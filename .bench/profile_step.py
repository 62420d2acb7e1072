"""Stage-by-stage timing of the flagship train step on the real chip.

Each stage runs K iterations inside one scanned dispatch (tunnel-overhead-
free) and is timed with a forced fetch. Prints ms/iter + achieved TF/s.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from avt_tpu.data.transforms import VideoPreprocessor
from avt_tpu.models.flagship import build_avt
from avt_tpu.models.vit import ViT
from avt_tpu.train import TrainState, build_optimizer, make_train_step

B, K, T, H, W = 16, 8, 10, 256, 342
N_CLS = 3806

rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, size=(K, B, T, H, W, 3)).astype(np.uint8))
pp = VideoPreprocessor(crop_size=224, scale_h="248-280", scale_w=-1,
                       mean=(0.5,)*3, std=(0.5,)*3, flip_p=0.5,
                       compute_dtype=jnp.bfloat16)

def timed(name, fn, *args, flops=None, n=3):
    t0 = time.time(); r = fn(*args); jnp.sum(jax.tree.leaves(r)[0]).block_until_ready()
    f = float(jnp.sum(jax.tree.leaves(r)[0]))  # forced fetch
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    f = float(jnp.sum(jax.tree.leaves(r)[0]))
    dt = (time.time() - t0) / (n * K)
    tf = (flops / dt / 1e12) if flops else 0
    print(f"{name:34s} {dt*1000:8.2f} ms/iter  {tf:6.1f} TF/s  (compile {compile_t:.0f}s)", flush=True)
    return dt

# --- stage 1: preprocessing only
def pp_scan(frames, rng):
    def body(c, fr):
        out = pp.train_fn(fr, jax.random.fold_in(rng, c))
        return c + 1, jnp.sum(out)
    return jax.lax.scan(body, 0, frames)[1]
t_pp = timed("preproc (uint8->crop, bf16)", jax.jit(pp_scan), frames, jax.random.PRNGKey(0))

# --- stage 2: ViT-B fwd only (bf16), B*T frames
vit = ViT(dtype=jnp.bfloat16)
video1 = pp.train_fn(frames[0], jax.random.PRNGKey(0))  # (B, 3, T, 224, 224)
video1 = video1.transpose(0, 2, 1, 3, 4).reshape(B * T, 3, 1, 224, 224)
vparams = vit.init(jax.random.PRNGKey(0), video1)
vit_flops_fwd = 2 * 17.6e9 * B * T  # ~17.6 GFLOP/frame matmul fwd... (x2 for MACs->FLOPs already in 17.6)
vit_flops_fwd = 17.6e9 * B * T
def vit_fwd_scan(params, frames, rng):
    def body(c, fr):
        v = pp.train_fn(fr, jax.random.fold_in(rng, c))
        v = v.transpose(0, 2, 1, 3, 4).reshape(B * T, 3, 1, 224, 224)
        out = vit.apply(params, v)
        return c + 1, jnp.sum(out)
    return jax.lax.scan(body, 0, frames)[1]
t_vf = timed("preproc + ViT-B fwd", jax.jit(vit_fwd_scan), vparams, frames, jax.random.PRNGKey(0), flops=vit_flops_fwd)

# --- stage 3: preproc + ViT fwd+bwd
def vit_fb_scan(params, frames, rng):
    def body(c, fr):
        v = pp.train_fn(fr, jax.random.fold_in(rng, c))
        v = v.transpose(0, 2, 1, 3, 4).reshape(B * T, 3, 1, 224, 224)
        def loss(p):
            return jnp.sum(vit.apply(p, v).astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss)(params)
        return c + 1, l + jnp.sum(jax.tree.leaves(g)[0])
    return jax.lax.scan(body, 0, frames)[1]
t_vfb = timed("preproc + ViT fwd+bwd", jax.jit(vit_fb_scan), vparams, frames, jax.random.PRNGKey(0), flops=3*vit_flops_fwd)

# --- stage 4: full train step (what bench.py measures)
model = build_avt(num_actions=N_CLS, vit_dtype=jnp.bfloat16)
video0 = pp.train_fn(frames[0], jax.random.PRNGKey(0)).transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
params = model.init(jax.random.PRNGKey(0), video0, (B,))
tx, _ = build_optimizer(params, lr_wd=[["__all__", 1e-4, 1e-5]],
    optimizer_name="sgd", scheduler_name="cosine", iters_per_epoch=1000,
    num_epochs=30, warmup_epochs=20, optimizer_kwargs={"nesterov": True})
inner = make_train_step(model, tx,
    loss_wts={"cls_action": 1.0, "past_cls_action": 1.0, "feat": 1.0},
    num_classes={"action": N_CLS}, jit_compile=False)
target = jnp.asarray(rng.integers(0, N_CLS, size=(K, B)))
tsub = jnp.asarray(rng.integers(-1, N_CLS, size=(K, B, T, 1)))
def full_scan(state, frames, target, tsub, rng):
    def body(carry, inp):
        c, state = carry
        fr, tg, ts = inp
        v = pp.train_fn(fr, jax.random.fold_in(rng, c)).transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
        state, m = inner(state, {"video": v, "target": {"action": tg},
                                 "target_subclips": {"action": ts}},
                         jax.random.fold_in(rng, c + 100))
        return (c + 1, state), m["loss"]
    (_, state), losses = jax.lax.scan(body, (0, state), (frames, target, tsub))
    return losses
state = TrainState.create(params, tx)
t_full = timed("FULL train step", jax.jit(full_scan, donate_argnums=(0,)), state, frames, target, tsub, jax.random.PRNGKey(1), flops=3*vit_flops_fwd)

print(f"\nbreakdown: preproc {t_pp*1e3:.1f} | +vit_fwd {t_vf*1e3:.1f} | +vit_fwd+bwd {t_vfb*1e3:.1f} | full {t_full*1e3:.1f} ms")
print(f"head+opt overhead (full - vit_fb): {(t_full-t_vfb)*1e3:.1f} ms")
print(f"clips/s full: {B/t_full:.1f}")
