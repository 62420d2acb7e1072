"""Localize full-step time: ViT, AVT-h head, optimizer, preproc, full step.

Bench shape: B=16, T=10, 224px, bf16 compute.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from avt_tpu.utils import enable_compile_cache

enable_compile_cache()

B, T = 16, 10
R = 20
rng = np.random.default_rng(0)


def timed(name, fn, *args, n=R):
    y = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    t0 = time.time()
    for _i in range(n):
        y = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / n
    print(f"{name:44s} {dt*1000:8.2f} ms", flush=True)


# 1. ViT alone fwd / fwd+bwd (dispatch-level, like the real step does)
from avt_tpu.models.vit import ViT

v = jnp.asarray(rng.normal(size=(B, 3, T, 224, 224)).astype(np.float32))
vit = ViT(dtype=jnp.bfloat16)
pv = vit.init(jax.random.PRNGKey(0), v)
timed("vit fwd", jax.jit(lambda p, x: vit.apply(p, x)), pv, v)
timed("vit fwd+bwd",
      jax.jit(jax.grad(lambda p, x: jnp.sum(vit.apply(p, x).astype(jnp.float32) ** 2))),
      pv, v)

# 2. AVT-h + classifier on features
from avt_tpu.losses import mse
from avt_tpu.models.future import AVTh
from avt_tpu.models.classifiers import LinearClassifier

feats = jnp.asarray(rng.normal(size=(B, T, 768)).astype(np.float32))
head = AVTh(in_features=768, inter_dim=2048, n_layer=6, n_head=4,
            output_len=1, avg_last_n=1, return_past_too=True,
            future_pred_loss=lambda p, t: mse(p, t, reduction="none"),
            dtype=jnp.bfloat16)
ph = head.init(jax.random.PRNGKey(0), feats)


def head_loss(p, f):
    past, future, losses, _ = head.apply(p, f)
    return (jnp.sum(future.astype(jnp.float32) ** 2)
            + jnp.sum(losses["feat"]))


timed("avth fwd+bwd", jax.jit(jax.grad(head_loss)), ph, feats)

# 3. optimizer update alone on the full flagship param tree
from avt_tpu.models.flagship import build_avt
from avt_tpu.train import TrainState, build_optimizer

model = build_avt(num_actions=3806, vit_dtype=jnp.bfloat16)
video0 = jnp.zeros((B, T, 3, 1, 224, 224), jnp.float32)
params = model.init(jax.random.PRNGKey(0), video0, (B,))
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"# param count: {n_params/1e6:.1f}M")
tx, _ = build_optimizer(
    params, lr_wd=[["__all__", 1e-4, 1e-5]], optimizer_name="sgd",
    scheduler_name="cosine", iters_per_epoch=1000, num_epochs=30,
    warmup_epochs=20,
    optimizer_kwargs={"nesterov": True, "momentum_dtype": "bfloat16"},
)
state = TrainState.create(params, tx)
grads = jax.tree.map(jnp.zeros_like, params)


import optax


@jax.jit
def opt_step(state, grads):
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    return state.replace(
        params=optax.apply_updates(state.params, updates),
        opt_state=new_opt, step=state.step + 1,
    )


timed("optimizer update alone", opt_step, state, grads)

# 4. preprocessing alone
from avt_tpu.data.transforms import VideoPreprocessor

pp = VideoPreprocessor(crop_size=224, scale_h="248-280", scale_w=-1,
                       mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), flip_p=0.5,
                       compute_dtype=jnp.bfloat16)
frames = jnp.asarray(rng.integers(0, 256, size=(B, T, 256, 342, 3)).astype(np.uint8))
timed("preproc train_fn", jax.jit(pp.train_fn), frames, jax.random.PRNGKey(0))
