"""Probe: does casting grads to bf16 before tx.update speed up the step?"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from avt_tpu.data.transforms import VideoPreprocessor
from avt_tpu.models.flagship import build_avt
from avt_tpu.train import TrainState, build_optimizer
from avt_tpu.train.ops import basic_loss_accuracy
from avt_tpu.train.step import weighted_loss_sum
import optax

B, K, T, H, W = 16, 8, 10, 256, 342
N_CLS = 3806
model = build_avt(num_actions=N_CLS, vit_dtype=jnp.bfloat16)
pp = VideoPreprocessor(crop_size=224, scale_h="248-280", scale_w=-1,
                       mean=(0.5,)*3, std=(0.5,)*3, flip_p=0.5,
                       compute_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, size=(K, B, T, H, W, 3)).astype(np.uint8))
target = jnp.asarray(rng.integers(0, N_CLS, size=(K, B)))
tsub = jnp.asarray(rng.integers(-1, N_CLS, size=(K, B, T, 1)))
video0 = pp.train_fn(frames[0], jax.random.PRNGKey(0)).transpose(0,2,1,3,4)[:, :, :, None]
params = model.init(jax.random.PRNGKey(0), video0, (B,))
tx, _ = build_optimizer(params, lr_wd=[["__all__", 1e-4, 1e-5]],
    optimizer_name="sgd", scheduler_name="cosine", iters_per_epoch=1000,
    num_epochs=30, warmup_epochs=20,
    optimizer_kwargs={"nesterov": True, "momentum_dtype": "bfloat16"})

def make(grad_bf16):
    def step(state, batch, rng):
        k1, k2 = jax.random.split(rng)
        video = pp.train_fn(batch["f"], k1).transpose(0,2,1,3,4)[:, :, :, None]
        def loss_fn(p):
            out, aux = model.apply(p, video, (B,), train=True,
                                   rngs={"dropout": k2, "cloze": k2})
            losses, accs = basic_loss_accuracy(out, {"action": batch["t"]},
                {"action": batch["s"].reshape(B, T, -1)}, num_classes={"action": N_CLS})
            losses.update(aux)
            tot, ml = weighted_loss_sum(losses, {"cls_action":1.0,"past_cls_action":1.0,"feat":1.0})
            return tot, ml
        (tot, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if grad_bf16:
            grads = jax.tree.map(lambda g: g.astype(jnp.bfloat16), grads)
        upd, opt2 = tx.update(grads, state.opt_state, state.params)
        p2 = optax.apply_updates(state.params, upd)
        return TrainState(step=state.step+1, params=p2, opt_state=opt2), tot
    def multi(state, fb, tb, sb, r):
        def body(c, inp):
            st, i = c
            f, t_, s_ = inp
            st, l = step(st, {"f": f, "t": t_, "s": s_}, jax.random.fold_in(r, i))
            return (st, i+1), l
        (st, _), ls = jax.lax.scan(body, (state, 0), (fb, tb, sb))
        return st, ls
    return jax.jit(multi, donate_argnums=(0,))

params_host = jax.device_get(params)
for name, gb in (("f32 grads", False), ("bf16 grads", True)):
    state = TrainState.create(jax.device_put(params_host), tx)
    fn = make(gb)
    state, ls = fn(state, frames, target, tsub, jax.random.PRNGKey(1))
    _ = float(ls[-1])
    t0 = time.time()
    for i in range(3):
        state, ls = fn(state, frames, target, tsub, jax.random.PRNGKey(i))
    _ = float(ls[-1])
    dt = (time.time()-t0)/(3*K)
    print(f"{name}: {dt*1000:.1f} ms/step -> {B/dt:.1f} clips/s", flush=True)
