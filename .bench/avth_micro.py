"""AVT-h head cost, dispatch-amortized (chained scan in one jit)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from avt_tpu.utils import enable_compile_cache

enable_compile_cache()

B, T = 16, 10
R = 30
rng = np.random.default_rng(0)
feats0 = jnp.asarray(rng.normal(size=(B, T, 768)).astype(np.float32))

from avt_tpu.losses import mse
from avt_tpu.models.future import AVTh

head = AVTh(in_features=768, inter_dim=2048, n_layer=6, n_head=4,
            output_len=1, avg_last_n=1, return_past_too=True,
            future_pred_loss=lambda p, t: mse(p, t, reduction="none"),
            dtype=jnp.bfloat16)
ph = head.init(jax.random.PRNGKey(0), feats0)


def head_loss(p, f):
    past, future, losses, _ = head.apply(p, f)
    return jnp.sum(future.astype(jnp.float32) ** 2) + jnp.sum(losses["feat"])


g = jax.grad(head_loss, argnums=1)


def timed(name, jfn, args):
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    t0 = time.time()
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / R
    print(f"{name:34s} {dt*1000:8.3f} ms/iter", flush=True)


@jax.jit
def fwd_loop(f):
    def body(f, _):
        _, fut, losses, _ = head.apply(ph, f)
        return f + jnp.mean(fut) * 1e-6, ()
    f, _ = jax.lax.scan(body, f, None, length=R)
    return f


@jax.jit
def bwd_loop(f):
    def body(f, _):
        return f + g(ph, f) * 1e-6, ()
    f, _ = jax.lax.scan(body, f, None, length=R)
    return f


timed("avth fwd (chained)", fwd_loop, (feats0,))
timed("avth fwd+bwd-wrt-input (chained)", bwd_loop, (feats0,))
