"""packed_attention: pallas kernel vs XLA fallback, chained in-jit."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from avt_tpu.utils import enable_compile_cache

enable_compile_cache()

N, T, C, H = 160, 197, 768, 12
R = 30
rng = np.random.default_rng(0)
qkv0 = jnp.asarray(rng.normal(size=(N, T, 3 * C)).astype(np.float32) * 0.3,
                   dtype=jnp.bfloat16)
from avt_tpu.ops.attention import packed_attention


def timed(name, jfn, args):
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    t0 = time.time()
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / R
    print(f"{name:34s} {dt*1000:8.3f} ms/iter", flush=True)


def make(use_pallas, grad):
    def kfwd(qkv):
        o = packed_attention(qkv, H, causal=False, use_pallas=use_pallas)
        return jnp.pad(o, ((0, 0), (0, 0), (0, 2 * C)))
    f = kfwd
    if grad:
        f = jax.grad(lambda x: jnp.sum(kfwd(x).astype(jnp.float32) ** 2))

    @jax.jit
    def loop(qkv):
        def body(x, _):
            return (x + f(x) * jnp.asarray(1e-6, x.dtype)).astype(x.dtype), ()
        x, _ = jax.lax.scan(body, qkv, None, length=R)
        return x
    return loop


timed("xla fwd", make(False, False), (qkv0,))
timed("xla fwd+bwd", make(False, True), (qkv0,))
timed("pallas fwd", make(True, False), (qkv0,))
timed("pallas fwd+bwd", make(True, True), (qkv0,))
