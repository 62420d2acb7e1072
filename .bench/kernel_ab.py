"""A/B the packed attention kernel at ViT bench shape (160, 197, 768)."""
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


def kfwd(qkv):
    o = packed_attention(qkv, H, causal=False, use_pallas=True)
    return jnp.pad(o, ((0, 0), (0, 0), (0, 2 * C)))


@jax.jit
def fwd_loop(qkv):
    def body(x, _):
        return (x + kfwd(x) * jnp.asarray(1e-6, x.dtype)).astype(x.dtype), ()
    x, _ = jax.lax.scan(body, qkv, None, length=R)
    return x


g = jax.grad(lambda x: jnp.sum(kfwd(x).astype(jnp.float32) ** 2))


@jax.jit
def bwd_loop(qkv):
    def body(x, _):
        return (x + g(x) * jnp.asarray(1e-6, x.dtype)).astype(x.dtype), ()
    x, _ = jax.lax.scan(body, qkv, None, length=R)
    return x


timed("packed kernel fwd", fwd_loop, (qkv0,))
timed("packed kernel fwd+bwd", bwd_loop, (qkv0,))

# correctness vs XLA fallback
o_pal = packed_attention(qkv0, H, causal=False, use_pallas=True)
o_xla = packed_attention(qkv0, H, causal=False, use_pallas=False)
err = float(jnp.max(jnp.abs(o_pal.astype(jnp.float32) - o_xla.astype(jnp.float32))))
print(f"fwd max err vs xla: {err:.5f}")
gp = jax.jit(jax.grad(lambda q: jnp.sum(
    packed_attention(q, H, use_pallas=True).astype(jnp.float32) ** 2)))(qkv0)
gx = jax.jit(jax.grad(lambda q: jnp.sum(
    packed_attention(q, H, use_pallas=False).astype(jnp.float32) ** 2)))(qkv0)
gerr = float(jnp.max(jnp.abs(gp.astype(jnp.float32) - gx.astype(jnp.float32))))
print(f"bwd max err vs xla: {gerr:.5f}")
