import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

M, C = 160*197, 768
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32), dtype=jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(C, 4*C)).astype(np.float32), dtype=jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(4*C, C)).astype(np.float32), dtype=jnp.bfloat16)
R = 50

def timed(name, fn, args, per_iter_flops=None, per_iter_bytes=None):
    y = fn(*args); _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    t0=time.time()
    y = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    dt=(time.time()-t0)/R
    extra = ""
    if per_iter_flops: extra += f" {per_iter_flops/dt/1e12:.0f} TF/s"
    if per_iter_bytes: extra += f" {per_iter_bytes/dt/1e9:.0f} GB/s"
    print(f"{name:36s} {dt*1000:7.3f} ms/iter{extra}", flush=True)

@jax.jit
def mlp_loop(x, w1, w2):
    def body(x, _):
        h = jax.nn.gelu(x @ w1)
        return x + h @ w2 * 1e-3, ()
    x, _ = jax.lax.scan(body, x, None, length=R)
    return x
timed("in-call MLP pair", mlp_loop, (x, w1, w2), per_iter_flops=2*M*C*4*C*2)

@jax.jit
def ln_loop(x):
    def body(x, _):
        m = jnp.mean(x, -1, keepdims=True)
        v = jnp.var(x, -1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-6) + x * 1e-3, ()
    x, _ = jax.lax.scan(body, x, None, length=R)
    return x
timed("in-call LayerNorm", ln_loop, (x,), per_iter_bytes=2*M*C*2)

q0 = jnp.asarray(rng.normal(size=(160, 197, 12, 64)).astype(np.float32), dtype=jnp.bfloat16)
@jax.jit
def att_loop(q):
    def body(q, _):
        o = jax.nn.dot_product_attention(q, q, q)
        return q + o * 1e-3, ()
    q, _ = jax.lax.scan(body, q, None, length=R)
    return q
timed("in-call XLA attention", att_loop, (q0,), per_iter_flops=4*160*12*197*197*64)

from avt_tpu.ops.flash_attention import flash_attention
@jax.jit
def fla_loop(q):
    def body(q, _):
        o = flash_attention(q, q, q)
        return q + o * 1e-3, ()
    q, _ = jax.lax.scan(body, q, None, length=R)
    return q
timed("in-call pallas attention", fla_loop, (q0,), per_iter_flops=4*160*12*197*197*64)
