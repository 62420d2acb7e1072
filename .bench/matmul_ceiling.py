import sys, time
import numpy as np, jax, jax.numpy as jnp

@jax.jit
def mm_chain(a, b):
    for _ in range(8):
        a = jnp.tanh(a @ b)
    return a

for n, dtype in [(4096, jnp.bfloat16), (8192, jnp.bfloat16)]:
    a = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)), dtype=dtype)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(n, n)), dtype=dtype)
    x = mm_chain(a, b); _ = float(jnp.sum(x.astype(jnp.float32)))
    iters = 10
    t0 = time.time()
    x = a
    for _ in range(iters):
        x = mm_chain(x, b)
    _ = float(jnp.sum(x.astype(jnp.float32)))
    dt = time.time() - t0
    flops = 2 * n**3 * 8 * iters
    print(f"{n}x{n} {dtype.__name__}: {flops/dt/1e12:.0f} TF/s  ({dt/iters*1000:.1f} ms/call)", flush=True)
