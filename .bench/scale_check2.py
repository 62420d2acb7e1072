import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from avt_tpu.models.vit import ViT

rng = np.random.default_rng(0)
vit = ViT(dtype=jnp.bfloat16)

@jax.jit
def gstep(p, x):
    g = jax.grad(lambda xx: jnp.sum(vit.apply(p, xx) ** 2))(x)
    return x + g * 1e-12

p = None
for B, T in [(1, 1), (8, 10), (16, 10)]:
    v = jnp.asarray(rng.normal(size=(B, 3, T, 224, 224)).astype(np.float32))
    if p is None:
        p = vit.init(jax.random.PRNGKey(0), v)
    x = gstep(p, v)
    _ = float(jnp.sum(x))  # warm, fetch
    n = 20
    t0 = time.time()
    for _ in range(n):
        x = gstep(p, x)
    _ = float(jnp.sum(x))  # force full execution + fetch
    dt = (time.time() - t0) / n * 1000
    frames = B * T
    print(f"B={B:3d} frames={frames:4d}: {dt:8.2f} ms/iter (fetch-forced)", flush=True)
