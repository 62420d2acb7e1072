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

for B, T in [(1, 1), (8, 10), (16, 10), (32, 10)]:
    v = jnp.asarray(rng.normal(size=(B, 3, T, 224, 224)).astype(np.float32))
    p = vit.init(jax.random.PRNGKey(0), v) if B == 1 else p
    x = jax.block_until_ready(gstep(p, v))
    n = 50
    t0 = time.time()
    for _ in range(n):
        x = gstep(p, x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / n * 1000
    frames = B * T
    tflops = 3 * 2 * frames * 17.6e9 / 2 / (dt / 1000) / 1e12  # ~3x fwd flops
    print(f"B={B:3d} T={T:2d} frames={frames:4d}: {dt:8.2f} ms  (~{tflops:.0f} TF/s)", flush=True)
