import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import avt_tpu.ops.attention as attn_mod
from avt_tpu.models.vit import ViT

B, T = 8, 10
rng = np.random.default_rng(0)
v = jnp.asarray(rng.normal(size=(B, 3, T, 224, 224)).astype(np.float32))

def bench_chained(name, fn, p, x0, n=20):
    x = jax.block_until_ready(fn(p, x0))
    t0 = time.time()
    for _ in range(n):
        x = fn(p, x)
    jax.block_until_ready(x)
    print(f"{name:44s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)

for use_pallas, label in [(False, "xla"), (True, "pallas")]:
    attn_mod._PALLAS_MIN_SEQ = 128 if use_pallas else 10**9
    vit = ViT(dtype=jnp.bfloat16)
    p = vit.init(jax.random.PRNGKey(0), v)

    @jax.jit
    def step(p, x, _vit=vit):
        feats = _vit.apply(p, x)
        return x + jnp.mean(feats) * 1e-6

    bench_chained(f"ViT-B bf16 fwd chained [{label}]", step, p, v)

    @jax.jit
    def gstep(p, x, _vit=vit):
        g = jax.grad(lambda xx: jnp.sum(_vit.apply(p, xx) ** 2))(x)
        return x + g * 1e-12

    bench_chained(f"ViT-B bf16 fwd+bwd chained [{label}]", gstep, p, v)
