import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import avt_tpu.ops.attention as attn_mod
from avt_tpu.models.vit import ViT

B, T = 16, 10
rng = np.random.default_rng(0)
v = jnp.asarray(rng.normal(size=(B, 3, T, 224, 224)).astype(np.float32))

for use_pallas, label in [(False, "xla"), (True, "pallas")]:
    attn_mod._PALLAS_MIN_SEQ = 128 if use_pallas else 10**9
    vit = ViT(dtype=jnp.bfloat16)
    p = vit.init(jax.random.PRNGKey(0), v)

    @jax.jit
    def gstep(p, x, _vit=vit):
        g = jax.grad(lambda xx: jnp.sum(_vit.apply(p, xx) ** 2))(x)
        return x + g * 1e-12

    x = gstep(p, v); _ = float(jnp.sum(x))
    n = 10
    t0 = time.time()
    for _ in range(n):
        x = gstep(p, x)
    _ = float(jnp.sum(x))
    print(f"ViT-B bf16 fwd+bwd 160 frames [{label:6s}]: {(time.time()-t0)/n*1000:7.1f} ms", flush=True)
