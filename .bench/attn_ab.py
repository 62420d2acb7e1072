import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import avt_tpu.ops.attention as attn_mod
from avt_tpu.models.vit import ViT

B, T = 8, 10
rng = np.random.default_rng(0)
v = jnp.asarray(rng.normal(size=(B, 3, T, 224, 224)).astype(np.float32))

def bench_fn(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)

# force XLA attention
attn_mod._PALLAS_MIN_SEQ = 10**9
vit = ViT(dtype=jnp.bfloat16)
p = vit.init(jax.random.PRNGKey(0), v)
bench_fn("ViT-B bf16 fwd XLA-attn", jax.jit(lambda p, x: vit.apply(p, x)), p, v)
bench_fn("ViT-B bf16 fwd+bwd XLA-attn",
         jax.jit(jax.grad(lambda p, x: jnp.sum(vit.apply(p, x)**2))), p, v)
vit32 = ViT()
bench_fn("ViT-B f32 fwd+bwd XLA-attn",
         jax.jit(jax.grad(lambda p, x: jnp.sum(vit32.apply(p, x)**2))), p, v)

# raw attention op A/B at ViT shape
q = jnp.asarray(rng.normal(size=(80, 197, 12, 64)).astype(np.float32))
from avt_tpu.ops.flash_attention import flash_attention
bench_fn("pallas flash attn (80,197,12,64)", lambda q: flash_attention(q, q, q), q)
bench_fn("xla attn (80,197,12,64)",
         jax.jit(lambda q: jax.nn.dot_product_attention(q, q, q)), q)
