"""Decompose ViT block fwd+bwd cost at bench shapes (160x197x768 bf16).

Each component is timed as grad(component) chained R times inside ONE jit
via lax.scan, so dispatch/tunnel overhead amortizes to zero and XLA cannot
dead-code the backward.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from avt_tpu.utils import enable_compile_cache

enable_compile_cache()

N, T, C, H = 160, 197, 768, 12
M = N * T
R = 30
rng = np.random.default_rng(0)
bf = jnp.bfloat16
x0 = jnp.asarray(rng.normal(size=(N, T, C)).astype(np.float32), dtype=bf)


def timed(name, jfn, args, flops=None):
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    t0 = time.time()
    y = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / R
    extra = f" {flops/dt/1e12:6.0f} TF/s" if flops else ""
    print(f"{name:42s} {dt*1000:8.3f} ms/iter{extra}", flush=True)


def chain_grad(f):
    g = jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32) ** 2))

    @jax.jit
    def run(x):
        def body(x, _):
            return (x + g(x) * jnp.asarray(1e-6, x.dtype)).astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=R)
        return x
    return run


def chain_fwd(f):
    @jax.jit
    def run(x):
        def body(x, _):
            return (x + f(x) * jnp.asarray(1e-6, x.dtype)).astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=R)
        return x
    return run


# 1. packed attention (qkv Dense + pallas kernel + proj Dense)
from avt_tpu.models.vit import ViTAttention, ViTBlock

attn = ViTAttention(num_heads=H, dtype=bf)
pa = attn.init(jax.random.PRNGKey(0), x0)
attn_flops = 2 * M * C * 4 * C * 2 + 4 * N * H * T * T * 64  # matmuls + attn fwd
timed("attn(qkv+kernel+proj) fwd", chain_fwd(lambda x: attn.apply(pa, x)), (x0,),
      flops=attn_flops)
timed("attn(qkv+kernel+proj) fwd+bwd",
      chain_grad(lambda x: attn.apply(pa, x)), (x0,), flops=3 * attn_flops)

# 2. kernel alone
from avt_tpu.ops.attention import packed_attention

qkv0 = jnp.asarray(rng.normal(size=(N, T, 3 * C)).astype(np.float32), dtype=bf)
kflops = 4 * N * H * T * T * 64


def kfwd(qkv):
    o = packed_attention(qkv, H, causal=False)
    return jnp.pad(o, ((0, 0), (0, 0), (0, 2 * C)))  # match qkv shape for chain


timed("pallas kernel fwd", chain_fwd(kfwd), (qkv0,), flops=kflops)
timed("pallas kernel fwd+bwd", chain_grad(kfwd), (qkv0,), flops=kflops * 11 // 4)

# 3. MLP (fc1+gelu-tanh+fc2)
import flax.linen as nn


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * C, dtype=bf, name="fc1")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(C, dtype=bf, name="fc2")(h)


mlp = MLP()
pm = mlp.init(jax.random.PRNGKey(0), x0)
mlp_flops = 2 * M * C * 4 * C * 2
timed("mlp fwd", chain_fwd(lambda x: mlp.apply(pm, x)), (x0,), flops=mlp_flops)
timed("mlp fwd+bwd", chain_grad(lambda x: mlp.apply(pm, x)), (x0,),
      flops=3 * mlp_flops)

# 4. LayerNorm
ln = nn.LayerNorm(epsilon=1e-6, dtype=bf)
pl_ = ln.init(jax.random.PRNGKey(0), x0)
timed("layernorm fwd", chain_fwd(lambda x: ln.apply(pl_, x)), (x0,))
timed("layernorm fwd+bwd", chain_grad(lambda x: ln.apply(pl_, x)), (x0,))

# 5. whole block
blk = ViTBlock(num_heads=H, dtype=bf)
pb = blk.init(jax.random.PRNGKey(0), x0)
blk_flops = attn_flops + mlp_flops
timed("ViTBlock fwd", chain_fwd(lambda x: blk.apply(pb, x)), (x0,),
      flops=blk_flops)
timed("ViTBlock fwd+bwd", chain_grad(lambda x: blk.apply(pb, x)), (x0,),
      flops=3 * blk_flops)
