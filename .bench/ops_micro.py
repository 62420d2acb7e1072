import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

M, C = 160*197, 768   # ViT token stream at B=16,T=10
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32), dtype=jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(C, 4*C)).astype(np.float32), dtype=jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(4*C, C)).astype(np.float32), dtype=jnp.bfloat16)

def timed(name, fn, x, n=10, flops=None):
    y = fn(x); _ = float(jnp.sum(y.astype(jnp.float32)))
    t0=time.time()
    for _ in range(n): x = fn(x)
    _ = float(jnp.sum(x.astype(jnp.float32)))
    dt=(time.time()-t0)/n
    extra = f" ({flops/dt/1e12:.0f} TF/s)" if flops else ""
    print(f"{name:34s} {dt*1000:7.2f} ms{extra}", flush=True)
    return x

# one MLP block iterated
@jax.jit
def mlp(x):
    h = jax.nn.gelu(x @ w1)
    return x + h @ w2 * 1e-3
timed("ViT MLP pair (31.5k x 768)", mlp, x, flops=2*M*C*4*C*2)

# LN
@jax.jit
def ln(x):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-6)
timed("LayerNorm", ln, x)

# attention at ViT shape via XLA
q = jnp.asarray(rng.normal(size=(160, 197, 12, 64)).astype(np.float32), dtype=jnp.bfloat16)
@jax.jit
def att(q):
    o = jax.nn.dot_product_attention(q, q, q)
    return q + o * 1e-3
timed("XLA attention (160,197,12,64)", att, q)

# patch conv
img = jnp.asarray(rng.normal(size=(160, 224, 224, 3)).astype(np.float32), dtype=jnp.bfloat16)
kern = jnp.asarray(rng.normal(size=(16, 16, 3, 768)).astype(np.float32), dtype=jnp.bfloat16)
@jax.jit
def pconv(img):
    o = jax.lax.conv_general_dilated(img, kern, (16,16), "VALID",
        dimension_numbers=("NHWC","HWIO","NHWC"))
    return img + jnp.mean(o) * 1e-3
timed("patch conv 16x16 (160 frames)", pconv, img)
