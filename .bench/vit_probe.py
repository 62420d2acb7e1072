import time, numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from avt_tpu.models.vit import ViT
print("devices", jax.devices(), flush=True)
vit = ViT()
video = jnp.zeros((2, 3, 4, 224, 224), jnp.float32)
t0 = time.time()
params = vit.init(jax.random.PRNGKey(0), video)
print(f"init {time.time()-t0:.1f}s", flush=True)
f = jax.jit(lambda p, v: vit.apply(p, v))
t0 = time.time()
out = jax.block_until_ready(f(params, video))
print(f"fwd compile+run {time.time()-t0:.1f}s out {out.shape}", flush=True)
t0 = time.time()
for _ in range(5):
    out = f(params, video)
jax.block_until_ready(out)
print(f"fwd steady {(time.time()-t0)/5*1000:.1f} ms", flush=True)

# now with grad
def loss(p, v):
    return jnp.sum(vit.apply(p, v) ** 2)

g = jax.jit(jax.grad(loss))
t0 = time.time()
gr = jax.block_until_ready(g(params, video))
print(f"bwd compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(5):
    gr = g(params, video)
jax.block_until_ready(jax.tree.leaves(gr)[0])
print(f"bwd steady {(time.time()-t0)/5*1000:.1f} ms", flush=True)
