"""Component-level timing of the bench step on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

from avt_tpu.data.transforms import VideoPreprocessor
from avt_tpu.models.vit import ViT
from avt_tpu.models.flagship import build_avt
from avt_tpu.losses import mse

B, T = 8, 10
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, size=(B, T, 256, 342, 3)).astype(np.uint8))

def bench_fn(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return out

pp = VideoPreprocessor(crop_size=224, scale_h="248-280", scale_w=-1,
                       mean=(0.5,0.5,0.5), std=(0.5,0.5,0.5))
video = bench_fn("preprocess train_fn", lambda f: pp.train_fn(f, jax.random.PRNGKey(0)), frames)

# ViT fwd f32 vs bf16, pallas vs xla attention
vit32 = ViT()
v = video.transpose(0, 2, 1, 3, 4).reshape(B, 3, T, 224, 224)
p32 = vit32.init(jax.random.PRNGKey(0), v)
f32 = jax.jit(lambda p, x: vit32.apply(p, x))
bench_fn("ViT-B f32 fwd (80 frames)", f32, p32, v)

g32 = jax.jit(jax.grad(lambda p, x: jnp.sum(vit32.apply(p, x)**2)))
bench_fn("ViT-B f32 fwd+bwd", g32, p32, v)

vit16 = ViT(dtype=jnp.bfloat16)
f16 = jax.jit(lambda p, x: vit16.apply(p, x))
bench_fn("ViT-B bf16 fwd", f16, p32, v)
g16 = jax.jit(jax.grad(lambda p, x: jnp.sum(vit16.apply(p, x)**2)))
bench_fn("ViT-B bf16 fwd+bwd", g16, p32, v)

# AVTh head at bench scale
from avt_tpu.models import AVTh
head = AVTh(in_features=768, inter_dim=2048, n_layer=6, n_head=4,
            output_len=1, avg_last_n=1, return_past_too=True,
            future_pred_loss=lambda p, t: mse(p, t, reduction="none"))
feats = jnp.asarray(rng.normal(size=(B, T, 768)).astype(np.float32))
hp = head.init(jax.random.PRNGKey(0), feats)
hf = jax.jit(lambda p, x: head.apply(p, x)[1])
bench_fn("AVTh-2048x6 fwd (B=8)", hf, hp, feats)
hg = jax.jit(jax.grad(lambda p, x: jnp.sum(head.apply(p, x)[1]**2)))
bench_fn("AVTh-2048x6 fwd+bwd", hg, hp, feats)
