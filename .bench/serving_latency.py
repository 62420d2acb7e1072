"""Serving-latency probe: single-request (B=1) end-to-end anticipation
latency on one chip, the number an online deployment cares about (the
reference has no serving story; avt_tpu/serve.py exports this same fused
program as StableHLO).

Measures the fused device-preproc + ViT-B/16 + AVT-h forward at B=1 for
  * center-crop (eval_num_crops=1, the online-serving config), and
  * 3-crop + flip (the challenge-submission quality config, 6 views),
reporting p50/p95 over N single-request calls, each timed with a
fetch-forced sync (block_until_ready is unreliable on axon — CLAUDE.md).

Run:  python .bench/serving_latency.py            (TPU via the tunnel)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from avt_tpu.utils import enable_compile_cache

enable_compile_cache()

from avt_tpu.data.transforms import VideoPreprocessor
from avt_tpu.models.flagship import build_avt

T, H, W = 10, 256, 342
N_CLS = 3806
N_CALLS = 50


def build(num_crops: int, flips: bool):
    model = build_avt(num_actions=N_CLS, vit_dtype=jnp.bfloat16)
    pp = VideoPreprocessor(
        crop_size=224, scale_h=248, scale_w=-1,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        eval_num_crops=num_crops, eval_flip_crops=flips,
        compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
    )

    @jax.jit
    def fwd(params, fr):
        video = pp.eval_fn(fr)[:, None]
        outputs, _ = model.apply(params, video, train=False)
        return outputs["logits/action"]

    return model, pp, fwd


def measure(tag: str, num_crops: int, flips: bool):
    model, pp, fwd = build(num_crops, flips)
    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(rng.integers(0, 256, size=(1, T, H, W, 3), dtype=np.int64
                                 ).astype(np.uint8))
        for _ in range(8)
    ]
    video0 = pp.eval_fn(frames[0])[:, None]
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), video0, (1,))
    print(f"# {tag}: init {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    _ = float(jnp.sum(fwd(params, frames[0])))
    print(f"# {tag}: compiled {time.time() - t0:.0f}s", flush=True)
    lat = []
    for i in range(N_CALLS):
        t0 = time.time()
        _ = float(jnp.sum(fwd(params, frames[i % len(frames)])))
        lat.append((time.time() - t0) * 1e3)
    lat = np.array(lat)
    print(
        f"{tag}: p50 {np.percentile(lat, 50):.1f} ms  "
        f"p95 {np.percentile(lat, 95):.1f} ms  "
        f"mean {lat.mean():.1f} ms  ({N_CALLS} calls, B=1)",
        flush=True,
    )


if __name__ == "__main__":
    measure("center-crop  (1 view) ", 1, False)
    measure("3-crop+flip  (6 views)", 3, True)
