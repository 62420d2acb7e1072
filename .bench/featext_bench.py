"""Feature-extraction throughput: dense clips -> backbone features -> H5.

The production featext path (tools/extract_features.py): eval preproc at
ONE crop (no 3-crop/flip views), full flagship forward, fetch the
temp_agg endpoint to host, append to the per-rank H5 (the
evaluate/results.py sink). Reports feats/s/chip device-only and with the
store in the loop (one-deep async pipeline so the H5 gzip write overlaps
device compute).

Run on the real chip:  python .bench/featext_bench.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

B = int(os.environ.get("AVT_BENCH_B", "32"))
N_STEPS = int(os.environ.get("AVT_BENCH_STEPS", "24"))
T, H, W = 10, 256, 342
N_CLS = 3806


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avt_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from avt_tpu.data.transforms import VideoPreprocessor
    from avt_tpu.evaluate.results import store_append_h5
    from avt_tpu.models.flagship import build_avt

    model = build_avt(num_actions=N_CLS, vit_dtype=jnp.bfloat16)
    pp = VideoPreprocessor(
        crop_size=224, scale_h=248, scale_w=-1,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        eval_num_crops=1, eval_flip_crops=False,
        compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(rng.integers(0, 256, size=(B, T, H, W, 3), dtype=np.uint8))
        for _ in range(4)
    ]

    @jax.jit
    def featext(params, fr):
        video = pp.eval_fn(fr)[:, None]  # (B, 1, 1, 3, T, 224, 224)
        outputs, _ = model.apply(params, video, train=False)
        return outputs["temp_agg"].astype(jnp.float32)

    video0 = pp.eval_fn(frames[0])[:, None]
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), video0, (B,))
    print(f"# init {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    f0 = featext(params, frames[0])
    _ = float(jnp.sum(f0))
    print(f"# compile {time.time()-t0:.0f}s, feat dim {f0.shape}", flush=True)

    # device-only rate (async dispatch, fetch-forced at the end)
    t0 = time.time()
    outs = [featext(params, frames[k % 4]) for k in range(N_STEPS)]
    _ = float(jnp.sum(outs[-1]))
    dev_fps = N_STEPS * B / (time.time() - t0)
    print(f"device-only: {dev_fps:.1f} feats/s/chip")

    # with the H5 store in the loop (one-deep: fetch step i while step i+1
    # runs on device; gzip append on the host)
    import shutil

    out_dir = "/tmp/featext_bench_h5"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    pending = None
    for k in range(N_STEPS):
        feats = featext(params, frames[k % 4])
        if pending is not None:
            store_append_h5(
                {"temp_agg": np.asarray(pending),
                 "uid": np.asarray([f"v_{k}_{i}" for i in range(B)]),
                 "idx": np.arange(B) + k * B},
                out_dir,
            )
        pending = feats
    store_append_h5(
        {"temp_agg": np.asarray(pending),
         "uid": np.asarray([f"v_last_{i}" for i in range(B)]),
         "idx": np.arange(B)},
        out_dir,
    )
    stored_fps = N_STEPS * B / (time.time() - t0)
    print(f"with H5 store: {stored_fps:.1f} feats/s/chip")
    print(f"# eval-mode 6-view equivalent: {dev_fps / 6:.1f} clips/s "
          "(cross-check vs bench eval mode)")


if __name__ == "__main__":
    main()
