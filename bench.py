"""Benchmark: end-to-end AVT-b + AVT-h training throughput on one chip.

Measures the full flagship pipeline the reference runs in expts/01
(README.md:193): device-side preprocessing (scale-jitter resize + crop +
flip + normalize) -> ViT-B/16 per frame (bf16 compute) -> AVT-h causal head
-> cls + past + feat losses -> SGD update; 10-frame 224px clips,
forward+backward, one TPU chip. K train steps run inside one dispatch
(lax.scan over prefetched batches) so host/tunnel round-trips don't pollute
the device measurement; timing is fetch-forced. Prints ONE JSON line.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6);
its hardware was V100-16GB at batch 3/GPU, fp32 (no AMP anywhere in
func/train.py). The model costs ~1.06 TFLOPs/clip (ViT-B = 17.6 GMACs =
35.2 GFLOPs per frame, x10 frames, x3 for fwd+bwd). The 20 clips/s V100
denominator is deliberately GENEROUS: it implies ~21 TFLOP/s sustained,
above V100 fp32 peak (15.7), so vs_baseline understates the real speedup.
vs_baseline = measured / 20.0 = how many idealized V100s one TPU chip
replaces on this workload.
"""
import json
import os
import sys
import time

V100_CLIPS_PER_SEC_EST = 20.0
# 'train' (default; the driver's headline metric), 'eval' (the 3-crop
# + flip challenge-submission forward, models/base.py batched-crop path),
# or 'fed' (disk -> native decode -> loader -> device, .bench/fed_pipeline.md)
MODE = os.environ.get("AVT_BENCH_MODE", "train")
if MODE not in ("train", "eval", "fed"):
    # fail fast: a typo'd mode must neither KeyError after a 15-minute
    # measurement nor silently run the train bench with no floor
    raise SystemExit(f"Unknown AVT_BENCH_MODE {MODE!r} (train|eval|fed)")
# clips per step; overridable for A/B runs (AVT_BENCH_B=32 python bench.py).
# Train: B=16 beat 24/32 (ledger, CLAUDE.md); fed drives the SAME train
# step, so it inherits B=16 (its .bench/fed_pipeline.md comparisons are at
# 16). Eval: B=32 measured best (63.96 vs 62.63 clips/s at 16; 64 OOMs the
# 16GB chip) — .bench sweep r3.
_DEFAULT_B = "32" if MODE == "eval" else "16"
B = int(os.environ.get("AVT_BENCH_B", _DEFAULT_B))
# scanned steps per dispatch: K=32 measured a consistent ~+0.25% over
# K=16 (120.98/121.11/121.19 vs 120.65-120.98 across r3/r4 runs) — less
# per-dispatch overhead; costs a longer scan trace on cold compiles.
_DEFAULT_K = "32" if MODE == "train" else "8"
K = int(os.environ.get("AVT_BENCH_K", _DEFAULT_K))
T, H, W = 10, 256, 342
N_CLS = 3806

# --- perf-fingerprint constants -----------------------------------------
# Model cost per clip (fwd+bwd), from the xprof op ledger in DESIGN.md:
# ViT-B/16 is 17.58 GMACs/frame at 224px (35.2 GFLOPs) x 10 frames, AVT-h
# (6-layer GPT-2-ish @ n_embd=2048 over 10 tokens) ~9.7 GFLOPs/clip, past
# classifier + heads ~1.6; x3 for fwd+bwd.
TRAIN_FLOPS_PER_CLIP = (35.2e9 * T + 9.7e9 + 1.6e9) * 3
# eval: 6 crop-views (3 crops x flip), forward only
EVAL_FLOPS_PER_CLIP = (35.2e9 * T + 9.7e9 + 1.6e9) * 6
# TPU v5e bf16 peak (nominal; the chip measures 173-176 TF/s on 8192^3
# matmuls, so nominal-peak MFU understates achieved-roofline by ~12%)
PEAK_FLOPS = 197e12

# Regression floors per mode (VERDICT r4 item 4): a perf regression must
# not slip through an otherwise-green round. Train: ~2% under the r4
# steady state 121.2; eval: under the 63.96 r3 optimum; fed: under the
# 2.94 r4 number (host-bound, noisier). Only enforced at the default
# (B, K) config; AVT_BENCH_MIN overrides (0 disables).
FLOORS = {"train": 119.0, "eval": 62.0, "fed": 2.6}


def check_floor(clips_per_sec):
    if os.environ.get("AVT_BENCH_B") or os.environ.get("AVT_BENCH_K"):
        return  # custom config — floors are for the default config only
    # .get: an unrecognized AVT_BENCH_MODE falls through to main() and
    # must not KeyError AFTER a valid 15-minute measurement
    min_cps = float(os.environ.get("AVT_BENCH_MIN", FLOORS.get(MODE, 0)))
    if min_cps and clips_per_sec < min_cps:
        log(f"REGRESSION: {clips_per_sec:.2f} clips/s < {min_cps} "
            f"floor ({MODE})")
        sys.exit(1)


def hbm_high_water_gb(jitted=None, *args):
    """Device HBM peak in GB: the runtime's memory_stats where reported,
    else the compiled step's static peak (memory_analysis — the axon
    platform returns memory_stats()=None but reports
    peak_memory_in_bytes from the server-side compile)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        if peak:
            return round(peak / 2**30, 3)
    except Exception:
        pass
    if jitted is not None:
        try:
            ma = jitted.lower(*args).compile().memory_analysis()
            peak = getattr(ma, "peak_memory_in_bytes", 0)
            if peak:
                return round(peak / 2**30, 3)
        except Exception as err:
            log(f"memory_analysis unavailable: {err}")
    return None


def log(msg):
    print(f"# bench: {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avt_tpu.utils import enable_compile_cache

    enable_compile_cache()  # cold compile of this step is minutes on 1 core

    from avt_tpu.data.transforms import VideoPreprocessor
    from avt_tpu.models.flagship import build_avt
    from avt_tpu.train import TrainState, build_optimizer, make_train_step
    from avt_tpu.train.step import make_multi_step

    model = build_avt(num_actions=N_CLS, vit_dtype=jnp.bfloat16)
    pp = VideoPreprocessor(
        crop_size=224, scale_h="248-280", scale_w=-1,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), flip_p=0.5,
        compute_dtype=jnp.bfloat16,  # full-res pass in bf16 (HBM-bound)
        out_dtype=jnp.bfloat16,  # backbone computes bf16: fuse the cast
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(K, B, T, H, W, 3)).astype(np.uint8)
    )
    target = jnp.asarray(rng.integers(0, N_CLS, size=(K, B)))
    tsub = jnp.asarray(rng.integers(-1, N_CLS, size=(K, B, T, 1)))

    video0 = pp.train_fn(frames[0], jax.random.PRNGKey(0))
    video0 = video0.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), video0, (B,))
    init_s = time.time() - t0
    log(f"init done in {init_s:.0f}s")
    tx, _ = build_optimizer(
        params,
        lr_wd=[["__all__", 1e-4, 1e-5]],
        optimizer_name="sgd",
        scheduler_name="cosine",
        iters_per_epoch=1000,
        num_epochs=30,
        warmup_epochs=20,
        optimizer_kwargs={"nesterov": True, "momentum_dtype": "bfloat16"},
    )
    inner = make_train_step(
        model, tx,
        loss_wts={"cls_action": 1.0, "past_cls_action": 1.0, "feat": 1.0},
        num_classes={"action": N_CLS},
        jit_compile=False,
    )

    def step_with_pp(state, batch, rng):
        k1, k2 = jax.random.split(rng)
        video = pp.train_fn(batch["frames"], k1)  # (B, 3, T, 224, 224)
        video = video.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
        return inner(
            state,
            {
                "video": video,
                "target": {"action": batch["target"]},
                "target_subclips": {"action": batch["tsub"]},
            },
            k2,
        )

    multi = make_multi_step(step_with_pp, K)
    state = TrainState.create(params, tx)
    batches = {"frames": frames, "target": target, "tsub": tsub}
    t0 = time.time()
    state, m = multi(state, batches, jax.random.PRNGKey(1))
    loss0 = float(m["loss"][-1])  # fetch forces completion
    compile_s = time.time() - t0
    log(f"train step compiled in {compile_s:.0f}s, loss={loss0:.3f}")
    n_rounds = 4
    t0 = time.time()
    for i in range(n_rounds):
        state, m = multi(state, batches, jax.random.PRNGKey(i))
    _ = float(m["loss"][-1])  # fetch-forced timing
    dt = (time.time() - t0) / (n_rounds * K)
    clips_per_sec = B / dt
    print(
        json.dumps(
            {
                "metric": "clips/sec/chip (e2e AVT-b ViT-B/16 + AVT-h, "
                          "10-frame 224px clips, fwd+bwd incl. device preproc)",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / V100_CLIPS_PER_SEC_EST, 2),
                # perf fingerprint (VERDICT r4 item 4): auditable MFU +
                # memory margin + compile cost, not just throughput
                "mfu_vs_nominal_peak": round(
                    clips_per_sec * TRAIN_FLOPS_PER_CLIP / PEAK_FLOPS, 4),
                "hbm_high_water_gb": hbm_high_water_gb(
                    multi, state, batches, jax.random.PRNGKey(0)),
                "warm_compile_s": round(compile_s, 1),
                "init_s": round(init_s, 1),
            }
        )
    )
    check_floor(clips_per_sec)


def main_eval():
    """3-crop + horizontal-flip eval forward (the challenge-submission
    path, reference expts eval_num_crops=3 eval_flip_crops=true): device
    preproc (torch-exact resize + 6 crops) -> batched-crop ViT-B + AVT-h
    forward, no grad. Each clip runs 6 crop-forwards; clips/s counts CLIPS."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avt_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from avt_tpu.data.transforms import VideoPreprocessor
    from avt_tpu.models.flagship import build_avt

    model = build_avt(num_actions=N_CLS, vit_dtype=jnp.bfloat16)
    pp = VideoPreprocessor(
        crop_size=224, scale_h=248, scale_w=-1,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        eval_num_crops=3, eval_flip_crops=True,
        compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(K, B, T, H, W, 3)).astype(np.uint8)
    )

    @jax.jit
    def fwd_one(params, fr):
        video = pp.eval_fn(fr)  # (B, 6, 3, T, 224, 224)
        video = video[:, None]  # -> (B, #clips=1, #crops, C, T, H, W)
        outputs, _ = model.apply(params, video, train=False)
        return outputs["logits/action"]

    video0 = pp.eval_fn(frames[0])[:, None]
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), video0, (B,))
    init_s = time.time() - t0
    log(f"init done in {init_s:.0f}s")
    t0 = time.time()
    _ = float(jnp.sum(fwd_one(params, frames[0])))
    compile_s = time.time() - t0
    log(f"eval forward compiled in {compile_s:.0f}s")
    # async dispatch hides the per-batch python overhead; fetch at the end
    n_rounds = 4
    t0 = time.time()
    for _ in range(n_rounds):
        outs = [fwd_one(params, frames[k]) for k in range(K)]
    _ = float(jnp.sum(outs[-1]))  # fetch-forced timing
    dt = (time.time() - t0) / (n_rounds * K)
    clips_per_sec = B / dt
    print(
        json.dumps(
            {
                "metric": "eval clips/sec/chip (AVT-b + AVT-h, 3 crops + "
                          "flips batched into one forward, no grad)",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / V100_CLIPS_PER_SEC_EST, 2),
                "mfu_vs_nominal_peak": round(
                    clips_per_sec * EVAL_FLOPS_PER_CLIP / PEAK_FLOPS, 4),
                "hbm_high_water_gb": hbm_high_water_gb(
                    fwd_one, params, frames[0]),
                "warm_compile_s": round(compile_s, 1),
                "init_s": round(init_s, 1),
            }
        )
    )
    check_floor(clips_per_sec)


def _make_fed_videos(vid_dir, n_videos=4, seconds=40, fps=30):
    """Synthetic EK-scale source videos (256x342 @30fps), cached on disk."""
    import cv2
    import numpy as np

    os.makedirs(vid_dir, exist_ok=True)
    paths = [os.path.join(vid_dir, f"fed_{i:02d}.mp4") for i in range(n_videos)]
    if all(os.path.exists(p) and os.path.getsize(p) > 0 for p in paths):
        return paths, float(seconds)
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 255, size=(16, 256, 342, 3)).astype(np.uint8)
    for vi, path in enumerate(paths):
        w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (342, 256))
        for f in range(seconds * fps):
            # moving noise tile over a gradient: non-degenerate encode cost
            frame = np.full((256, 342, 3), (f + 31 * vi) % 200, np.uint8)
            frame[:, : 342 // 2] = noise[f % 16, :, : 342 // 2]
            w.write(frame)
        w.release()
    return paths, float(seconds)


class _FedDataset:
    """10-frame 1-fps anticipation windows decoded from disk — the host
    work a real EK run does per clip (a ~10 s ranged decode at source
    fps, then frame-rate subsampling; readers.py/sampling.py semantics)."""

    def __init__(self, paths, duration, n_items, n_cls):
        from avt_tpu.data.video_decoder import LibavVideoReader

        self.reader = LibavVideoReader()
        self.paths = paths
        self.duration = duration
        self.n_items = n_items
        self.n_cls = n_cls

    def __len__(self):
        return self.n_items

    def __getitem__(self, i):
        import numpy as np

        path = self.paths[i % len(self.paths)]
        start = (i * 3.7) % (self.duration - 11.0)
        frames, _ = self.reader(path, start, start + 10.0, None, None)
        if frames.shape[0] < T:
            raise IOError(f"short decode from {path}")
        idx = np.linspace(0, frames.shape[0] - 1, T).round().astype(int)
        rng = np.random.default_rng(i)
        return {
            "video": frames[idx],
            "target": {"action": rng.integers(0, self.n_cls)},
            "target_subclips": {
                "action": rng.integers(-1, self.n_cls, size=(T, 1))
            },
            "idx": i,
        }


def main_fed():
    """End-to-end FED pipeline: disk -> native libav decode -> DataLoader
    threads -> host->device transfer -> device preproc + train step,
    one-deep async pipeline (the loop.py overlap). Reports achieved
    clips/s next to the synthetic-fed number and the loader-only rate,
    from which the host cores needed to saturate one chip follow
    (the reference ran workers=10 per GPU, conf/data/default.yaml)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avt_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from avt_tpu.data.loader import DataLoader
    from avt_tpu.data.transforms import VideoPreprocessor
    from avt_tpu.models.flagship import build_avt
    from avt_tpu.train import TrainState, build_optimizer, make_train_step

    n_steps = int(os.environ.get("AVT_BENCH_FED_STEPS", "24"))
    workers = int(os.environ.get("AVT_BENCH_FED_WORKERS", "8"))
    vid_dir = os.environ.get("AVT_BENCH_FED_DIR", "/tmp/avt_fed_videos")
    log(f"writing/loading synthetic videos in {vid_dir}")
    paths, duration = _make_fed_videos(vid_dir)

    dataset = _FedDataset(paths, duration, n_items=B * (n_steps + 2), n_cls=N_CLS)
    loader = DataLoader(
        dataset, B, shuffle=False, drop_last=True, num_workers=workers,
        keys=["video", "target", "target_subclips", "idx"],
    )

    # loader-only rate first (same items): the pure host decode ceiling
    t0 = time.time()
    n_clips = 0
    for batch in loader:
        n_clips += batch["video"].shape[0]
    loader_cps = n_clips / (time.time() - t0)
    log(f"loader-only: {loader_cps:.2f} clips/s on this host")

    model = build_avt(num_actions=N_CLS, vit_dtype=jnp.bfloat16)
    pp = VideoPreprocessor(
        crop_size=224, scale_h="248-280", scale_w=-1,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), flip_p=0.5,
        compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
    )

    it = iter(loader)
    b0 = next(it)

    def to_dev(batch):
        return {
            "video": jnp.asarray(batch["video"]),
            "target": {"action": jnp.asarray(batch["target"]["action"])},
            "target_subclips": {
                "action": jnp.asarray(batch["target_subclips"]["action"])
            },
        }

    video0 = pp.train_fn(jnp.asarray(b0["video"]), jax.random.PRNGKey(0))
    video0 = video0.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), video0, (B,))
    init_s = time.time() - t0
    log(f"init done in {init_s:.0f}s")
    tx, _ = build_optimizer(
        params, lr_wd=[["__all__", 1e-4, 1e-5]],
        optimizer_name="sgd", scheduler_name="cosine",
        iters_per_epoch=1000, num_epochs=30, warmup_epochs=20,
        optimizer_kwargs={"nesterov": True, "momentum_dtype": "bfloat16"},
    )
    inner = make_train_step(
        model, tx,
        loss_wts={"cls_action": 1.0, "past_cls_action": 1.0, "feat": 1.0},
        num_classes={"action": N_CLS},
        jit_compile=False,
    )

    def step_with_pp(state, batch, rng):
        k1, k2 = jax.random.split(rng)
        video = pp.train_fn(batch["video"], k1)
        video = video.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
        return inner(
            state,
            {
                "video": video,
                "target": {"action": batch["target"]["action"]},
                "target_subclips": {"action": batch["target_subclips"]["action"]},
            },
            k2,
        )

    step = jax.jit(step_with_pp, donate_argnums=(0,))
    state = TrainState.create(params, tx)
    t0 = time.time()
    state, m = step(state, to_dev(b0), jax.random.PRNGKey(0))
    compile_s = time.time() - t0
    log(f"train step compiled in {compile_s:.0f}s, "
        f"loss={float(m['loss']):.3f}")

    # steady state: one-deep pipeline — fetch step i's loss only after
    # dispatching step i+1, so host decode overlaps device compute
    loader.set_epoch(1)
    pending = None
    n_done = 0
    t0 = time.time()
    for i, batch in enumerate(loader):
        if i >= n_steps:
            break
        state, m = step(state, to_dev(batch), jax.random.fold_in(
            jax.random.PRNGKey(2), i))
        if pending is not None:
            _ = float(pending["loss"])
        pending = m
        n_done += 1
    _ = float(pending["loss"])  # fetch forces completion
    dt = time.time() - t0
    fed_cps = n_done * B / dt
    cores_needed = 120.8 / max(loader_cps, 1e-9)
    log(f"fed: {n_done} steps, {fed_cps:.2f} clips/s "
        f"(loader ceiling {loader_cps:.2f}; ~{cores_needed:.1f} of these "
        f"cores to saturate the 120.8 clips/s synthetic-fed step)")
    print(
        json.dumps(
            {
                "metric": "fed clips/sec/chip (disk -> native decode -> "
                          "loader -> device preproc + train step, "
                          f"workers={workers} on {os.cpu_count()} host core)",
                "value": round(fed_cps, 2),
                "unit": "clips/s",
                "vs_baseline": round(fed_cps / V100_CLIPS_PER_SEC_EST, 2),
                "loader_only_clips_per_sec": round(loader_cps, 2),
                "host_cores_to_saturate_chip": round(cores_needed, 1),
                "hbm_high_water_gb": hbm_high_water_gb(
                    step, state, to_dev(b0), jax.random.PRNGKey(0)),
                "warm_compile_s": round(compile_s, 1),
                "init_s": round(init_s, 1),
            }
        )
    )
    check_floor(fed_cps)


def _wait_for_backend():
    """Ride out a transient tunnel wedge: backend init on a wedged axon
    tunnel blocks ~25 min then raises UNAVAILABLE; recovery is spontaneous
    (CLAUDE.md). Probe in SUBPROCESSES (a failed in-process init can leave
    the backend error cached) and fall through to the real init once one
    succeeds — or after the last attempt, letting main() surface the error.
    Single client at a time, natural exits only (no kill mid-init)."""
    import subprocess

    attempts = int(os.environ.get("AVT_BENCH_INIT_RETRIES", "3"))
    for i in range(attempts):
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('up')"],
            capture_output=True, text=True,
        )
        if probe.returncode == 0:
            return
        if i == attempts - 1:
            log("backend still unavailable after retries; proceeding to "
                "surface the real error")
            return
        log(f"backend unavailable (attempt {i + 1}/{attempts}); "
            "idling 300s before retrying")
        time.sleep(300)


if __name__ == "__main__":
    _wait_for_backend()
    if MODE == "eval":
        main_eval()
    elif MODE == "fed":
        main_fed()
    else:
        main()
