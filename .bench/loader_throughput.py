"""Host input-pipeline throughput probe: can the loader feed >100 clips/s?

Synthesizes mp4s via cv2, builds the real VideoDataset + DataLoader with
the C++ libav reader, and measures clips/s of pure host-side batch
production (no device work).

Findings (2026-08-16, this dev VM):
  * nproc == 1 here: the measured ~17 clips/s IS the single-core decode
    rate (52 ms/clip = 331 mpeg4 frames @ 0.15 ms; Python overhead ~2 ms).
    Worker threads cannot help on one core; production v5e hosts have
    >100 cores, where 8-16 workers x ~19 clips/s/core comfortably exceeds
    the chip's ~101 clips/s.
  * Use REALISTIC content: noise videos are ~30x larger and make the
    probe disk-bound (2 clips/s artifacts).
  * Handles must NOT be shared across threads for the same path: the
    reader pools per-path contexts (video_decoder._HandlePool).
"""
import sys, time, os
sys.path.insert(0, ".")
import numpy as np
import pandas as pd
import cv2

from avt_tpu.data.dataset import VideoDataset
from avt_tpu.data.video_decoder import LibavVideoReader
from avt_tpu.data.anticipation import convert_to_anticipation
from avt_tpu.data.loader import DataLoader

root = "/tmp/vidbench2"
os.makedirs(root, exist_ok=True)
FPS, SECS = 30, 40
for v in range(4):
    path = f"{root}/v{v}.mp4"
    if os.path.exists(path):
        continue
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (342, 256))
    rng = np.random.default_rng(v)
    base = rng.integers(0, 255, size=(256, 342, 3)).astype(np.uint8)
    for t in range(FPS * SECS):
        w.write(np.roll(base, t, axis=1))
    w.release()
print("videos ready", flush=True)

rows = []
uid = 0
for v in range(4):
    t = 12.0
    while t < SECS - 3:
        rows.append(dict(uid=uid, video_path=f"v{v}.mp4", start=t, end=t + 2.0,
                         verb_class=0, noun_class=0, action_class=uid % 5))
        uid += 1
        t += 1.0
df = pd.DataFrame(rows)
ds = VideoDataset(
    df, root=root, frames_per_clip=10, frame_rate=1.0,
    reader=LibavVideoReader(),
    label_type=["action"],
    sample_strategy="last_clip",
    conv_to_anticipate_fn=lambda d: convert_to_anticipation(d, tau_a=1.0, tau_o=10.0),
    action_classes={f"a{i}": i for i in range(5)},
)
print(f"{len(ds)} clips", flush=True)
for workers in (8, 16):
    loader = DataLoader(ds, 16, shuffle=True, drop_last=True,
                        num_workers=workers, keys=["video", "target"])
    n = 0
    it = iter(loader)
    next(it)  # warm
    t0 = time.time()
    for batch in it:
        n += batch["video"].shape[0]
    dt = time.time() - t0
    print(f"workers={workers}: {n/dt:.1f} clips/s host-side "
          f"({batch['video'].shape} per batch)", flush=True)
