#!/usr/bin/env python3
"""Pre-resize a video tree to 256px height (keep aspect, even width).

Parity: reference sample_scripts/resize_epic_256px.sh — the datasets are
read fastest when videos are stored pre-resized near the training scale
(SURVEY.md §3.5 hot loop #3); the on-device preprocessor then only does the
scale-jitter/crop. This version is a Python driver over the same ffmpeg
filter with a bounded worker pool and resumable output (skips files whose
output already exists and is newer than the input).

Usage:
  python tools/resize_videos_256px.py IN_DIR OUT_DIR [--height 256]
      [--workers 32] [--ext .MP4] [--dry-run]
"""
import argparse
import concurrent.futures as cf
import os
import subprocess
import sys
from pathlib import Path


def _resize_cv2(src: Path, dst: Path, height: int) -> None:
    """Decode/resize/re-encode with OpenCV when no ffmpeg CLI exists
    (drops audio; the training pipeline never reads it anyway)."""
    import cv2

    cap = cv2.VideoCapture(str(src))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    in_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    in_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    out_w = int(round(in_w * height / in_h / 2)) * 2  # even width
    writer = cv2.VideoWriter(
        str(dst), cv2.VideoWriter_fourcc(*"mp4v"), fps, (out_w, height)
    )
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            writer.write(
                cv2.resize(frame, (out_w, height),
                           interpolation=cv2.INTER_AREA)
            )
    finally:
        cap.release()
        writer.release()


def convert(src: Path, dst: Path, height: int, dry: bool) -> str:
    if dst.exists() and dst.stat().st_mtime >= src.stat().st_mtime:
        return f"skip (done) {src}"
    dst.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "ffmpeg", "-y", "-loglevel", "error", "-i", str(src),
        # even output width (required by yuv420p), aspect preserved
        "-filter:v", f"scale=trunc(oh*a/2)*2:{height}",
        "-c:a", "copy", str(dst),
    ]
    if dry:
        return " ".join(cmd)
    # keep the real video extension LAST (cv2/ffmpeg pick the container
    # from it); the .part marker goes before it
    tmp = dst.with_name(dst.stem + ".part" + dst.suffix)
    cmd[-1] = str(tmp)
    try:
        try:
            subprocess.run(cmd, check=True)
        except FileNotFoundError:  # no ffmpeg CLI: OpenCV fallback
            _resize_cv2(src, tmp, height)
        os.replace(tmp, dst)  # atomic: a crash never leaves a half file
    finally:
        tmp.unlink(missing_ok=True)
    return f"converted {src}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("in_dir", type=Path)
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--workers", type=int, default=32)
    ap.add_argument("--ext", default=".MP4",
                    help="video extension (case-insensitive)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    vids = sorted(
        p for p in args.in_dir.rglob("*")
        if p.suffix.lower() == args.ext.lower()
    )
    if not vids:
        print(f"no {args.ext} files under {args.in_dir}", file=sys.stderr)
        return 1
    with cf.ThreadPoolExecutor(args.workers) as pool:
        futs = [
            pool.submit(
                convert, v, args.out_dir / v.relative_to(args.in_dir),
                args.height, args.dry_run,
            )
            for v in vids
        ]
        # one corrupt video must not abort the whole (hours-long) batch:
        # report per-file failures and keep converting, fail only at exit
        nfail = 0
        for f in cf.as_completed(futs):
            try:
                print(f.result(), flush=True)
            except Exception as e:  # noqa: BLE001 - ffmpeg/cv2/OS errors alike
                nfail += 1
                print(f"FAILED: {e}", file=sys.stderr, flush=True)
    if nfail:
        print(f"{nfail}/{len(vids)} conversions failed", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
