"""Feature extraction round trip: TPU backbone -> RULSTM-layout store.

Closes the reference ecosystem's core workflow (SURVEY.md §2.3):
  1. dense-sample clips over whole videos
     (reference datasets/base_video_dataset.py:200-267),
  2. run the backbone in feature-extraction mode and dump per-rank H5s
     (reference func/train.py:319-429, only_run_featext),
  3. pack those features into stores the feature readers consume —
     an LMDB keyed '<video>_frame_%010d.jpg' (reference
     datasets/epic_kitchens.py:394-526, EpicRULSTMFeatsReader) and/or
     per-video .npy shards (avt_tpu.data.NpyFeatsReader) —
so an expts/02-style AVT-h config can train from self-extracted features.

Frame keying follows the RULSTM convention the readers assume: the feature
of the dense clip ending at t seconds is stored at frame floor(t * fps)
with fps = RULSTM_TSN_FPS (30). Extracting at stride s < 1/fps-granularity
leaves gaps the readers fill by backward search (radius 10) — exactly how
the reference's released 10fps stores work with its 30fps reader
(expts/04: warn_if_using_closeby_frame=false).

Usage:
  # extract + pack + verify, tiny example:
  python tools/extract_features.py -c expts/01_ek100_avt.txt \
      --out DATA/extracted_features/my_avtb --stride 0.1 --clip-len 1.0
  # pack-only from an existing featext run dir:
  python tools/extract_features.py --pack-only --run-dir OUTPUTS/x/0 \
      --out DATA/extracted_features/my_avtb
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from avt_tpu.data.anticipation import RULSTM_TSN_FPS
from avt_tpu.utils import get_logger

INDEX_NAME = "featext_index.csv"
RESULTS_DIR = "results"


def _featext_overrides(args) -> List[str]:
    """Overrides forcing feature-extraction mode onto any config."""
    dense = (
        "{_target_: datasets.base_video_dataset.dense_clip_sampler, "
        f"clip_len: {args.clip_len}, stride: {args.stride}, "
        "keep_orig_clips: false, "
        f"featext_skip_done: {str(bool(args.resume)).lower()}, "
        f"featext_results_dir: {os.path.join(args.run_dir, RESULTS_DIR)}, "
        "shard_per_worker: true}"
    )
    return [
        "test_only=true",
        "eval.eval_fn.only_run_featext=true",
        f"eval.eval_fn.store_endpoint={args.endpoint}",
        "eval.eval_fn.store=true",
        # raw dense windows, not anticipation-shifted ones
        "dataset_eval.conv_to_anticipate_fn=null",
        f"+dataset_eval.sample_clips_densely_fn={dense}",
    ]


def compose_cfg(config_file: Optional[str], overrides: List[str], args,
                conf_dir: str, for_index: bool = False) -> Dict:
    from avt_tpu.config import (
        Composer,
        expand_sweeps,
        parse_override,
        parse_overrides_file,
    )

    parsed = []
    if config_file:
        parsed += parse_overrides_file(config_file)
    parsed += [parse_override(o) for o in overrides]
    extra = _featext_overrides(args)
    if for_index:
        # the index must cover the FULL dataset, unsharded, with no resume
        # filtering — every rank's pack sees the same uid -> frame map
        extra = [
            o.replace("shard_per_worker: true", "shard_per_worker: false")
             .replace("featext_skip_done: true", "featext_skip_done: false")
            for o in extra
        ]
    parsed += [parse_override(o) for o in extra]
    variants = expand_sweeps(parsed)
    if len(variants) > 1:
        raise SystemExit(
            f"config expands to {len(variants)} sweep variants; feature "
            "extraction needs exactly one — pin the sweep keys"
        )
    return Composer(conf_dir).compose("config", variants[0])


def write_index(cfg: Dict, run_dir: str, logger) -> str:
    """uid -> (video_stem, end_sec) map of the dense eval dataset.

    Written from the dataset's own DataFrame rather than re-parsed from uid
    strings, so custom uid schemes and orig clips stay packable.
    """
    from avt_tpu.config.build import build_dataset

    ds = build_dataset(cfg["dataset_eval"], cfg["data_eval"])
    index_path = os.path.join(run_dir, INDEX_NAME)
    with open(index_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["uid", "video_stem", "end"])
        for _, row in ds.df.iterrows():
            w.writerow([
                row["uid"], Path(row["video_path"]).stem, float(row["end"]),
            ])
    logger.info("Wrote %d-row index -> %s", len(ds.df), index_path)
    return index_path


def read_index(index_path: str) -> Dict[str, Tuple[str, float]]:
    out = {}
    with open(index_path, newline="") as f:
        for row in csv.DictReader(f):
            out[row["uid"]] = (row["video_stem"], float(row["end"]))
    return out


def frame_id_for_time(end_sec: float, fps: float = RULSTM_TSN_FPS) -> int:
    """Store key frame for a clip ending at end_sec: floor(t * fps), min 1 —
    the same floor the readers apply to timestamps
    (reference epic_kitchens.py:493-509), so an exact-time readback hits
    the exact key."""
    return max(1, int(np.floor(end_sec * fps)))


def _iter_h5_rows(results_dir: str, endpoint: str):
    """(uid, feature) rows from every rank's H5, keyed on the endpoint."""
    import glob

    import h5py

    resfiles = sorted(glob.glob(os.path.join(results_dir, "*.h5")))
    if not resfiles:
        raise FileNotFoundError(f"no H5 result files in {results_dir}")
    for resfile in resfiles:
        with h5py.File(resfile, "r") as f:
            keys = [k for k in f.keys() if k.startswith(endpoint)]
            if not keys:
                raise KeyError(
                    f"{resfile} stores {sorted(f.keys())}, no '{endpoint}*' — "
                    "pass --endpoint matching the extraction's store_endpoint"
                )
            key = endpoint if endpoint in keys else keys[0]
            feats = f[key]
            uids = f["uid"][()]
            for i in range(feats.shape[0]):
                uid = uids[i]
                uid = uid.decode() if isinstance(uid, bytes) else str(uid)
                yield uid, np.asarray(feats[i], dtype=np.float32)


def pack(
    results_dir: str,
    index: Dict[str, Tuple[str, float]],
    out_dir: str,
    *,
    endpoint: str = "temp_agg",
    formats: Tuple[str, ...] = ("npy", "lmdb"),
    store_fps: float = RULSTM_TSN_FPS,
    logger=None,
) -> Dict[str, int]:
    """Pack featext H5s into reader-consumable stores.

    npy: <out>/npy/<stem>.npy, (max_frame, C) float32, NaN rows = missing
         (the NpyFeatsReader sparse-store convention, data/readers.py:212).
    lmdb: <out>/lmdb/, '<stem>_frame_%010d.jpg' -> float32 bytes (the
          RULSTM layout the reference's reader and ours both consume).
    Returns {"rows": n, "skipped": n_not_in_index, "videos": n}.
    """
    logger = logger or get_logger("extract_features")
    per_video: Dict[str, Dict[int, np.ndarray]] = {}
    n_rows = n_skip = 0
    for uid, feat in _iter_h5_rows(results_dir, endpoint):
        if uid not in index:
            n_skip += 1
            continue
        if feat.ndim != 1:
            raise ValueError(
                f"endpoint '{endpoint}' stores {feat.shape}-shaped rows; "
                "per-frame stores need one vector per clip — extract an "
                "aggregated endpoint (temp_agg with a mean/transformer "
                "aggregator, or backbone_mean)"
            )
        stem, end = index[uid]
        per_video.setdefault(stem, {})[frame_id_for_time(end, store_fps)] = feat
        n_rows += 1
    if not per_video:
        raise ValueError(
            f"nothing packable: {n_rows} rows matched the index, "
            f"{n_skip} skipped"
        )
    if "npy" in formats:
        npy_dir = os.path.join(out_dir, "npy")
        os.makedirs(npy_dir, exist_ok=True)
        for stem, frames in per_video.items():
            c = next(iter(frames.values())).shape[-1]
            arr = np.full((max(frames), c), np.nan, dtype=np.float32)
            for fid, feat in frames.items():
                arr[fid - 1] = feat
            np.save(os.path.join(npy_dir, f"{stem}.npy"), arr)
        logger.info("npy store: %d videos -> %s", len(per_video), npy_dir)
    if "lmdb" in formats:
        from avt_tpu.data import readers as _readers

        if not _readers.HAVE_LMDB:
            logger.warning(
                "lmdb module unavailable; skipping the LMDB store "
                "(npy shards carry the same features)"
            )
        else:
            lmdb_dir = os.path.join(out_dir, "lmdb")
            os.makedirs(lmdb_dir, exist_ok=True)
            nbytes = sum(
                f.nbytes + 64 for v in per_video.values() for f in v.values()
            )
            env = _readers.lmdb.open(
                lmdb_dir, map_size=max(nbytes * 4, 1 << 24)
            )
            with env.begin(write=True) as txn:
                for stem, frames in per_video.items():
                    for fid, feat in frames.items():
                        txn.put(
                            f"{stem}_frame_{fid:010d}.jpg".encode("utf-8"),
                            np.ascontiguousarray(feat).tobytes(),
                        )
            env.close()
            logger.info("lmdb store: %d videos -> %s", len(per_video), lmdb_dir)
    return {"rows": n_rows, "skipped": n_skip, "videos": len(per_video)}


def verify_roundtrip(
    results_dir: str,
    index: Dict[str, Tuple[str, float]],
    out_dir: str,
    *,
    endpoint: str,
    n_check: int = 16,
    store_fps: float = RULSTM_TSN_FPS,
    logger=None,
) -> int:
    """Read n_check features back through the actual readers and compare
    bit-exactly with the extracted H5 rows. Returns checks performed."""
    from avt_tpu.data import readers as _readers

    logger = logger or get_logger("extract_features")
    rows = []
    for uid, feat in _iter_h5_rows(results_dir, endpoint):
        if uid in index:
            rows.append((uid, feat))
    rng = np.random.default_rng(0)
    picks = rng.choice(len(rows), size=min(n_check, len(rows)), replace=False)
    readers_to_check = []
    npy_dir = os.path.join(out_dir, "npy")
    if os.path.isdir(npy_dir):
        readers_to_check.append(
            ("npy", _readers.NpyFeatsReader(npy_dir, read_type="normal"))
        )
    lmdb_dir = os.path.join(out_dir, "lmdb")
    if os.path.isdir(lmdb_dir) and _readers.HAVE_LMDB:
        readers_to_check.append(
            ("lmdb", _readers.LMDBFeatsReader(lmdb_dir, read_type="normal"))
        )
    n_done = 0
    for p in picks:
        uid, want = rows[int(p)]
        stem, end = index[uid]
        fid = frame_id_for_time(end, store_fps)
        # a window whose only frame is fid: readers take floor(t*fps) for
        # t in (start, end] -> [fid] exactly
        t_end, t_start = fid / store_fps, (fid - 1) / store_fps
        for name, reader in readers_to_check:
            got, _ = reader(f"{stem}.mp4", t_start, t_end, store_fps, None)
            got = got.reshape(-1)
            if got.shape != want.shape or not np.array_equal(got, want):
                raise AssertionError(
                    f"{name} readback mismatch for uid={uid} frame={fid}: "
                    f"max|diff|={np.abs(got - want).max()}"
                )
            n_done += 1
    logger.info("verified %d reader readbacks bit-exact", n_done)
    return n_done


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config-file", default=None)
    parser.add_argument("--conf-dir", default=str(
        Path(__file__).resolve().parent.parent / "conf"))
    parser.add_argument("--run-dir", default=None,
                        help="featext work dir (default OUTPUTS/<expt>_featext/0)")
    parser.add_argument("--out", required=True,
                        help="store output dir (npy/ and lmdb/ subdirs)")
    parser.add_argument("--endpoint", default="temp_agg",
                        help="model endpoint to extract (store_endpoint)")
    parser.add_argument("--clip-len", default=1.0,
                        help="dense clip seconds (or mean_action_len)")
    parser.add_argument("--stride", type=float, default=0.1,
                        help="dense sampling stride seconds")
    parser.add_argument("--store-fps", type=float, default=RULSTM_TSN_FPS,
                        help="fps of the frame keying (RULSTM stores use 30)")
    parser.add_argument("--formats", default="npy,lmdb")
    parser.add_argument("--resume", action="store_true",
                        help="skip uids already in the run dir's H5s")
    parser.add_argument("--pack-only", action="store_true",
                        help="skip extraction; pack an existing run dir")
    parser.add_argument("--no-verify", action="store_true")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    logger = get_logger("extract_features")

    if args.run_dir is None:
        expt = Path(args.config_file).stem if args.config_file else "default"
        args.run_dir = os.path.join("OUTPUTS", f"{expt}_featext", "0")
    os.makedirs(args.run_dir, exist_ok=True)
    results_dir = os.path.join(args.run_dir, RESULTS_DIR)

    index_path = os.path.join(args.run_dir, INDEX_NAME)
    rank = int(
        os.environ.get("JAX_PROCESS_ID") or os.environ.get("RANK") or 0
    )
    if not args.pack_only:
        from avt_tpu.train_net import main as train_main

        if rank == 0:
            cfg_index = compose_cfg(
                args.config_file, args.overrides, args, args.conf_dir,
                for_index=True,
            )
            index_path = write_index(cfg_index, args.run_dir, logger)
        cfg = compose_cfg(
            args.config_file, args.overrides, args, args.conf_dir)
        logger.info("Extracting '%s' features -> %s", args.endpoint,
                    results_dir)
        train_main(cfg, args.run_dir)
        # multi-process extraction (shard_per_worker): featext eval skips
        # the usual cross-process syncs (reference func/train.py docstring),
        # so rank 0 must not pack while other ranks are still appending —
        # barrier first, then only rank 0 packs the merged H5s
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("featext_done")
    if rank != 0:
        logger.info("rank %d: extraction finished; rank 0 packs", rank)
        return None
    if not os.path.exists(index_path):
        raise SystemExit(
            f"{index_path} missing — run extraction first (or copy the "
            "index from the extracting run dir)"
        )
    index = read_index(index_path)
    stats = pack(
        results_dir, index, args.out,
        endpoint=args.endpoint,
        formats=tuple(args.formats.split(",")),
        store_fps=args.store_fps, logger=logger,
    )
    logger.info("packed %(rows)d features / %(videos)d videos "
                "(%(skipped)d rows not in index)", stats)
    if not args.no_verify:
        verify_roundtrip(
            results_dir, index, args.out, endpoint=args.endpoint,
            store_fps=args.store_fps, logger=logger,
        )
    return stats


if __name__ == "__main__":
    main()
