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


def _featext_overrides(args, *, shard: bool = True,
                       resume: Optional[bool] = None) -> List[str]:
    """Overrides forcing feature-extraction mode onto any config."""
    resume = bool(args.resume) if resume is None else resume
    dense = (
        "{_target_: datasets.base_video_dataset.dense_clip_sampler, "
        f"clip_len: {args.clip_len}, stride: {args.stride}, "
        "keep_orig_clips: false, "
        f"featext_skip_done: {str(resume).lower()}, "
        f"featext_results_dir: {os.path.join(args.run_dir, RESULTS_DIR)}, "
        f"shard_per_worker: {str(shard).lower()}}}"
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
    # for_index: the index must cover the FULL dataset, unsharded, with no
    # resume filtering — every rank's pack sees the same uid -> frame map
    extra = _featext_overrides(
        args, shard=not for_index,
        resume=False if for_index else None,
    )
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


def _h5_files(results_dir: str) -> List[str]:
    import glob

    resfiles = glob.glob(os.path.join(results_dir, "*.h5"))
    if not resfiles:
        raise FileNotFoundError(f"no H5 result files in {results_dir}")
    # numeric rank order (lexical would put 10.h5 before 2.h5 and break
    # the later-row-wins dedup for >= 10-rank extractions)
    resfiles.sort(
        key=lambda p: (
            (0, int(Path(p).stem)) if Path(p).stem.isdigit()
            else (1, Path(p).stem)
        )
    )
    return resfiles


def _endpoint_key(f, resfile: str, endpoint: str) -> str:
    keys = [k for k in f.keys() if k.startswith(endpoint)]
    if not keys:
        raise KeyError(
            f"{resfile} stores {sorted(f.keys())}, no '{endpoint}*' — "
            "pass --endpoint matching the extraction's store_endpoint"
        )
    return endpoint if endpoint in keys else keys[0]


def _decode_uid(uid) -> str:
    return uid.decode() if isinstance(uid, bytes) else str(uid)


def _locate_rows(resfiles, index, endpoint, store_fps):
    """Pass 1 over the H5s: uid strings only (no features in RAM).

    Returns (per_video: stem -> [(file_i, row_i, frame_id)], feat_dim,
    n_rows, n_skip). A later row for the same frame id wins, matching the
    append-order semantics of a resumed extraction.
    """
    import h5py

    per_video: Dict[str, List[Tuple[int, int, int]]] = {}
    n_rows = n_skip = 0
    feat_dim = None
    for fi, resfile in enumerate(resfiles):
        with h5py.File(resfile, "r") as f:
            key = _endpoint_key(f, resfile, endpoint)
            shape = f[key].shape
            if len(shape) != 2:
                raise ValueError(
                    f"endpoint '{endpoint}' stores {shape[1:]}-shaped rows; "
                    "per-frame stores need one vector per clip — extract an "
                    "aggregated endpoint (temp_agg with a mean/transformer "
                    "aggregator, or backbone_mean)"
                )
            if feat_dim is None:
                feat_dim = int(shape[1])
            elif int(shape[1]) != feat_dim:
                raise ValueError(
                    f"{resfile} feature width {shape[1]} != {feat_dim}"
                )
            uids = f["uid"][()]
        for ri, uid in enumerate(uids):
            uid = _decode_uid(uid)
            if uid not in index:
                n_skip += 1
                continue
            stem, end = index[uid]
            per_video.setdefault(stem, []).append(
                (fi, ri, frame_id_for_time(end, store_fps))
            )
            n_rows += 1
    return per_video, feat_dim, n_rows, n_skip


def _gather_video(resfiles, endpoint, locs, feat_dim) -> np.ndarray:
    """(max_frame, C) float32 array for ONE video, NaN rows = missing."""
    import h5py

    max_fid = max(fid for _, _, fid in locs)
    arr = np.full((max_fid, feat_dim), np.nan, dtype=np.float32)
    by_file: Dict[int, List[Tuple[int, int]]] = {}
    for fi, ri, fid in locs:
        by_file.setdefault(fi, []).append((ri, fid))
    for fi, items in by_file.items():
        items.sort()  # h5py fancy reads want increasing row indices
        rows = np.asarray([ri for ri, _ in items])
        with h5py.File(resfiles[fi], "r") as f:
            key = _endpoint_key(f, resfiles[fi], endpoint)
            data = f[key][rows]
        for (ri, fid), row in zip(items, data):
            arr[fid - 1] = row
    return arr


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
    Memory is bounded at ONE video's features (pass 1 reads uids only;
    pass 2 gathers one video at a time) — an EK100-scale extraction
    (~10M clips) packs without holding the ~30 GB feature volume in RAM.
    Returns {"rows": n, "skipped": n_not_in_index, "videos": n}.
    """
    logger = logger or get_logger("extract_features")
    resfiles = _h5_files(results_dir)
    per_video, feat_dim, n_rows, n_skip = _locate_rows(
        resfiles, index, endpoint, store_fps
    )
    if not per_video:
        raise ValueError(
            f"nothing packable: {n_rows} rows matched the index, "
            f"{n_skip} skipped"
        )
    npy_dir = os.path.join(out_dir, "npy") if "npy" in formats else None
    if npy_dir:
        os.makedirs(npy_dir, exist_ok=True)
    env = None
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
            nbytes = n_rows * (feat_dim * 4 + 64)
            env = _readers.lmdb.open(
                lmdb_dir, map_size=max(nbytes * 4, 1 << 24)
            )
    for stem, locs in per_video.items():
        arr = _gather_video(resfiles, endpoint, locs, feat_dim)
        if npy_dir:
            np.save(os.path.join(npy_dir, f"{stem}.npy"), arr)
        if env is not None:
            present = np.flatnonzero(~np.isnan(arr).all(axis=1))
            with env.begin(write=True) as txn:
                for fid0 in present:
                    txn.put(
                        f"{stem}_frame_{fid0 + 1:010d}.jpg".encode("utf-8"),
                        np.ascontiguousarray(arr[fid0]).tobytes(),
                    )
    if env is not None:
        env.close()
        logger.info("lmdb store: %d videos -> %s", len(per_video),
                    os.path.join(out_dir, "lmdb"))
    if npy_dir:
        logger.info("npy store: %d videos -> %s", len(per_video), npy_dir)
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
    bit-exactly with the extracted H5 rows. Returns checks performed.

    Memory-bounded: pass 1 collects uid locations only; only the sampled
    rows' features are fetched from the H5s."""
    import h5py

    from avt_tpu.data import readers as _readers

    logger = logger or get_logger("extract_features")
    resfiles = _h5_files(results_dir)
    # last (file, row) per STORE KEY (stem, frame id) — the exact
    # later-row-wins rule pack applies (superseding re-extraction rows,
    # but also two uids flooring to the same frame id at sub-frame
    # strides); verifying any other row would fail on a correct store
    locs: Dict[Tuple[str, int], Tuple[str, int, int]] = {}
    for fi, resfile in enumerate(resfiles):
        with h5py.File(resfile, "r") as f:
            uids = f["uid"][()]
        for ri, uid in enumerate(uids):
            uid = _decode_uid(uid)
            if uid in index:
                stem, end = index[uid]
                fid = frame_id_for_time(end, store_fps)
                locs[(stem, fid)] = (uid, fi, ri)
    loc_items = list(locs.values())
    rng = np.random.default_rng(0)
    picks = rng.choice(
        len(loc_items), size=min(n_check, len(loc_items)), replace=False
    )
    rows = []
    for p in picks:
        uid, fi, ri = loc_items[int(p)]
        with h5py.File(resfiles[fi], "r") as f:
            key = _endpoint_key(f, resfiles[fi], endpoint)
            rows.append((uid, np.asarray(f[key][ri], dtype=np.float32)))
    # closeby-frame warnings off: the 2-frame readback window's first
    # frame is legitimately absent at strides coarser than a frame period
    readers_to_check = []
    npy_dir = os.path.join(out_dir, "npy")
    if os.path.isdir(npy_dir):
        readers_to_check.append(
            ("npy", _readers.NpyFeatsReader(
                npy_dir, read_type="normal",
                warn_if_using_closeby_frame=False))
        )
    lmdb_dir = os.path.join(out_dir, "lmdb")
    if os.path.isdir(lmdb_dir) and _readers.HAVE_LMDB:
        readers_to_check.append(
            ("lmdb", _readers.LMDBFeatsReader(
                lmdb_dir, read_type="normal",
                warn_if_using_closeby_frame=False))
        )
    n_done = 0
    for uid, want in rows:
        stem, end = index[uid]
        fid = frame_id_for_time(end, store_fps)
        # read a short window ending at the INDEX's own end time: the
        # reader computes its last frame as floor(end*fps) — the exact
        # float expression pack keyed the feature with, so the LAST frame
        # must be the stored one. (Reconstructing t=fid/fps and flooring
        # again is FP-unsafe: floor((fid/30)*30) == fid-1 for ~1.6% of
        # ids.) Clips ending before the first frame time were key-clamped
        # to frame 1 (frame_id_for_time); read that frame's own window.
        if end * store_fps < 1.0:
            t_start, end = 0.0, 1.49 / store_fps
        else:
            t_start = end - 2.0 / store_fps
        for name, reader in readers_to_check:
            got, _ = reader(f"{stem}.mp4", t_start, end, store_fps, None)
            got = got[-1].reshape(-1)
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
