#!/usr/bin/env python
"""Fit k-means centroids over stored features -> .npy for KmeansAssigner.

TPU-native stand-in for the offline faiss clustering step the reference's
quantized AVT-h path assumed (its common/cluster.py only LOADS centroid
files; producing them was out-of-repo). Feature sources:

  * .npy file(s): (N, C) or (N, T, C) arrays (RULSTM-style per-video
    feature dumps are concatenated over files)
  * an LMDB feature-store directory (as read by LMDBFeatsReader): every
    value is one frame's (C,) feature

Usage:
  python tools/compute_centroids.py feats1.npy feats2.npy -k 1024 -o cent.npy
  python tools/compute_centroids.py DATA/rulstm_feats/rgb --lmdb -k 512 \
      --max-samples 2000000 --norm -o centroids.npy

The output loads through avt_tpu.models.cluster.load_centroids /
KmeansAssigner (and the model.future_predictor quantized configs).
"""
import argparse
import sys

import numpy as np


def _load_npy(paths):
    arrs = []
    for p in paths:
        a = np.load(p, mmap_mode="r")
        arrs.append(np.asarray(a).reshape(-1, a.shape[-1]))
    return np.concatenate(arrs, axis=0)


def _load_lmdb(path):
    import avt_tpu.data.readers as readers

    if not readers.HAVE_LMDB:
        raise ImportError("lmdb module not available in this environment")
    env = readers.lmdb.open(
        str(path), readonly=True, lock=False, max_readers=256
    )
    rows = []
    with env.begin() as txn:
        for _, val in txn.cursor():
            rows.append(np.frombuffer(val, dtype=np.float32))
    return np.stack(rows)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sources", nargs="+", help=".npy files or an LMDB dir")
    ap.add_argument("--lmdb", action="store_true",
                    help="treat the (single) source as an LMDB store dir")
    ap.add_argument("-k", type=int, required=True, help="number of centroids")
    ap.add_argument("-o", "--output", required=True, help="output .npy")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--norm", action="store_true",
                    help="l2-normalize features before clustering "
                         "(match KmeansAssigner(norm=True))")
    ap.add_argument("--max-samples", type=int, default=None,
                    help="random subsample cap before fitting")
    args = ap.parse_args(argv)

    from avt_tpu.models.cluster import kmeans_fit

    if args.lmdb:
        assert len(args.sources) == 1, "--lmdb takes one store directory"
        feats = _load_lmdb(args.sources[0])
    else:
        feats = _load_npy(args.sources)
    if args.max_samples and len(feats) > args.max_samples:
        rng = np.random.default_rng(args.seed)
        feats = feats[
            rng.choice(len(feats), size=args.max_samples, replace=False)
        ]
    print(f"# fitting k={args.k} on {feats.shape} features", file=sys.stderr)
    centroids = kmeans_fit(
        feats, args.k, iters=args.iters, seed=args.seed, norm=args.norm
    )
    np.save(args.output, centroids)
    print(f"# wrote {centroids.shape} centroids to {args.output}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
