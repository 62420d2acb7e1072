"""K-means centroid assignment (pure JAX).

Parity target: reference common/cluster.py (KmeansAssigner): float input ->
nearest-centroid ids; integer input -> centroid features. Centroids load
from a torch checkpoint ({'weight': KxC}) or a .npy file.
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


def load_centroids(fpath: str) -> np.ndarray:
    if str(fpath).endswith(".npy"):
        return np.load(fpath)
    import torch  # torch-cpu is available; used only for checkpoint IO

    obj = torch.load(fpath, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "weight" in obj:
        obj = obj["weight"]
    return np.asarray(obj)


def kmeans_fit(
    feats: np.ndarray,
    k: int,
    iters: int = 50,
    seed: int = 0,
    norm: bool = False,
    chunk: int = 65536,
) -> np.ndarray:
    """Lloyd's k-means on (N, C) features -> (k, C) centroids.

    TPU-native replacement for the offline faiss clustering the reference
    assumed for its quantized AVT-h inputs (common/cluster.py loads the
    resulting centroid files; the clustering step itself is not in its
    repo). Device-resident: features transfer to HBM ONCE (padded to a
    chunk multiple), then k-means++ seeding and every Lloyd iteration run
    as jitted device programs — the (chunk, C) @ (C, k) distance matmuls
    are MXU work, the per-cluster reduction is a segment_sum, and only
    (k, C) centroids cross the host boundary per iteration. Empty
    clusters reseed to the farthest points (full squared distance, one
    candidate per chunk) and get extra refinement rounds so no raw or
    stale row escapes into the output.
    """
    feats = np.ascontiguousarray(feats, dtype=np.float32)
    n, c = feats.shape
    assert k <= n, f"k={k} > n={n}"
    rng = np.random.default_rng(seed)

    chunk = min(chunk, max(n, 1))
    n_pad = (-n) % chunk
    fdev = jnp.asarray(
        np.concatenate([feats, np.zeros((n_pad, c), np.float32)])
        if n_pad else feats
    ).reshape(-1, chunk, c)  # (m, chunk, C), device-resident
    valid = jnp.asarray(
        (np.arange(n + n_pad) < n).astype(np.float32)
    ).reshape(-1, chunk)
    if norm:
        fdev = fdev / jnp.maximum(
            jnp.linalg.norm(fdev, axis=-1, keepdims=True), 1e-12
        )

    # ---- k-means++ seeding on a device-resident subsample
    sub_n = int(min(n, max(k * 64, 4096)))
    sub = jnp.asarray(feats[rng.choice(n, size=sub_n, replace=False)])
    if norm:
        sub = sub / jnp.maximum(
            jnp.linalg.norm(sub, axis=-1, keepdims=True), 1e-12
        )

    @jax.jit
    def _seed_plus_plus(sub, key):
        first = jax.random.randint(key, (), 0, sub.shape[0])
        centers0 = jnp.zeros((k, c), jnp.float32).at[0].set(sub[first])
        d2 = jnp.sum((sub - sub[first]) ** 2, axis=-1)

        def body(i, carry):
            centers, d2, key = carry
            key, sk = jax.random.split(key)
            idx = jax.random.categorical(sk, jnp.log(jnp.maximum(d2, 1e-30)))
            nxt = sub[idx]
            centers = centers.at[i].set(nxt)
            d2 = jnp.minimum(d2, jnp.sum((sub - nxt) ** 2, axis=-1))
            return centers, d2, key

        centers, _, _ = jax.lax.fori_loop(
            1, k, body, (centers0, d2, key)
        )
        return centers

    cents = _seed_plus_plus(sub, jax.random.PRNGKey(seed))

    # ---- one jitted Lloyd iteration over all chunks (lax.map keeps the
    # per-chunk working set in VMEM-friendly tiles; padded rows carry
    # weight 0 and dmin -inf so they never move a centroid or get reseeded)
    @jax.jit
    def lloyd(fdev, valid, cents):
        def per_chunk(args):
            fchunk, w = args
            d = jnp.sum(cents**2, axis=-1)[None] - 2.0 * fchunk @ cents.T
            lab = jnp.argmin(d, axis=-1)
            # Scatter-free per-cluster reduction: a one-hot matmul rides
            # the MXU; segment_sum lowers to scatter-add, which
            # serializes on the TPU's VPU and dominates the iteration.
            # Padded rows carry w=0 so they never move a centroid.
            oh = jax.nn.one_hot(lab, k, dtype=jnp.float32) * w[:, None]
            sums = oh.T @ fchunk
            counts = jnp.sum(oh, axis=0)
            # reseed candidate: farthest VALID point by the FULL squared
            # distance ||f-c||^2 = ||f||^2 + (||c||^2 - 2 f.c); dropping
            # ||f||^2 is fine for the per-point argmin over centroids but
            # NOT for comparing across points — it biases toward
            # small-norm points
            fn2 = jnp.sum(fchunk**2, axis=-1)
            dmin = jnp.where(
                w > 0, fn2 + jnp.min(d, axis=-1), -jnp.inf
            )
            far = jnp.argmax(dmin)
            return sums, counts, fchunk[far], dmin[far]

        sums, counts, far_pts, far_d = jax.lax.map(per_chunk, (fdev, valid))
        sums = jnp.sum(sums, axis=0)
        counts = jnp.sum(counts, axis=0)
        new_cents = jnp.where(
            (counts > 0)[:, None], sums / jnp.maximum(counts, 1)[:, None],
            cents,
        )
        # (m, C) per-chunk farthest points, farthest-first
        order = jnp.argsort(-far_d)
        return new_cents, counts, far_pts[order]

    def step(cents):
        cents, counts, far_pts = lloyd(fdev, valid, cents)
        empty = np.flatnonzero(np.asarray(counts) == 0)
        # reseed up to one empty per chunk candidate; later iterations
        # refine the raw points into real centroids
        for slot, cand in zip(empty, np.asarray(far_pts)):
            cents = cents.at[int(slot)].set(jnp.asarray(cand))
        return cents, empty.size

    for _ in range(iters):
        cents, n_empty = step(cents)
    # extra refinement rounds if the last iteration reseeded or left
    # empty clusters, so no raw/stale row escapes into the output
    for _ in range(5):
        if n_empty == 0:
            break
        cents, n_empty = step(cents)
    return np.asarray(cents)


class KmeansAssigner:
    def __init__(self, centroids: Union[str, np.ndarray], norm: bool = False):
        if isinstance(centroids, (str,)):
            centroids = load_centroids(centroids)
        self.centroids = jnp.asarray(centroids, dtype=jnp.float32)  # (K, C)
        self.norm = norm

    @property
    def num_clusters(self) -> int:
        return self.centroids.shape[0]

    def feat2cluster(self, feats: jax.Array) -> jax.Array:
        flat = feats.reshape((-1, feats.shape[-1])).astype(jnp.float32)
        if self.norm:
            flat = flat / jnp.maximum(
                jnp.linalg.norm(flat, axis=-1, keepdims=True), 1e-12
            )
        # argmin ||f-c||^2 = argmin(|c|^2 - 2 f.c); |f|^2 constant per row
        d = jnp.sum(self.centroids**2, axis=-1)[None] - 2.0 * flat @ self.centroids.T
        return jnp.argmin(d, axis=-1).reshape(feats.shape[:-1])

    def cluster2feat(self, idx: jax.Array) -> jax.Array:
        return self.centroids[idx.reshape(-1)].reshape(
            idx.shape + (self.centroids.shape[-1],)
        )

    def __call__(self, inp: jax.Array) -> jax.Array:
        if jnp.issubdtype(inp.dtype, jnp.integer):
            return self.cluster2feat(inp)
        return self.feat2cluster(inp)
