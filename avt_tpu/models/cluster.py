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
