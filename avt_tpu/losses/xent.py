"""Cross-entropy over multi-dimensional inputs with ignore-index semantics.

Semantics-parity target: reference loss_fn/multidim_xentropy.py:10-25
(MultiDimCrossEntropy) composed with torch.nn.CrossEntropyLoss behavior:
  * input (*, C) logits, target (*,) int class ids
  * elements whose target == ignore_index contribute 0 loss
  * reduction='none' returns the per-element loss in target's shape
  * reduction='mean' divides by the summed weight of NON-ignored elements
    (torch semantics; with no class weights this is the count of kept
    elements)

All ops are jit-friendly (no data-dependent shapes): ignoring is done with
masks, never boolean indexing.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def multidim_cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    *,
    weight: Optional[jax.Array] = None,
    ignore_index: int = -1,
    reduction: str = "none",
) -> jax.Array:
    """Cross entropy on (*, C) logits vs (*,) integer targets.

    Args:
      logits: (*, C) unnormalized scores (any float dtype; computed in f32).
      targets: (*,) int class indices; entries == ignore_index are masked.
      weight: optional (C,) per-class weights (torch `weight=` parity).
      ignore_index: target value to mask out (reference uses -1 throughout).
      reduction: 'none' | 'mean' | 'sum'.
    """
    if logits.ndim != targets.ndim + 1:
        raise ValueError(
            f"logits must have one more dim than targets: "
            f"{logits.shape} vs {targets.shape}"
        )
    if logits.shape[:-1] != targets.shape:
        raise ValueError(
            f"leading dims must match: {logits.shape} vs {targets.shape}"
        )
    num_classes = logits.shape[-1]
    valid = targets != ignore_index
    # Clip so take_along_axis is in-bounds for ignored entries; their loss is
    # zeroed by the mask below.
    tgt_safe = jnp.clip(targets, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt_safe[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = jnp.asarray(weight, dtype=nll.dtype)[tgt_safe]
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    loss = nll * w
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        denom = jnp.sum(w)
        # Guard all-ignored batches (torch returns nan there; we return 0 so
        # jitted training never NaNs on padding-only shards).
        return jnp.where(denom > 0, jnp.sum(loss) / jnp.maximum(denom, 1e-12), 0.0)
    raise ValueError(f"Unknown reduction {reduction!r}")


def quantize_and_cross_entropy(
    inp: jax.Array,
    tgt: jax.Array,
    centroids: jax.Array,
    *,
    norm: bool = True,
    reduction: str = "none",
) -> jax.Array:
    """Project features onto k-means centroids, then cross-entropy.

    Parity target: reference loss_fn/multidim_xentropy.py:28-54
    (QuantizeAndCrossEntropy): L2-normalize input and target, input logits =
    inp @ centroids.T, target class = nearest centroid of tgt.
    """
    if norm:
        inp = inp / jnp.maximum(
            jnp.linalg.norm(inp, axis=-1, keepdims=True), 1e-12
        )
        tgt = tgt / jnp.maximum(
            jnp.linalg.norm(tgt, axis=-1, keepdims=True), 1e-12
        )
    logits = inp @ centroids.T
    d = jnp.sum(centroids**2, axis=-1)[None] - 2.0 * tgt.reshape(
        (-1, tgt.shape[-1])
    ) @ centroids.T
    tgt_ids = jnp.argmin(d, axis=-1).reshape(tgt.shape[:-1])
    return multidim_cross_entropy(logits, tgt_ids, reduction=reduction)


class QuantizeAndCrossEntropy:
    """Config-instantiable wrapper; centroids load from a file path."""

    def __init__(self, centroids_fpath, norm: bool = True, reduction: str = "none"):
        from avt_tpu.models.cluster import load_centroids

        self.centroids = jnp.asarray(load_centroids(centroids_fpath))
        self.norm = norm
        self.reduction = reduction

    def __call__(self, inp, tgt):
        return quantize_and_cross_entropy(
            inp, tgt, self.centroids, norm=self.norm, reduction=self.reduction
        )


class MultiDimCrossEntropy:
    """Configurable wrapper so the config registry can instantiate it."""

    def __init__(
        self,
        weight: Optional[jax.Array] = None,
        ignore_index: int = -1,
        reduction: str = "none",
    ):
        self.weight = weight
        self.ignore_index = ignore_index
        self.reduction = reduction

    def __call__(self, logits: jax.Array, targets: jax.Array) -> jax.Array:
        return multidim_cross_entropy(
            logits,
            targets,
            weight=self.weight,
            ignore_index=self.ignore_index,
            reduction=self.reduction,
        )
