"""Train-time accuracy meters (jit-friendly).

Parity target: reference common/utils.py:17-44 `accuracy`:
  * flattens leading dims, computes top-k over the last dim
  * returns percentages scaled by 100/batch (ignored -1 targets still count
    in the denominator, matching the reference)
  * if ALL targets are negative, returns zeros
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def topk_accuracy(
    logits: jax.Array,
    targets: jax.Array,
    topk: Sequence[int] = (1,),
) -> Tuple[jax.Array, ...]:
    """Top-k accuracy in percent over flattened leading dims.

    Args:
      logits: (*, C) scores.
      targets: (*,) int labels; -1 = unlabeled (never matches but is counted
        in the denominator, as in the reference).
    Returns tuple of scalar f32 arrays, one per k.
    """
    logits = logits.reshape((-1, logits.shape[-1]))
    targets = targets.reshape((-1,))
    batch = targets.shape[0]
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)  # (N, maxk)
    correct = pred == targets[:, None]  # (N, maxk); -1 never matches
    all_invalid = jnp.all(targets < 0)
    res = []
    for k in topk:
        acc = jnp.sum(correct[:, :k].astype(jnp.float32)) * (100.0 / batch)
        res.append(jnp.where(all_invalid, 0.0, acc))
    return tuple(res)
