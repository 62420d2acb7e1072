"""Loss/accuracy computation over model endpoints.

Parity target: reference func/train_eval_ops.py (BasicLossAccuracy):
  * per task: losses['cls_<task>'] = unreduced CE(logits/<task>, target),
    accuracies acc1/acc5
  * past-frame loss: losses['past_cls_<task>'] = CE(past_logits,
    mode-over-frames(target_subclips)) when past logits + subclips exist
  * optional class-balanced CE weights from inverse dataset counts (the
    reference's implementation of this crashes — train_eval_ops.py:34-41
    indexes a #tasks-sized tensor with class ids; re-implemented correctly
    here as per-task inverse-frequency weights)

All jit-friendly: dict structure is static; every value is an array.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from avt_tpu.losses import multidim_cross_entropy
from avt_tpu.models.base import PAST_LOGITS_PREFIX
from avt_tpu.utils import topk_accuracy


def mode_over_frames(labels: jax.Array, num_classes: int) -> jax.Array:
    """Mode over the last axis of integer labels in [-1, num_classes).

    torch.mode parity: the smallest of the most frequent values wins ties
    (argmax over counts with the smallest index first). -1 participates.
    """
    shifted = labels + 1  # -1 -> 0
    onehot = jax.nn.one_hot(shifted, num_classes + 1, dtype=jnp.int32)
    counts = jnp.sum(onehot, axis=-2)  # (..., num_classes+1)
    return jnp.argmax(counts, axis=-1) - 1


def balance_weights_from_counts(
    counts: Mapping[int, int], num_classes: int
) -> jnp.ndarray:
    """Inverse-frequency class weights (fixed version of the reference)."""
    w = jnp.zeros((num_classes,), dtype=jnp.float32)
    for cls_id, count in counts.items():
        if cls_id >= 0:
            w = w.at[cls_id].set(count)
    w = w / jnp.sum(w)
    return 1.0 / (w + 1e-5)


def basic_loss_accuracy(
    outputs: Dict[str, jax.Array],
    target: Dict[str, jax.Array],
    target_subclips: Optional[Dict[str, jax.Array]] = None,
    *,
    num_classes: Mapping[str, int],
    class_weights: Optional[Mapping[str, jax.Array]] = None,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Classification losses + accuracies for every target task."""
    losses: Dict[str, jax.Array] = {}
    accuracies: Dict[str, jax.Array] = {}
    for tgt_type, tgt_val in target.items():
        logits = outputs[f"logits/{tgt_type}"]
        assert logits.ndim == tgt_val.ndim + 1
        weight = class_weights.get(tgt_type) if class_weights else None
        losses[f"cls_{tgt_type}"] = multidim_cross_entropy(
            logits, tgt_val, weight=weight, reduction="none"
        )
        k5 = min(5, logits.shape[-1])
        acc1, acc5 = topk_accuracy(logits, tgt_val, topk=(1, k5))
        accuracies[f"acc1/{tgt_type}"] = acc1
        accuracies[f"acc5/{tgt_type}"] = acc5
        past_key = f"{PAST_LOGITS_PREFIX}logits/{tgt_type}"
        if past_key in outputs and target_subclips is not None:
            past_logits = outputs[past_key]
            past_target = mode_over_frames(
                target_subclips[tgt_type], num_classes[tgt_type]
            )
            assert past_logits.shape[:-1] == past_target.shape, (
                f"past logits {past_logits.shape} vs target {past_target.shape}"
            )
            losses[f"past_cls_{tgt_type}"] = multidim_cross_entropy(
                past_logits, past_target, weight=weight, reduction="none"
            )
    return losses, accuracies
