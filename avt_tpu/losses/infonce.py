"""SimCLR / MIL-NCE InfoNCE losses, mesh-aware.

Parity target: reference loss_fn/simclr_infonce.py
  * MILCrossEntropyLoss (:12-66): sum-style = logsumexp(all) - logsumexp(pos);
    max-style = replace the positive set by its max before the denominator.
  * DistributedSimclrInfoNCELoss (:69-157): L2-normalize, all-gather
    embeddings across replicas, one-hot positives at replica_id*B offset,
    self-similarity masked with a large negative, optional symmetric
    (target->output) term.

TPU-native redesign: instead of a torch.distributed all_gather autograd hack,
the batch-global negatives come from `jax.lax.all_gather` over a named mesh
axis (`axis_name`), so the loss works inside pjit/shard_map and its gradient
is handled by XLA. With axis_name=None it degrades to single-replica SimCLR.

Masking replaces boolean indexing so everything is jit-friendly with static
shapes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from avt_tpu.losses.mse import l2_normalize

LARGE_NUM = 1e9


def mil_cross_entropy(
    pred: jax.Array,
    labels_onehot: jax.Array,
    mil_type: str = "sum",
    reduction: str = "mean",
) -> jax.Array:
    """Multiple-instance NCE cross-entropy.

    Args:
      pred: (B, N) logits.
      labels_onehot: (B, N) with 1.0 at positive columns.
    """
    pos_mask = labels_onehot > 0.5
    neg_inf = jnp.asarray(-jnp.inf, dtype=pred.dtype)
    if mil_type == "sum":
        numerator = jax.nn.logsumexp(jnp.where(pos_mask, pred, neg_inf), axis=1)
        denominator = jax.nn.logsumexp(pred, axis=1)
    elif mil_type == "max":
        pos_max = jnp.max(jnp.where(pos_mask, pred, neg_inf), axis=1)
        numerator = pos_max
        neg_only = jnp.where(pos_mask, neg_inf, pred)
        denominator = jax.nn.logsumexp(
            jnp.concatenate([pos_max[:, None], neg_only], axis=1), axis=1
        )
    else:
        raise NotImplementedError(f"Unknown mil_type {mil_type!r}")
    loss = denominator - numerator
    if mil_type == "max":
        # reference quirk kept: MILCrossEntropyLoss.forward_max returns
        # torch.mean(...) UNCONDITIONALLY, ignoring the configured
        # reduction (loss_fn/simclr_infonce.py:44-55)
        return jnp.mean(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "none":
        return loss
    raise NotImplementedError(f"Unknown reduction {reduction!r}")


def _gather_embeddings(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """All-gather embeddings over the named mesh axis; identity if None."""
    if axis_name is None:
        return x
    # (num_replicas, B, C) -> (num_replicas * B, C), replica-major so the
    # one-hot offset below (replica_id * B) indexes our own block.
    gathered = jax.lax.all_gather(x, axis_name)
    return gathered.reshape((-1,) + x.shape[1:])


def simclr_infonce(
    output: jax.Array,
    target: jax.Array,
    *,
    temperature: float = 0.1,
    target_to_output_loss: bool = True,
    mil_type: str = "sum",
    reduction: str = "mean",
    axis_name: Optional[str] = None,
) -> jax.Array:
    """SimCLR-style InfoNCE with batch-global negatives over a mesh axis.

    Args:
      output: (B, C) predicted embeddings (this replica's shard).
      target: (B, C) or (B, K, C) positive embeddings (K positives per item,
        MIL-NCE style).
      axis_name: mesh axis to all-gather negatives over (the reference's
        torch.distributed world); None = local batch only.
    """
    output = l2_normalize(output.astype(jnp.float32))
    target = l2_normalize(target.astype(jnp.float32))
    if target.ndim == 3:
        num_matching = target.shape[1]
        target_flat = target.reshape((-1, target.shape[-1]))
        target = target[:, 0]
    elif target.ndim == 2:
        num_matching = 1
        target_flat = target
    else:
        raise ValueError(f"target must be 2D or 3D, got {target.shape}")

    output_all = _gather_embeddings(output, axis_name)
    target_flat_all = _gather_embeddings(target_flat, axis_name)

    batch_size = output.shape[0]
    full_size = output_all.shape[0]
    if axis_name is None:
        replica_id = 0
    else:
        replica_id = jax.lax.axis_index(axis_name)

    # One-hot positives: ours live at columns [replica_id*B, (replica_id+1)*B).
    col = jax.lax.broadcasted_iota(jnp.int32, (batch_size, full_size), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (batch_size, full_size), 0)
    labels_onehot = (col == row + replica_id * batch_size).astype(output.dtype)
    extra_zeros = jnp.zeros_like(labels_onehot)
    labels_onehot_interleaved = jnp.repeat(labels_onehot, num_matching, axis=1)

    logits_aa = output @ output_all.T / temperature
    logits_ab = output @ target_flat_all.T / temperature
    logits_aa = logits_aa - labels_onehot * LARGE_NUM  # mask self-similarity
    loss = mil_cross_entropy(
        jnp.concatenate([logits_ab, logits_aa], axis=1),
        jnp.concatenate([labels_onehot_interleaved, extra_zeros], axis=1),
        mil_type=mil_type,
        reduction=reduction,
    )
    if target_to_output_loss:
        # Only the first of K positives participates in the reverse term.
        target_all = target_flat_all[::num_matching]
        logits_bb = target @ target_all.T / temperature
        logits_bb = logits_bb - labels_onehot * LARGE_NUM
        logits_ba = target @ output_all.T / temperature
        loss = loss + mil_cross_entropy(
            jnp.concatenate([logits_ba, logits_bb], axis=1),
            jnp.concatenate([labels_onehot, extra_zeros], axis=1),
            mil_type=mil_type,
            reduction=reduction,
        )
    return loss


class SimclrInfoNCE:
    """Config-instantiable wrapper around simclr_infonce."""

    def __init__(
        self,
        temperature: float = 0.1,
        target_to_output_loss: bool = True,
        mil_type: str = "sum",
        reduction: str = "mean",
        axis_name: Optional[str] = None,
    ):
        self.temperature = temperature
        self.target_to_output_loss = target_to_output_loss
        self.mil_type = mil_type
        self.reduction = reduction
        self.axis_name = axis_name

    def __call__(self, output: jax.Array, target: jax.Array) -> jax.Array:
        return simclr_infonce(
            output,
            target,
            temperature=self.temperature,
            target_to_output_loss=self.target_to_output_loss,
            mil_type=self.mil_type,
            reduction=self.reduction,
            axis_name=self.axis_name,
        )


class MultiDimSimclrInfoNCE(SimclrInfoNCE):
    """Fold leading dims then run SimCLR InfoNCE.

    Parity: loss_fn/simclr_infonce.py:160-167.
    """

    def __call__(self, output: jax.Array, target: jax.Array) -> jax.Array:
        return super().__call__(
            output.reshape((-1, output.shape[-1])),
            target.reshape((-1, target.shape[-1])),
        )
