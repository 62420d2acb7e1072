"""Temporal aggregators: (B, T, C) -> (B, C') (or pass-through).

Parity target: reference models/temporal_aggregation.py
  * Identity (:21-31), Mean (:34-47)
  * Transformer (:73-147): downproject -> sin/cos positional encoding ->
    N post-LN encoder layers -> mean/last aggregation; optional cloze/MLM
    auxiliary loss with a learned [MASK] embedding whose masked positions
    are dropped from attention keys.
  * RULSTMAggregation (:150-201): rolling-unrolling LSTM — later round.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avt_tpu.models.layers import EncoderBlock, sincos_positional_encoding


class IdentityAgg(nn.Module):
    in_features: int

    def __call__(self, feats, *, train: bool = False):
        return feats, {}

    @property
    def output_dim(self):
        return self.in_features


class MeanAgg(nn.Module):
    in_features: int

    def __call__(self, feats, *, train: bool = False):
        return jnp.mean(feats, axis=1), {}

    @property
    def output_dim(self):
        return self.in_features


class RULSTMAgg(nn.Module):
    """Rolling-Unrolling LSTM aggregator.

    Parity target: reference models/temporal_aggregation.py:150-201
    (RULSTMAggregation) wrapping the external RULSTM model (Furnari &
    Farinella, TPAMI'20). The external source is NOT vendored in the
    reference checkout (temporal_aggregation.py:14-18 falls back to a stub
    when the import fails), so this is a paper-faithful reimplementation:
    a rolling LSTM summarizes the observed sequence; an unrolling LSTM
    initialized from the rolling state unrolls `num_pad_feats + 1` future
    steps (the reference's zero-pad trick to match models trained with
    longer anticipation unrolls); the final unrolled hidden state is the
    aggregated feature. Original RULSTM .pth checkpoints import via
    models.import_torch.rulstm_to_flax (parity-tested against a torch
    nn.LSTM rebuild in tests/test_parity_torch.py).
    """

    in_features: int
    intermediate_featdim: int = 1024
    dropout: float = 0.8
    num_pad_feats: int = 0

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        B, T, C = feats.shape
        feats = nn.Dropout(self.dropout, deterministic=not train)(feats)
        rolling = nn.OptimizedLSTMCell(self.intermediate_featdim, name="rolling")
        unrolling = nn.OptimizedLSTMCell(
            self.intermediate_featdim, name="unrolling"
        )
        carry = rolling.initialize_carry(
            jax.random.PRNGKey(0), feats[:, 0].shape
        )
        # unrolled over the (small, static) sequence length; nn.scan would
        # also work but obscures the param structure for no runtime gain here
        for t in range(T):
            carry, _ = rolling(carry, feats[:, t])
        # unroll the future from the rolling state; the U-LSTM's input is
        # the LAST observed representation repeated each step (the RULSTM
        # paper's sequence-completion scheme — the official code feeds
        # x[:, t] into the unrolling LSTM, not zeros). num_pad_feats adds
        # unroll steps to match models trained with longer unrolls
        # (reference wrapper :188-193).
        h = carry
        out = h[1]
        last = feats[:, -1]
        for _ in range(self.num_pad_feats + 1):
            h, out = unrolling(h, last)
        return out, {}

    @property
    def output_dim(self):
        return self.intermediate_featdim


class TransformerAgg(nn.Module):
    """Transformer-encoder aggregator with optional cloze (MLM) aux loss."""

    in_features: int
    inter_rep: int = 512
    nheads: int = 8
    nlayers: int = 6
    ffn_dim: int = 2048  # torch TransformerEncoderLayer default
    dropout: float = 0.1
    agg_style: str = "mean"
    cloze_loss_ratio: float = 0.0
    cloze_loss_wt: float = 0.0
    max_len: int = 1000

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        """feats: (B, T, C) -> ((B, inter_rep), aux_losses)."""
        B, T, C = feats.shape
        aux_losses = {}
        key_mask = None
        if train and self.cloze_loss_ratio > 0:
            mask_embed = self.param(
                "mask_embed", nn.initializers.normal(0.02), (1, 1, C)
            )
            rng = self.make_rng("cloze")
            key_mask = (
                jax.random.uniform(rng, (B, T)) <= self.cloze_loss_ratio
            )  # True = masked out
            feats = jnp.where(key_mask[..., None], mask_embed, feats)
        x = nn.Dense(
            self.inter_rep,
            kernel_init=nn.initializers.normal(stddev=0.01),
            name="downproject",
        )(feats)
        pe = sincos_positional_encoding(self.max_len, self.inter_rep)
        x = x + pe[None, :T]
        x = nn.Dropout(0.1, deterministic=not train)(x)
        enc_input = x
        attn_mask = None
        if key_mask is not None:
            # ignore masked positions as attention KEYS: (B, 1, 1, T)
            attn_mask = (~key_mask)[:, None, None, :]
        for i in range(self.nlayers):
            x = EncoderBlock(
                num_heads=self.nheads,
                ffn_dim=self.ffn_dim,
                dropout=self.dropout,
                name=f"layer_{i}",
            )(x, train=train, mask=attn_mask)
        x = nn.LayerNorm(name="norm")(x)
        if key_mask is not None and self.cloze_loss_wt > 0:
            dist = (x - enc_input) ** 2
            aux_losses["tx_mlm"] = self.cloze_loss_wt * jnp.mean(
                jnp.mean(dist, axis=-1) * key_mask
            )
        if self.agg_style == "mean":
            res = jnp.mean(x, axis=1)
        elif self.agg_style == "last":
            res = x[:, -1]
        else:
            raise NotImplementedError(f"Unknown agg_style {self.agg_style!r}")
        return res, aux_losses

    @property
    def output_dim(self):
        return self.inter_rep
