"""Future-feature predictors, incl. the AVT-h causal decoder head.

Parity target: reference models/future_prediction.py
  * Identity/MLP passthroughs (:17-48)
  * AVTh (:51-258): linear/embedding encoder into a GPT-2 core (wte
    removed), autoregressive rollout feeding back the last hidden state,
    teacher-forced next-feature loss, decoded outputs, updated-past
    features, avg_last_n / return_past_too / output_len_eval semantics.

TPU-native redesign of the rollout: the reference loops a Python
`for output_id in range(output_len)` over HuggingFace KV caches. Here the
rollout is a static recompute: a feedback buffer of T+L-1 input embeddings
is filled step by step (each step one full causal forward — positions and
causal masking make recomputed prefixes bit-identical to cached ones), and
ONE final forward yields every hidden state. For the tiny sequences AVT-h
runs (T <= ~16, L <= ~5) this is faster on the MXU than cache plumbing and
keeps all shapes static. With output_len == 1 (all shipped reference
configs) the loop vanishes: a single causal forward.

Rollout dropout fidelity: with output_len > 1 AND dropout > 0 the rollout
switches to position-stable dropout (layers.position_stable_dropout) — one
key shared by every pass, masks a function of token position only — so the
recomputed prefix is bit-identical to what a KV cache would have reused.
Training at rollout > 1 with dropout therefore matches the reference's
cache semantics exactly (test_models.test_rollout_dropout_cache_equiv).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avt_tpu.models.layers import GPT2Core


class IdentityFuture(nn.Module):
    """Pass-through future predictor."""

    in_features: int

    def __call__(self, feats, target_shape=None, *, train: bool = False):
        return feats, feats, {}, {}

    @property
    def output_dim(self):
        return self.in_features


class MLPFuture(nn.Module):
    """MLP future predictor: feats -> MLP(feats)."""

    in_features: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, feats, target_shape=None, *, train: bool = False):
        h = feats
        for i in range(self.num_layers):
            h = nn.Dense(
                self.in_features,
                kernel_init=nn.initializers.normal(stddev=0.01),
                name=f"fc_{i}",
            )(h)
            if i < self.num_layers - 1:
                h = nn.relu(h)
        return feats, h, {}, {}

    @property
    def output_dim(self):
        return self.in_features


class AVTh(nn.Module):
    """AVT-h: causal transformer that predicts future frame features.

    Args (mirroring the reference's AVTh.__init__):
      in_features: input feature dim; 1 => inputs are cluster ids.
      output_len / output_len_eval: rollout steps (train / eval).
      avg_last_n: mean the last n predicted features into one.
      inter_dim: transformer width.
      n_layer/n_head/n_positions + dropouts: GPT-2 core config.
      future_pred_loss: callable (pred, tgt) -> unreduced loss, or None.
      return_past_too: prepend GT past to the predicted future sequence.
      drop_last_n: debug truncation of the input sequence.
      quantize_before_rollout: argmax+re-encode feedback (embedding mode).
      centroids: optional (K, C) array enabling assign-to-centroids mode.
      output_attentions: export per-rollout-step attention maps as
        endpoints gpt2_att_<k> shaped (B, n_layer, n_head, Tq_k, Tk_k) —
        the reference's HF output_attentions passthrough
        (future_prediction.py:89-93,184-188).
      rollout_mode: 'recompute' (default) or 'cache'. Recompute re-runs the
        growing buffer each step — fastest at AVT's lengths (L <= ~5),
        where cache plumbing costs more than the recomputed FLOPs. 'cache'
        is the long-rollout path: one prefill then single-token decode
        steps against per-layer KV caches, O(T+L) tokens processed instead
        of O(L*(T+L)). Both produce the same outputs (position-stable
        dropout makes them match under training dropout as well);
        output_attentions viz always uses recompute.
    """

    in_features: int
    output_len: int = -1
    output_len_eval: int = -1
    avg_last_n: int = -1
    inter_dim: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_positions: int = 1024
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    future_pred_loss: Optional[Callable] = None
    return_past_too: bool = False
    drop_last_n: int = 0
    quantize_before_rollout: bool = False
    num_cluster_centers: int = 50000
    centroids: Optional[Any] = None  # (K, C) array for on-the-fly assignment
    output_attentions: bool = False
    rollout_mode: str = "recompute"  # 'recompute' | 'cache' (long rollouts)
    dtype: Optional[Any] = None  # GPT core compute dtype (params stay f32)

    def setup(self):
        if self.rollout_mode not in ("recompute", "cache"):
            raise ValueError(
                f"rollout_mode must be 'recompute' or 'cache', got "
                f"{self.rollout_mode!r}"
            )
        self.quantized_input = self.in_features == 1 or self.centroids is not None
        self.assigner = None
        if self.centroids is not None:
            from avt_tpu.models.cluster import KmeansAssigner

            # ONE assigner: the (K, C) centroid table is a trace constant,
            # constructing it per use would embed it twice per jit
            self.assigner = KmeansAssigner(self.centroids)
        if self.quantized_input:
            self.encoder = nn.Embed(
                self.num_cluster_centers, self.inter_dim, name="encoder_embed"
            )
        else:
            # the reference's model-wide init resets these nn.Linears
            # to N(0, 0.01) (base_model.py:110-127) after HF construction
            self.encoder = nn.Dense(
                self.inter_dim, use_bias=False,
                kernel_init=nn.initializers.normal(stddev=0.01),
                name="encoder",
            )
            self.decoder = nn.Dense(
                self.in_features, use_bias=False,
                kernel_init=nn.initializers.normal(stddev=0.01),
                name="decoder",
            )
        self.gpt = GPT2Core(
            n_layer=self.n_layer,
            n_head=self.n_head,
            n_positions=self.n_positions,
            embd_dropout=self.embd_pdrop,
            attn_dropout=self.attn_pdrop,
            resid_dropout=self.resid_pdrop,
            dtype=self.dtype,
            name="gpt",
        )

    def _decode(self, hidden):
        """Map hidden states back to the input space.

        Embedding mode ties decoder weights to the encoder embedding
        (reference :83-84): logits over cluster ids via attend().
        """
        if self.quantized_input:
            return self.encoder.attend(hidden)
        return self.decoder(hidden)

    def _cached_rollout(self, encoded, L, train, dkey):
        """KV-cache decode: one prefill + L-1 single-token steps.

        Processes O(T0 + L) tokens where the static recompute processes
        O(L * (T0 + L)) — the long-rollout path. Position-stable dropout
        (masks keyed off token position) makes each step's activations
        bit-identical to what the recompute pass computes for that
        position, so both modes agree even under train-time dropout
        (pinned by test_models.test_rollout_cache_equals_recompute)."""
        B, T0, _ = encoded.shape
        Tc = T0 + L - 1
        h0, kvs = self.gpt(
            encoded, train=train, dropout_key=dkey, return_kv=True,
        )
        # grow each layer's (B, T0, H, D) prefill k/v to the full cache size
        kvs = [
            tuple(
                jnp.concatenate(
                    [a, jnp.zeros((B, Tc - T0) + a.shape[2:], a.dtype)],
                    axis=1,
                )
                for a in kv
            )
            for kv in kvs
        ]
        hiddens = [h0]
        last = h0[:, -1:, :]
        for k in range(1, L):
            inp = last
            if self.quantize_before_rollout:
                assert self.quantized_input
                inp = self.encoder(jnp.argmax(self._decode(inp), axis=-1))
            last, kvs = self.gpt(
                inp, train=train, dropout_key=dkey,
                kv_caches=kvs, position_offset=T0 + k - 1,
            )
            hiddens.append(last)
        return jnp.concatenate(hiddens, axis=1)  # (B, T0+L-1, d)

    def __call__(
        self, feats, target_shape=None, *, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, dict, dict]:
        endpoints: dict = {}
        if feats.ndim == 2:
            feats = feats[:, None, :]
        # resolve rollout length (static at trace time)
        if target_shape is not None and len(target_shape) == 3:
            output_len = int(target_shape[1])
        elif train or self.output_len_eval < 0:
            output_len = self.output_len
        else:
            output_len = self.output_len_eval
        if output_len < 1:
            raise ValueError(
                f"output_len must be >= 1 (got {output_len}); the reference "
                "errors on <1 too (empty concat)"
            )
        full_inp_feats = feats
        if self.assigner is not None:
            feats = self.assigner.feat2cluster(feats)[..., None]
        if self.quantized_input:
            assert feats.shape[-1] == 1
            feats = feats[..., 0].astype(jnp.int32)

        full_orig_feats = feats  # loss target (ids if quantized else floats)
        inp_feats = full_inp_feats
        if self.drop_last_n != 0:
            feats = feats[:, : -self.drop_last_n]
            inp_feats = inp_feats[:, : -self.drop_last_n]
        T0 = feats.shape[1]
        L = output_len

        encoded = self.encoder(feats)  # (B, T0, inter_dim)
        orig_feats_encoded = encoded

        # --- static recompute rollout ------------------------------------
        # Position-stable dropout: ONE key shared by every pass makes the
        # recomputed prefix bit-identical to a KV cache's reused states.
        dkey = None
        if (
            train
            and L > 1
            and max(self.embd_pdrop, self.attn_pdrop, self.resid_pdrop) > 0
        ):
            dkey = self.make_rng("dropout")
        if (
            self.rollout_mode == "cache"
            and L > 1
            and not self.output_attentions  # viz maps need the full pass
        ):
            hidden = self._cached_rollout(encoded, L, train, dkey)
        else:
            # buffer of input embeddings: [encoded feats | fed-back states]
            buf = encoded
            for k in range(1, L):
                hidden_k = self.gpt(
                    buf, train=train, dropout_key=dkey
                )  # (B, T0+k-1, d)
                last = hidden_k[:, -1:, :]
                if self.quantize_before_rollout:
                    assert self.quantized_input
                    last = self.encoder(
                        jnp.argmax(self._decode(last), axis=-1)
                    )
                buf = jnp.concatenate([buf, last], axis=1)
            hidden = self.gpt(
                buf,
                train=train,
                dropout_key=dkey,
                output_attentions=self.output_attentions,
            )  # (B, T0+L-1, d) == cat(all_outputs)
        if self.output_attentions:
            # Per-step maps, sliced from the final pass (recompute == cache,
            # so these equal what each rollout step's forward saw): step 0 is
            # the full (T0, T0) causal block, step k >= 1 is the single new
            # query over its T0+k visible keys — the exact shapes HF returns
            # under past_key_values (reference future_prediction.py:184-188).
            hidden, probs = hidden
            endpoints["gpt2_att_0"] = probs[..., :T0, :T0]
            for k in range(1, L):
                endpoints[f"gpt2_att_{k}"] = probs[
                    ..., T0 + k - 1 : T0 + k, : T0 + k
                ]
        decoded = self._decode(hidden)

        # --- teacher-forced future prediction loss ------------------------
        losses = {}
        if self.future_pred_loss is not None:
            n = min(full_orig_feats.shape[1], decoded.shape[1])
            losses["feat"] = self.future_pred_loss(
                decoded[:, : n - 1], full_orig_feats[:, 1:n]
            )

        # --- choose the output feature space -------------------------------
        if self.in_features == 1:
            prev = orig_feats_encoded
            all_outputs = hidden  # hidden states are the best features here
        elif self.assigner is not None:
            prev = inp_feats
            # predictions use original kmeans centroid features
            all_outputs = self.assigner.cluster2feat(jnp.argmax(decoded, axis=-1))
        else:
            prev = inp_feats
            all_outputs = decoded

        if self.return_past_too:
            final = jnp.concatenate([prev, all_outputs[:, T0 - 1 :, :]], axis=1)
        else:
            final = all_outputs[:, -L:]
        if self.avg_last_n > 0:
            final = jnp.mean(final[:, -self.avg_last_n :, :], axis=1)
        assert prev.shape[1] == T0
        updated_past_feat = jnp.concatenate(
            [prev[:, :1, :], all_outputs[:, : T0 - 1]], axis=1
        )
        return updated_past_feat, final, losses, endpoints

    @property
    def output_dim(self):
        if self.in_features == 1:
            return self.inter_dim
        return self.in_features
