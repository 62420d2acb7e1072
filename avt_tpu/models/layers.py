"""Shared transformer building blocks (flax.linen).

GPT-2-style decoder block (pre-LN, gelu_new MLP) matching the architecture
the reference gets from transformers.GPT2Model (future_prediction.py:89-95),
and an encoder block for the temporal-aggregation transformer
(temporal_aggregation.py:73-147). Attention goes through
avt_tpu.ops.dot_product_attention (Pallas on TPU for long sequences).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avt_tpu.ops import dot_product_attention


def gelu_new(x: jax.Array) -> jax.Array:
    """GPT-2's tanh-approximated GELU."""
    return (
        0.5
        * x
        * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))
    )


def position_stable_dropout(
    x: jax.Array, key: jax.Array, rate: float, offset: int = 0
) -> jax.Array:
    """Dropout whose mask is a pure function of (key, absolute position) —
    independent of the live sequence length or buffer capacity: position
    p's (B, C) mask comes from fold_in(key, p), so any window of any pass
    that covers p regenerates the identical mask.

    This reproduces the reference's KV-cache dropout semantics for the AVTh
    rollout (future_prediction.py:168-202): with a cache, token t's
    activations are dropout-masked once — at the step that processed token t
    — and reused; with our static recompute, re-running the prefix under a
    position-stable mask regenerates bit-identical activations, so
    recompute == cache exactly, even under train-time dropout. The cached
    decode path passes the token position as `offset` and pays only O(B*C)
    mask generation per step (not O(B*t_max*C) as a slice-of-full-buffer
    scheme would).
    """
    if rate == 0.0:
        return x
    B, T, C = x.shape
    pos = offset + jnp.arange(T)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pos)
    keep = jax.vmap(
        lambda k: jax.random.bernoulli(k, 1.0 - rate, (B, C))
    )(keys).transpose(1, 0, 2)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def _explicit_attention_probs(q, k, causal):
    """Softmax attention probabilities, (B, H, Tq, Tk).

    Used only when attention maps are exported (gpt2_att_* endpoints,
    reference future_prediction.py:184-188); the fused kernels never
    materialize the (T, T) probabilities.
    """
    head_dim = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(head_dim)
    if causal:
        Tq, Tk = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((Tq, Tk), dtype=bool), k=Tk - Tq)
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    return jax.nn.softmax(logits, axis=-1)


class SelfAttention(nn.Module):
    """Multi-head self-attention with fused qkv projection.

    dtype: compute dtype (params stay f32); bf16 for MXU throughput.
    """

    num_heads: int
    causal: bool = False
    attn_dropout: float = 0.0
    resid_dropout: float = 0.0
    out_features: Optional[int] = None
    qkv_init: Any = nn.linear.default_kernel_init
    proj_init: Any = nn.linear.default_kernel_init
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x,
        *,
        train: bool = False,
        mask=None,
        output_attentions: bool = False,
        dropout_key=None,
        kv_cache=None,
        cache_index=None,
        pos_offset: int = 0,
        return_kv: bool = False,
    ):
        """kv_cache/cache_index: cached single-token decode — x is the one
        (B, 1, C) new token at position cache_index; its k/v are written
        into the (B, Tc, H, D) cache pair and q attends over positions
        <= cache_index. return_kv: also return this call's (k, v) (the
        prefill that seeds a cache). pos_offset: token position of x[:, 0]
        for position-stable dropout masks."""
        B, T, C = x.shape
        out_dim = self.out_features or C
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, kernel_init=self.qkv_init, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.num_heads, head_dim)
        k = k.reshape(B, T, self.num_heads, head_dim)
        v = v.reshape(B, T, self.num_heads, head_dim)
        probs = None
        if kv_cache is not None:
            assert not output_attentions, "viz mode uses the recompute path"
            assert T == 1, "cached decode processes one token at a time"
            k_cache, v_cache = kv_cache
            k = jax.lax.dynamic_update_slice_in_dim(
                k_cache, k.astype(k_cache.dtype), cache_index, axis=1
            )
            v = jax.lax.dynamic_update_slice_in_dim(
                v_cache, v.astype(v_cache.dtype), cache_index, axis=1
            )
            # causal for a single query at position cache_index: keys <= it
            visible = (
                jnp.arange(k.shape[1]) <= cache_index
            )[None, None, None, :]
            out = dot_product_attention(q, k, v, causal=False, mask=visible)
        elif output_attentions:
            # explicit path that materializes the probabilities; only used
            # for attention-map export (viz mode), never on the hot path
            probs = _explicit_attention_probs(q, k, self.causal)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            out = dot_product_attention(q, k, v, causal=self.causal, mask=mask)
        # attn_dropout on probabilities is not expressible with the fused
        # kernel; dropping out the attention OUTPUT instead has very similar
        # regularization behavior and keeps the kernel fused.
        if dropout_key is not None and train:
            out = position_stable_dropout(
                out.reshape(B, T, C),
                jax.random.fold_in(dropout_key, 0),
                self.attn_dropout,
                pos_offset,
            )
        else:
            out = nn.Dropout(self.attn_dropout, deterministic=not train)(out)
            out = out.reshape(B, T, C)
        out = nn.Dense(out_dim, kernel_init=self.proj_init, dtype=self.dtype, name="proj")(out)
        if dropout_key is not None and train:
            out = position_stable_dropout(
                out, jax.random.fold_in(dropout_key, 1), self.resid_dropout,
                pos_offset,
            )
        else:
            out = nn.Dropout(self.resid_dropout, deterministic=not train)(out)
        if kv_cache is not None or return_kv:
            return out, (k, v)
        if output_attentions:
            return out, probs
        return out


# HF GPT-2 from-scratch init: every Linear/Conv1D/Embedding weight is
# N(0, initializer_range=0.02), biases zero (transformers 4.2.2
# GPT2PreTrainedModel._init_weights — the version the reference pins; the
# later scaled-c_proj init does not exist there).
GPT2_INIT = nn.initializers.normal(stddev=0.02)


class GPT2Block(nn.Module):
    """Pre-LN decoder block: x += attn(ln1(x)); x += mlp(ln2(x))."""

    num_heads: int
    mlp_ratio: int = 4
    attn_dropout: float = 0.1
    resid_dropout: float = 0.1
    ln_eps: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x,
        *,
        train: bool = False,
        output_attentions: bool = False,
        dropout_key=None,
        kv_cache=None,
        cache_index=None,
        pos_offset: int = 0,
        return_kv: bool = False,
    ):
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_1")(x)
        attn_out = SelfAttention(
            num_heads=self.num_heads,
            causal=True,
            attn_dropout=self.attn_dropout,
            resid_dropout=self.resid_dropout,
            qkv_init=GPT2_INIT,
            proj_init=GPT2_INIT,
            dtype=self.dtype,
            name="attn",
        )(
            h,
            train=train,
            output_attentions=output_attentions,
            dropout_key=(
                jax.random.fold_in(dropout_key, 0)
                if dropout_key is not None
                else None
            ),
            kv_cache=kv_cache,
            cache_index=cache_index,
            pos_offset=pos_offset,
            return_kv=return_kv,
        )
        probs = kv = None
        if kv_cache is not None or return_kv:
            attn_out, kv = attn_out
        elif output_attentions:
            attn_out, probs = attn_out
        x = x + attn_out
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(
            self.mlp_ratio * x.shape[-1], kernel_init=GPT2_INIT,
            dtype=self.dtype, name="mlp_fc",
        )(h)
        h = gelu_new(h)
        h = nn.Dense(
            x.shape[-1], kernel_init=GPT2_INIT, dtype=self.dtype,
            name="mlp_proj",
        )(h)
        if dropout_key is not None and train:
            h = position_stable_dropout(
                h, jax.random.fold_in(dropout_key, 1), self.resid_dropout,
                pos_offset,
            )
        else:
            h = nn.Dropout(self.resid_dropout, deterministic=not train)(h)
        out = x + h
        if kv is not None:
            return out, kv
        if output_attentions:
            return out, probs
        return out


class GPT2Core(nn.Module):
    """Stack of GPT2Blocks with learned positions and final LN.

    Equivalent of transformers.GPT2Model with wte deleted (the reference
    deletes it and feeds inputs_embeds, future_prediction.py:95). All
    weights (wpe + every Dense kernel) init to N(0, 0.02) like HF's
    _init_weights, so training from scratch matches the reference.
    """

    n_layer: int = 12
    n_head: int = 12
    n_positions: int = 1024
    embd_dropout: float = 0.1
    attn_dropout: float = 0.1
    resid_dropout: float = 0.1
    ln_eps: float = 1e-5
    dtype: Optional[Any] = None  # compute dtype (e.g. bf16); params f32

    @nn.compact
    def __call__(
        self,
        inputs_embeds,
        *,
        train: bool = False,
        position_offset: int = 0,
        output_attentions: bool = False,
        dropout_key=None,
        kv_caches=None,
        return_kv: bool = False,
    ):
        """dropout_key: position-stable rollout dropout — pass the SAME
        key for every forward of a growing rollout buffer and masks become a
        function of token position only, making recompute == KV cache.
        output_attentions: additionally return per-layer attention
        probabilities stacked (B, n_layer, n_head, T, T).
        return_kv: additionally return the per-layer (k, v) pairs of this
        forward (seeding a decode cache). kv_caches: per-layer (k, v) pairs
        of shape (B, Tc, H, D) — cached single-token decode of the one
        (B, 1, C) token at position `position_offset`; returns the updated
        caches. Position-stable dropout masks are keyed off the token's
        position, so cached decode == full recompute under dropout too."""
        B, T, C = inputs_embeds.shape
        wpe = self.param("wpe", GPT2_INIT, (self.n_positions, C))
        pos = jax.lax.dynamic_slice_in_dim(wpe, position_offset, T, axis=0)
        x = inputs_embeds + pos[None]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if dropout_key is not None and train:
            x = position_stable_dropout(
                x, jax.random.fold_in(dropout_key, 0), self.embd_dropout,
                position_offset,
            )
        else:
            x = nn.Dropout(self.embd_dropout, deterministic=not train)(x)
        all_probs = []
        new_kvs = []
        for i in range(self.n_layer):
            x = GPT2Block(
                num_heads=self.n_head,
                attn_dropout=self.attn_dropout,
                resid_dropout=self.resid_dropout,
                ln_eps=self.ln_eps,
                dtype=self.dtype,
                name=f"h_{i}",
            )(
                x,
                train=train,
                output_attentions=output_attentions,
                dropout_key=(
                    jax.random.fold_in(dropout_key, 1 + i)
                    if dropout_key is not None
                    else None
                ),
                kv_cache=None if kv_caches is None else kv_caches[i],
                cache_index=None if kv_caches is None else position_offset,
                pos_offset=position_offset,
                return_kv=return_kv,
            )
            if kv_caches is not None or return_kv:
                x, kv = x
                new_kvs.append(kv)
            elif output_attentions:
                x, probs = x
                all_probs.append(probs)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_f")(x)
        out = x.astype(jnp.float32) if self.dtype is not None else x
        if kv_caches is not None or return_kv:
            return out, new_kvs
        if output_attentions:
            # (B, n_layer, n_head, T, T) — the reference's stack+transpose
            # layout (future_prediction.py:185-188)
            return out, jnp.stack(all_probs, axis=1)
        return out


def sincos_positional_encoding(max_len: int, d_model: int) -> jnp.ndarray:
    """Sin/cos table, (max_len, d_model); reference temporal_aggregation.py:50-70."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


# The reference's model-wide init (base_model.py:110-127) resets every
# nn.Linear to N(0, 0.01) AFTER submodule construction — inside a torch
# TransformerEncoderLayer that covers linear1/linear2 and attn out_proj,
# while in_proj_weight (a bare Parameter) keeps its xavier_uniform.
LINEAR_INIT = nn.initializers.normal(stddev=0.01)


class EncoderBlock(nn.Module):
    """Post-LN transformer encoder layer (torch.nn.TransformerEncoderLayer
    semantics: attn -> add+LN -> ffn -> add+LN)."""

    num_heads: int
    ffn_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False, mask=None):
        a = SelfAttention(
            num_heads=self.num_heads,
            causal=False,
            attn_dropout=self.dropout,
            resid_dropout=0.0,
            qkv_init=nn.initializers.xavier_uniform(),
            proj_init=LINEAR_INIT,
            name="attn",
        )(x, train=train, mask=mask)
        x = nn.LayerNorm(name="ln_1")(x + nn.Dropout(self.dropout, deterministic=not train)(a))
        h = nn.Dense(self.ffn_dim, kernel_init=LINEAR_INIT, name="ffn_fc")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(x.shape[-1], kernel_init=LINEAR_INIT, name="ffn_proj")(h)
        x = nn.LayerNorm(name="ln_2")(x + nn.Dropout(self.dropout, deterministic=not train)(h))
        return x
