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
    def __call__(self, x, *, train: bool = False, mask=None):
        B, T, C = x.shape
        out_dim = self.out_features or C
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, kernel_init=self.qkv_init, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.num_heads, head_dim)
        k = k.reshape(B, T, self.num_heads, head_dim)
        v = v.reshape(B, T, self.num_heads, head_dim)
        out = dot_product_attention(q, k, v, causal=self.causal, mask=mask)
        # attn_dropout on probabilities is not expressible with the fused
        # kernel; dropping out the attention OUTPUT instead has very similar
        # regularization behavior and keeps the kernel fused.
        out = nn.Dropout(self.attn_dropout, deterministic=not train)(out)
        out = out.reshape(B, T, C)
        out = nn.Dense(out_dim, kernel_init=self.proj_init, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.resid_dropout, deterministic=not train)(out)
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
    def __call__(self, x, *, train: bool = False):
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_1")(x)
        x = x + SelfAttention(
            num_heads=self.num_heads,
            causal=True,
            attn_dropout=self.attn_dropout,
            resid_dropout=self.resid_dropout,
            qkv_init=GPT2_INIT,
            proj_init=GPT2_INIT,
            dtype=self.dtype,
            name="attn",
        )(h, train=train)
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
        h = nn.Dropout(self.resid_dropout, deterministic=not train)(h)
        return x + h


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
    def __call__(self, inputs_embeds, *, train: bool = False, position_offset: int = 0):
        B, T, C = inputs_embeds.shape
        wpe = self.param("wpe", GPT2_INIT, (self.n_positions, C))
        pos = jax.lax.dynamic_slice_in_dim(wpe, position_offset, T, axis=0)
        x = inputs_embeds + pos[None]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Dropout(self.embd_dropout, deterministic=not train)(x)
        for i in range(self.n_layer):
            x = GPT2Block(
                num_heads=self.n_head,
                attn_dropout=self.attn_dropout,
                resid_dropout=self.resid_dropout,
                ln_eps=self.ln_eps,
                dtype=self.dtype,
                name=f"h_{i}",
            )(x, train=train)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_f")(x)
        return x.astype(jnp.float32) if self.dtype is not None else x


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
