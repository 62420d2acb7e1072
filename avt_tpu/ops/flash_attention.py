"""Pallas TPU flash attention (forward) with online softmax.

Design (see /opt/skills/guides/pallas_guide.md):
  * grid = (batch, heads, Tq/block_q); each program computes one q block's
    output for one (batch, head).
  * K/V for the (batch, head) live in VMEM (seq lengths here are <= ~1k:
    ViT 256, AVT-h <= 64, so full-K/V residency is the fast layout —
    at 1024 x 128 x f32 that is 0.5 MB per tensor, well under the 16 MB VMEM).
  * online softmax over k blocks keeps the (block_q, block_k) score tile in
    registers/VMEM; no (Tq, Tk) materialization in HBM.
  * padding and causal masks are generated statically from the true lengths
    (static at trace time), so XLA sees fixed shapes.

Backward falls back to XLA autodiff of this forward via jax.custom_vjp
residual recompute (flash-style recompute backward is a later optimization;
the ViT backbone is the only long-seq consumer and its backward is
matmul-dominated).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, sm_scale, causal, q_len, kv_len, block_k
):
    """G (batch*head) rows x one q-block x all k-blocks, online softmax.

    Ref shapes: q (G, block_q, D), k/v (G, Tk_pad, D), o like q. The wrapper
    collapses (batch, heads) into the leading dim and this kernel processes
    G of them per program: at short sequence lengths (ViT's 197 tokens) the
    per-program fixed cost dominates a 1-row grid, so batching rows into
    each program is what makes the kernel beat the XLA path (which
    materializes the full score tensor in HBM).
    """
    G, block_q, head_dim = q_ref.shape
    kv_pad = k_ref.shape[1]
    q_block_idx = pl.program_id(1)
    q_pos = q_block_idx * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )
    num_kb = kv_pad // block_k
    for g in range(G):  # static unroll; all operands stay in VMEM
        q = q_ref[g, :, :] * sm_scale  # (block_q, D)
        m = jnp.full((block_q, 1), NEG_INF, dtype=jnp.float32)
        l = jnp.zeros((block_q, 1), dtype=jnp.float32)
        acc = jnp.zeros((block_q, head_dim), dtype=jnp.float32)
        for kb in range(num_kb):  # static; kv_pad is trace-time constant
            k = k_ref[g, kb * block_k : (kb + 1) * block_k, :]
            v = v_ref[g, kb * block_k : (kb + 1) * block_k, :]
            s = jnp.dot(
                q, k.T, preferred_element_type=jnp.float32
            )  # (block_q, block_k)
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = k_pos < kv_len
            if causal:
                mask = mask & (k_pos <= q_pos)
            s = jnp.where(mask, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            m = m_new
        # Rows that saw no valid key (fully masked padding rows) have l == 0.
        out = acc / jnp.maximum(l, 1e-30)
        o_ref[g, :, :] = out.astype(o_ref.dtype)


def _pick_group(n_rows: int, tk_pad: int, head_dim: int, itemsize: int) -> int:
    """Rows (batch*head) per program: as many as fit a VMEM budget."""
    # K+V+Q+O VMEM bytes per row; the last dim pads to 128 lanes and the
    # pipeline double-buffers every block
    lanes = max(head_dim, 128)
    per_row = (2 * tk_pad + 2 * DEFAULT_BLOCK_Q) * lanes * max(itemsize, 2) * 2
    budget = 6 * 1024 * 1024  # stay well under the ~16MB VMEM
    g = max(1, min(n_rows, budget // max(per_row, 1)))
    while n_rows % g != 0:  # grid must divide evenly
        g -= 1
    return g


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over (B, T, H, D); returns (B, Tq, H, D).

    Scale = 1/sqrt(D), matching jax.nn.dot_product_attention. Forward only;
    use flash_attention_vjp for a differentiable version.
    """
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    sm_scale = 1.0 / math.sqrt(D)
    tq_pad = _round_up(Tq, block_q)
    tk_pad = _round_up(Tk, block_k)

    def to_bh(x, t_pad, t):
        # (B, T, H, D) -> (B*H, T_pad, D)
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        x = x.transpose(0, 2, 1, 3)
        return x.reshape(B * H, t_pad, D)

    qp = to_bh(q, tq_pad, Tq)
    kp = to_bh(k, tk_pad, Tk)
    vp = to_bh(v, tk_pad, Tk)

    G = _pick_group(B * H, tk_pad, D, q.dtype.itemsize)
    grid = (B * H // G, tq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            sm_scale=sm_scale,
            causal=causal,
            q_len=Tq,
            kv_len=Tk,
            block_k=block_k,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (G, block_q, D),
                lambda bh, i: (bh, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, tk_pad, D),
                lambda bh, i: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, tk_pad, D),
                lambda bh, i: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (G, block_q, D),
            lambda bh, i: (bh, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, tq_pad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq * Tk * D,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=B * H * Tq * Tk,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    # (B*H, Tq_pad, D) -> (B, Tq, H, D)
    out = out.reshape(B, H, tq_pad, D).transpose(0, 2, 1, 3)
    return out[:, :Tq]


# ---------------------------------------------------------------------------
# Differentiable wrapper: fast Pallas forward, XLA-derived backward (the
# backward re-derives grads from the standard attention expression; a
# recompute-style Pallas backward kernel is a later optimization).
# ---------------------------------------------------------------------------
def _attention_reference(q, k, v, causal):
    return jax.nn.dot_product_attention(q, k, v, is_causal=causal)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_vjp(q, k, v, causal=False):
    return flash_attention(q, k, v, causal=causal)


def _fa_fwd(q, k, v, causal):
    return flash_attention(q, k, v, causal=causal), (q, k, v)


def _fa_bwd(causal, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda a, b, c: _attention_reference(a, b, c, causal), q, k, v)
    return vjp(g)


flash_attention_vjp.defvjp(_fa_fwd, _fa_bwd)
