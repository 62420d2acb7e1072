"""Pallas TPU flash attention (forward + recompute backward), online softmax.

Design (see /opt/skills/guides/pallas_guide.md):
  * grid = (batch*heads / G, Tq/block_q); each program computes G rows'
    q-block outputs (G batch*head rows batched per program: at short
    sequence lengths the per-program fixed cost dominates a 1-row grid).
  * K/V for the rows live fully in VMEM (seq lengths here are <= ~1k:
    ViT 256, AVT-h <= 64 — at 1024 x 128 x f32 that is 0.5 MB per tensor,
    well under the 16 MB VMEM).
  * online softmax keeps the (block_q, block_k) score tile in VMEM; no
    (Tq, Tk) materialization in HBM — in forward OR backward.
  * backward is the standard flash recompute: forward saves only the
    per-row logsumexp; dq / dk / dv kernels re-form the probabilities
    blockwise from (q, k, lse) and contract against dO. This replaces the
    XLA-autodiff fallback that materialized (B*H, Tq, Tk) score tensors in
    HBM for the ViT backward (the round-1 perf drag).
  * padding and causal masks are generated statically from the true
    lengths (static at trace time), so XLA sees fixed shapes.

Replaces: cuDNN fused attention the reference gets through timm/HF
(models/video_classification.py, models/future_prediction.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as pl_P

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *,
    sm_scale, causal, q_len, kv_len, block_k
):
    """Forward: G rows x one q block x all k blocks, online softmax.

    Ref shapes: q (G, block_q, D), k/v (G, Tk_pad, D), o like q,
    lse (G, block_q) logsumexp of the scaled scores (None = don't store).
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
        if lse_ref is not None:
            lse_ref[g, :] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
    sm_scale, causal, kv_len, block_k
):
    """dq for G rows x one q block; K/V resident, iterate k blocks.

    ds = p * (dO @ V^T - delta); dq = sm_scale * ds @ K, with
    p = exp(q.K^T * scale - lse) recomputed blockwise.
    """
    G, block_q, head_dim = q_ref.shape
    kv_pad = k_ref.shape[1]
    q_block_idx = pl.program_id(1)
    q_pos = q_block_idx * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )
    for g in range(G):
        q = q_ref[g, :, :] * sm_scale
        do = do_ref[g, :, :]
        lse = lse_ref[g, :][:, None]
        delta = delta_ref[g, :][:, None]
        acc = jnp.zeros((block_q, head_dim), dtype=jnp.float32)
        for kb in range(kv_pad // block_k):
            k = k_ref[g, kb * block_k : (kb + 1) * block_k, :]
            v = v_ref[g, kb * block_k : (kb + 1) * block_k, :]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = k_pos < kv_len
            if causal:
                mask = mask & (k_pos <= q_pos)
            s = jnp.where(mask, s, NEG_INF)
            p = jnp.exp(s - lse)  # (block_q, block_k), zeros where masked
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            acc = acc + jnp.dot(
                ds.astype(k.dtype), k, preferred_element_type=jnp.float32
            )
        dq_ref[g, :, :] = (acc * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *,
    sm_scale, causal, kv_len, block_q
):
    """dk/dv for G rows x one k block; Q/dO resident, iterate q blocks.

    dv = p^T @ dO; dk = ds^T @ (q * scale), p recomputed as in _dq_kernel.
    Padded q rows contribute nothing (their dO and delta are zero).
    """
    G, block_k, head_dim = k_ref.shape
    tq_pad = q_ref.shape[1]
    k_block_idx = pl.program_id(1)
    k_pos = k_block_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    for g in range(G):
        k = k_ref[g, :, :]
        v = v_ref[g, :, :]
        dk = jnp.zeros((block_k, head_dim), dtype=jnp.float32)
        dv = jnp.zeros((block_k, head_dim), dtype=jnp.float32)
        for qb in range(tq_pad // block_q):
            sl = slice(qb * block_q, (qb + 1) * block_q)
            q = q_ref[g, sl, :] * sm_scale
            do = do_ref[g, sl, :]
            lse = lse_ref[g, sl][:, None]
            delta = delta_ref[g, sl][:, None]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            mask = k_pos < kv_len
            if causal:
                q_pos = qb * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0
                )
                mask = mask & (k_pos <= q_pos)
            s = jnp.where(mask, s, NEG_INF)
            p = jnp.exp(s - lse)
            dv = dv + jnp.dot(
                p.T.astype(do.dtype), do, preferred_element_type=jnp.float32
            )
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            dk = dk + jnp.dot(
                ds.T.astype(q.dtype), q, preferred_element_type=jnp.float32
            )
        dk_ref[g, :, :] = dk.astype(dk_ref.dtype)
        dv_ref[g, :, :] = dv.astype(dv_ref.dtype)


def _pick_group(
    n_rows: int, tk_pad: int, head_dim: int, itemsize: int, n_resident: int = 4
) -> int:
    """Rows (batch*head) per program: as many as fit a VMEM budget.

    n_resident: how many full-seq-length tensors the kernel keeps per row
    (fwd: K, V + double-buffered q/o blocks; bwd dkv: q, do, k, v, ...).

    G is also the SUBLANE dim of the 2D lse/delta blocks (G, block_q), so
    Mosaic requires G % 8 == 0 or G == n_rows; among the divisors of n_rows
    satisfying that, pick the largest within (a slight overshoot of) the
    VMEM budget — overshooting beats an illegal tiling, real VMEM is ~16MB
    vs the 6MB budget.
    """
    # the last dim pads to 128 lanes and the pipeline double-buffers blocks
    lanes = max(head_dim, 128)
    per_row = (
        (n_resident * tk_pad + 2 * DEFAULT_BLOCK_Q) * lanes * max(itemsize, 2) * 2
    )
    budget = 6 * 1024 * 1024  # stay well under the ~16MB VMEM
    target = max(1, budget // max(per_row, 1))
    valid = [
        g for g in range(1, n_rows + 1)
        if n_rows % g == 0 and (g % 8 == 0 or g == n_rows)
    ]
    under = [g for g in valid if g <= max(target, 8)]
    return max(under) if under else min(valid)


def _to_bh(x, t_pad, t):
    """(B, T, H, D) -> (B*H, T_pad, D), zero-padded along T."""
    B, _, H, D = x.shape
    x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(B * H, t_pad, D)


def _from_bh(x, B, H, t):
    """(B*H, T_pad, D) -> (B, T, H, D)."""
    t_pad, D = x.shape[1:]
    return x.reshape(B, H, t_pad, D).transpose(0, 2, 1, 3)[:, :t]


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret", "want_lse"),
)
def _flash_attention_fwd(
    q, k, v, *, causal, block_q, block_k, interpret, want_lse
):
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    sm_scale = 1.0 / math.sqrt(D)
    tq_pad = _round_up(Tq, block_q)
    tk_pad = _round_up(Tk, block_k)
    qp = _to_bh(q, tq_pad, Tq)
    kp = _to_bh(k, tk_pad, Tk)
    vp = _to_bh(v, tk_pad, Tk)

    G = _pick_group(B * H, tk_pad, D, q.dtype.itemsize)
    grid = (B * H // G, tq_pad // block_q)
    blk = lambda shape, idx: pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)  # noqa: E731
    out_shapes = [jax.ShapeDtypeStruct((B * H, tq_pad, D), q.dtype)]
    out_specs = [blk((G, block_q, D), lambda bh, i: (bh, i, 0))]
    if want_lse:
        out_shapes.append(jax.ShapeDtypeStruct((B * H, tq_pad), jnp.float32))
        out_specs.append(blk((G, block_q), lambda bh, i: (bh, i)))

    def kernel(q_ref, k_ref, v_ref, o_ref, *maybe_lse):
        _flash_kernel(
            q_ref, k_ref, v_ref, o_ref,
            maybe_lse[0] if maybe_lse else None,
            sm_scale=sm_scale, causal=causal, q_len=Tq, kv_len=Tk,
            block_k=block_k,
        )

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blk((G, block_q, D), lambda bh, i: (bh, i, 0)),
            blk((G, tk_pad, D), lambda bh, i: (bh, 0, 0)),
            blk((G, tk_pad, D), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq * Tk * D,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=B * H * Tq * Tk,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = _from_bh(res[0], B, H, Tq)
    if want_lse:
        # batch-major (B, H, Tq_pad): the leading dim is the batch, so the
        # GSPMD partitioning rules below can shard it with q's batch
        return out, res[1].reshape(B, H, tq_pad)
    return out


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
    return _flash_attention_fwd(
        q, k, v, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret, want_lse=False,
    )


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def _flash_attention_bwd(
    q, k, v, do, lse, delta, *, causal, block_q, block_k, interpret
):
    """dq/dk/dv via the recompute kernels; lse/delta are (B, H, Tq_pad)."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    sm_scale = 1.0 / math.sqrt(D)
    tq_pad = _round_up(Tq, block_q)
    tk_pad = _round_up(Tk, block_k)
    qp = _to_bh(q, tq_pad, Tq)
    kp = _to_bh(k, tk_pad, Tk)
    vp = _to_bh(v, tk_pad, Tk)
    dop = _to_bh(do, tq_pad, Tq)
    lse = lse.reshape(B * H, tq_pad)
    delta = delta.reshape(B * H, tq_pad)

    blk = lambda shape, idx: pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)  # noqa: E731
    bh = B * H
    itemsize = q.dtype.itemsize

    # dq: per-program residents K, V, q/do/dq blocks -> ~2 full-len rows
    G = _pick_group(bh, tk_pad, D, itemsize, n_resident=2)
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, sm_scale=sm_scale, causal=causal, kv_len=Tk,
            block_k=block_k,
        ),
        grid=(bh // G, tq_pad // block_q),
        in_specs=[
            blk((G, block_q, D), lambda b, i: (b, i, 0)),   # q
            blk((G, tk_pad, D), lambda b, i: (b, 0, 0)),    # k
            blk((G, tk_pad, D), lambda b, i: (b, 0, 0)),    # v
            blk((G, block_q, D), lambda b, i: (b, i, 0)),   # do
            blk((G, block_q), lambda b, i: (b, i)),         # lse
            blk((G, block_q), lambda b, i: (b, i)),         # delta
        ],
        out_specs=blk((G, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * Tq * Tk * D,
            bytes_accessed=(qp.size * 2 + kp.size + vp.size) * itemsize,
            transcendentals=B * H * Tq * Tk,
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    # dk/dv: per-program residents Q, dO (full Tq) + k/v/dk/dv blocks
    G2 = _pick_group(bh, tq_pad, D, itemsize, n_resident=2)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, sm_scale=sm_scale, causal=causal, kv_len=Tk,
            block_q=block_q,
        ),
        grid=(bh // G2, tk_pad // block_k),
        in_specs=[
            blk((G2, tq_pad, D), lambda b, j: (b, 0, 0)),   # q
            blk((G2, block_k, D), lambda b, j: (b, j, 0)),  # k
            blk((G2, block_k, D), lambda b, j: (b, j, 0)),  # v
            blk((G2, tq_pad, D), lambda b, j: (b, 0, 0)),   # do
            blk((G2, tq_pad), lambda b, j: (b, 0)),         # lse
            blk((G2, tq_pad), lambda b, j: (b, 0)),         # delta
        ],
        out_specs=[
            blk((G2, block_k, D), lambda b, j: (b, j, 0)),
            blk((G2, block_k, D), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tk_pad, D), k.dtype),
            jax.ShapeDtypeStruct((bh, tk_pad, D), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * Tq * Tk * D,
            bytes_accessed=(qp.size * 2 + kp.size * 2 + vp.size * 2) * itemsize,
            transcendentals=B * H * Tq * Tk,
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    return (
        _from_bh(dq, B, H, Tq),
        _from_bh(dk, B, H, Tk),
        _from_bh(dv, B, H, Tk),
    )


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward + Pallas recompute backward.
# Kernels run interpreted off-TPU so the same code path tests on the CPU
# mesh (the dispatcher in ops/attention.py only routes real TPU shapes here).
# ---------------------------------------------------------------------------
def _interp() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_vjp(q, k, v, causal=False):
    return _partitioned_flash_fwd(causal, _interp())(q, k, v)[0]


def _fa_fwd(q, k, v, causal):
    out, lse = _partitioned_flash_fwd(causal, _interp())(q, k, v)
    return out, (q, k, v, out, lse)


def _fa_bwd(causal, residuals, g):
    q, k, v, out, lse = residuals
    B, Tq, H, _ = q.shape
    tq_pad = lse.shape[-1]
    # delta = rowsum(dO * O) in the kernels' batch-major (B, H, Tq_pad)
    # layout (plain jnp: GSPMD shards it natively alongside the kernel)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, tq_pad - Tq), (0, 0)))
    delta = delta.transpose(0, 2, 1)
    return _partitioned_flash_bwd(causal, _interp())(q, k, v, g, lse, delta)


flash_attention_vjp.defvjp(_fa_fwd, _fa_bwd)


# ---------------------------------------------------------------------------
# Packed short-sequence attention (the ViT hot path).
#
# The generic kernels above pay a pad + transpose + reshape of q/k/v/o in
# HBM to reach the (B*H, T, D) layout — at ViT-B scale (160 frames x 197
# tokens x 768) that layout traffic dwarfs the attention math. These kernels
# instead read the qkv projection's natural output (N, T, 3, H, D) IN PLACE
# via Pallas index maps (zero copies), keep a whole sequence per program
# (T <= ~1k fits VMEM), and the backward is ONE kernel that recomputes the
# probabilities and writes a single packed dqkv array that feeds the qkv
# Dense backward directly. Residuals: just (qkv, do) — no out/lse stored
# (delta folds into rowsum(p * dp)).
# ---------------------------------------------------------------------------
LOG2E = 1.4426950408889634


def _short_fwd_kernel(qkv_ref, o_ref, *, num_heads, sm_scale, kv_len, causal):
    """qkv_ref (G, T, 3*H*D) -> o_ref (G, T, H*D); full-seq softmax.

    Heads are addressed by STATIC lane slices of the packed projection —
    Mosaic handles 2D lane-sliced loads/stores natively, where interior
    integer indexing of a 5D (G, T, 3, H, D) ref would need an unsupported
    vector reshape.

    The softmax runs in base 2 with log2(e) folded into the q scaling (exp
    lowers to exp2 + a per-element multiply anyway), and the mask select is
    skipped when statically all-true (the ViT path: non-causal, no padding).
    Measured on v5e at the ViT shape (160x197x768): this kernel is ~1.6x
    faster than XLA's fused attention forward (2.3 vs 3.7 ms chained) and
    near its structural floor — the cost is 1920 small (197x64) matmul
    pipelines, not VPU arithmetic (exp2/maskless/bigger-G all measured
    neutral within noise).
    """
    G, T, C3 = qkv_ref.shape
    C = C3 // 3
    D = C // num_heads
    masked = causal or kv_len < T
    if masked:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        mask = k_pos < kv_len
        if causal:
            mask = mask & (k_pos <= q_pos)
    for g in range(G):
        for h in range(num_heads):
            q = qkv_ref[g, :, h * D:(h + 1) * D] * (sm_scale * LOG2E)
            k = qkv_ref[g, :, C + h * D:C + (h + 1) * D]
            v = qkv_ref[g, :, 2 * C + h * D:2 * C + (h + 1) * D]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            if masked:
                s = jnp.where(mask, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            # reciprocal-multiply: T divides + T*T muls instead of T*T
            # divides (div is many VPU cycles; this is ~15% of the kernel)
            pn = (p * (1.0 / l)).astype(v.dtype)
            o_ref[g, :, h * D:(h + 1) * D] = jnp.dot(
                pn, v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def _short_bwd_kernel(
    qkv_ref, do_ref, dqkv_ref, *, num_heads, sm_scale, kv_len, causal
):
    """Recompute-probabilities backward; writes dq/dk/dv into one packed
    (G, T, 3*H*D) output via static lane slices. delta = rowsum(pn * dp),
    so neither out nor lse need storing. Base-2 softmax + static maskless
    path as in the forward kernel; q carries sm_scale*log2(e), so the dk
    matmul against it is rescaled by 1/log2(e) to recover ds^T @ (q*scale).
    """
    G, T, C3 = qkv_ref.shape
    C = C3 // 3
    D = C // num_heads
    masked = causal or kv_len < T
    if masked:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        mask = k_pos < kv_len
        if causal:
            mask = mask & (k_pos <= q_pos)
    for g in range(G):
        for h in range(num_heads):
            q = qkv_ref[g, :, h * D:(h + 1) * D] * (sm_scale * LOG2E)
            k = qkv_ref[g, :, C + h * D:C + (h + 1) * D]
            v = qkv_ref[g, :, 2 * C + h * D:2 * C + (h + 1) * D]
            do = do_ref[g, :, h * D:(h + 1) * D]
            s = jax.lax.dot_general(  # q @ k.T without the relayout
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if masked:
                s = jnp.where(mask, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            pn = p * (1.0 / l)  # (T, T) f32; see fwd kernel note on divides
            dp = jax.lax.dot_general(  # do @ v.T
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(pn * dp, axis=-1, keepdims=True)
            ds = pn * (dp - delta)
            ds_c = ds.astype(k.dtype)
            dqkv_ref[g, :, h * D:(h + 1) * D] = (
                jnp.dot(ds_c, k, preferred_element_type=jnp.float32) * sm_scale
            ).astype(dqkv_ref.dtype)
            dqkv_ref[g, :, C + h * D:C + (h + 1) * D] = (
                jax.lax.dot_general(  # ds.T @ q: contract the q-rows dim
                    ds_c, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (1.0 / LOG2E)
            ).astype(dqkv_ref.dtype)
            dqkv_ref[g, :, 2 * C + h * D:2 * C + (h + 1) * D] = (
                jax.lax.dot_general(  # p.T @ do
                    pn.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            ).astype(dqkv_ref.dtype)


def _pair_masks(T: int, W: int, D: int, dtype):
    """(T, W) lane masks selecting the low / high head of a 128-lane pair."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    return (lane < D).astype(dtype), (lane >= D).astype(dtype)


def _short_fwd_kernel_paired(
    qkv_ref, o_ref, *, num_heads, sm_scale, kv_len, causal
):
    """Head-PAIR variant of _short_fwd_kernel for D=64 heads.

    A (197, 64) head slice at odd h starts mid-lane-tile (lane tiling is
    128), so every per-head access costs cross-lane shuffles. Loading
    aligned (T, 128) head pairs and separating heads by masking ONE matmul
    operand (zeroed lanes contribute nothing to the contraction) keeps all
    VMEM traffic tile-aligned at identical effective MXU work — measured
    ~10% faster. Output matches the per-head kernel to test tolerance
    (~1e-4 rel): since the 1/l softmax normalization moved after the pv
    matmul (a (T, W) f32 row-scale on unnormalized bf16 p), rounding
    differs slightly from the normalize-before-matmul unpaired kernel.
    """
    G, T, C3 = qkv_ref.shape
    C = C3 // 3
    D = C // num_heads
    W = 2 * D
    masked = causal or kv_len < T
    if masked:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        smask = k_pos < kv_len
        if causal:
            smask = smask & (k_pos <= q_pos)
    m_lo, m_hi = _pair_masks(T, W, D, qkv_ref.dtype)
    for g in range(G):
        for hp in range(num_heads // 2):
            q2 = qkv_ref[g, :, hp * W:(hp + 1) * W] * (sm_scale * LOG2E)
            k2 = qkv_ref[g, :, C + hp * W:C + (hp + 1) * W]
            v2 = qkv_ref[g, :, 2 * C + hp * W:2 * C + (hp + 1) * W]
            o = None
            for m in (m_lo, m_hi):
                s = jnp.dot(q2 * m, k2.T, preferred_element_type=jnp.float32)
                if masked:
                    s = jnp.where(smask, s, NEG_INF)
                mx = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - mx)
                l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
                # normalize AFTER the pv matmul: a (T, W) row-scale instead
                # of a (T, T) multiply — one fewer full-score VPU pass
                pv = jnp.dot(p.astype(v2.dtype), v2 * m,
                             preferred_element_type=jnp.float32) * (1.0 / l)
                o = pv if o is None else o + pv
            o_ref[g, :, hp * W:(hp + 1) * W] = o.astype(o_ref.dtype)


def _short_bwd_kernel_paired(
    qkv_ref, do_ref, dqkv_ref, *maybe_db, num_heads, sm_scale, kv_len, causal
):
    """Head-pair recompute backward (see _short_fwd_kernel_paired).

    Per head: masking one operand of each matmul confines the contraction
    to that head's lanes; the two heads' (T, 128) grads sum into one
    aligned store per q/k/v third.

    Optional db_ref (1, 3C) f32 output: the qkv BIAS gradient
    sum-over-rows(dqkv), accumulated in VMEM while dqkv is still resident
    (its out-block index is constant, so Mosaic keeps it in VMEM across
    sequential grid steps). Without this, XLA's Dense backward re-reads
    the full dqkv from HBM just to reduce it — 0.2 ms x 12 blocks/step
    at ViT-B bench shapes.
    """
    db_ref = maybe_db[0] if maybe_db else None
    G, T, C3 = qkv_ref.shape
    C = C3 // 3
    D = C // num_heads
    W = 2 * D
    masked = causal or kv_len < T
    if masked:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        smask = k_pos < kv_len
        if causal:
            smask = smask & (k_pos <= q_pos)
    m_lo, m_hi = _pair_masks(T, W, D, qkv_ref.dtype)
    if db_ref is not None:
        @pl.when(pl.program_id(0) == 0)
        def _init_db():
            db_ref[...] = jnp.zeros_like(db_ref)
    for g in range(G):
        for hp in range(num_heads // 2):
            q2 = qkv_ref[g, :, hp * W:(hp + 1) * W] * (sm_scale * LOG2E)
            k2 = qkv_ref[g, :, C + hp * W:C + (hp + 1) * W]
            v2 = qkv_ref[g, :, 2 * C + hp * W:2 * C + (hp + 1) * W]
            do2 = do_ref[g, :, hp * W:(hp + 1) * W]
            dq = dk = dv = None
            for m in (m_lo, m_hi):
                qm = q2 * m
                s = jnp.dot(qm, k2.T, preferred_element_type=jnp.float32)
                if masked:
                    s = jnp.where(smask, s, NEG_INF)
                mx = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - mx)
                l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
                inv_l = 1.0 / l  # (T, 1)
                dom = do2 * m
                dp = jnp.dot(dom, (v2 * m).T,
                             preferred_element_type=jnp.float32)
                # 1/l folded OUT of the (T, T) domain: work with the
                # unnormalized p and row-rescale the (T, W) matmul
                # operands/results — one fewer full-score VPU pass
                t = p * dp
                delta = jnp.sum(t, axis=-1, keepdims=True) * inv_l
                ds_u = p * (dp - delta)  # = l * ds
                ds_c = ds_u.astype(k2.dtype)
                dq_h = jnp.dot(ds_c, k2 * m,
                               preferred_element_type=jnp.float32
                               ) * (sm_scale * inv_l)
                dk_h = jnp.dot(ds_c.T, qm * inv_l.astype(qm.dtype),
                               preferred_element_type=jnp.float32
                               ) * (1.0 / LOG2E)
                dv_h = jnp.dot(
                    p.astype(dom.dtype).T,
                    dom * inv_l.astype(dom.dtype),
                    preferred_element_type=jnp.float32,
                )
                dq = dq_h if dq is None else dq + dq_h
                dk = dk_h if dk is None else dk + dk_h
                dv = dv_h if dv is None else dv + dv_h
            dqkv_ref[g, :, hp * W:(hp + 1) * W] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[g, :, C + hp * W:C + (hp + 1) * W] = (
                dk.astype(dqkv_ref.dtype))
            dqkv_ref[g, :, 2 * C + hp * W:2 * C + (hp + 1) * W] = (
                dv.astype(dqkv_ref.dtype))
            if db_ref is not None:
                # db = sum over rows of dqkv, matching XLA's reduce of the
                # bf16-rounded dqkv (reduce the STORED values, not the f32)
                db_ref[0, hp * W:(hp + 1) * W] += jnp.sum(
                    dq.astype(dqkv_ref.dtype).astype(jnp.float32), axis=0
                )
                db_ref[0, C + hp * W:C + (hp + 1) * W] += jnp.sum(
                    dk.astype(dqkv_ref.dtype).astype(jnp.float32), axis=0
                )
                db_ref[0, 2 * C + hp * W:2 * C + (hp + 1) * W] += jnp.sum(
                    dv.astype(dqkv_ref.dtype).astype(jnp.float32), axis=0
                )


def _use_paired(num_heads: int, head_dim: int) -> bool:
    """Pair path: D=64 heads (the misaligned case) with an even count."""
    return head_dim == 64 and num_heads % 2 == 0


def _fused_qkv_attn_fwd_kernel(
    x_ref, w_ref, b_ref, o_ref, qkv_ref, *, num_heads, sm_scale, causal
):
    """Fused qkv projection + head-pair attention forward.

    Computes qkv = x @ W + b PER HEAD-PAIR inside the kernel, so Mosaic
    overlaps one pair's projection matmuls (MXU) with another pair's
    softmax (VPU) — measured on v5e, independent MXU/VPU chains in one
    kernel run at ~max(t_mxu, t_vpu), not the sum (.bench/overlap_probe).
    The projected qkv is also written out: the backward reads it exactly
    like the unfused path (packed dqkv kernel + XLA dW/dx matmuls), and
    q2/k2/v2 are rounded to the storage dtype BEFORE the softmax so the
    forward is bit-identical to Dense -> packed_short_attention.
    """
    G, T, C = x_ref.shape
    D = C // num_heads
    W = 2 * D
    masked = bool(causal)
    if masked:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        smask = k_pos <= q_pos
    m_lo, m_hi = _pair_masks(T, W, D, x_ref.dtype)
    for g in range(G):
        # ONE big projection per frame (M=T, K=C, N=3C — near-peak MXU);
        # frame g+1's projection has no dependency on frame g's softmax,
        # so Mosaic overlaps them across the g loop. flax Dense rounding
        # order: dot (f32 accum -> storage dtype), then bias in storage.
        qkv_g = jnp.dot(
            x_ref[g, :, :], w_ref[...],
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype) + b_ref[0, :][None, :]
        qkv_ref[g, :, :] = qkv_g
        for hp in range(num_heads // 2):
            sl_q = slice(hp * W, (hp + 1) * W)
            q2 = qkv_g[:, hp * W:(hp + 1) * W]
            k2 = qkv_g[:, C + hp * W:C + (hp + 1) * W]
            v2 = qkv_g[:, 2 * C + hp * W:2 * C + (hp + 1) * W]
            q2s = q2 * (sm_scale * LOG2E)
            o = None
            for m in (m_lo, m_hi):
                s = jnp.dot(q2s * m, k2.T,
                            preferred_element_type=jnp.float32)
                if masked:
                    s = jnp.where(smask, s, NEG_INF)
                mx = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - mx)
                l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
                # normalize after the matmul (see _short_fwd_kernel_paired)
                pv = jnp.dot(p.astype(v2.dtype), v2 * m,
                             preferred_element_type=jnp.float32) * (1.0 / l)
                o = pv if o is None else o + pv
            o_ref[g, :, sl_q] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "interpret")
)
def _fused_qkv_attn_fwd_call(x, w, b, num_heads, causal, interpret):
    N, T, C = x.shape
    H = num_heads
    D = C // H
    sm_scale = 1.0 / math.sqrt(D)
    itemsize = max(x.dtype.itemsize, 2)
    # per-frame VMEM: x + o + qkv blocks, double-buffered; W is
    # constant-indexed (resident once)
    w_bytes = C * 3 * C * itemsize
    per_frame = 5 * T * C * itemsize * 2
    budget = 10 * 1024 * 1024 - w_bytes
    G = max(1, min(N, budget // max(per_frame, 1)))
    while N % G != 0:
        G -= 1
    return pl.pallas_call(
        functools.partial(
            _fused_qkv_attn_fwd_kernel, num_heads=H, sm_scale=sm_scale,
            causal=causal,
        ),
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, T, C), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, T, C), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, 3 * C), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, T, C), x.dtype),
            jax.ShapeDtypeStruct((N, T, 3 * C), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * T * C * 3 * C + 4 * N * H * T * T * D,
            bytes_accessed=(x.size * 5 + w.size) * itemsize,
            transcendentals=N * H * T * T,
        ),
        interpret=interpret,
    )(x, w, b[None, :])


def _short_pick_group(n: int, per_frame_bytes: int) -> int:
    # ~10MB of the ~16MB VMEM: fewer, fatter programs (per-program fixed
    # cost dominated at the old 5MB budget: G=2 fwd / G=1 bwd at ViT shape)
    budget = 10 * 1024 * 1024
    g = max(1, min(n, budget // max(per_frame_bytes, 1)))
    while n % g != 0:
        g -= 1
    return g


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "interpret")
)
def _short_attention_fwd_call(qkv, num_heads, causal, interpret):
    N, T, C3 = qkv.shape
    H, D = num_heads, C3 // (3 * num_heads)
    sm_scale = 1.0 / math.sqrt(D)
    per_frame = (3 + 1) * T * H * D * qkv.dtype.itemsize * 2
    G = _short_pick_group(N, per_frame)
    fwd_kernel = (
        _short_fwd_kernel_paired if _use_paired(H, D) else _short_fwd_kernel
    )
    return pl.pallas_call(
        functools.partial(
            fwd_kernel, num_heads=H, sm_scale=sm_scale, kv_len=T,
            causal=causal,
        ),
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, T, C3), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((G, T, H * D), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, H * D), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * H * T * T * D,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=N * H * T * T,
        ),
        interpret=interpret,
    )(qkv)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "interpret")
)
def _short_attention_bwd_call(qkv, do, num_heads, causal, interpret):
    N, T, C3 = qkv.shape
    H, D = num_heads, C3 // (3 * num_heads)
    sm_scale = 1.0 / math.sqrt(D)
    per_frame = (3 + 1 + 3) * T * H * D * qkv.dtype.itemsize * 2
    G = _short_pick_group(N, per_frame)
    bwd_kernel = (
        _short_bwd_kernel_paired if _use_paired(H, D) else _short_bwd_kernel
    )
    return pl.pallas_call(
        functools.partial(
            bwd_kernel, num_heads=H, sm_scale=sm_scale, kv_len=T,
            causal=causal,
        ),
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, T, C3), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, H * D), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, T, C3), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, C3), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=11 * N * H * T * T * D,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 8 // 3,
            transcendentals=N * H * T * T,
        ),
        interpret=interpret,
    )(qkv, do)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "interpret")
)
def _short_attention_bwd_db_call(qkv, do, num_heads, causal, interpret):
    """(dqkv, db): the paired backward with the bias gradient accumulated
    in-kernel (db out-block index is constant -> VMEM-resident reduction
    across grid steps). Paired geometry (D=64, even heads) only."""
    N, T, C3 = qkv.shape
    H, D = num_heads, C3 // (3 * num_heads)
    assert _use_paired(H, D), (H, D)
    sm_scale = 1.0 / math.sqrt(D)
    per_frame = (3 + 1 + 3) * T * H * D * qkv.dtype.itemsize * 2
    G = _short_pick_group(N, per_frame)
    return pl.pallas_call(
        functools.partial(
            _short_bwd_kernel_paired, num_heads=H, sm_scale=sm_scale,
            kv_len=T, causal=causal,
        ),
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, T, C3), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, H * D), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, T, C3), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C3), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, T, C3), qkv.dtype),
            jax.ShapeDtypeStruct((1, C3), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=11 * N * H * T * T * D,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 8 // 3,
            transcendentals=N * H * T * T,
        ),
        interpret=interpret,
    )(qkv, do)


def packed_qkv_bias_attention(qkv_nobias, bias, num_heads, causal=False):
    """bias add + head-pair attention with the BIAS GRADIENT computed
    inside the backward kernel.

    qkv_nobias: (N, T, 3C) — the qkv projection BEFORE its bias (the bias
    add fuses into the producer matmul's epilogue under XLA). The custom
    backward emits (dqkv, db) from one kernel pass: without it, autodiff
    re-reads the full dqkv from HBM just to reduce the bias gradient.
    Paired geometry (head_dim 64, even head count) only.
    """
    return _packed_bias_vjp(qkv_nobias, bias.astype(qkv_nobias.dtype),
                            num_heads, causal)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _packed_bias_vjp(qkv_nobias, bias_c, num_heads, causal=False):
    qkv = qkv_nobias + bias_c
    return _partitioned_short_fwd(num_heads, causal, _interp())(qkv)


def _packed_bias_fwd_rule(qkv_nobias, bias_c, num_heads, causal):
    qkv = qkv_nobias + bias_c
    o = _partitioned_short_fwd(num_heads, causal, _interp())(qkv)
    return o, qkv


def _packed_bias_bwd_rule(num_heads, causal, qkv, g):
    dqkv, db = _partitioned_short_bwd_db(num_heads, causal, _interp())(
        qkv, g
    )
    return dqkv, db[0].astype(dqkv.dtype)


_packed_bias_vjp.defvjp(_packed_bias_fwd_rule, _packed_bias_bwd_rule)


@functools.lru_cache(maxsize=None)
def _partitioned_short_bwd_db(num_heads: int, causal: bool, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding

    @custom_partitioning
    def bwd(qkv, do):
        return _short_attention_bwd_db_call(
            qkv, do, num_heads, causal, interpret
        )

    def infer(mesh, arg_infos, result_infos):
        batch = _batch_component(arg_infos[0])
        return (
            NamedSharding(mesh, pl_P(batch, None, None)),
            NamedSharding(mesh, pl_P(None, None)),  # db replicated
        )

    def partition(mesh, arg_infos, result_infos):
        batch = _batch_component(arg_infos[0])
        sh3 = NamedSharding(mesh, pl_P(batch, None, None))
        db_sh = NamedSharding(mesh, pl_P(None, None))

        def lower(qkv, do):
            dqkv, db = _short_attention_bwd_db_call(
                qkv, do, num_heads, causal, interpret
            )
            if batch is not None:
                # each shard reduced only its rows; db is the global sum
                db = jax.lax.psum(db, batch)
            return dqkv, db

        return mesh, lower, (sh3, db_sh), (sh3, sh3)

    bwd.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b t c, b s d -> b u e, one f",
    )
    return bwd


def fused_qkv_attention(x, w, b, num_heads, causal=False):
    """qkv projection + attention in ONE kernel: x (N,T,C), w (C,3C), b (3C).

    Returns (N, T, C). Bit-identical to `x @ w + b` -> packed_short_attention
    (projections are rounded to x.dtype before the softmax), but the per-
    head-pair projection matmuls run INSIDE the kernel so Mosaic overlaps
    them with the previous pair's softmax VPU work. Backward: the packed
    dqkv recompute kernel on the stored qkv + XLA dx/dw/db matmuls.

    The x.dtype casts sit OUTSIDE the custom_vjp, so param gradients get
    the storage->param dtype conversion from JAX's cast vjp — the same
    rounding flax's Dense(dtype=...) produces.
    """
    return _fused_vjp(x, w.astype(x.dtype), b.astype(x.dtype),
                      num_heads, causal)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_vjp(x, wc, bc, num_heads, causal=False):
    o, _ = _partitioned_fused_fwd(num_heads, causal, _interp())(x, wc, bc)
    return o


def _fused_fwd_rule(x, wc, bc, num_heads, causal):
    o, qkv = _partitioned_fused_fwd(num_heads, causal, _interp())(x, wc, bc)
    return o, (x, wc, qkv)


def _fused_bwd_rule(num_heads, causal, res, g):
    x, wc, qkv = res
    dqkv = _partitioned_short_bwd(num_heads, causal, _interp())(qkv, g)
    N, T, C3 = dqkv.shape
    d2 = dqkv.reshape(N * T, C3)
    dx = jnp.dot(d2, wc.T).reshape(x.shape)
    xf = x.reshape(N * T, x.shape[-1])
    dw = jnp.dot(xf.T, d2)
    db = jnp.sum(d2.astype(jnp.float32), axis=0).astype(d2.dtype)
    return dx, dw, db


_fused_vjp.defvjp(_fused_fwd_rule, _fused_bwd_rule)


@functools.lru_cache(maxsize=None)
def _partitioned_fused_fwd(num_heads: int, causal: bool, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding

    @custom_partitioning
    def fwd(x, w, b):
        return _fused_qkv_attn_fwd_call(x, w, b, num_heads, causal, interpret)

    def infer(mesh, arg_infos, result_infos):
        batch = _batch_component(arg_infos[0])
        sh = NamedSharding(mesh, pl_P(batch, None, None))
        return (sh, sh)

    def partition(mesh, arg_infos, result_infos):
        batch = _batch_component(arg_infos[0])
        x_sh = NamedSharding(mesh, pl_P(batch, None, None))
        w_sh = NamedSharding(mesh, pl_P(None, None))
        b_sh = NamedSharding(mesh, pl_P(None))

        def lower(x, w, b):
            return _fused_qkv_attn_fwd_call(
                x, w, b, num_heads, causal, interpret
            )

        return mesh, lower, (x_sh, x_sh), (x_sh, w_sh, b_sh)

    fwd.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        # batch factor shared between x and both outputs; w/b replicated
        sharding_rule="b t c, c f, f -> b t d, b t e",
    )
    return fwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def packed_short_attention(qkv, num_heads, causal=False):
    """Attention straight off the packed qkv projection.

    qkv: (N, T, 3*H*D), the fused qkv Dense output (thirds = q, k, v).
    Returns (N, T, H*D). The whole sequence lives in one VMEM block, so this
    path is for T <= ~1k (ViT's 197); the generic flash_attention above
    handles longer sequences. Under a sharded jit the call partitions
    batch-parallel (see the custom_partitioning rules below).
    """
    return _partitioned_short_fwd(num_heads, causal, _interp())(qkv)


def _short_fwd_rule(qkv, num_heads, causal):
    return (
        _partitioned_short_fwd(num_heads, causal, _interp())(qkv),
        qkv,
    )


def _short_bwd_rule(num_heads, causal, qkv, g):
    return (_partitioned_short_bwd(num_heads, causal, _interp())(qkv, g),)


packed_short_attention.defvjp(_short_fwd_rule, _short_bwd_rule)


# ---------------------------------------------------------------------------
# GSPMD partitioning: a pallas_call is an opaque custom call, so under a
# sharded jit XLA would otherwise replicate it (all-gathering the full
# global batch into every device). These rules declare the kernels
# batch-parallel: each device runs the kernel on its own batch shard, with
# feature/sequence dims replicated (a 'model'-sharded qkv activation gets
# all-gathered first — the same thing XLA does for any opaque op).
# ---------------------------------------------------------------------------
def _batch_component(arg_info):
    spec = getattr(arg_info.sharding, "spec", None)
    if not spec or len(spec) == 0:
        return None
    return spec[0]


@functools.lru_cache(maxsize=None)
def _partitioned_short_fwd(num_heads: int, causal: bool, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding

    @custom_partitioning
    def fwd(qkv):
        return _short_attention_fwd_call(qkv, num_heads, causal, interpret)

    def infer(mesh, arg_infos, result_infos):
        return NamedSharding(mesh, pl_P(_batch_component(arg_infos[0])))

    def partition(mesh, arg_infos, result_infos):
        batch = _batch_component(arg_infos[0])
        arg_sh = (NamedSharding(mesh, pl_P(batch, None, None)),)
        out_sh = NamedSharding(mesh, pl_P(batch, None, None))

        def lower(qkv):
            return _short_attention_fwd_call(qkv, num_heads, causal, interpret)

        return mesh, lower, out_sh, arg_sh

    fwd.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        # Shardy propagation rule: batch factor shared, everything else
        # independent (the partition callback replicates non-batch dims)
        sharding_rule="b t c -> b s d",
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _partitioned_short_bwd(num_heads: int, causal: bool, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding

    @custom_partitioning
    def bwd(qkv, do):
        return _short_attention_bwd_call(qkv, do, num_heads, causal, interpret)

    def infer(mesh, arg_infos, result_infos):
        return NamedSharding(mesh, pl_P(_batch_component(arg_infos[0])))

    def partition(mesh, arg_infos, result_infos):
        batch = _batch_component(arg_infos[0])
        arg_sh = (
            NamedSharding(mesh, pl_P(batch, None, None)),
            NamedSharding(mesh, pl_P(batch, None, None)),
        )
        out_sh = NamedSharding(mesh, pl_P(batch, None, None))

        def lower(qkv, do):
            return _short_attention_bwd_call(
                qkv, do, num_heads, causal, interpret
            )

        return mesh, lower, out_sh, arg_sh

    bwd.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b t c, b s d -> b u e",
    )
    return bwd


@functools.lru_cache(maxsize=None)
def _partitioned_flash_fwd(causal: bool, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding

    @custom_partitioning
    def fwd(q, k, v):
        return _flash_attention_fwd(
            q, k, v, causal=causal, block_q=DEFAULT_BLOCK_Q,
            block_k=DEFAULT_BLOCK_K, interpret=interpret, want_lse=True,
        )

    def infer(mesh, arg_infos, result_infos):
        batch = _batch_component(arg_infos[0])
        return (
            NamedSharding(mesh, pl_P(batch, None, None, None)),
            NamedSharding(mesh, pl_P(batch, None, None)),
        )

    def partition(mesh, arg_infos, result_infos):
        batch = _batch_component(arg_infos[0])
        qkv_sh = NamedSharding(mesh, pl_P(batch, None, None, None))
        out_sh = (
            qkv_sh,
            NamedSharding(mesh, pl_P(batch, None, None)),
        )

        def lower(q, k, v):
            return _flash_attention_fwd(
                q, k, v, causal=causal, block_q=DEFAULT_BLOCK_Q,
                block_k=DEFAULT_BLOCK_K, interpret=interpret, want_lse=True,
            )

        return mesh, lower, out_sh, (qkv_sh, qkv_sh, qkv_sh)

    fwd.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        # shared factors tie q's and out's dims; lse is (b, h, tq)
        sharding_rule="b q h d, b k h d, b k h d -> b q h d, b h q",
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _partitioned_flash_bwd(causal: bool, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding

    @custom_partitioning
    def bwd(q, k, v, do, lse, delta):
        return _flash_attention_bwd(
            q, k, v, do, lse, delta, causal=causal,
            block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
            interpret=interpret,
        )

    def infer(mesh, arg_infos, result_infos):
        batch = _batch_component(arg_infos[0])
        sh4 = NamedSharding(mesh, pl_P(batch, None, None, None))
        return (sh4, sh4, sh4)

    def partition(mesh, arg_infos, result_infos):
        batch = _batch_component(arg_infos[0])
        sh4 = NamedSharding(mesh, pl_P(batch, None, None, None))
        sh3 = NamedSharding(mesh, pl_P(batch, None, None))

        def lower(q, k, v, do, lse, delta):
            return _flash_attention_bwd(
                q, k, v, do, lse, delta, causal=causal,
                block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                interpret=interpret,
            )

        return (
            mesh, lower, (sh4, sh4, sh4), (sh4, sh4, sh4, sh4, sh3, sh3)
        )

    bwd.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b q h d, b k h d, b k h d, b q h d, b h q, b h q "
            "-> b q h d, b k h d, b k h d"
        ),
    )
    return bwd
