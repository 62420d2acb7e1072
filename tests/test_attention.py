"""Flash-attention kernel tests (interpret mode on the CPU mesh)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avt_tpu.ops.attention import dot_product_attention, multi_head_attention
from avt_tpu.ops.flash_attention import flash_attention, flash_attention_vjp

RNG = np.random.default_rng(1)


def _qkv(B, T, H, D):
    return [
        jnp.asarray(RNG.normal(size=(B, T, H, D)).astype(np.float32))
        for _ in range(3)
    ]


def _numpy_attention(q, k, v, causal):
    q, k, v = [np.asarray(x, dtype=np.float64).transpose(0, 2, 1, 3) for x in (q, k, v)]
    D = q.shape[-1]
    s = np.einsum("bhtd,bhsd->bhts", q, k) / np.sqrt(D)
    if causal:
        T, S = s.shape[-2:]
        mask = np.tril(np.ones((T, S), bool), k=S - T)
        s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhts,bhsd->bhtd", p, v).transpose(0, 2, 1, 3)


@pytest.mark.parametrize(
    "B,T,H,D,causal",
    [(2, 197, 3, 64, False), (2, 160, 3, 64, True), (1, 13, 2, 64, True),
     (1, 256, 1, 128, True)],
)
def test_flash_attention_interpret_matches_reference(B, T, H, D, causal):
    q, k, v = _qkv(B, T, H, D)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    ref = _numpy_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_dispatcher_xla_path_matches_reference():
    q, k, v = _qkv(2, 10, 4, 32)
    out = dot_product_attention(q, k, v, causal=True, use_pallas=False)
    ref = _numpy_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_flash_attention_custom_bwd_matches_xla_grads():
    """The kernel's custom backward == grads of the standard expression."""
    from avt_tpu.ops.flash_attention import _fa_bwd

    q, k, v = _qkv(1, 24, 2, 32)
    out_ref, vjp_ref = jax.vjp(
        lambda a, b, c: jax.nn.dot_product_attention(a, b, c, is_causal=True),
        q, k, v,
    )
    g = jnp.ones_like(out_ref)
    ref_grads = vjp_ref(g)
    got_grads = _fa_bwd(True, (q, k, v), g)
    for got, ref in zip(got_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)
    # and the interpret-mode kernel forward agrees with the reference fwd
    out_kernel = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_kernel), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )


def test_multi_head_attention_shapes():
    B, T, C, H = 2, 8, 32, 4
    x = jnp.asarray(RNG.normal(size=(B, T, C)).astype(np.float32))
    w = lambda i, o: jnp.asarray(RNG.normal(size=(i, o)).astype(np.float32) * 0.1)  # noqa: E731
    out = multi_head_attention(
        x, x, w(C, C), w(C, C), w(C, C), w(C, C), num_heads=H, causal=True
    )
    assert out.shape == (B, T, C)
    assert np.isfinite(np.asarray(out)).all()
