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


@pytest.mark.parametrize(
    "B,T,H,D,causal",
    [(1, 24, 2, 32, True),     # padded-to-128 rows exercise the zero-dO path
     (2, 197, 3, 64, False),   # ViT shape
     (1, 160, 2, 64, True)],
)
def test_flash_attention_pallas_bwd_matches_xla_grads(B, T, H, D, causal):
    """The Pallas recompute backward == grads of the standard expression.

    flash_attention_vjp auto-interprets off-TPU, so this drives the REAL
    backward kernel code (in interpret mode) on the CPU mesh.
    """
    q, k, v = _qkv(B, T, H, D)
    out_ref, vjp_ref = jax.vjp(
        lambda a, b, c: jax.nn.dot_product_attention(a, b, c, is_causal=causal),
        q, k, v,
    )
    g = jnp.asarray(RNG.normal(size=out_ref.shape).astype(np.float32))
    ref_grads = vjp_ref(g)
    out_got, vjp_got = jax.vjp(
        lambda a, b, c: flash_attention_vjp(a, b, c, causal), q, k, v
    )
    got_grads = vjp_got(g)
    np.testing.assert_allclose(
        np.asarray(out_got), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )
    for got, ref, name in zip(got_grads, ref_grads, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name} mismatch",
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


@pytest.mark.parametrize("N,T,H,D,causal", [
    (3, 197, 12, 64, False),   # ViT-B shape -> head-PAIR kernels
    (2, 96, 4, 64, True),      # paired path, causal masking
    (2, 96, 3, 64, False),     # odd head count at D=64 -> per-head kernels
    (2, 64, 4, 32, True),      # D != 64 -> per-head kernels
    (1, 10, 2, 16, True),      # below the pallas threshold: XLA fallback
])
def test_packed_attention_matches_split_path(N, T, H, D, causal):
    """packed_attention (fused-qkv Pallas path, interpret off-TPU) ==
    attention on split q/k/v, forward AND backward."""
    from avt_tpu.ops.attention import packed_attention
    from avt_tpu.ops.flash_attention import packed_short_attention

    C = H * D
    qkv = jnp.asarray(RNG.normal(size=(N, T, 3 * C)).astype(np.float32))

    def ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = [t.reshape(N, T, H, D) for t in (q, k, v)]
        out = jax.nn.dot_product_attention(q, k, v, is_causal=causal)
        return out.reshape(N, T, C)

    out_ref, vjp_ref = jax.vjp(ref, qkv)
    out_got, vjp_got = jax.vjp(
        lambda x: packed_short_attention(x, H, causal), qkv
    )
    np.testing.assert_allclose(
        np.asarray(out_got), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )
    g = jnp.asarray(RNG.normal(size=out_ref.shape).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(vjp_got(g)[0]), np.asarray(vjp_ref(g)[0]),
        rtol=5e-4, atol=5e-4,
    )
    # dispatcher output agrees too (XLA fallback on CPU)
    np.testing.assert_allclose(
        np.asarray(packed_attention(qkv, H, causal=causal)),
        np.asarray(out_ref), rtol=2e-4, atol=2e-4,
    )


def test_packed_attention_partitions_over_mesh():
    """Under a sharded jit the packed kernel partitions batch-parallel
    (custom_partitioning rules): sharded inputs give the same outputs and
    grads as unsharded, and the result stays sharded on 'data' instead of
    being replicated around an opaque custom call."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avt_tpu.ops.flash_attention import packed_short_attention
    from avt_tpu.parallel import make_mesh

    N, T, H, D = 16, 64, 4, 32
    C = H * D
    qkv = jnp.asarray(RNG.normal(size=(N, T, 3 * C)).astype(np.float32))

    def loss(x):
        return jnp.sum(packed_short_attention(x, H, False) ** 2)

    f = jax.jit(jax.value_and_grad(loss))
    l_ref, g_ref = f(qkv)

    mesh = make_mesh(8, 1)
    qkv_sh = jax.device_put(qkv, NamedSharding(mesh, P("data", None, None)))
    l_sh, g_sh = f(qkv_sh)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )
    assert "data" in str(g_sh.sharding.spec), g_sh.sharding
    # forward output sharding follows the batch dim too
    out = jax.jit(lambda x: packed_short_attention(x, H, False))(qkv_sh)
    assert "data" in str(out.sharding.spec), out.sharding


def test_flash_attention_partitions_over_mesh():
    """The generic flash kernel also partitions batch-parallel under a
    sharded jit (custom_partitioning rules with batch-major lse)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avt_tpu.ops.flash_attention import flash_attention_vjp
    from avt_tpu.parallel import make_mesh

    B, T, H, D = 16, 197, 2, 32
    q, k, v = _qkv(B, T, H, D)

    def loss(q, k, v):
        return jnp.sum(flash_attention_vjp(q, k, v, False) ** 2)

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    l_ref, g_ref = f(q, k, v)

    mesh = make_mesh(8, 1)
    sh = NamedSharding(mesh, P("data", None, None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    l_sh, g_sh = f(qs, ks, vs)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    for a, b, name in zip(g_sh, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name}",
        )
        assert "data" in str(a.sharding.spec), (name, a.sharding)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_qkv_attention_matches_split_path(causal):
    """fused_qkv_attention (projection inside the kernel, interpret
    off-TPU) == Dense-equivalent matmul + packed attention, forward AND
    all three gradients (dx, dw, db)."""
    from avt_tpu.ops.attention import fused_qkv_attention

    N, T, H, D = 2, 96, 4, 64
    C = H * D
    x = jnp.asarray(RNG.normal(size=(N, T, C)).astype(np.float32) * 0.3)
    w = jnp.asarray(RNG.normal(size=(C, 3 * C)).astype(np.float32) * 0.02)
    b = jnp.asarray(RNG.normal(size=(3 * C,)).astype(np.float32) * 0.02)

    def f_fused(x, w, b):
        return fused_qkv_attention(x, w, b, H, causal=causal,
                                   use_pallas=True)

    def f_ref(x, w, b):
        return fused_qkv_attention(x, w, b, H, causal=causal,
                                   use_pallas=False)

    o1, vjp1 = jax.vjp(f_fused, x, w, b)
    o2, vjp2 = jax.vjp(f_ref, x, w, b)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-4, atol=2e-4)
    g = jnp.asarray(RNG.normal(size=o1.shape).astype(np.float32))
    for got, ref in zip(vjp1(g), vjp2(g)):
        scale = max(float(jnp.max(jnp.abs(ref))), 1.0)
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(ref) / scale,
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_packed_qkv_bias_attention_grads_match_autodiff(causal):
    """(dqkv, db) from packed_qkv_bias_attention's custom vjp == autodiff of
    the unfused composition (qkv_nobias + bias) -> attention.

    This is the default TPU ViT attention path (attention.py:140-147); the
    db gradient is produced by the in-kernel VMEM-resident reduction
    (_short_attention_bwd_db_call), which has no other numerical test.
    Runs the real kernel in interpret mode on CPU.
    """
    from avt_tpu.ops.flash_attention import packed_qkv_bias_attention

    N, T, H, D = 2, 96, 4, 64  # paired geometry: D=64, even heads
    C = H * D
    qkv_nb = jnp.asarray(RNG.normal(size=(N, T, 3 * C)).astype(np.float32) * 0.5)
    bias = jnp.asarray(RNG.normal(size=(3 * C,)).astype(np.float32) * 0.1)

    def ref(qkv_nb, bias):
        qkv = qkv_nb + bias
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = [t.reshape(N, T, H, D) for t in (q, k, v)]
        out = jax.nn.dot_product_attention(q, k, v, is_causal=causal)
        return out.reshape(N, T, C)

    o_ref, vjp_ref = jax.vjp(ref, qkv_nb, bias)
    o_got, vjp_got = jax.vjp(
        lambda x, b: packed_qkv_bias_attention(x, b, H, causal), qkv_nb, bias
    )
    np.testing.assert_allclose(
        np.asarray(o_got), np.asarray(o_ref), rtol=2e-4, atol=2e-4
    )
    g = jnp.asarray(RNG.normal(size=o_ref.shape).astype(np.float32))
    dqkv_got, db_got = vjp_got(g)
    dqkv_ref, db_ref = vjp_ref(g)
    np.testing.assert_allclose(
        np.asarray(dqkv_got), np.asarray(dqkv_ref), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(db_got), np.asarray(db_ref), rtol=5e-4, atol=5e-4,
        err_msg="in-kernel bias gradient",
    )


def test_packed_qkv_bias_attention_partitions_over_mesh():
    """The (dqkv, db) backward partitions batch-parallel on the CPU mesh:
    exercises _partitioned_short_bwd_db's custom_partitioning rules incl.
    the per-shard db psum (flash_attention.py:976-990), which only this
    path uses. Sharded grads must equal unsharded ones; db is replicated
    (the psum makes it the global sum), dqkv stays sharded on 'data'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avt_tpu.ops.flash_attention import packed_qkv_bias_attention
    from avt_tpu.parallel import make_mesh

    N, T, H, D = 16, 64, 2, 64  # paired geometry, batch divisible by 8
    C = H * D
    qkv_nb = jnp.asarray(RNG.normal(size=(N, T, 3 * C)).astype(np.float32) * 0.5)
    bias = jnp.asarray(RNG.normal(size=(3 * C,)).astype(np.float32) * 0.1)

    def loss(x, b):
        return jnp.sum(packed_qkv_bias_attention(x, b, H, False) ** 2)

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    l_ref, (dqkv_ref, db_ref) = f(qkv_nb, bias)

    mesh = make_mesh(8, 1)
    x_sh = jax.device_put(
        qkv_nb, NamedSharding(mesh, P("data", None, None))
    )
    b_sh = jax.device_put(bias, NamedSharding(mesh, P(None)))
    l_sh, (dqkv_sh, db_sh) = f(x_sh, b_sh)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dqkv_sh), np.asarray(dqkv_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(db_sh), np.asarray(db_ref), rtol=1e-4, atol=1e-4,
        err_msg="db psum across shards",
    )
    assert "data" in str(dqkv_sh.sharding.spec), dqkv_sh.sharding
