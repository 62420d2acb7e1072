"""Parity tests for losses against torch reference semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from avt_tpu.losses import (
    multidim_cross_entropy,
    normed_mse,
    mse,
    mil_cross_entropy,
    simclr_infonce,
)
from avt_tpu.utils import topk_accuracy

RNG = np.random.default_rng(0)


def test_multidim_xent_matches_torch_none():
    logits = RNG.normal(size=(4, 7, 11)).astype(np.float32)
    targets = RNG.integers(-1, 11, size=(4, 7))
    ours = multidim_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), reduction="none"
    )
    ref = F.cross_entropy(
        torch.from_numpy(logits).reshape(-1, 11),
        torch.from_numpy(targets).reshape(-1),
        ignore_index=-1,
        reduction="none",
    ).reshape(4, 7)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_multidim_xent_matches_torch_mean_with_weights():
    logits = RNG.normal(size=(6, 5)).astype(np.float32)
    targets = RNG.integers(-1, 5, size=(6,))
    targets[0] = -1  # ensure at least one ignored
    weight = RNG.uniform(0.5, 2.0, size=(5,)).astype(np.float32)
    ours = multidim_cross_entropy(
        jnp.asarray(logits),
        jnp.asarray(targets),
        weight=jnp.asarray(weight),
        reduction="mean",
    )
    ref = F.cross_entropy(
        torch.from_numpy(logits),
        torch.from_numpy(targets),
        weight=torch.from_numpy(weight),
        ignore_index=-1,
        reduction="mean",
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_multidim_xent_all_ignored_is_zero():
    logits = jnp.zeros((3, 4))
    targets = -jnp.ones((3,), dtype=jnp.int32)
    assert float(multidim_cross_entropy(logits, targets, reduction="mean")) == 0.0
    np.testing.assert_array_equal(
        np.asarray(multidim_cross_entropy(logits, targets, reduction="none")),
        np.zeros((3,)),
    )


def test_normed_mse_matches_torch():
    a = RNG.normal(size=(4, 16)).astype(np.float32)
    b = RNG.normal(size=(4, 16)).astype(np.float32)
    ours = normed_mse(jnp.asarray(a), jnp.asarray(b))
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ref = F.mse_loss(F.normalize(ta, dim=-1, p=2), F.normalize(tb, dim=-1, p=2))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    np.testing.assert_allclose(
        float(mse(jnp.asarray(a), jnp.asarray(b))),
        float(F.mse_loss(ta, tb)),
        rtol=1e-5,
    )


def _torch_mil_sum(pred, labels_onehot):
    pos_pred = pred[labels_onehot.bool()].reshape((pred.size(0), -1))
    numerator = torch.logsumexp(pos_pred, dim=1)
    denominator = torch.logsumexp(pred, dim=1)
    return torch.mean(denominator - numerator)


def _torch_mil_max(pred, labels_onehot):
    pos_pred = pred[labels_onehot.bool()].reshape((pred.size(0), -1))
    pos_pred = torch.max(pos_pred, dim=1, keepdim=True)[0]
    neg_pred = pred[~labels_onehot.bool()].reshape((pred.size(0), -1))
    numerator = torch.logsumexp(pos_pred, dim=1)
    denominator = torch.logsumexp(torch.cat([pos_pred, neg_pred], dim=1), dim=1)
    return torch.mean(denominator - numerator)


@pytest.mark.parametrize("mil_type", ["sum", "max"])
def test_mil_cross_entropy_matches_torch(mil_type):
    B, N, K = 5, 20, 2
    pred = RNG.normal(size=(B, N)).astype(np.float32)
    labels = np.zeros((B, N), dtype=np.float32)
    for i in range(B):
        pos = RNG.choice(N, size=K, replace=False)
        labels[i, pos] = 1.0
    ours = mil_cross_entropy(jnp.asarray(pred), jnp.asarray(labels), mil_type)
    tfn = _torch_mil_sum if mil_type == "sum" else _torch_mil_max
    ref = tfn(torch.from_numpy(pred), torch.from_numpy(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def _torch_simclr(output, target, temperature=0.1, target_to_output=True):
    """Single-replica reimplementation of the reference loss for checking."""
    LARGE_NUM = 1e9
    output = F.normalize(output, dim=-1, p=2)
    target = F.normalize(target, dim=-1, p=2)
    if target.ndim == 3:
        num_matching = target.size(1)
        target_flat = target.reshape((-1, target.size(-1)))
        target = target[:, 0]
    else:
        num_matching = 1
        target_flat = target
    B = output.size(0)
    labels_onehot = torch.eye(B)
    extra_zeros = torch.zeros((B, B))
    labels_int = labels_onehot.repeat_interleave(num_matching, dim=1)
    logits_aa = output @ output.t() / temperature - labels_onehot * LARGE_NUM
    logits_ab = output @ target_flat.t() / temperature
    loss = _torch_mil_sum(
        torch.cat([logits_ab, logits_aa], 1),
        torch.cat([labels_int, extra_zeros], 1),
    )
    if target_to_output:
        target_all = target_flat[0::num_matching]
        logits_bb = target @ target_all.t() / temperature - labels_onehot * LARGE_NUM
        logits_ba = target @ output.t() / temperature
        loss = loss + _torch_mil_sum(
            torch.cat([logits_ba, logits_bb], 1),
            torch.cat([labels_onehot, extra_zeros], 1),
        )
    return loss


@pytest.mark.parametrize("k_positives", [None, 3])
def test_simclr_infonce_single_replica(k_positives):
    B, C = 6, 12
    out = RNG.normal(size=(B, C)).astype(np.float32)
    tgt_shape = (B, C) if k_positives is None else (B, k_positives, C)
    tgt = RNG.normal(size=tgt_shape).astype(np.float32)
    ours = simclr_infonce(jnp.asarray(out), jnp.asarray(tgt))
    ref = _torch_simclr(torch.from_numpy(out), torch.from_numpy(tgt))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4, atol=1e-5)


def test_simclr_infonce_multidevice_matches_global_batch():
    """Sharded loss with all_gather == single-device loss on the full batch."""
    n_dev = jax.device_count()
    assert n_dev == 8, "tests must run with 8 virtual CPU devices"
    B, C = 16, 8
    out = RNG.normal(size=(B, C)).astype(np.float32)
    tgt = RNG.normal(size=(B, C)).astype(np.float32)

    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))

    def per_shard(o, t):
        # per-replica mean loss; pmean of equal-size shard means == global mean
        loss = simclr_infonce(o, t, axis_name="data")
        return jax.lax.pmean(loss, "data")

    sharded = jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P(),
        )
    )(jnp.asarray(out), jnp.asarray(tgt))
    ref = simclr_infonce(jnp.asarray(out), jnp.asarray(tgt))
    np.testing.assert_allclose(float(sharded), float(ref), rtol=1e-4, atol=1e-5)


def test_topk_accuracy_matches_torch():
    logits = RNG.normal(size=(4, 3, 11)).astype(np.float32)
    targets = RNG.integers(0, 11, size=(4, 3))
    targets[0, 0] = -1
    ours = topk_accuracy(jnp.asarray(logits), jnp.asarray(targets), topk=(1, 5))

    tl = torch.from_numpy(logits).flatten(0, -2)
    tt = torch.from_numpy(targets).flatten()
    maxk = 5
    _, pred = tl.topk(maxk, 1, True, True)
    pred = pred.t()
    correct = pred.eq(tt[None])
    refs = [
        correct[:k].flatten().sum(dtype=torch.float32) * (100.0 / tt.size(0))
        for k in (1, 5)
    ]
    for o, r in zip(ours, refs):
        np.testing.assert_allclose(float(o), float(r), rtol=1e-5)


def test_topk_accuracy_all_invalid_returns_zero():
    logits = jnp.ones((3, 5))
    targets = -jnp.ones((3,), dtype=jnp.int32)
    res = topk_accuracy(logits, targets, topk=(1, 5))
    assert all(float(r) == 0.0 for r in res)
