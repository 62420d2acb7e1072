"""Mesh/sharding semantics tests (8-device virtual CPU mesh).

SyncBN parity (VERDICT r1 item 7): the reference converts BN to SyncBN when
distributed (func/train.py:666-667) so batch statistics span the global
batch. In this framework the train step is WRITTEN over the global batch
and GSPMD shards it — so jnp.mean over a 'data'-sharded batch IS the global
mean (XLA inserts the psum). These tests pin that property: BN under a
sharded batch produces bit-identical outputs and running stats to an
unsharded global-batch run, i.e. SyncBN semantics hold by construction and
a `sync_bn` config flag has nothing left to toggle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from avt_tpu.models.video_resnet import _BN
from avt_tpu.parallel import make_mesh, shard_batch, shard_params

RNG = np.random.default_rng(11)


def test_bn_sharded_equals_global_stats():
    model = _BN(eps=1e-3, momentum_torch=0.1)
    x = jnp.asarray(RNG.normal(size=(16, 4, 8, 8, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    def step(variables, x):
        out, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    # global (unsharded) reference on one device
    out_ref, stats_ref = jax.jit(step)(variables, x)

    # sharded on the 8-device 'data' axis through the mesh helpers
    mesh = make_mesh(8, 1)
    xs = shard_batch({"x": x}, mesh)["x"]
    vs = shard_params(variables, mesh)
    out_sh, stats_sh = jax.jit(step)(vs, xs)
    assert "data" in str(xs.sharding.spec)

    np.testing.assert_allclose(
        np.asarray(out_sh), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )
    # running stats updated from GLOBAL batch moments, not per-shard ones
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(stats_sh["bn"][key])),
            np.asarray(jax.tree.leaves(stats_ref["bn"][key])),
            rtol=1e-5, atol=1e-6,
        )
    # and the global moments really differ from any single shard's moments
    shard0 = np.asarray(x[:2])
    assert not np.allclose(
        shard0.mean(axis=(0, 1, 2, 3)), np.asarray(x).mean(axis=(0, 1, 2, 3)),
        rtol=1e-3,
    )


def test_shard_batch_axis_and_fallback():
    mesh = make_mesh(8, 1)
    batch = {
        "video": np.zeros((16, 3, 4, 4), np.float32),
        "stacked": np.zeros((2, 16, 5), np.float32),
        "odd": np.zeros((7, 3), np.float32),  # 7 % 8 != 0 -> replicated
    }
    placed = shard_batch(
        {"video": batch["video"], "odd": batch["odd"]}, mesh
    )
    assert "data" in str(placed["video"].sharding.spec)
    assert placed["odd"].sharding.spec == P()
    stacked = shard_batch({"stacked": batch["stacked"]}, mesh, batch_axis=1)
    spec = stacked["stacked"].sharding.spec
    assert len(spec) >= 2 and spec[0] is None and spec[1] == "data", spec


def test_data_parallel_training_equals_single_device():
    """The sharded train step IS the reference's DDP: training over a
    'data'-sharded batch produces the same params as the same global batch
    unsharded (XLA's psum = DDP's gradient all-reduce)."""
    from avt_tpu.losses import mse
    from avt_tpu.models import (
        AVTh,
        AVTModel,
        IdentityAgg,
        IdentityBackbone,
        LinearClassifier,
    )
    from avt_tpu.train import TrainState, build_optimizer, make_train_step

    n_cls, C, B, T = 5, 16, 16, 4
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=C),
        future_predictor=AVTh(
            in_features=C, inter_dim=32, n_layer=2, n_head=2, output_len=1,
            avg_last_n=1, return_past_too=True,
            future_pred_loss=lambda p, t: mse(p, t, reduction="none"),
        ),
        temporal_aggregator_after_future_pred=IdentityAgg(in_features=C),
        classifiers={"action": LinearClassifier(out_features=n_cls)},
        num_classes=(("action", n_cls),),
        backbone_dim=C,
        dropout=0.0,  # dropout rng patterns differ under sharding layouts
    )
    batch = {
        "video": jnp.asarray(
            RNG.normal(size=(B, T, C, 1, 1, 1)).astype(np.float32)
        ),
        "target": {"action": jnp.asarray(RNG.integers(0, n_cls, size=(B,)))},
    }
    params = model.init(jax.random.PRNGKey(0), batch["video"], (B,))
    tx, _ = build_optimizer(
        params, [["__all__", 0.05, 1e-4]],
        optimizer_name="sgd", scheduler_name="cosine",
        iters_per_epoch=10, num_epochs=2, warmup_epochs=0,
        optimizer_kwargs={"nesterov": True},
    )
    step = make_train_step(
        model, tx, loss_wts={"cls_action": 1.0, "feat": 1.0},
        num_classes={"action": n_cls}, donate=False,
    )

    def train2(params, batch):
        state = TrainState.create(params, tx)
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(7 + i))
        return state.params, metrics

    p_ref, m_ref = train2(params, batch)

    mesh = make_mesh(8, 1)
    p_sh, m_sh = train2(
        shard_params(params, mesh), shard_batch(batch, mesh)
    )
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_sh),
        jax.tree_util.tree_leaves_with_path(p_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg=str(path),
        )


def test_tensor_parallel_training_equals_single_device():
    """A (data=4, model=2) mesh — attention/MLP/classifier matmuls sharded
    on 'model' — still trains identically to one device (the TP seam the
    reference never had; mesh rules in parallel/mesh.py)."""
    from avt_tpu.losses import mse
    from avt_tpu.models import (
        AVTh,
        AVTModel,
        IdentityAgg,
        IdentityBackbone,
        LinearClassifier,
    )
    from avt_tpu.train import TrainState, build_optimizer, make_train_step

    n_cls, C, B, T = 8, 16, 8, 4
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=C),
        future_predictor=AVTh(
            in_features=C, inter_dim=32, n_layer=2, n_head=2, output_len=1,
            avg_last_n=1, return_past_too=True,
            future_pred_loss=lambda p, t: mse(p, t, reduction="none"),
        ),
        temporal_aggregator_after_future_pred=IdentityAgg(in_features=C),
        classifiers={"action": LinearClassifier(out_features=n_cls)},
        num_classes=(("action", n_cls),),
        backbone_dim=C,
        dropout=0.0,
    )
    batch = {
        "video": jnp.asarray(
            RNG.normal(size=(B, T, C, 1, 1, 1)).astype(np.float32)
        ),
        "target": {"action": jnp.asarray(RNG.integers(0, n_cls, size=(B,)))},
    }
    params = model.init(jax.random.PRNGKey(1), batch["video"], (B,))
    tx, _ = build_optimizer(
        params, [["__all__", 0.05, 1e-4]],
        optimizer_name="sgd", scheduler_name="cosine",
        iters_per_epoch=10, num_epochs=2, warmup_epochs=0,
    )
    step = make_train_step(
        model, tx, loss_wts={"cls_action": 1.0, "feat": 1.0},
        num_classes={"action": n_cls}, donate=False,
    )

    def train2(params, batch):
        state = TrainState.create(params, tx)
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(3 + i))
        return state.params, metrics

    p_ref, m_ref = train2(params, batch)
    mesh = make_mesh(4, 2)
    sp = shard_params(params, mesh)
    # the TP rules must actually shard something on 'model'
    assert any(
        "model" in str(leaf.sharding.spec)
        for leaf in jax.tree.leaves(sp)
        if hasattr(leaf, "sharding")
    ), "no parameter got a 'model' sharding"
    p_sh, m_sh = train2(sp, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_sh),
        jax.tree_util.tree_leaves_with_path(p_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg=str(path),
        )


def test_cache_rollout_sharded_equals_unsharded():
    """AVTh rollout_mode='cache' under a 'data'-sharded batch == the
    unsharded forward. The cache path's per-layer dynamic_update_slice
    writes and masked single-query attention are plain XLA ops, so GSPMD
    shards them on the batch dim without replication — this pins that the
    long-rollout decode path stays multi-chip-correct (the recompute path
    is covered by the e2e mesh tests)."""
    from avt_tpu.models import AVTh

    B, T0, C = 16, 6, 24
    model = AVTh(
        in_features=C, inter_dim=32, n_layer=2, n_head=2, output_len=6,
        avg_last_n=-1, return_past_too=False, rollout_mode="cache",
    )
    feats = jnp.asarray(RNG.normal(size=(B, T0, C)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats)

    fwd = jax.jit(lambda p, f: model.apply(p, f)[1])
    want = np.asarray(fwd(params, feats))

    mesh = make_mesh(8, 1)
    fs = shard_batch({"f": feats}, mesh)["f"]
    ps = shard_params(params, mesh)
    assert "data" in str(fs.sharding.spec)
    got = np.asarray(fwd(ps, fs))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mesh_shape,style,crit", [
    ((8, 1), "together", "infonce"),
    ((4, 2), "together", "infonce"),
    ((8, 1), "separately", "nmse"),
])
def test_ssl_training_sharded_equals_single_device(mesh_shape, style, crit):
    """The SSL (PredFutureFeat) step on a (data x model) mesh == single
    device, loss AND updated params. InfoNCE is the reference's ONLY
    explicitly collective loss (loss_fn/simclr_infonce.py:146-157
    all-gathers embeddings across ranks); our loss is written over the
    GLOBAL batch so GSPMD inserts that collective implicitly — this pins
    the global-batch-negatives claim (losses/infonce.py:70-78) with
    gradients flowing through the psum."""
    from avt_tpu.losses import NormedMSE, SimclrInfoNCE
    from avt_tpu.models import (
        AVTModel,
        IdentityBackbone,
        IdentityFuture,
        LinearClassifier,
        MeanAgg,
    )
    from avt_tpu.models.temporal_agg import IdentityAgg
    from avt_tpu.train import TrainState, build_optimizer
    from avt_tpu.train.step import make_ssl_train_step

    n_cls, C, B, T = 5, 16, 16, 4
    model = AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=MeanAgg(in_features=C),
        future_predictor=IdentityFuture(in_features=C),
        temporal_aggregator_after_future_pred=IdentityAgg(in_features=C),
        classifiers={"action": LinearClassifier(out_features=n_cls)},
        num_classes=(("action", n_cls),),
        backbone_dim=C,
        project_dim_for_nce=8,
        dropout=0.0,
    )
    batch = {
        "video": jnp.asarray(
            RNG.normal(size=(B, 1, C, T, 1, 1)).astype(np.float32)
        ),
        "target": {"action": jnp.asarray(RNG.integers(0, n_cls, size=(B,)))},
        "future_0_video": jnp.asarray(
            RNG.normal(size=(B, 1, C, T, 1, 1)).astype(np.float32)
        ),
        "future_1_video": jnp.asarray(
            RNG.normal(size=(B, 1, C, T, 1, 1)).astype(np.float32)
        ),
    }
    params = model.init(jax.random.PRNGKey(0), batch["video"])
    tx, _ = build_optimizer(
        params, [["__all__", 0.05, 1e-4]],
        optimizer_name="sgd", scheduler_name="cosine",
        iters_per_epoch=10, num_epochs=2, warmup_epochs=0,
        optimizer_kwargs={"nesterov": True},
    )
    criterion = (
        SimclrInfoNCE(temperature=0.1) if crit == "infonce" else NormedMSE()
    )
    step = make_ssl_train_step(
        model, tx,
        loss_wts={"cls_action": 1.0, "reg": 1.0},
        num_classes={"action": n_cls},
        reg_criterion=criterion,
        nfutures=2,
        incur_loss_style=style,
        donate=False,
    )

    def train2(params, batch):
        state = TrainState.create(params, tx)
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(3 + i))
        return state.params, metrics

    p_ref, m_ref = train2(params, batch)
    mesh = make_mesh(*mesh_shape)
    p_sh, m_sh = train2(
        shard_params(params, mesh), shard_batch(batch, mesh)
    )
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_sh["loss/reg"]), float(m_ref["loss/reg"]), rtol=1e-5
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_sh),
        jax.tree_util.tree_leaves_with_path(p_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg=str(path),
        )
