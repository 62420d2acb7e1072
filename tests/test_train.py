"""Train-layer tests: mode, schedules vs torch, param groups, smoke train."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import torch

from avt_tpu.losses import mse
from avt_tpu.models import (
    AVTh,
    AVTModel,
    IdentityAgg,
    IdentityBackbone,
    LinearClassifier,
)
from avt_tpu.train import (
    TrainState,
    build_optimizer,
    build_schedule,
    make_train_step,
    mode_over_frames,
)
from avt_tpu.train.step import weighted_loss_sum

RNG = np.random.default_rng(3)


def test_mode_over_frames_matches_torch():
    labels = RNG.integers(-1, 5, size=(4, 3, 7))
    ours = mode_over_frames(jnp.asarray(labels), num_classes=5)
    ref = torch.mode(torch.from_numpy(labels), -1)[0]
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


def _torch_lr_trajectory(sched_name, base_lr, iters_per_epoch, num_epochs,
                         warmup_epochs, n_iters, **kw):
    """Reference scheduler implementation trajectory via torch."""
    import sys
    from bisect import bisect_right

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)

    class CosineLR(torch.optim.lr_scheduler.CosineAnnealingLR):
        def __init__(self, optimizer, num_epochs, iters_per_epoch, world_size=1, eta_min=0.0):
            super().__init__(optimizer, T_max=num_epochs * iters_per_epoch,
                             eta_min=eta_min * world_size)

        def get_lr(self, *a, **k):
            if self.last_epoch < self.T_max:
                return super().get_lr(*a, **k)
            return [0.0 for _ in self.optimizer.param_groups]

    class Warmup(torch.optim.lr_scheduler._LRScheduler):
        def __init__(self, optimizer, scheduler, init_lr_ratio, num_epochs,
                     iters_per_epoch):
            self.base_scheduler = scheduler
            self.warmup_iters = max(num_epochs * iters_per_epoch, 1)
            self.init_lr_ratio = init_lr_ratio if self.warmup_iters > 1 else 1.0
            super().__init__(optimizer, -1)

        def get_lr(self):
            assert self.last_epoch < self.warmup_iters
            return [
                el * (self.init_lr_ratio + (1 - self.init_lr_ratio) *
                      (float(self.last_epoch) / self.warmup_iters))
                for el in self.base_lrs
            ]

        def step(self, *a, **k):
            if self.last_epoch < (self.warmup_iters - 1):
                super().step(*a, **k)
            else:
                self.base_scheduler.step(*a, **k)

    base = CosineLR(opt, num_epochs - warmup_epochs, iters_per_epoch, **kw)
    sched = Warmup(opt, base, kw.get("init_lr_ratio", 0.0), warmup_epochs,
                   iters_per_epoch)
    lrs = []
    for _ in range(n_iters):
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    return np.asarray(lrs)


@pytest.mark.parametrize("warmup_epochs", [0, 2])
def test_cosine_warmup_schedule_matches_torch(warmup_epochs):
    base_lr, ipe, n_ep = 0.1, 5, 8
    n_iters = ipe * n_ep + 3  # walk past T_max to check the 0-LR tail
    ref = _torch_lr_trajectory(
        "cosine", base_lr, ipe, n_ep, warmup_epochs, n_iters
    )
    sched = build_schedule(
        "cosine", base_lr, iters_per_epoch=ipe, num_epochs=n_ep,
        warmup_epochs=warmup_epochs,
    )
    ours = np.asarray([float(sched(i)) for i in range(n_iters)])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_weighted_loss_sum_excludes_zero_weights():
    losses = {"cls_action": jnp.asarray([2.0, 4.0]), "feat": jnp.asarray(6.0)}
    total, means = weighted_loss_sum(
        losses, {"cls_action": 1.0, "feat": 0.0}
    )
    assert float(total) == 3.0  # feat excluded
    assert float(means["feat"]) == 6.0  # but still reported
    with pytest.raises(KeyError):
        weighted_loss_sum(losses, {"cls_action": 1.0})


def _tiny_model(C=64, n_cls=8):
    return AVTModel(
        backbone=IdentityBackbone(),
        temporal_aggregator=IdentityAgg(in_features=C),
        future_predictor=AVTh(
            in_features=C, inter_dim=64, n_layer=2, n_head=2,
            output_len=1, avg_last_n=1, return_past_too=True,
            embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
            future_pred_loss=lambda p, t: mse(p, t, reduction="none"),
        ),
        temporal_aggregator_after_future_pred=IdentityAgg(in_features=C),
        classifiers={"action": LinearClassifier(out_features=n_cls)},
        num_classes=(("action", n_cls),),
        backbone_dim=C,
        dropout=0.0,
        classifier_on_past=True,
    )


def test_build_optimizer_groups_and_frozen():
    model = _tiny_model()
    video = jnp.zeros((2, 6, 64, 1, 1, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video, (2,))
    # freeze everything except the classifiers
    tx, scheds = build_optimizer(
        params,
        lr_wd=[["classifiers_action", 0.1, 1e-4], ["__all__", 0.0, 0.0]],
        optimizer_name="sgd",
        scheduler_name="cosine",
        iters_per_epoch=10,
        num_epochs=2,
    )
    state = TrainState.create(params, tx)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state.opt_state, params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    for path, leaf in flat:
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        moved = float(jnp.abs(leaf).sum()) > 0
        if "classifiers_action" in path_str:
            assert moved, f"{path_str} should train"
        else:
            assert not moved, f"{path_str} should be frozen"


def test_train_smoke_loss_decreases():
    """Overfit 16 synthetic clips: total loss must drop substantially."""
    n_cls, C, B, T = 8, 64, 16, 6
    model = _tiny_model(C, n_cls)
    video = jnp.asarray(RNG.normal(size=(B, T, C, 1, 1, 1)).astype(np.float32))
    target = {"action": jnp.asarray(RNG.integers(0, n_cls, size=(B,)))}
    tsub = {"action": jnp.asarray(RNG.integers(0, n_cls, size=(B, T, 1)))}
    params = model.init(jax.random.PRNGKey(0), video, (B,))
    tx, _ = build_optimizer(
        params,
        lr_wd=[["__all__", 0.01, 1e-6]],
        optimizer_name="sgd",
        scheduler_name="constant",
        iters_per_epoch=100,
        num_epochs=1,
        optimizer_kwargs={"nesterov": True},
    )
    step = make_train_step(
        model, tx,
        loss_wts={"cls_action": 1.0, "past_cls_action": 1.0, "feat": 1.0},
        num_classes={"action": n_cls},
        donate=False,
    )
    state = TrainState.create(params, tx)
    batch = {"video": video, "target": target, "target_subclips": tsub}
    state, m0 = step(state, batch, jax.random.PRNGKey(1))
    for i in range(60):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    assert float(metrics["loss"]) < 0.5 * float(m0["loss"]), (
        float(m0["loss"]), float(metrics["loss"]),
    )
    assert float(metrics["acc1/action"]) > 80.0
    assert int(state.step) == 61


def test_reduce_lr_on_plateau_matches_torch():
    """Plateau multiplier steps exactly like torch's ReduceLROnPlateau
    (VERDICT r1 item 5): same metric sequence -> same effective LR every
    epoch, including threshold/cooldown/patience interplay and min_lr floor."""
    import torch

    from avt_tpu.train.optim import (
        PlateauScaleState,
        ReduceLROnPlateau,
        build_optimizer,
    )

    base_lr, min_lr = 0.1, 2e-3
    kw = dict(mode="max", factor=0.4, patience=2, threshold=1.0,
              threshold_mode="abs", cooldown=1)
    params = {"w": jnp.ones((3,), jnp.float32)}
    tx, _ = build_optimizer(
        params, [["__all__", base_lr, 0.0]],
        optimizer_name="sgd", scheduler_name="reduce_lr_on_plateau",
        iters_per_epoch=1, num_epochs=100,
        scheduler_kwargs={"min_lr": min_lr},
    )
    opt_state = tx.init(params)
    ours = ReduceLROnPlateau(**kw)

    tparam = torch.nn.Parameter(torch.ones(3))
    topt = torch.optim.SGD([tparam], lr=base_lr)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, min_lr=min_lr, **kw
    )

    def our_lr(opt_state):
        mults = [
            leaf for leaf in jax.tree.leaves(
                opt_state,
                is_leaf=lambda n: isinstance(n, PlateauScaleState),
            )
            if isinstance(leaf, PlateauScaleState)
        ]
        assert mults, "no PlateauScaleState in opt_state"
        return base_lr * float(mults[0].mult)

    # improvements, plateaus, recoveries, and a long tail hitting min_lr
    metrics = [10, 10.5, 10.2, 10.1, 10.05, 30, 30.1, 30.2, 29, 28,
               27, 26, 25, 24, 23, 22, 21, 20, 19, 18, 17, 16, 15, 14]
    for ep, m in enumerate(metrics):
        opt_state = ours.step(opt_state, m)
        tsched.step(m)
        np.testing.assert_allclose(
            our_lr(opt_state), topt.param_groups[0]["lr"],
            rtol=1e-6, err_msg=f"epoch {ep} metric {m}",
        )
    assert our_lr(opt_state) == pytest.approx(min_lr)  # floor engaged

    # and the multiplier actually scales the update stream
    grads = {"w": jnp.ones((3,), jnp.float32)}
    updates, _ = tx.update(grads, opt_state, params)
    np.testing.assert_allclose(
        np.asarray(updates["w"]), -min_lr * np.ones(3), rtol=1e-5
    )


def test_plateau_counters_persist_through_checkpoint(tmp_path):
    """The plateau tracker's best/bad-epoch counters ride the checkpoint's
    host_state (the reference persists scheduler state, func/train.py:52-74)."""
    import optax

    from avt_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from avt_tpu.train.optim import ReduceLROnPlateau
    from avt_tpu.train.step import TrainState

    params = {"w": jnp.ones((2,))}
    tx = optax.sgd(0.1)
    state = TrainState.create(params, tx)
    tracker = ReduceLROnPlateau(mode="max", patience=2)
    for m in [10.0, 9.0, 8.0]:  # 2 bad epochs after the first best
        state = tracker(state, m)
    assert tracker.num_bad_epochs == 2 and tracker.best == 10.0

    save_checkpoint(str(tmp_path), state, 3.0, host_state=tracker.state_dict())
    fresh = ReduceLROnPlateau(mode="max", patience=2)
    restored = restore_checkpoint(
        str(tmp_path), state, host_template=fresh.state_dict()
    )
    assert restored is not None
    _, epoch, host = restored
    fresh.load_state_dict(host)
    assert epoch == 3.0
    assert fresh.num_bad_epochs == 2 and fresh.best == 10.0

    # old-format checkpoints (no host payload) still restore
    save_checkpoint(str(tmp_path / "old"), state, 1.0)
    r2 = restore_checkpoint(
        str(tmp_path / "old"), state, host_template=fresh.state_dict()
    )
    assert r2 is not None and r2[1] == 1.0


def test_store_video_logs_tb_grid():
    """TB video grids (reference func/train.py:77-102): 6-D '*video' keys
    flattened over (B, #clips), transposed to (N, T, C, H, W), min-max
    normalized; non-video/non-6D keys skipped; encoder failures disable
    the feature instead of crashing training."""
    from avt_tpu.train import loop as loop_mod
    from avt_tpu.train.meters import MetricLogger

    class FakeWriter:
        def __init__(self, fail=False):
            self.calls = []
            self.fail = fail

        def add_video(self, key, vid, step, fps=None):
            if self.fail:
                raise RuntimeError("no moviepy")
            self.calls.append((key, np.asarray(vid), step, fps))

        def add_scalar(self, *a, **k):
            pass

    loop_mod._VIDEO_LOG_DISABLED = False
    w = FakeWriter()
    ml = MetricLogger(writer=w)
    batch = {
        "video": np.arange(2 * 3 * 3 * 4 * 5 * 5, dtype=np.float32).reshape(
            2, 3, 3, 4, 5, 5
        ),
        "target": np.zeros((2,), np.int64),  # skipped: not a video key
        "future_0_video": np.zeros((2, 4, 5)),  # skipped: not 6-D
    }
    loop_mod._store_video_logs(batch, 0, 1000, ml)
    assert len(w.calls) == 1
    key, vid, step, fps = w.calls[0]
    assert key == "video" and step == 0 and fps == 4
    assert vid.shape == (6, 4, 3, 5, 5)  # (B*#clips, T, C, H, W)
    assert vid.min() == 0.0 and vid.max() == 1.0

    # failure path: first error disables, later calls are no-ops
    loop_mod._VIDEO_LOG_DISABLED = False
    wf = FakeWriter(fail=True)
    loop_mod._store_video_logs(batch, 0, 1000, MetricLogger(writer=wf))
    assert loop_mod._VIDEO_LOG_DISABLED
    loop_mod._store_video_logs(batch, 0, 1000, ml)
    assert len(w.calls) == 1  # unchanged
    loop_mod._VIDEO_LOG_DISABLED = False


def test_eval_pad_rows_wraps_when_batch_smaller_than_pad():
    # a ragged final eval batch can be SMALLER than the pad needed
    # (bsz=1, pad_multiple=4): padding must wrap, not slice
    from avt_tpu.evaluate.evaluator import _pad_rows

    batch = {
        "video": np.arange(1 * 2 * 3, dtype=np.float32).reshape(1, 2, 3),
        "uid": ["a"],
        "nested": {"x": np.ones((1, 5))},
    }
    out = _pad_rows(batch, 3)
    assert out["video"].shape[0] == 4
    assert out["nested"]["x"].shape[0] == 4
    assert out["uid"] == ["a", "a", "a", "a"]
    # all padded rows replicate the single source row
    assert np.array_equal(out["video"][1], batch["video"][0])
    assert np.array_equal(out["video"][3], batch["video"][0])
    # and the usual case (pad < bsz) still repeats the leading rows
    big = {"v": np.arange(6).reshape(3, 2)}
    out2 = _pad_rows(big, 1)
    assert out2["v"].shape[0] == 4
    assert np.array_equal(out2["v"][3], big["v"][0])


def test_device_hbm_probe_transient_vs_capability(monkeypatch):
    # a RAISING memory_stats (tunnel blip) must not permanently disable
    # the probe; a stats dict without bytes_in_use (capability gap) must
    from avt_tpu.train import meters as meters_mod

    class FakeDev:
        def __init__(self, behavior):
            self.behavior = behavior

        def memory_stats(self):
            if self.behavior == "raise":
                raise RuntimeError("UNAVAILABLE: tunnel blip")
            if self.behavior == "nocap":
                return {"something_else": 1}
            return {"bytes_in_use": 2 * 1024 * 1024}

    state = {"dev": FakeDev("ok")}
    # device_hbm_mb imports jax inside the function — patch the real module
    monkeypatch.setattr(jax, "local_devices", lambda: [state["dev"]])
    meters_mod._HBM_STATS.update({"broken": False, "t": 0.0, "value": None})
    assert meters_mod.device_hbm_mb() == 2.0
    # transient failure: serves the stale value, not None, and not sticky
    state["dev"] = FakeDev("raise")
    meters_mod._HBM_STATS["t"] = 0.0  # bypass throttle
    assert meters_mod.device_hbm_mb() == 2.0
    assert not meters_mod._HBM_STATS["broken"]
    state["dev"] = FakeDev("ok")
    meters_mod._HBM_STATS["t"] = 0.0
    assert meters_mod.device_hbm_mb() == 2.0
    # capability gap: sticky None
    state["dev"] = FakeDev("nocap")
    meters_mod._HBM_STATS["t"] = 0.0
    assert meters_mod.device_hbm_mb() is None
    assert meters_mod._HBM_STATS["broken"]
    meters_mod._HBM_STATS.update({"broken": False, "t": 0.0, "value": None})
