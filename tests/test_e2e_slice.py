"""End-to-end minimum slice (the expts/02 topology, synthetic data):

EK100-style annotations + npy feature store where the pre-action window
carries a class-dependent pattern -> VideoDataset -> DataLoader ->
AVTModel(identity backbone + AVT-h) -> jitted train step -> evaluator with
H5 sink -> final_acc/action/AR5 -> checkpoint + fractional resume.
"""
import os
import signal

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from avt_tpu.data import NpyFeatsReader, VideoDataset, convert_to_anticipation
from avt_tpu.data.loader import DataLoader, collate
from avt_tpu.evaluate import evaluate, read_results
from avt_tpu.losses import mse
from avt_tpu.models import (
    AVTh,
    AVTModel,
    IdentityAgg,
    IdentityBackbone,
    LinearClassifier,
)
from avt_tpu.train import TrainState, build_optimizer, make_eval_step, make_train_step
from avt_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from avt_tpu.train.loop import run_training

N_CLS = 6
C = 32
FPS = 30.0


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    """Synthetic EK-ish corpus: the 12 s before an action carries its class."""
    tmp = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(0)
    rows = []
    feats = {}
    uid = 0
    for v in range(3):
        n_frames = 12000
        arr = rng.normal(scale=0.3, size=(n_frames, C)).astype(np.float32)
        t = 20.0
        while t < n_frames / FPS - 30:
            cls = int(rng.integers(N_CLS))
            # pattern in the observed window [t-12, t]
            lo, hi = int((t - 12) * FPS), int(t * FPS)
            arr[lo:hi, cls] += 3.0
            rows.append(
                dict(
                    uid=uid,
                    video_path=f"V{v:02d}.MP4",
                    start=t,
                    end=t + 2.0,
                    verb_class=cls % 2,
                    noun_class=cls % 3,
                    action_class=cls,
                    participant_id=f"P{v:02d}",
                )
            )
            uid += 1
            t += 16.0
        feats[f"V{v:02d}"] = arr
        np.save(tmp / f"V{v:02d}.npy", arr)
    df = pd.DataFrame(rows)
    return tmp, df


def _make_ds(root, df, train):
    return VideoDataset(
        df.copy(),
        root=str(root),
        frames_per_clip=10,
        frame_rate=1.0,
        subclips_options={"num_frames": 1, "stride": 1},
        reader=NpyFeatsReader(str(root), read_type="normal"),
        label_type=["action"],
        sample_strategy="last_clip",
        conv_to_anticipate_fn=lambda d: convert_to_anticipation(d, 1.0, 10.0),
        load_seg_labels=True,
        action_classes={f"a{i}": i for i in range(N_CLS)},
        random_seed=42 if train else 43,
    )


def _make_model():
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
        classifiers={"action": LinearClassifier(out_features=N_CLS)},
        num_classes=(("action", N_CLS),),
        backbone_dim=C,
        dropout=0.1,
        classifier_on_past=True,
    )


def test_e2e_train_eval_resume(synth, tmp_path):
    root, df = synth
    train_df = df[df.participant_id != "P02"]
    eval_df = df[df.participant_id == "P02"]
    ds_train = _make_ds(root, train_df, True)
    ds_eval = _make_ds(root, eval_df, False)
    assert len(ds_train) > 20 and len(ds_eval) > 8

    loader = DataLoader(
        ds_train, batch_size=16, shuffle=True, drop_last=True, num_workers=4,
        keys=["video", "target", "target_subclips", "idx", "uid"],
    )
    eval_loader = DataLoader(
        ds_eval, batch_size=16, shuffle=False, drop_last=False, num_workers=4,
        keys=["video", "target", "target_subclips", "idx", "uid"],
    )
    model = _make_model()
    batch0 = next(iter(loader))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch0["video"]),
        batch0["target"]["action"].shape,
    )
    ipe = len(loader)
    tx, _ = build_optimizer(
        params,
        lr_wd=[["__all__", 0.005, 1e-6]],
        optimizer_name="sgd",
        scheduler_name="cosine",
        iters_per_epoch=ipe,
        num_epochs=6,
        warmup_epochs=1,
        optimizer_kwargs={"nesterov": True},
    )
    train_step = make_train_step(
        model, tx,
        loss_wts={"cls_action": 1.0, "past_cls_action": 1.0, "feat": 1.0},
        num_classes={"action": N_CLS},
        donate=False,
    )
    eval_step = make_eval_step(model, num_classes={"action": N_CLS})
    state = TrainState.create(params, tx)
    ckpt_dir = str(tmp_path / "run")
    eval_dir = str(tmp_path / "run")

    metrics = {}

    def eval_fn(state, epoch):
        m = evaluate(
            eval_step, state.params, {"": eval_loader},
            save_dir=eval_dir, epoch=epoch,
        )
        metrics[epoch] = m
        return m

    # initial (untrained) metric
    m0 = eval_fn(state, 0.0)
    state = run_training(
        train_step=train_step,
        state=state,
        train_loader=loader,
        eval_fn=eval_fn,
        num_epochs=6,
        ckpt_dir=ckpt_dir,
        eval_freq=3,
        store_best=True,
        save_freq_min=None,
    )
    # reference eval cadence: after epochs 0 and 3 for eval_freq=3
    # (func/train.py:820-825), logged as fractional epochs 1.0 and 4.0
    assert set(metrics) == {0.0, 1.0, 4.0}, metrics
    m_final = metrics[4.0]
    # AR5 with 6 classes: top-5 of 6 -> near-perfect once learned; check it
    # improved a lot over the untrained model
    assert m_final > max(m0 * 1.5, 60.0), (m0, m_final)
    assert int(state.step) == 6 * ipe

    # results H5 exists and parses
    res = read_results(os.path.join(eval_dir, "results"))
    assert "logits/action" in res and res["logits/action"].shape[1] == N_CLS

    # --- resume path: restored state continues from where it stopped -----
    restored = restore_checkpoint(ckpt_dir, state)
    assert restored is not None
    r_state, r_epoch = restored
    assert r_epoch == 6.0
    assert int(r_state.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(r_state.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )

    # fractional checkpoint + resume fast-forward smoke
    save_checkpoint(ckpt_dir, state, 6.5)
    r_state2, r_epoch2 = restore_checkpoint(ckpt_dir, state)
    assert r_epoch2 == 6.5


class _CrashingLoader:
    """Loader proxy that simulates a preemption: raises before yielding the
    crash_at-th batch (counted across epochs), once."""

    def __init__(self, inner, crash_at):
        self.inner = inner
        self.crash_at = crash_at
        self.count = 0
        self.armed = True

    def __len__(self):
        return len(self.inner)

    def set_epoch(self, epoch):
        self.inner.set_epoch(epoch)

    def __iter__(self):
        for batch in self.inner:
            if self.armed and self.count == self.crash_at:
                self.armed = False
                raise RuntimeError("simulated preemption")
            self.count += 1
            yield batch


def _make_run(synth, tmp_path, run):
    """A fresh (train_step, initial state, deterministic loader, ckpt dir)
    quadruple for the resume-equivalence tests — every call reproduces the
    identical initialization and batch sequence."""
    model = _make_model()
    ds = _make_ds(synth[0], synth[1][synth[1].participant_id != "P02"],
                  True)
    loader = DataLoader(
        ds, batch_size=8, shuffle=True, drop_last=True, num_workers=2,
        keys=["video", "target", "target_subclips", "idx", "uid"],
    )
    batch0 = next(iter(loader))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch0["video"]),
        batch0["target"]["action"].shape,
    )
    tx, _ = build_optimizer(
        params, lr_wd=[["__all__", 0.005, 1e-6]], optimizer_name="sgd",
        scheduler_name="cosine", iters_per_epoch=len(loader),
        num_epochs=2, warmup_epochs=1,
    )
    step = make_train_step(
        model, tx,
        loss_wts={"cls_action": 1.0, "past_cls_action": 1.0, "feat": 1.0},
        num_classes={"action": N_CLS}, donate=False,
    )
    return step, TrainState.create(params, tx), loader, str(tmp_path / run)


_RESUME_KW = dict(num_epochs=2, save_freq=0.4, save_freq_min=None,
                  print_freq=1)


def _assert_states_equal(final_a, final_b, n_steps):
    assert int(final_a.step) == int(final_b.step) == n_steps
    for a, b in zip(jax.tree.leaves(final_a.params),
                    jax.tree.leaves(final_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(final_a.opt_state),
                    jax.tree.leaves(final_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crash_resume_trajectory_equivalence(synth, tmp_path):
    """Killing training mid-epoch and auto-resuming from the rolling
    checkpoint reproduces the uninterrupted run EXACTLY: per-step rng =
    fold_in(step_id), seeded per-epoch reshuffle, and the fractional
    fast-forward replay the identical batch/rng sequence, so final params,
    optimizer state, and step count are bitwise-equal. Pins the reference's
    resume semantics (func/train.py:165-201,760-769) at full strength —
    the reference itself only *approximately* resumes (its fast-forward
    re-consumes the sampler but CUDA nondeterminism breaks bitwise equality
    there; XLA replay is exact)."""
    make = lambda run: _make_run(synth, tmp_path, run)  # noqa: E731
    common = _RESUME_KW

    # run A: straight through
    step, state, loader, ckpt = make("straight")
    assert len(loader) >= 4
    final_a = run_training(train_step=step, state=state, train_loader=loader,
                           ckpt_dir=ckpt, **common)

    # run B: crash mid-epoch-1 (after a fractional checkpoint), then resume
    step, state, loader, ckpt = make("crashed")
    crashing = _CrashingLoader(loader, crash_at=len(loader) + 3)
    with pytest.raises(RuntimeError, match="simulated preemption"):
        run_training(train_step=step, state=state, train_loader=crashing,
                     ckpt_dir=ckpt, **common)
    # fresh process: new state template; run_training auto-restores the
    # rolling fractional checkpoint and fast-forwards the loader
    _, state2, _, _ = make("crashed")
    final_b = run_training(train_step=step, state=state2,
                           train_loader=crashing, ckpt_dir=ckpt, **common)

    _assert_states_equal(final_a, final_b, 2 * len(loader))


class _SignalingLoader:
    """Loader proxy that delivers SIGTERM to this process right before
    yielding the kill_at-th batch (counted across epochs), once — the
    graceful handler finishes that chunk, checkpoints, and raises."""

    def __init__(self, inner, kill_at):
        self.inner = inner
        self.kill_at = kill_at
        self.count = 0
        self.armed = True

    def __len__(self):
        return len(self.inner)

    def set_epoch(self, epoch):
        self.inner.set_epoch(epoch)

    def __iter__(self):
        for batch in self.inner:
            if self.armed and self.count == self.kill_at:
                self.armed = False
                os.kill(os.getpid(), signal.SIGTERM)
            self.count += 1
            yield batch


def test_sigterm_preempt_resume(synth, tmp_path):
    """Graceful preemption parity (reference: submitit checkpoint-and-
    requeue on SLURM SIGTERM/timeout, launch.py:282, SURVEY §5.3): SIGTERM
    mid-epoch makes run_training finish the in-flight chunk, write the
    rolling checkpoint at that batch boundary, and raise Preempted; a
    relaunch auto-resumes and the final state is bitwise-identical to an
    uninterrupted run. Also checks the previous SIGTERM disposition is
    restored afterwards."""
    from avt_tpu.train.loop import Preempted

    make = lambda run: _make_run(synth, tmp_path, run)  # noqa: E731
    common = dict(_RESUME_KW, graceful_signals=(signal.SIGTERM,))

    step, state, loader, ckpt = make("straight")
    assert len(loader) >= 4
    final_a = run_training(train_step=step, state=state, train_loader=loader,
                           ckpt_dir=ckpt, **common)

    before = signal.getsignal(signal.SIGTERM)
    step, state, loader, ckpt = make("preempted")
    signaling = _SignalingLoader(loader, kill_at=len(loader) + 2)
    with pytest.raises(Preempted) as ei:
        run_training(train_step=step, state=state, train_loader=signaling,
                     ckpt_dir=ckpt, **common)
    assert 1.0 < ei.value.epoch < 2.0  # stopped mid-epoch-1, ckpt written
    assert signal.getsignal(signal.SIGTERM) is before

    _, state2, _, _ = make("preempted")
    final_b = run_training(train_step=step, state=state2,
                           train_loader=signaling, ckpt_dir=ckpt, **common)
    _assert_states_equal(final_a, final_b, 2 * len(loader))


def test_collate_static_shapes(synth):
    root, df = synth
    ds = _make_ds(root, df, True)
    items = [ds[i] for i in range(4)]
    batch = collate(items)
    assert batch["video"].shape == (4, 10, C, 1, 1, 1)
    assert batch["target"]["action"].shape == (4,)
    assert batch["target_subclips"]["action"].shape == (4, 10, 1)


def test_loader_backfills_raising_items():
    """A dataset item that RAISES (corrupt video, missing feature) is
    backfilled like a None item — one bad sample must not kill the epoch."""
    from avt_tpu.data.loader import DataLoader

    class Flaky:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            if i == 5:
                raise IOError("corrupt video")
            if i == 7:
                return None
            return {"x": np.full((2,), i, np.float32)}

    loader = DataLoader(Flaky(), 4, shuffle=False, drop_last=True,
                        num_workers=2, keys=["x"])
    batches = list(loader)
    assert len(batches) == 3
    seen = np.concatenate([b["x"][:, 0] for b in batches])
    assert len(seen) == 12
    assert 5.0 not in seen and 7.0 not in seen  # both replaced
