"""The training loop.

Parity target: reference func/train.py:539-844 (main/train_one_epoch):
epoch loop with per-epoch reshuffling, periodic + wall-clock checkpointing
(fractional epochs), eval every eval_freq with best-checkpoint tracking,
NaN-loss abort, fractional-epoch resume that fast-forwards the loader.

TPU-native: the entire step (forward, losses, grads, update) is one jitted
program built by make_train_step; the loop only moves host data, meters and
checkpoints.
"""
from __future__ import annotations

import datetime
import math
import signal as _signal
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np

from avt_tpu.train.checkpoint import (
    BEST_NAME,
    CKPT_NAME,
    restore_checkpoint,
    save_checkpoint,
)
from avt_tpu.train.meters import MetricLogger, make_tb_writer
from avt_tpu.train.step import TrainState

_JIT_KEYS = ("video", "target", "target_subclips")
_VIDEO_LOG_DISABLED = False
# multi-host graceful-preemption flags are agreed collectively once per this
# many chunks (not every chunk) to keep the pipeline free of per-chunk
# host barriers; see run_training's preempt_check
PREEMPT_SYNC_EVERY = 16


class Preempted(RuntimeError):
    """A graceful-shutdown signal arrived mid-epoch; the rolling checkpoint
    was written at the batch boundary where training stopped, so a relaunch
    auto-resumes from exactly there (and, with XLA's deterministic replay,
    reproduces the uninterrupted trajectory bitwise —
    test_sigterm_preempt_resume). Parity: submitit's checkpoint-and-requeue
    on SLURM preemption/timeout (reference launch.py:282, SURVEY §5.3)."""

    def __init__(self, epoch: float):
        super().__init__(
            f"preempted at epoch {epoch:.4f}; checkpoint saved"
        )
        self.epoch = epoch


def _store_video_logs(batch, step_id, print_large_freq, metric_logger):
    """TB grids of every 6-D '*video' batch key (reference func/train.py:
    77-102): flatten (B, #clips), transpose to tensorboard's (N, T, C, H, W),
    min-max normalize. Disabled after the first failure (tensorboardX's
    video encoder needs moviepy, which may be absent)."""
    global _VIDEO_LOG_DISABLED
    if (
        metric_logger.writer is None
        or not print_large_freq
        or _VIDEO_LOG_DISABLED
    ):
        return
    for key, video in batch.items():
        arr = np.asarray(video)
        if not key.endswith("video") or arr.ndim != 6:
            continue
        v = arr.reshape((-1,) + arr.shape[2:]).transpose(0, 2, 1, 3, 4)
        v = v.astype(np.float32)
        v -= v.min()
        vmax = v.max()
        if vmax > 0:
            v /= vmax
        try:
            # batches don't carry per-video fps; the reference floors its
            # min-fps estimate at 4 anyway (func/train.py:100-101)
            metric_logger.writer.add_video(key, v, step_id, fps=4)
        except Exception:
            _VIDEO_LOG_DISABLED = True
            return


def _jit_batch(batch):
    """Keys forwarded into the jitted step (incl. SSL future clips)."""
    return {
        k: v for k, v in batch.items()
        if k in _JIT_KEYS or (k.startswith("future_") and k.endswith("_video"))
    }


def train_one_epoch(
    train_step: Callable,
    state: TrainState,
    loader,
    *,
    epoch: int,
    partial_epoch: float = 0.0,
    rng,
    multi_step: Optional[Callable] = None,
    unroll_steps: int = 1,
    place_batch: Optional[Callable] = None,
    metric_logger: Optional[MetricLogger] = None,
    logger=None,
    print_freq: int = 10,
    print_large_freq: int = 1000,
    save_freq: Optional[float] = None,
    save_freq_min: Optional[float] = None,
    save_intermediates: bool = False,
    ckpt_dir: Optional[str] = None,
    last_saved_time: Optional[datetime.datetime] = None,
    rank: int = 0,
    writer=None,
    host_state_fn: Optional[Callable] = None,
    preempt_check: Optional[Callable[[], bool]] = None,
):
    """Run (the rest of) one epoch; returns (state, last_saved_time).

    preempt_check: polled once per chunk; when it turns true the in-flight
    chunk is drained, the rolling checkpoint is written at the current
    batch boundary, and Preempted is raised (graceful SIGTERM handling).

    The hot path dispatches `unroll_steps` batches per device call through
    `multi_step` (lax.scan inside one XLA program) so the host never syncs
    per step — the per-dispatch overhead and the loss fetch amortize over K
    steps. Short tails (epoch end / fractional resume remainders) fall back
    to single `train_step` calls.

    place_batch(batch, batch_axis) puts host arrays onto the mesh with the
    batch dim sharded on 'data' (None = feed numpy and let jit transfer).
    """
    metric_logger = metric_logger or MetricLogger(logger=logger, writer=writer)
    batches_per_epoch = len(loader)
    # The stored fraction is always consumed_batches/batches_per_epoch, so
    # round() recovers the exact count. Deliberate delta vs the reference's
    # int() truncation (func/train.py:165-175), which re-applies one batch
    # whenever the fraction's float repr rounds down (e.g. 1/5 -> 0.1999..):
    # with XLA's deterministic replay that would break the bitwise resume
    # guarantee (test_crash_resume_trajectory_equivalence).
    partial_iters = int(round(batches_per_epoch * partial_epoch))
    last_saved_time = last_saved_time or datetime.datetime.now()
    save_freq_steps = (
        int(save_freq * batches_per_epoch) if save_freq else None
    )
    it = iter(loader)
    for _ in range(partial_iters):  # fast-forward a fractional resume
        next(it)
    K = max(1, unroll_steps) if multi_step is not None else 1

    def chunked():
        buf = []
        for batch in it:
            buf.append(batch)
            if len(buf) == K:
                yield buf
                buf = []
        if buf:
            yield buf

    n_chunks = -(-(batches_per_epoch - partial_iters) // K)
    step_id = epoch * batches_per_epoch + partial_iters
    # bucket counter so chunked dispatch preserves the reference's
    # "save every save_freq*iters steps" cadence (func/train.py:176-201);
    # initialized so the first chunk saves ONLY on an exact boundary
    # (reference: step_id % save_freq_steps == 0), not on every epoch start
    last_save_bucket = -1
    if save_freq_steps:
        last_save_bucket = step_id // save_freq_steps
        if step_id % save_freq_steps == 0:
            last_save_bucket -= 1

    # One-chunk-deep software pipeline: the metrics of chunk i are fetched
    # only AFTER chunk i+1 has been dispatched, so the host's stacking +
    # transfer of the next chunk overlaps the device computing the current
    # one (JAX dispatch is async; the fetch is the only sync point). The
    # NaN abort therefore fires one chunk late — same abort, one chunk of
    # extra compute.
    pending = None  # (per_step device metric trees, n_steps, bs, step_id0)
    last_dispatch = time.time()

    def drain(entry):
        nonlocal last_dispatch
        per_step, n_steps, batch_size, sid0 = entry
        per_step = [jax.tree.map(np.asarray, m) for m in per_step]  # sync
        dt = time.time() - last_dispatch
        last_dispatch = time.time()
        for m in per_step:
            loss = float(m["loss"])
            if math.isnan(loss):
                raise ValueError("The loss is NaN!")
            metric_logger.update(loss=loss)
            for k, v in m.items():
                if k.startswith("acc"):
                    metric_logger.update(n=batch_size, **{k: float(v)})
                elif k.startswith("loss/"):
                    metric_logger.update(**{k: float(v)})
        metric_logger["clips/s"].update(batch_size * n_steps / dt)
        if (sid0 // K) % print_freq == 0:
            for k, v in per_step[-1].items():
                metric_logger.write_scalar(
                    f"train_per_iter/{k}", float(v), sid0 + n_steps - 1
                )

    n_procs = jax.process_count()
    chunk_idx = -1
    for chunk in metric_logger.log_every(
        chunked(), print_freq, f"Epoch [{epoch}]", total=n_chunks
    ):
        chunk_idx += 1
        cur_epoch = step_id / batches_per_epoch
        if preempt_check is not None and preempt_check():
            if pending is not None:
                drain(pending)
                pending = None
            if ckpt_dir:
                save_checkpoint(
                    ckpt_dir, state, cur_epoch, rank=rank,
                    host_state=host_state_fn() if host_state_fn else None,
                )
            raise Preempted(cur_epoch)
        now = datetime.datetime.now()
        mins_since = (now - last_saved_time).total_seconds() / 60.0
        time_due = bool(save_freq_min and mins_since >= save_freq_min)
        if save_freq_min and n_procs > 1:
            # save_checkpoint is a cross-host collective, but wall clocks
            # skew across hosts — a host-local time trigger would let host
            # A enter the save barrier while host B dispatches the next
            # chunk's psums (collective mismatch = deadlock). Broadcast
            # rank 0's decision on a fixed chunk schedule instead: every
            # host enters (or skips) each broadcast in lockstep, so the
            # save chunk is agreed. Same pattern as preempt_check.
            if chunk_idx % PREEMPT_SYNC_EVERY == 0:
                from jax.experimental import multihost_utils

                time_due = bool(
                    multihost_utils.broadcast_one_to_all(
                        np.int32(time_due)
                    )
                )
            else:
                time_due = False
        bucket = step_id // save_freq_steps if save_freq_steps else -1
        if ckpt_dir and (
            (save_freq_steps and bucket > last_save_bucket)
            or time_due
        ):
            # drain the in-flight chunk FIRST so its NaN abort fires before
            # the (possibly NaN) state can overwrite the rolling checkpoint
            if pending is not None:
                drain(pending)
                pending = None
            names = [CKPT_NAME]
            if save_intermediates:
                names.append(f"{CKPT_NAME}_ep{cur_epoch:.8f}")
            save_checkpoint(
                ckpt_dir, state, cur_epoch, names=tuple(names), rank=rank,
                host_state=host_state_fn() if host_state_fn else None,
            )
            last_saved_time = now
            last_save_bucket = bucket

        # TB video grids once per print_large_freq steps (step_id advances
        # by K per chunk, so fire on the crossing chunk)
        if print_large_freq and step_id % print_large_freq < K:
            _store_video_logs(chunk[0], step_id, print_large_freq,
                              metric_logger)
        jit_chunk = [_jit_batch(b) for b in chunk]
        # xprof-visible step annotation (jax.profiler trace server is
        # served by `avt_tpu.launch --profile`)
        with jax.profiler.StepTraceAnnotation("train", step_num=step_id):
            if len(chunk) == K and K > 1:
                stacked = jax.tree.map(
                    lambda *xs: np.stack(xs), *jit_chunk
                )
                if place_batch is not None:
                    stacked = place_batch(stacked, 1)
                state, metrics = multi_step(
                    state, stacked, jax.random.fold_in(rng, step_id)
                )
                per_step = [
                    jax.tree.map(lambda m, j=j: m[j], metrics)
                    for j in range(len(chunk))
                ]
            else:  # tail (or K == 1): plain per-batch dispatch
                per_step = []
                for j, jb in enumerate(jit_chunk):
                    if place_batch is not None:
                        jb = place_batch(jb, 0)
                    state, m = train_step(
                        state, jb, jax.random.fold_in(rng, step_id + j)
                    )
                    per_step.append(m)
        batch_size = next(iter(chunk[0]["target"].values())).shape[0]
        entry = (per_step, len(chunk), batch_size, step_id)
        if pending is not None:
            drain(pending)
        pending = entry
        step_id += len(chunk)
    if pending is not None:
        drain(pending)
    metric_logger.dump_to_tb(epoch)
    return state, last_saved_time


def run_training(
    *,
    train_step: Callable,
    state: TrainState,
    train_loader,
    eval_fn: Optional[Callable] = None,  # (state, epoch) -> primary metric
    num_epochs: int,
    multi_step: Optional[Callable] = None,
    unroll_steps: int = 1,
    place_batch: Optional[Callable] = None,
    plateau: Optional[Callable] = None,  # (state, metric) -> state
    ckpt_dir: Optional[str] = None,
    eval_freq: int = 1,
    store_best: bool = False,
    print_freq: int = 10,
    print_large_freq: int = 1000,
    save_freq: Optional[float] = None,
    save_freq_min: Optional[float] = 60.0,
    save_intermediates: bool = False,
    seed: int = 42,
    logger=None,
    rank: int = 0,
    tb_dir: Optional[str] = None,
    graceful_signals: Tuple[int, ...] = (),
) -> TrainState:
    """Full training driver with auto-resume (func/train.py:760-840).

    graceful_signals: OS signals (e.g. SIGTERM) that trigger a graceful
    checkpoint-and-exit: the current chunk finishes, the rolling checkpoint
    is written, and Preempted propagates so the launcher can requeue —
    the reference gets this from submitit on SLURM preemption/timeout
    (launch.py:282); on TPU pods the scheduler's SIGTERM plays that role.
    Original handlers are restored on exit; main thread only."""
    writer = make_tb_writer(tb_dir, rank) if tb_dir else None
    # plateau counters persist through checkpoints (the reference stores
    # its scheduler state_dict too, func/train.py:52-74)
    host_state_fn = (
        plateau.state_dict if hasattr(plateau, "state_dict") else None
    )
    start_epoch = 0.0
    if ckpt_dir:
        restored = restore_checkpoint(
            ckpt_dir, state,
            host_template=host_state_fn() if host_state_fn else None,
        )
        if restored is not None:
            state, start_epoch = restored[0], restored[1]
            if host_state_fn and len(restored) > 2:
                plateau.load_state_dict(restored[2])
            if logger:
                logger.info("Resumed from epoch %.4f", start_epoch)
    rng = jax.random.PRNGKey(seed)
    # 0.0 floor + >= tie rule: the reference seeds best_acc1 = 0.0 and
    # stores on acc1 >= best_acc1 (func/train.py:815,826-831), so ties go
    # to the LATEST epoch and the first eval always stores
    best_metric = 0.0
    last_saved = datetime.datetime.now()
    epoch = int(start_epoch)
    partial = start_epoch - epoch
    preempt_sig = {"signum": None}
    orig_handlers = {}

    def _on_signal(signum, frame):
        preempt_sig["signum"] = signum
        if logger:
            logger.info(
                "Signal %d received — will checkpoint and exit at the "
                "next chunk boundary", signum,
            )

    for s in graceful_signals:
        orig_handlers[s] = _signal.signal(s, _on_signal)
    preempt_check = None
    if graceful_signals:
        if jax.process_count() > 1:
            # multi-host: the decision must be COLLECTIVE — if one host
            # raised Preempted while another (whose signal landed a moment
            # later) dispatched the next sharded chunk, the survivor would
            # hang in its collectives until the scheduler SIGKILLs it. An
            # any-reduce of the local flags makes all hosts stop at the
            # same step. Running it every chunk would add a host-synchronous
            # barrier per chunk to the otherwise one-chunk-deep async
            # pipeline, so it fires every PREEMPT_SYNC_EVERY chunks — the
            # counter advances identically on all hosts (same loader
            # length), so every host enters (or skips) each collective in
            # lockstep, and a signal is acted on within N chunks, well
            # inside any scheduler grace period.
            from jax.experimental import multihost_utils

            chunk_counter = {"n": 0}

            def preempt_check():
                n = chunk_counter["n"]
                chunk_counter["n"] = n + 1
                if n % PREEMPT_SYNC_EVERY != 0:
                    return False
                local = np.array(
                    [preempt_sig["signum"] is not None], np.int32
                )
                return bool(multihost_utils.process_allgather(local).any())
        else:
            def preempt_check():
                return preempt_sig["signum"] is not None
    try:
        while epoch < num_epochs:
            train_loader.set_epoch(epoch)
            state, last_saved = train_one_epoch(
                train_step,
                state,
                train_loader,
                epoch=epoch,
                partial_epoch=partial if epoch == int(start_epoch) else 0.0,
                rng=rng,
                multi_step=multi_step,
                unroll_steps=unroll_steps,
                place_batch=place_batch,
                logger=logger,
                print_freq=print_freq,
                print_large_freq=print_large_freq,
                save_freq=save_freq,
                save_freq_min=save_freq_min,
                save_intermediates=save_intermediates,
                ckpt_dir=ckpt_dir,
                last_saved_time=last_saved,
                rank=rank,
                writer=writer,
                host_state_fn=host_state_fn,
                preempt_check=preempt_check,
            )
            partial = 0.0
            if ckpt_dir:
                save_checkpoint(
                    ckpt_dir, state, float(epoch + 1), rank=rank,
                    host_state=host_state_fn() if host_state_fn else None,
                )
                last_saved = datetime.datetime.now()
            # eval on the reference's cadence — after epochs 0, eval_freq,
            # 2*eval_freq, ... (func/train.py:820-825: `epoch % eval_freq`
            # on the 0-based just-finished epoch), with metric = 0 on
            # non-eval epochs feeding best-ckpt and plateau exactly as the
            # reference's acc1 = 0 does
            if eval_fn is not None and eval_freq and epoch % eval_freq == 0:
                metric = eval_fn(state, float(epoch + 1))
                if logger:
                    logger.info(
                        "Epoch %d primary metric: %f", epoch + 1, metric
                    )
                if writer is not None:
                    writer.add_scalar(
                        "eval_per_epoch/primary_metric", metric, epoch + 1
                    )
            else:
                metric = 0.0
            # best checkpoint BEFORE the plateau step — the plateau may
            # rescale the LR inside the state, and the reference stores
            # best first (func/train.py:826-834)
            if store_best and metric >= best_metric and ckpt_dir:
                best_metric = metric
                save_checkpoint(
                    ckpt_dir, state, float(epoch + 1), names=(BEST_NAME,),
                    rank=rank,
                    host_state=host_state_fn() if host_state_fn else None,
                )
            if plateau is not None and eval_fn is not None:
                # ReduceLROnPlateau stepped EVERY epoch on the val metric
                # (0 on non-eval epochs), func/train.py:832-834
                state = plateau(state, metric)
            epoch += 1
    finally:
        for s, h in orig_handlers.items():
            _signal.signal(s, h)
    return state
