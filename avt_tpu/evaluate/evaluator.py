"""Evaluation driver.

Parity target: reference func/train.py:319-429 (evaluate): loop over eval
loaders, append per-batch logits/targets/uids/unreduced-losses to per-rank
H5 files, sync meters, recompute the final metrics FROM THE STORED FILES
(so offline analysis and in-train eval always agree), return the suffixless
dataset's primary metric.
"""
from __future__ import annotations

import os
import shutil
from typing import Callable, Dict, Optional

import jax
import numpy as np

from avt_tpu.evaluate.metrics import final_accuracies_from_results
from avt_tpu.evaluate.results import read_results, store_append_h5
from avt_tpu.train.meters import MetricLogger

RESULTS_SAVE_DIR = "results"

# batch keys forwarded into the jitted eval step
_JIT_KEYS = ("video", "target", "target_subclips")


def _pad_rows(node, pad: int):
    """Repeat rows (wrapping) at the end (dicts recurse; lists too).

    Wrap-around indexing matters: a ragged final batch can be SMALLER than
    the pad needed (bsz=1, pad_multiple=4 -> pad=3), where a plain
    ``arr[:pad]`` slice would under-pad and the batch still wouldn't
    divide pad_multiple.
    """
    if isinstance(node, dict):
        return {k: _pad_rows(v, pad) for k, v in node.items()}
    if isinstance(node, list):
        return node + [node[i % len(node)] for i in range(pad)]
    arr = np.asarray(node)
    idx = np.arange(pad) % arr.shape[0]
    return np.concatenate([arr, arr[idx]], axis=0)


def evaluate(
    eval_step: Callable,
    params,
    data_loaders: Dict[str, object],
    *,
    save_dir: str = ".",
    epoch: float = 0.0,
    store: bool = True,
    only_run_featext: bool = False,
    logger=None,
    rank: int = 0,
    place_batch: Optional[Callable] = None,
    gather_results: Optional[Callable] = None,
    pad_multiple: int = 1,
) -> float:
    """Run evaluation over every loader; return the primary metric of the
    suffix-less ('') loader.

    pad_multiple: multi-process runs need every per-process batch to
    divide its local data-axis device share; a ragged final eval batch is
    padded by REPEATING leading rows — the torchvision DistributedSampler
    the reference wraps eval loaders in pads the same way (func/train.py:
    413 FIXME), and the duplicate idx rows are averaged out by
    read_results' mean-per-idx merge. Online meters see the padded rows,
    exactly like the reference's padded-sampler meters."""
    final_accuracies = {}
    for data_key, loader in data_loaders.items():
        metric_logger = MetricLogger(logger=logger)
        this_save_dir = os.path.join(save_dir, RESULTS_SAVE_DIR + data_key)
        if store and not only_run_featext:
            if rank == 0:
                shutil.rmtree(this_save_dir, ignore_errors=True)
            if jax.process_count() > 1:
                # other ranks must not append before rank 0 clears the dir
                # (reference barriers at func/train.py:300)
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("eval_clear" + data_key)
        for batch in metric_logger.log_every(
            loader, print_freq=50, header=f"[{data_key}] Test:", total=len(loader)
        ):
            if pad_multiple > 1:
                bsz = next(iter(batch["target"].values())).shape[0]
                rem = bsz % pad_multiple
                if rem:
                    batch = _pad_rows(batch, pad_multiple - rem)
            jit_batch = {k: batch[k] for k in _JIT_KEYS if k in batch}
            if place_batch is not None:
                jit_batch = place_batch(jit_batch, 0)
            res = eval_step(params, jit_batch)
            # multi-host: per-sample outputs are sharded across hosts;
            # gather_results pulls THIS host's rows (parallel/mesh.py:
            # unshard_results). device_get would touch non-addressable
            # devices there.
            res = (
                gather_results(res) if gather_results is not None
                else jax.device_get(res)
            )
            batch_size = next(iter(batch["target"].values())).shape[0]
            if store:
                # everything the eval step selected (logits OR feature
                # endpoints) + unreduced losses, like the reference's
                # all_logits (func/train.py:367-390)
                to_store = {
                    # scalars (e.g. mean aux losses) append as (1,) rows
                    k: (np.asarray(v)[None] if np.ndim(v) == 0 else np.asarray(v))
                    for k, v in res.items()
                    if not k.startswith("acc")
                }
                to_store["idx"] = np.asarray(batch["idx"])
                to_store["uid"] = np.asarray(batch["uid"])
                if not only_run_featext:
                    for k, v in batch["target"].items():
                        to_store[f"target/{k}"] = np.asarray(v)
                to_store["epoch"] = np.asarray([epoch])
                store_append_h5(to_store, this_save_dir, rank=rank)
            # meters
            loss_keys = [k for k in res if k.startswith("loss/")]
            total_loss = float(np.sum([np.mean(res[k]) for k in loss_keys]))
            metric_logger.update(loss=total_loss)
            for k, v in res.items():
                if k.startswith("acc"):
                    metric_logger.update(n=batch_size, **{k: float(v)})
                elif k.startswith("loss/"):
                    metric_logger.update(n=batch_size, **{k: float(np.mean(v))})
        n_backfilled = getattr(loader, "backfill_count", 0)
        if n_backfilled and logger is not None:
            # duplicate-idx rows are deduped in the final H5-recomputed
            # metrics, but the online meters saw them — make that visible
            logger.warning(
                "[eval%s] %d failed reads were backfilled this epoch",
                data_key, n_backfilled,
            )
        if only_run_featext:
            continue
        metric_logger.synchronize_between_processes()
        accs = {
            k: m.global_avg for k, m in metric_logger.meters.items()
        }
        if store:
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("eval_store")
            dataset = loader.dataset
            results = read_results(this_save_dir)
            accs.update(
                final_accuracies_from_results(results, dataset.classes_manyshot)
            )
        if logger is not None:
            for k in sorted(accs):
                logger.info("[eval%s] %s: %f", data_key, k, accs[k])
        final_accuracies[data_key] = accs
    if only_run_featext:
        return 0.0
    main = data_loaders[""]
    accs = final_accuracies[""]
    pm = main.dataset.primary_metric
    if pm not in accs:
        # store=False keeps only the online meters (the final metrics are
        # recomputed FROM the stored files); fall back to a top-1 meter
        # instead of discarding the whole evaluation with a KeyError
        fallback = next((k for k in sorted(accs) if k.startswith("acc1")), None)
        if logger is not None:
            logger.warning(
                "primary metric %s needs store=true; returning %s", pm,
                fallback or "0.0",
            )
        return float(accs[fallback]) if fallback else 0.0
    return accs[pm]
