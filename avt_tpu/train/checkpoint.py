"""Checkpointing: orbax-backed save/restore of the TrainState + epoch.

Parity target: reference func/train.py:52-74 (store_checkpoint: rolling
checkpoint + optional named intermediates + best) and :760-769
(auto-resume from 'checkpoint' in the run dir, with FRACTIONAL epochs so
intra-epoch saves resume mid-epoch).
"""
from __future__ import annotations

import os
import shutil
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_NAME = "checkpoint"
BEST_NAME = "checkpoint_best"


def _save(path: str, payload, rank: int = 0, multiproc: bool = False):
    """Atomic orbax save: write to <path>.tmp, rename over <path>.

    Multi-process: orbax's (async) save is a COLLECTIVE — every process
    must call it (each host writes its addressable shards; orbax syncs
    internally), so only the filesystem mutations are rank-gated, with
    barriers so no rank races the rename (assumes the usual shared-fs
    checkpoint dir; on one machine that's trivially true)."""
    ckptr = ocp.StandardCheckpointer()
    tmp = path + ".tmp"
    if rank == 0:
        shutil.rmtree(tmp, ignore_errors=True)
    if multiproc:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_tmp_clear:" + path)
    ckptr.save(os.path.abspath(tmp), payload)
    ckptr.wait_until_finished()
    if multiproc:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_written:" + path)
    if rank == 0:
        shutil.rmtree(path, ignore_errors=True)
        os.rename(tmp, path)
    if multiproc:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_renamed:" + path)


def save_checkpoint(
    ckpt_dir: str,
    state,
    epoch: float,
    *,
    names: Tuple[str, ...] = (CKPT_NAME,),
    rank: int = 0,
    host_state: Optional[dict] = None,
):
    """Write the rolling checkpoint (and optional extra names).

    Call from EVERY process (like the reference's save_on_master callers,
    common/utils.py:101-103): single-process saves are rank-gated here,
    multi-process saves are orbax collectives — see _save.

    host_state: small dict of host-side scalars saved alongside the
    TrainState (e.g. the ReduceLROnPlateau tracker counters — the reference
    stores scheduler state in its checkpoint too, func/train.py:52-74).
    """
    multiproc = jax.process_count() > 1
    if not multiproc and rank != 0:
        return
    if rank == 0:
        os.makedirs(ckpt_dir, exist_ok=True)

    # Localize to host numpy wherever possible so the checkpoint is
    # TOPOLOGY-FREE (resumable on any process/device layout — the
    # reference's torch.save state_dicts have the same property). Only
    # params actually sharded ACROSS hosts (model-parallel spanning
    # processes) stay as global arrays, which orbax writes shard-by-shard
    # (that checkpoint then needs matching shardings at restore).
    def _localize(leaf):
        if isinstance(leaf, jax.Array):
            if leaf.is_fully_addressable:
                return np.asarray(jax.device_get(leaf))
            if leaf.is_fully_replicated:
                return np.asarray(leaf.addressable_data(0))
        return leaf

    payload = {
        "state": jax.tree.map(_localize, state),
        "epoch": np.asarray(epoch),
    }
    if host_state:
        payload["host"] = {k: np.asarray(v) for k, v in host_state.items()}
    for name in names:
        _save(os.path.join(ckpt_dir, name), payload, rank=rank,
              multiproc=multiproc)


def restore_checkpoint(
    ckpt_dir: str,
    state_template,
    name: str = CKPT_NAME,
    host_template: Optional[dict] = None,
) -> Optional[Tuple[object, float]]:
    """Restore (state, epoch[, host_state]) or None if absent.

    Pass host_template (same keys as the saved host_state) to ALSO get the
    host-side dict back as a third element.
    """
    path = os.path.join(ckpt_dir, name)
    if not os.path.exists(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    template = {
        "state": jax.device_get(state_template),
        "epoch": np.zeros(()),
    }
    if host_template is not None:
        template["host"] = {
            k: np.asarray(v) for k, v in host_template.items()
        }
    try:
        restored = ckptr.restore(os.path.abspath(path), target=template)
    except Exception:
        if host_template is not None:
            # checkpoint written without host state: restore without it
            template.pop("host")
            restored = ckptr.restore(os.path.abspath(path), target=template)
        else:
            # checkpoint CARRIES host state (e.g. plateau counters) the
            # caller didn't ask for: discover its structure from the
            # checkpoint metadata, restore, and drop it below
            meta = ckptr.metadata(os.path.abspath(path))
            host_meta = meta.item_metadata.tree.get("host")
            if host_meta is None:
                raise
            template["host"] = jax.tree.map(
                lambda m: np.zeros(m.shape, m.dtype), dict(host_meta)
            )
            restored = ckptr.restore(os.path.abspath(path), target=template)
    if host_template is None:
        return restored["state"], float(restored["epoch"])
    return (
        restored["state"],
        float(restored["epoch"]),
        restored.get("host", dict(host_template)),
    )
