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


def _save(path: str, payload):
    ckptr = ocp.StandardCheckpointer()
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ckptr.save(os.path.abspath(tmp), payload)
    ckptr.wait_until_finished()
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)


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

    host_state: small dict of host-side scalars saved alongside the
    TrainState (e.g. the ReduceLROnPlateau tracker counters — the reference
    stores scheduler state in its checkpoint too, func/train.py:52-74).
    """
    if rank != 0:
        return
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"state": jax.device_get(state), "epoch": np.asarray(epoch)}
    if host_state:
        payload["host"] = {k: np.asarray(v) for k, v in host_state.items()}
    for name in names:
        _save(os.path.join(ckpt_dir, name), payload)


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
        if host_template is None:
            raise
        # checkpoint written without host state: restore without it
        template.pop("host")
        restored = ckptr.restore(os.path.abspath(path), target=template)
    if host_template is None:
        return restored["state"], float(restored["epoch"])
    return (
        restored["state"],
        float(restored["epoch"]),
        restored.get("host", dict(host_template)),
    )
