"""Subprocess driver for the whole-trainer differential.

Runs the REAL entry point — ``avt_tpu.train_net.main(cfg, work_dir)`` — on
ONE virtual CPU device, so mesh = 1 device = 1 process and the loop's LR
world-size scaling matches the reference's single-GPU single-process run
(func/train.py:723 ``this_lr * world_size`` with world_size=1). Dumps the
per-iteration loss trace, per-epoch eval metrics, and the final + best
parameters for the parent test (test_diff_whole_trainer.py) to diff
against the reference's own ``func.train.main()``.

A subprocess is required: the test process pins an 8-device CPU mesh at
conftest import, and the platform/device-count choice freezes at first
backend use (see CLAUDE.md).

Usage: python _whole_trainer_worker.py <spec.json> <out.npz>
spec keys: conf_dir, overrides (list of strings), init_ckpt, work_dir
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import ref_harness  # noqa: E402  (for the in-tree fake lmdb)


def main(spec_path: str, out_path: str) -> None:
    with open(spec_path) as f:
        spec = json.load(f)

    import avt_tpu.data.readers as readers

    readers.lmdb = ref_harness._load_fake_lmdb()
    readers.HAVE_LMDB = True

    from avt_tpu.config import Composer, parse_override

    cfg = Composer(spec["conf_dir"]).compose(
        "config", [parse_override(o) for o in spec["overrides"]]
    )
    cfg["train"]["init_from_model"] = [[spec["init_ckpt"]]]

    # --- capture hooks -------------------------------------------------
    losses = []  # per-iteration training loss, in order
    import avt_tpu.train.loop as loop_mod

    orig_ml = loop_mod.MetricLogger

    class RecordingML(orig_ml):
        def update(self, n=1, **kwargs):
            if "loss" in kwargs:
                losses.append(float(kwargs["loss"]))
            return super().update(n=n, **kwargs)

    loop_mod.MetricLogger = RecordingML

    final = {}
    orig_rt = loop_mod.run_training

    def run_training_rec(**kw):
        state = orig_rt(**kw)
        final["state"] = state
        return state

    loop_mod.run_training = run_training_rec

    eval_metrics = []  # (epoch, primary metric) per in-loop eval
    import avt_tpu.evaluate as ev

    orig_eval = ev.evaluate

    def eval_rec(*a, **kw):
        m = orig_eval(*a, **kw)
        eval_metrics.append((float(kw.get("epoch", -1.0)), float(m)))
        return m

    ev.evaluate = eval_rec

    # --- the actual run --------------------------------------------------
    import avt_tpu.train_net as tn

    returned_metric = tn.main(cfg, spec["work_dir"])

    # --- dump --------------------------------------------------------
    state = final["state"]
    out = {
        "losses": np.asarray(losses, np.float64),
        "eval_epochs": np.asarray([e for e, _ in eval_metrics]),
        "eval_metrics": np.asarray([m for _, m in eval_metrics]),
        "returned_metric": np.asarray(returned_metric, np.float64),
    }
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    for path, leaf in flat:
        out["param:" + jax.tree_util.keystr(path)] = np.asarray(leaf)

    from avt_tpu.train.checkpoint import BEST_NAME, restore_checkpoint

    best = restore_checkpoint(spec["work_dir"], state, name=BEST_NAME)
    assert best is not None, "store_best=true wrote no best checkpoint"
    out["best_epoch"] = np.asarray(best[1])
    for path, leaf in jax.tree_util.tree_flatten_with_path(
        best[0].params
    )[0]:
        out["best:" + jax.tree_util.keystr(path)] = np.asarray(leaf)
    np.savez(out_path, **out)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
