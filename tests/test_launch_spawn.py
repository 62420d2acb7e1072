"""`launch --spawn N` end-to-end: TWO coordinator-connected processes run
the REAL trainer (train_net via the launcher, each on 4 virtual CPU
devices) over the synthetic EK100 feature tree, and the result is checked
for equality against a single-process 8-device run of the same config:

  * final parameters (from the rank-0-written checkpoint) match,
  * the merged per-rank H5 results cover exactly the same rows and the
    recomputed metric bundles match (the rank-0 results-dir clear must not
    race rank 1's append — evaluator.py:48-56 sync),
  * per-rank pid files exist for `launch --kill`.

This is the reference's submitit_local surface (launch.py:277-280: one
task per GPU on the local machine) + its cross-rank eval merge
(func/train.py:290-300), upgraded to jax.distributed + GSPMD: the global
batch is assembled across the two processes' loader shards, so the
gradient psum spans both hosts exactly like DDP's all-reduce.
"""
import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from test_diff_whole_trainer import _our_overrides, _write_tree

pytestmark = pytest.mark.slow  # 3 uncached CPU compiles of the same model

REPO = Path(__file__).resolve().parent.parent
CONF_DIR = REPO / "conf"


def _overrides(annot, tmp_path):
    base = [
        o for o in _our_overrides(annot, tmp_path)
        if not o.startswith(("train.batch_size", "train.num_epochs"))
    ]
    # global batch = 1 * 8 data shards on BOTH topologies (1 proc x 8 dev,
    # 2 proc x 4 dev); 12 samples -> 1 train iter/epoch (drop_last)
    return base + ["train.batch_size=1", "train.num_epochs=2"]


def test_spawn_two_process_equals_single_process(tmp_path, monkeypatch):
    annot = _write_tree(tmp_path)
    overrides = _overrides(annot, tmp_path)
    expt = tmp_path / "spawn_smoke.txt"
    expt.write_text("\n".join(overrides) + "\n")

    # children import `lmdb` for real: shim dir with the fake on PYTHONPATH
    shim = tmp_path / "shim"
    shim.mkdir()
    shutil.copyfile(
        Path(__file__).parent / "_fake_lmdb.py", shim / "lmdb.py")
    child_env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    child_env["AVT_PLATFORM"] = "cpu"
    child_env["PYTHONPATH"] = ":".join(
        [str(shim), str(REPO)]
        + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
    )

    def run(n_devices, spawn, out_root, extra=()):
        env = dict(child_env)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_devices}"
        )
        cmd = [sys.executable, "-m", "avt_tpu.launch",
               "-c", str(expt)]
        if spawn:
            cmd += ["--spawn", str(spawn)]
        cmd += list(extra)
        proc = subprocess.run(
            cmd, cwd=str(out_root), env=env, capture_output=True,
            text=True, timeout=1500,
        )
        logs = ""
        for lf in sorted(Path(out_root).glob("OUTPUTS/*/rank*.log")):
            logs += f"\n--- {lf}:\n" + lf.read_text()[-3000:]
        assert proc.returncode == 0, (
            f"launch failed\nstdout:{proc.stdout[-3000:]}\n"
            f"stderr:{proc.stderr[-3000:]}\n{logs}"
        )
        return Path(out_root) / "OUTPUTS" / "spawn_smoke" / "0"

    single_root = tmp_path / "single"
    single_root.mkdir()
    run_dir_1 = run(8, spawn=None, out_root=single_root)

    multi_root = tmp_path / "multi"
    multi_root.mkdir()
    run_dir_2 = run(4, spawn=2, out_root=multi_root)

    # per-rank H5s: rank 1 appended AFTER rank 0's clear (no lost rows)
    assert (run_dir_2 / "results" / "0.h5").exists()
    assert (run_dir_2 / "results" / "1.h5").exists()
    assert (run_dir_1 / "results" / "0.h5").exists()
    assert not (run_dir_1 / "results" / "1.h5").exists()

    from avt_tpu.evaluate.metrics import final_accuracies_from_results
    from avt_tpu.evaluate.results import read_results

    res_1 = read_results(str(run_dir_1 / "results"))
    res_2 = read_results(str(run_dir_2 / "results"))
    np.testing.assert_array_equal(
        np.sort(res_1["idx"]), np.sort(res_2["idx"]))
    order_1 = np.argsort(res_1["idx"], kind="stable")
    order_2 = np.argsort(res_2["idx"], kind="stable")
    for task in ("verb", "noun", "action"):
        np.testing.assert_allclose(
            res_2[f"logits/{task}"][order_2],
            res_1[f"logits/{task}"][order_1],
            rtol=1e-4, atol=1e-5,
            err_msg=f"2-process eval logits/{task} != 1-process",
        )
    accs_1 = final_accuracies_from_results(res_1)
    accs_2 = final_accuracies_from_results(res_2)
    assert set(accs_1) == set(accs_2)
    for k in accs_1:
        np.testing.assert_allclose(accs_2[k], accs_1[k], atol=1e-6,
                                   err_msg=k)

    # final params from each run's rank-0 checkpoint
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree_1 = ckptr.restore(str((run_dir_1 / "checkpoint").resolve()))
    tree_2 = ckptr.restore(str((run_dir_2 / "checkpoint").resolve()))
    assert float(tree_1["epoch"]) == float(tree_2["epoch"]) == 2.0
    import jax

    flat_1 = jax.tree_util.tree_flatten_with_path(
        tree_1["state"]["params"])[0]
    flat_2 = dict(jax.tree_util.tree_flatten_with_path(
        tree_2["state"]["params"])[0])
    assert flat_1 and len(flat_1) == len(flat_2)
    for path, leaf in flat_1:
        np.testing.assert_allclose(
            flat_2[path], np.asarray(leaf), rtol=1e-4, atol=1e-6,
            err_msg=f"param {jax.tree_util.keystr(path)} diverged "
                    "between 1- and 2-process training",
        )

    # --kill bookkeeping: per-rank pid files were written (and cleaned on
    # exit — run.pid removal happens in train_net.cli's finally)
    assert not (run_dir_2 / "run.pid").exists()
    assert not (run_dir_2 / "run.1.pid").exists()
    assert (run_dir_2.parent / "rank0.log").exists()
    assert (run_dir_2.parent / "rank1.log").exists()

    # --- multi-process AUTO-RESUME: relaunch the SAME run dirs with
    # num_epochs=4 — run_training restores the epoch-2 checkpoint into
    # each topology's live state (both ranks on the 2-process side) and
    # trains two more epochs; the resumed trajectories must still agree
    run(8, spawn=None, out_root=single_root, extra=["train.num_epochs=4"])
    run(4, spawn=2, out_root=multi_root, extra=["train.num_epochs=4"])
    tree_1b = ckptr.restore(str((run_dir_1 / "checkpoint").resolve()))
    tree_2b = ckptr.restore(str((run_dir_2 / "checkpoint").resolve()))
    assert float(tree_1b["epoch"]) == float(tree_2b["epoch"]) == 4.0
    flat_1b = jax.tree_util.tree_flatten_with_path(
        tree_1b["state"]["params"])[0]
    flat_2b = dict(jax.tree_util.tree_flatten_with_path(
        tree_2b["state"]["params"])[0])
    moved = 0
    for path, leaf in flat_1b:
        np.testing.assert_allclose(
            flat_2b[path], np.asarray(leaf), rtol=1e-4, atol=1e-6,
            err_msg=f"param {jax.tree_util.keystr(path)} diverged "
                    "after 2-process resume",
        )
        moved += int(
            not np.array_equal(np.asarray(leaf), np.asarray(flat_2[path]))
        )
    assert moved > 0, "resumed run trained no further"


def test_spawn_two_process_ssl_infonce_equals_single_process(tmp_path):
    """SSL (PredFutureFeat + SimclrInfoNCE) under --spawn 2: the InfoNCE
    negatives span the GLOBAL batch assembled from BOTH processes' loader
    shards (the reference's explicit all_gather, loss_fn/simclr_infonce.py:
    146-157, happens inside XLA here), so 2-process == 1-process params is
    exactly the global-batch-negatives claim at the process level."""
    annot = _write_tree(tmp_path)
    # the ssl_nmse whole-trainer topology (mean agg + MLP future + SSL op,
    # whole-clip subclips — the MIL 'together' path wants flat (B, P)
    # projections), with the reg criterion swapped to the collective
    # InfoNCE
    overrides = [
        o for o in _our_overrides(annot, tmp_path, "ssl_nmse")
        if not o.startswith(("train.batch_size", "train.num_epochs"))
    ] + [
        "train.batch_size=1",  # x8 data shards on both topologies
        "train.num_epochs=2",
        "train_eval_op/reg_criterion=simclr_infonce",
        "train_eval_op.incur_loss_style=together",
    ]
    expt = tmp_path / "spawn_ssl.txt"
    expt.write_text("\n".join(overrides) + "\n")

    shim = tmp_path / "shim"
    shim.mkdir()
    shutil.copyfile(
        Path(__file__).parent / "_fake_lmdb.py", shim / "lmdb.py")
    child_env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    child_env["AVT_PLATFORM"] = "cpu"
    child_env["PYTHONPATH"] = ":".join(
        [str(shim), str(REPO)]
        + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
    )

    def run(n_devices, spawn, out_root):
        env = dict(child_env)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_devices}"
        )
        cmd = [sys.executable, "-m", "avt_tpu.launch", "-c", str(expt)]
        if spawn:
            cmd += ["--spawn", str(spawn)]
        proc = subprocess.run(
            cmd, cwd=str(out_root), env=env, capture_output=True,
            text=True, timeout=1500,
        )
        logs = ""
        for lf in sorted(Path(out_root).glob("OUTPUTS/*/rank*.log")):
            logs += f"\n--- {lf}:\n" + lf.read_text()[-3000:]
        assert proc.returncode == 0, (
            f"launch failed\nstdout:{proc.stdout[-3000:]}\n"
            f"stderr:{proc.stderr[-3000:]}\n{logs}"
        )
        return Path(out_root) / "OUTPUTS" / "spawn_ssl" / "0"

    single_root = tmp_path / "single"
    single_root.mkdir()
    run_dir_1 = run(8, spawn=None, out_root=single_root)
    multi_root = tmp_path / "multi"
    multi_root.mkdir()
    run_dir_2 = run(4, spawn=2, out_root=multi_root)

    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree_1 = ckptr.restore(str((run_dir_1 / "checkpoint").resolve()))
    tree_2 = ckptr.restore(str((run_dir_2 / "checkpoint").resolve()))
    assert float(tree_1["epoch"]) == float(tree_2["epoch"]) == 2.0
    flat_1 = jax.tree_util.tree_flatten_with_path(
        tree_1["state"]["params"])[0]
    flat_2 = dict(jax.tree_util.tree_flatten_with_path(
        tree_2["state"]["params"])[0])
    assert flat_1 and len(flat_1) == len(flat_2)
    # the project head must exist (the NCE path was active)
    assert any("project" in jax.tree_util.keystr(p) for p, _ in flat_1)
    for path, leaf in flat_1:
        np.testing.assert_allclose(
            flat_2[path], np.asarray(leaf), rtol=1e-4, atol=1e-6,
            err_msg=f"param {jax.tree_util.keystr(path)} diverged "
                    "between 1- and 2-process SSL training",
        )
