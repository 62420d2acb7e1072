"""Launcher modes, dense clip sampler wiring, ConcatDataset, featext resume."""
import os

import numpy as np
import pandas as pd
import pytest

from avt_tpu.data import NpyFeatsReader, VideoDataset
from avt_tpu.data.anticipation import dense_clip_sampler
from avt_tpu.data.dataset import ConcatDataset
from avt_tpu.evaluate.results import read_saved_results_uids, store_append_h5
from avt_tpu.launch import main as launch_main, output_dir_for


def _df(n=4, vp="V00.MP4"):
    return pd.DataFrame(
        [dict(uid=i + 1, video_path=vp, start=5.0 + 10 * i, end=7.0 + 10 * i,
              verb_class=0, noun_class=0, action_class=i % 2,
              participant_id="P0")
         for i in range(n)]
    )


def test_dense_clip_sampler_shard_and_skip():
    df = _df()
    full, _ = dense_clip_sampler(
        df.copy(), video_len_fn=lambda p: 50.0, clip_len=2.0, stride=10.0,
        keep_orig_clips=False,
    )
    assert len(full) == 5  # ends at 0,10,20,30,40
    assert (full.action_class == -1).all()
    # sharding splits the videos across workers
    df2 = pd.concat([_df(2, "V00.MP4"), _df(2, "V01.MP4")])
    s0, _ = dense_clip_sampler(
        df2.copy(), video_len_fn=lambda p: 50.0, clip_len=2.0, stride=10.0,
        shard=(0, 2), keep_orig_clips=False,
    )
    s1, _ = dense_clip_sampler(
        df2.copy(), video_len_fn=lambda p: 50.0, clip_len=2.0, stride=10.0,
        shard=(1, 2), keep_orig_clips=False,
    )
    assert set(s0.video_id) == {"V00"} and set(s1.video_id) == {"V01"}
    # skip_uids removes already-extracted clips (featext resume)
    skip = {f"V00_{float(0.0)}", f"V00_{float(10.0)}"}
    s2, _ = dense_clip_sampler(
        df.copy(), video_len_fn=lambda p: 50.0, clip_len=2.0, stride=10.0,
        skip_uids=skip, keep_orig_clips=False,
    )
    assert len(s2) == 3


def test_read_saved_results_uids_roundtrip(tmp_path):
    resdir = str(tmp_path)
    store_append_h5(
        {"uid": np.asarray(["a", "b"]), "idx": np.arange(2)}, resdir, rank=0
    )
    uids = read_saved_results_uids(os.path.join(resdir, "0.h5"))
    assert uids == {"a", "b"}
    assert read_saved_results_uids(os.path.join(resdir, "nope.h5")) == set()


def test_concat_dataset(tmp_path):
    arr = np.tile(np.arange(1, 3001, dtype=np.float32)[:, None], (1, 4))
    np.save(tmp_path / "V00.npy", arr)
    np.save(tmp_path / "V01.npy", arr)
    mk = lambda vp: VideoDataset(  # noqa: E731
        _df(3, vp), root=str(tmp_path), frames_per_clip=4, frame_rate=1.0,
        reader=NpyFeatsReader(str(tmp_path), read_type="normal"),
        label_type=["action"], sample_strategy="last_clip",
        action_classes={"a": 0, "b": 1},
    )
    cat = ConcatDataset([mk("V00.MP4"), mk("V01.MP4")])
    assert len(cat) == 6
    assert cat[0]["uid"] == 1 and cat[3]["uid"] == 1
    assert list(cat.classes.keys()) == ["action"]


def test_launcher_print_cmd_and_delete(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    expt = tmp_path / "my_expt.txt"
    expt.write_text("train.batch_size=4\nfold=1,2\n")
    launch_main(["-c", str(expt), "--print-cmd", "-r", "1"])
    out = capsys.readouterr().out
    assert "avt_tpu.train_net" in out and "--run-id 1" in out
    # delete mode removes the output dir
    od = output_dir_for(str(expt))
    os.makedirs(od, exist_ok=True)
    (tmp_path / od / "junk.txt").write_text("x")
    launch_main(["-c", str(expt), "--delete"])
    assert not os.path.exists(od)


def test_launcher_print_cmd_multihost(capsys):
    """--print-cmd emits one per-host command with the jax.distributed env
    (the reference's SLURM nodes topology; setup_distributed reads these)."""
    from avt_tpu.launch import main as launch_main

    launch_main(["-c", "expts/01_ek100_avt.txt", "--print-cmd"])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 4  # expt 01 declares hydra.launcher.nodes=4
    for pid, line in enumerate(out):
        assert f"JAX_PROCESS_ID={pid}" in line
        assert "JAX_NUM_PROCESSES=4" in line
        assert "JAX_COORDINATOR_ADDRESS=" in line
        assert "-m avt_tpu.train_net" in line


def test_launcher_kill_by_pidfile(tmp_path, monkeypatch):
    """--kill SIGTERMs the exact PIDs recorded in run.pid files (the local
    analog of the reference's scancel mode, launch.py:229)."""
    import subprocess
    import sys
    import time

    monkeypatch.chdir(tmp_path)
    expt = tmp_path / "kill_expt.txt"
    expt.write_text("train.batch_size=4\n")
    od = output_dir_for(str(expt))
    run_dir = tmp_path / od / "0"
    run_dir.mkdir(parents=True)
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(600)"])
    (run_dir / "run.pid").write_text(str(proc.pid))
    # a stale pid file (already-dead process) must be skipped gracefully
    stale = tmp_path / od / "1"
    stale.mkdir()
    (stale / "run.pid").write_text("999999")
    try:
        launch_main(["-c", str(expt), "--kill"])
        for _ in range(50):
            if proc.poll() is not None:
                break
            time.sleep(0.1)
        assert proc.poll() is not None, "process not terminated by --kill"
    finally:
        if proc.poll() is None:
            proc.kill()


def test_concat_dataset_unknown_attribute_raises(tmp_path):
    """Delegation is a metadata whitelist, not a catch-all: attribute typos
    must raise instead of silently resolving on datasets[0]."""
    import pytest as _pytest

    arr = np.tile(np.arange(1, 3001, dtype=np.float32)[:, None], (1, 4))
    np.save(tmp_path / "V00.npy", arr)
    ds = VideoDataset(
        _df(3, "V00.MP4"), root=str(tmp_path), frames_per_clip=4,
        frame_rate=1.0,
        reader=NpyFeatsReader(str(tmp_path), read_type="normal"),
        label_type=["action"], sample_strategy="last_clip",
        action_classes={"a": 0, "b": 1},
    )
    cat = ConcatDataset([ds])
    assert cat.primary_metric == ds.primary_metric
    with _pytest.raises(AttributeError):
        cat.primry_metric  # noqa: B018 - typo on purpose
    with _pytest.raises(AttributeError):
        cat.df  # noqa: B018 - exists on the child but is not metadata


def test_launcher_slurm_emitter(tmp_path, monkeypatch, capsys):
    """--slurm writes an sbatch array script: one task per sweep variant,
    hydra.launcher.* keys honored, requeue-on-143 (the submitit
    max_num_timeout analog, reference launch.py:282)."""
    import subprocess

    monkeypatch.chdir(tmp_path)
    expt = tmp_path / "slurm_expt.txt"
    expt.write_text(
        "train.batch_size=4\nfold=1,2,3\n"
        "hydra.launcher.nodes=2\nhydra.launcher.timeout_min=120\n"
        "hydra.launcher.partition=tpu\nhydra.launcher.max_num_timeout=5\n"
    )
    path = launch_main(["-c", str(expt), "--slurm"])
    assert os.path.exists(path)
    script = open(path).read()
    assert "#SBATCH --array=0-2" in script  # 3 sweep variants
    assert "#SBATCH --nodes=2" in script
    assert "#SBATCH --time=120" in script
    assert "#SBATCH --partition=tpu" in script
    assert "#SBATCH --requeue" in script
    # no 'B:' prefix — that would signal only the batch shell, and the
    # graceful-preempt handler lives in the srun task (submitit convention)
    assert "--signal=USR1@120" in script
    assert "--signal=B:" not in script
    assert 'JAX_PROCESS_ID=$SLURM_PROCID' in script
    assert "-lt 5" in script and "scontrol requeue" in script
    assert "--run-id $SLURM_ARRAY_TASK_ID" in script
    # output path must not point into directories nothing pre-creates
    assert "%a/" not in script
    # coordinator port derived from the job id (concurrent jobs sharing a
    # head node must not collide on a constant port)
    assert "SLURM_JOB_ID % 50000" in script
    # the emitted script is valid bash
    subprocess.run(["bash", "-n", path], check=True)
    # pinning -r collapses the array to that variant
    path1 = launch_main(["-c", str(expt), "--slurm", "-r", "1"])
    assert "#SBATCH --array=1-1" in open(path1).read()
    # extra overrides with spaces/braces (the project's own flow-mapping
    # syntax) survive as ONE shell token and the script stays valid bash
    flow = "+dataset_eval.reader_fn={_target_: x, stride: 0.1}"
    path2 = launch_main([
        "-c", str(expt), "--slurm",
        "--sbatch-out", str(tmp_path / "s2.sh"), flow,
    ])
    s2 = open(path2).read()
    assert "{_target_: x, stride: 0.1}" in s2
    subprocess.run(["bash", "-n", path2], check=True)


def test_choose_run_interactive():
    """Interactive local pick (reference launch.py:134-166): shows only the
    sweep-differing params, accepts an index or 'all'."""
    from avt_tpu.config.overrides import expand_sweeps, parse_override
    from avt_tpu.launch import _sweep_diff_labels, choose_run_interactive
    from avt_tpu.utils import get_logger

    variants = expand_sweeps(
        [parse_override("train.batch_size=4"), parse_override("fold=1,2,3")]
    )
    labels = _sweep_diff_labels(variants)
    assert labels == ["fold=1", "fold=2", "fold=3"]
    logger = get_logger("test")
    answers = iter(["bogus", "7", "2"])
    assert choose_run_interactive(
        variants, logger, input_fn=lambda _: next(answers)) == 2
    assert choose_run_interactive(
        variants, logger, input_fn=lambda _: "all") == -1


def test_coordinator_bind_failed(tmp_path):
    from avt_tpu.launch import _coordinator_bind_failed

    good = tmp_path / "rank0.log"
    good.write_text("all fine, training\n")
    assert not _coordinator_bind_failed([str(good)])
    bad = tmp_path / "rank1.log"
    bad.write_text("RuntimeError: Failed to bind: Address already in use\n")
    assert _coordinator_bind_failed([str(good), str(bad)])
    assert not _coordinator_bind_failed([str(tmp_path / "missing.log")])
    # a LONG run that later fails must never be classified as a bind race
    # (that would re-run hours of training), nor may a mere ALREADY_EXISTS
    # status substring trigger it
    assert not _coordinator_bind_failed([str(bad)], elapsed_s=3600.0)
    late = tmp_path / "rank2.log"
    late.write_text("tsl status: ALREADY_EXISTS: checkpoint step 4\n")
    assert not _coordinator_bind_failed([str(late)])


def test_launcher_slurm_submit_and_kill(tmp_path, monkeypatch):
    """--slurm --submit runs sbatch, records the job id, and --kill
    scancels it (the reference's hydra-submitit submit + scancel modes,
    launch.py:229,282) — exercised against stub SLURM binaries."""
    import stat
    import subprocess

    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    (bin_dir / "sbatch").write_text(
        "#!/bin/bash\necho \"Submitted batch job 4242\"\n")
    (bin_dir / "scancel").write_text(
        f"#!/bin/bash\necho \"$@\" > {tmp_path}/scancel_args\n")
    for b in ("sbatch", "scancel"):
        p = bin_dir / b
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")
    monkeypatch.chdir(tmp_path)
    expt = tmp_path / "submit_expt.txt"
    expt.write_text("train.batch_size=4\n")

    job_id = launch_main(["-c", str(expt), "--slurm", "--submit"])
    assert job_id == "4242"
    od = output_dir_for(str(expt))
    assert (tmp_path / od / "slurm_job_ids").read_text().split() == ["4242"]

    launch_main(["-c", str(expt), "--kill"])
    assert (tmp_path / "scancel_args").read_text().split() == ["4242"]
    assert not (tmp_path / od / "slurm_job_ids").exists()
