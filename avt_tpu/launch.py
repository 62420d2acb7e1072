"""Experiment launcher.

Parity target: reference launch.py (305 LoC): reads a TXT override file,
expands sweeps into run_id variants, launches training, plus utility modes
(tensorboard, delete outputs, debug single-process).

TPU-native deltas: there is no SLURM/submitit layer — a JAX SPMD program is
one process per host, so "launching" is running train_net (optionally under
a multi-host coordinator via JAX_COORDINATOR_ADDRESS + JAX_PROCESS_ID env,
the jax.distributed.initialize convention). Cluster schedulers wrap this
CLI; --print-cmd emits the per-host command for them.

Usage:
  python -m avt_tpu.launch -c expts/02_ek100_avt_tsn.txt        # run all
  python -m avt_tpu.launch -c expts/02.txt -r 1                  # one variant
  python -m avt_tpu.launch -c expts/02.txt -g                    # debug mode
  python -m avt_tpu.launch -c expts/02.txt --tb                  # tensorboard
  python -m avt_tpu.launch -c expts/02.txt --delete              # rm outputs
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
from pathlib import Path

from avt_tpu.config.overrides import expand_sweeps, parse_overrides_file
from avt_tpu.utils import get_logger

OUTPUT_ROOT = "OUTPUTS"


def output_dir_for(config_file: str) -> str:
    return os.path.join(OUTPUT_ROOT, Path(config_file).stem)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config-file", required=True)
    parser.add_argument("-r", "--run-id", type=int, default=None,
                        help="run only this sweep variant")
    parser.add_argument("-g", "--debug", action="store_true",
                        help="debug: data workers=0, tiny print freq")
    parser.add_argument("-l", "--local", action="store_true",
                        help="(default) run locally in this process")
    parser.add_argument("--tb", action="store_true",
                        help="launch tensorboard on the experiment outputs")
    parser.add_argument("--delete", action="store_true",
                        help="delete this experiment's outputs")
    parser.add_argument("--kill", action="store_true",
                        help="stop this experiment's running processes "
                             "(by the exact PIDs in run.pid files)")
    parser.add_argument("--folder", action="store_true",
                        help="serve the experiment outputs over HTTP")
    parser.add_argument("--port", type=int, default=8000,
                        help="port for --folder")
    parser.add_argument("--print-cmd", action="store_true",
                        help="print the per-host command(s) and exit")
    parser.add_argument("--spawn", type=int, default=None, metavar="N",
                        help="spawn N coordinator-connected local train "
                             "processes (the reference submitit_local's "
                             "one-task-per-GPU analog, launch.py:277-280); "
                             "per-rank logs + pid files land in the run dir")
    parser.add_argument("--nodes", type=int, default=None,
                        help="host count for --print-cmd; defaults to the "
                             "config's hydra.launcher.nodes")
    parser.add_argument("--coordinator", default="${COORDINATOR_ADDRESS}",
                        help="host:port of process 0 for multi-host runs")
    parser.add_argument("--profile", action="store_true",
                        help="serve a jax.profiler trace server during the run")
    parser.add_argument("extra", nargs="*", help="extra overrides")
    args = parser.parse_args(argv)
    logger = get_logger("avt_tpu.launch")
    out_dir = output_dir_for(args.config_file)

    if args.delete:
        logger.info("Deleting %s", out_dir)
        shutil.rmtree(out_dir, ignore_errors=True)
        return
    if args.kill:
        # the local-scheduler analog of the reference's `scancel` mode
        # (launch.py:229): each run wrote its exact PID to run.pid
        # (train_net.cli), so no name/pattern matching is involved.
        import signal

        killed = 0
        pid_files = sorted(Path(out_dir).glob("*/run.pid")) + sorted(
            Path(out_dir).glob("*/run.*.pid")  # --spawn non-zero ranks
        )
        for pid_file in pid_files:
            try:
                pid = int(pid_file.read_text().strip())
                os.kill(pid, signal.SIGTERM)
                logger.info("Sent SIGTERM to %d (%s)", pid, pid_file)
                killed += 1
            except (ValueError, ProcessLookupError, PermissionError) as e:
                logger.info("Skipping %s: %s", pid_file, e)
        logger.info("Killed %d run(s)", killed)
        return
    if args.folder:
        # reference launch.py:242: http view of the outputs folder
        subprocess.call(
            [sys.executable, "-m", "http.server", str(args.port),
             "--directory", out_dir]
        )
        return
    if args.tb:
        subprocess.call(
            [sys.executable, "-m", "tensorboard.main", "--logdir", out_dir]
        )
        return

    variants = expand_sweeps(parse_overrides_file(args.config_file))
    logger.info("%s expands to %d run(s)", args.config_file, len(variants))

    extra = list(args.extra)
    if args.debug:
        extra += ["data_train.workers=0", "data_eval.workers=0"]
    cmd_tail = ["-c", args.config_file] + extra
    if args.run_id is not None:
        cmd_tail += ["--run-id", str(args.run_id)]
    if args.print_cmd:
        # multi-host: one command per host with the jax.distributed env
        # (the reference's SLURM nodes x tasks topology, common/utils.py:
        # 106-150; our setup_distributed reads exactly these variables)
        nodes = args.nodes
        if nodes is None:
            nodes = next(
                (int(o.value) for o in variants[0]
                 if o.key == "hydra.launcher.nodes"), 1,
            )
        base = " ".join([sys.executable, "-m", "avt_tpu.train_net"] + cmd_tail)
        if nodes <= 1:
            print(base)
        else:
            for pid in range(nodes):
                print(
                    f"JAX_COORDINATOR_ADDRESS={args.coordinator} "
                    f"JAX_NUM_PROCESSES={nodes} JAX_PROCESS_ID={pid} {base}"
                )
        return
    if args.spawn and args.spawn > 1:
        # submitit_local analog: N coordinator-connected local processes
        # sharing the run dir (rank-0 checkpoints, per-rank H5 + pid files).
        import socket

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        os.makedirs(out_dir, exist_ok=True)
        procs = []
        for rank in range(args.spawn):
            env = dict(os.environ)
            env.update(
                JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                JAX_NUM_PROCESSES=str(args.spawn),
                JAX_PROCESS_ID=str(rank),
            )
            log_path = os.path.join(out_dir, f"rank{rank}.log")
            logf = open(log_path, "w")
            procs.append((
                subprocess.Popen(
                    [sys.executable, "-m", "avt_tpu.train_net"] + cmd_tail,
                    env=env, stdout=logf, stderr=subprocess.STDOUT,
                ),
                logf,
                log_path,
            ))
            logger.info("Spawned rank %d (pid %d) -> %s", rank,
                        procs[-1][0].pid, log_path)
        import time

        rcs = [None] * args.spawn
        while any(rc is None for rc in rcs):
            for i, (p, _, _) in enumerate(procs):
                if rcs[i] is None:
                    rcs[i] = p.poll()
            if any(rc not in (None, 0) for rc in rcs):
                # a dead rank leaves survivors hung in collectives —
                # terminate them (their own SIGTERM handler checkpoints)
                for i, (p, _, _) in enumerate(procs):
                    if rcs[i] is None:
                        p.terminate()
            time.sleep(0.5)
        for rank, (p, logf, log_path) in enumerate(procs):
            logf.close()
            if rcs[rank] != 0:
                logger.error("rank %d exited %d — see %s", rank, rcs[rank],
                             log_path)
        if any(rcs):
            # signal deaths are NEGATIVE returncodes; max() would pick a
            # clean rank's 0 and report a failed run as success
            raise SystemExit(max(abs(rc) for rc in rcs if rc))
        return rcs

    if args.profile:
        import jax

        jax.profiler.start_server(9999)
        logger.info("jax.profiler trace server on :9999")

    from avt_tpu.train_net import cli as train_cli

    return train_cli(cmd_tail)


if __name__ == "__main__":
    main()
