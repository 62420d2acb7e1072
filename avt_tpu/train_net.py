"""Training entry point.

Parity target: reference train_net.py + func/train.py:539-844 (main):
compose config from conf/ + overrides, build datasets/loaders/model/
optimizer, auto-resume, run the epoch loop with eval every eval_freq, or
test_only evaluation.

Usage:
  python -m avt_tpu.train_net key=value [+key=value ...]
  python -m avt_tpu.train_net --config-file expts/02_ek100_avt_tsn.txt \
      [--run-dir OUTPUTS/x/0] [extra overrides]
"""
from __future__ import annotations

import argparse
import os
import signal
import sys
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from avt_tpu.config import (
    Composer,
    expand_sweeps,
    parse_override,
    parse_overrides_file,
)
from avt_tpu.config.build import (
    build_all_datasets,
    build_model,
    build_optimizer_from_cfg,
    loss_weights,
)
from avt_tpu.utils import get_logger

CONF_DIR = Path(__file__).resolve().parent.parent / "conf"


def _apply_platform_env():
    """Honor AVT_PLATFORM=cpu|tpu|axon before any backend use.

    Needed because env JAX_PLATFORMS alone can be overridden by
    site-level platform registration; an explicit config update always
    wins. Lets `launch --spawn N` children (and users) force the CPU
    backend for multi-process runs on one host."""
    plat = os.environ.get("AVT_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main(cfg: Dict, work_dir: str = ".") -> float:
    _apply_platform_env()
    import jax
    import jax.numpy as jnp

    from avt_tpu.data.loader import DataLoader
    from avt_tpu.evaluate import evaluate
    from avt_tpu.models.import_torch import init_from_model
    from avt_tpu.parallel import (
        make_mesh,
        setup_distributed,
        shard_batch,
        shard_params,
        unshard_results,
    )
    from avt_tpu.train import TrainState, make_eval_step, make_train_step
    from avt_tpu.train.loop import run_training
    from avt_tpu.train.step import make_multi_step

    logger = get_logger("avt_tpu.train")
    seed = cfg.get("seed", 42)
    np.random.seed(seed)

    # Multi-host init (no-op single host), then one (data x model) mesh over
    # every device — the reference's DDP wrap (func/train.py:771-782) is the
    # 'data' axis; 'model' is a tensor-parallel seam it never had.
    # MUST precede enable_compile_cache(): the cache probe reads
    # jax.default_backend(), which initializes XLA, and
    # jax.distributed.initialize() refuses to run after that.
    setup_distributed(logger)

    from avt_tpu.utils import enable_compile_cache

    enable_compile_cache()
    pcfg = cfg.get("parallel") or {}
    n_model = int(pcfg.get("model_size") or 1)
    n_data = jax.device_count() // n_model
    mesh = make_mesh(n_data, n_model)

    def place_batch(batch, batch_axis=0):
        return shard_batch(batch, mesh, batch_axis=batch_axis)

    train_datasets, eval_datasets = build_all_datasets(cfg)
    if len(train_datasets) == 1:
        train_dataset = train_datasets[0]
    else:
        from avt_tpu.data.dataset import ConcatDataset

        train_dataset = ConcatDataset(train_datasets)
    num_classes = {k: len(v) for k, v in train_dataset.classes.items()}
    class_mappings = train_dataset.class_mappings

    # cfg batch_size is per data-parallel replica (reference: per GPU); the
    # loader on each process feeds its 1/process_count share of the global
    # batch, and the 'data' sharding reassembles the global array.
    world_size = jax.process_count()
    batch_size = cfg["train"]["batch_size"] * n_data // world_size
    # null eval bs falls back to 4x train bs — no backprop so memory allows
    # it (reference func/train.py:646-648)
    eval_bs = (cfg["eval"].get("batch_size")
               or cfg["train"]["batch_size"] * 4)
    eval_bs = eval_bs * n_data // world_size
    # SSL future clips: one key per future_<i>_start column the anticipation
    # conversion produced (a fixed cap would silently drop extra futures)
    dfs = [
        getattr(d, "df", None)
        for d in (train_datasets + list(eval_datasets.values()))
    ]
    n_futures = max(
        [
            len([c for c in df.columns if c.startswith("future_") and c.endswith("_start")])
            for df in dfs if df is not None
        ] or [0]
    )
    keys = ["video", "target", "target_subclips", "idx", "uid"] + [
        f"future_{i}_video" for i in range(n_futures)
    ]
    # clip samplers for VideoClips-style datasets (func/train.py:606-634);
    # (None, {None}) for every shipped AVT dataset -> built-in shuffle/shard
    from avt_tpu.data.clip_samplers import build_clip_samplers

    train_sampler, eval_samplers = build_clip_samplers(
        train_dataset, eval_datasets,
        train_bs_multiplier=cfg["data_train"].get("train_bs_multiplier", 5),
        val_clips_per_video=cfg["data_eval"].get("val_clips_per_video", 1),
        rank=jax.process_index(), world_size=world_size,
        shuffle_data=cfg["train"].get("shuffle_data", True),
    )
    train_loader = DataLoader(
        train_dataset,
        batch_size,
        shuffle=cfg["train"].get("shuffle_data", True),
        drop_last=True,
        num_workers=cfg["data_train"].get("workers", 8),
        seed=seed,
        rank=jax.process_index(),
        world_size=world_size,
        keys=keys,
        sampler=train_sampler,
    )
    # Independent per-process feature extraction (the reference's featext
    # semantics: dense_clip_sampler shard_per_worker pre-shards the VIDEOS
    # per rank and data_eval.use_dist_sampler=false turns the distributed
    # sampler off, func/train.py:626-634 + base_video_dataset.py:222-227).
    # Each process then owns a different-sized dataset, so the eval must
    # NOT be a lockstep global-mesh program: loaders stay unsharded and
    # the forward runs on local devices with a local param copy.
    only_featext = bool(cfg["eval"]["eval_fn"].get("only_run_featext"))
    dense_eval_cfg = (cfg.get("dataset_eval") or {}).get(
        "sample_clips_densely_fn") or {}
    independent_eval = world_size > 1 and only_featext and (
        bool(dense_eval_cfg.get("shard_per_worker"))
        or not cfg["data_eval"].get("use_dist_sampler", True)
    )
    if independent_eval and n_model > 1:
        raise ValueError(
            "independent featext needs fully replicated params; "
            "parallel.model_size must be 1"
        )
    eval_loaders = {
        suffix: DataLoader(
            ds, eval_bs, shuffle=False, drop_last=False,
            num_workers=cfg["data_eval"].get("workers", 8),
            rank=0 if independent_eval else jax.process_index(),
            world_size=1 if independent_eval else world_size, keys=keys,
            sampler=eval_samplers[suffix],
            # eval fidelity: failed reads repeat an in-batch row (same idx,
            # averaged away on merge) instead of substituting a random
            # other sample into the metrics
            backfill="repeat",
        )
        for suffix, ds in eval_datasets.items()
    }

    model = build_model(cfg, num_classes, class_mappings)
    batch0 = next(iter(train_loader))
    video0 = jnp.asarray(batch0["video"])

    # Raw-video batches (B, T, H, W, 3 uint8) preprocess ON DEVICE inside
    # the jitted step: resize/crop/augment + subclip fold (data/transforms).
    raw_video = video0.ndim == 5 and video0.shape[-1] == 3
    train_pp_fn = eval_pp_fn = None
    if raw_video:
        from avt_tpu.config.build import build_preprocess_fns

        train_pp_fn, eval_pp_fn = build_preprocess_fns(cfg)
        video0 = train_pp_fn(video0, jax.random.PRNGKey(0))

    params = model.init(
        jax.random.PRNGKey(seed), video0,
        next(iter(batch0["target"].values())).shape,
    )
    if cfg["train"].get("init_from_model"):
        params = init_from_model(params, cfg["train"]["init_from_model"])
    # params onto the mesh: replicated over 'data' (DDP), fat matmuls
    # sharded over 'model'; opt_state inherits via tx.init
    params = shard_params(params, mesh)

    iters_per_epoch = max(len(train_loader), 1)
    tx, _ = build_optimizer_from_cfg(
        cfg, params, iters_per_epoch=iters_per_epoch,
        world_size=n_data,
    )
    # train_eval_op from config (reference func/train.py:787-791)
    op_cfg = cfg.get("train_eval_op") or {}
    cls_cfg = op_cfg.get("cls_loss_acc_fn") or {}
    class_weights = None
    if cls_cfg.get("balance_classes"):
        # inverse-frequency CE weights from dataset class counts
        # (reference train_eval_ops.py:30-41)
        from avt_tpu.train.ops import balance_weights_from_counts

        class_weights = {
            task: balance_weights_from_counts(
                train_dataset.classes_counts[task], n
            )
            for task, n in num_classes.items()
        }
    if op_cfg.get("name") == "pred_future_feat":
        from avt_tpu.config.registry import instantiate
        from avt_tpu.train.step import make_ssl_train_step

        combine = op_cfg.get("combine_future_losses", "min")
        if isinstance(combine, dict):  # reference-style {_target_: torch.min}
            combine = combine["_target_"].rsplit(".", 1)[-1]
        nfutures = len(
            [k for k in batch0 if k.startswith("future_") and k.endswith("_video")]
        )
        if nfutures == 0:
            raise ValueError(
                "train_eval_op=pred_future_feat needs future clips: set "
                "dataset_train.return_future_clips_too=true"
            )
        raw_step = make_ssl_train_step(
            model, tx, loss_weights(cfg), num_classes=num_classes,
            reg_criterion=instantiate(op_cfg["reg_criterion"]),
            nfutures=nfutures,
            future_target=op_cfg.get("future_target", "temp_agg_projected"),
            incur_loss_style=op_cfg.get("incur_loss_style", "separately"),
            combine_future_losses=combine,
            cumulative_future=op_cfg.get("cumulative_future", False),
            class_weights=class_weights,
            use_cls_loss=cls_cfg.get("name", "basic") != "no",
            jit_compile=False,
        )
    else:
        raw_step = make_train_step(
            model, tx, loss_weights(cfg), num_classes=num_classes,
            class_weights=class_weights,
            preprocess_fn=train_pp_fn, jit_compile=False,
        )
    train_step = jax.jit(raw_step, donate_argnums=(0,))
    unroll_steps = int(cfg["train"].get("unroll_steps") or 1)
    multi_step = (
        make_multi_step(raw_step, unroll_steps) if unroll_steps > 1 else None
    )
    eval_step = make_eval_step(
        model, num_classes=num_classes,
        store_endpoint=cfg["eval"]["eval_fn"].get("store_endpoint", "logits"),
        preprocess_fn=eval_pp_fn,
    )
    state = TrainState.create(params, tx)

    # ReduceLROnPlateau: stepped on the val metric after each eval
    # (reference common/scheduler.py:78-85, func/train.py:832-834)
    plateau_fn = None
    scfg = cfg["opt"]["scheduler"]
    if scfg.get("name") == "reduce_lr_on_plateau":
        from avt_tpu.train.optim import ReduceLROnPlateau

        plateau_fn = ReduceLROnPlateau(
            mode=scfg.get("mode", "min"),
            factor=scfg.get("factor", 0.1),
            patience=scfg.get("patience", 10),
            threshold=scfg.get("threshold", 1e-4),
            threshold_mode=scfg.get("threshold_mode", "rel"),
            cooldown=scfg.get("cooldown", 0),
        )

    last_eval = {}

    def eval_fn(state, epoch):
        if independent_eval:
            # reference featext semantics: every process forwards ITS OWN
            # shard — replicated params are pulled to host once and placed
            # on a process-LOCAL mesh (batch sharded over the local
            # devices, so all local chips work), no collectives, no
            # lockstep batch counts across processes
            from jax.sharding import (
                Mesh as _Mesh,
                NamedSharding as _NS,
                PartitionSpec as _P,
            )

            local_devices = jax.local_devices()
            local_mesh = _Mesh(np.asarray(local_devices), ("ldata",))
            rep = _NS(local_mesh, _P())
            sharded = _NS(local_mesh, _P("ldata"))
            params = jax.device_put(
                jax.tree_util.tree_map(np.asarray, state.params), rep
            )

            def local_place(batch, batch_axis=0):
                def place(leaf):
                    leaf = np.asarray(leaf)
                    ok = (
                        leaf.ndim > batch_axis
                        and leaf.shape[batch_axis] % len(local_devices) == 0
                        and batch_axis == 0
                    )
                    return jax.device_put(leaf, sharded if ok else rep)

                return jax.tree_util.tree_map(place, batch)

            metric = evaluate(
                eval_step, params, eval_loaders,
                save_dir=work_dir, epoch=epoch,
                store=cfg["eval"]["eval_fn"].get("store", True),
                only_run_featext=True,
                logger=logger, rank=jax.process_index(),
                place_batch=local_place,
                pad_multiple=len(local_devices),
            )
        else:
            metric = evaluate(
                eval_step, state.params, eval_loaders,
                save_dir=work_dir, epoch=epoch,
                store=cfg["eval"]["eval_fn"].get("store", True),
                only_run_featext=only_featext,
                logger=logger, rank=jax.process_index(),
                place_batch=place_batch,
                gather_results=lambda res: unshard_results(res, mesh),
                # ragged final eval batches only need padding when the
                # batch must be assembled ACROSS processes; single-host
                # GSPMD handles uneven batch dims natively
                pad_multiple=(
                    n_data // world_size if world_size > 1 else 1
                ),
            )
        last_eval["metric"] = metric
        return metric

    if cfg.get("test_only"):
        return eval_fn(state, 0.0)

    tcfg = cfg["train"]["train_one_epoch_fn"]
    # graceful preemption: SIGTERM (TPU-pod/cluster preemption) and SIGUSR1
    # (the timeout pre-notice submitit listens for on SLURM) checkpoint at
    # the next chunk boundary and raise Preempted; the relauncher requeues
    # and auto-resume continues bitwise (reference launch.py:282, §5.3)
    state = run_training(
        graceful_signals=(signal.SIGTERM, signal.SIGUSR1),
        train_step=train_step,
        state=state,
        train_loader=train_loader,
        eval_fn=eval_fn if eval_loaders else None,
        num_epochs=cfg["train"]["num_epochs"],
        multi_step=multi_step,
        unroll_steps=unroll_steps,
        place_batch=place_batch,
        plateau=plateau_fn,
        ckpt_dir=work_dir,
        eval_freq=cfg["train"].get("eval_freq", 1),
        store_best=cfg["train"].get("store_best", False),
        print_freq=tcfg.get("print_freq", 10),
        print_large_freq=tcfg.get("print_large_freq", 1000),
        save_freq=tcfg.get("save_freq"),
        save_freq_min=tcfg.get("save_freq_min"),
        save_intermediates=tcfg.get("save_intermediates", False),
        seed=seed,
        logger=logger,
        rank=jax.process_index(),
        tb_dir=os.path.join(work_dir, "tb"),
    )
    if not eval_loaders:
        return 0.0
    # the loop evals on the reference cadence (after epochs 0, eval_freq,
    # ...); if the FINAL epoch was already evaluated in-loop, return that
    # metric rather than re-running eval — the reference never evals again
    # after the loop (func/train.py:816-841)
    n_ep = cfg["train"]["num_epochs"]
    efreq = cfg["train"].get("eval_freq", 1)
    if "metric" in last_eval and efreq and (n_ep - 1) % efreq == 0:
        return last_eval["metric"]
    return eval_fn(state, float(n_ep))


def cli(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config-file", default=None,
                        help="TXT experiment file of overrides")
    parser.add_argument("--conf-dir", default=str(CONF_DIR))
    parser.add_argument("--run-dir", default=None,
                        help="Work dir (default OUTPUTS/<expt>/<run_id>)")
    parser.add_argument("--run-id", type=int, default=None,
                        help="Pick one sweep variant; default: run all")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    overrides = []
    if args.config_file:
        overrides += parse_overrides_file(args.config_file)
    overrides += [parse_override(o) for o in args.overrides]
    variants = expand_sweeps(overrides)
    composer = Composer(args.conf_dir)
    logger = get_logger("avt_tpu.train")
    results = []
    for run_id, variant in enumerate(variants):
        if args.run_id is not None and run_id != args.run_id:
            continue
        cfg = composer.compose("config", variant)
        if args.run_dir:
            work_dir = args.run_dir
        else:
            expt = (
                Path(args.config_file).stem if args.config_file else "default"
            )
            work_dir = os.path.join("OUTPUTS", expt, str(run_id))
        os.makedirs(work_dir, exist_ok=True)
        logger.info("Run %d -> %s", run_id, work_dir)
        # run.pid lets `launch --kill` stop this run by exact PID — the
        # local-scheduler analog of the reference's scancel (launch.py:229).
        # Under `launch --spawn N` every rank shares the work dir, so
        # non-zero ranks write run.<rank>.pid (reference submitit_local ran
        # one task per GPU with per-task bookkeeping, launch.py:277-280)
        rank = int(
            os.environ.get("JAX_PROCESS_ID") or os.environ.get("RANK") or 0
        )
        pid_name = "run.pid" if rank == 0 else f"run.{rank}.pid"
        pid_file = os.path.join(work_dir, pid_name)
        with open(pid_file, "w") as f:
            f.write(str(os.getpid()))
        try:
            results.append(main(cfg, work_dir))
        except Exception as e:
            from avt_tpu.train.loop import Preempted

            if isinstance(e, Preempted):
                # conventional 128+SIGTERM exit so schedulers/wrappers can
                # distinguish preemption (requeue) from failure
                logger.info("%s — exiting for requeue", e)
                sys.exit(143)
            raise
        finally:
            try:
                os.remove(pid_file)
            except OSError:
                pass
    return results


if __name__ == "__main__":
    cli()
