"""WHOLE-TRAINER differential: reference ``func.train.main()`` raced
head-to-head against ``avt_tpu.train_net.main()``.

Every lower integration level is pinned elsewhere (datasets e2e, losses,
grads, 6-step trajectories, schedulers, metrics-from-H5). This test runs
the two actual entry points — the reference's full main with its epoch
loop, eval cadence, best-checkpoint tracking and loss_wts plumbing from
raw config (func/train.py:539-844), and ours (train_net.py:main) — on the
SAME synthetic EK100 feature tree from the SAME initial weights with a
pinned (shuffle-off) batch order, and asserts:

  1. the per-iteration training-loss traces match (num_epochs * ipe),
  2. the per-epoch eval primary metrics (AR5) match,
  3. the final-epoch eval H5 logits and the recomputed metric bundles
     match,
  4. best-checkpoint selection picks the same epoch,
  5. the final parameters agree leaf-for-leaf (with full tree coverage).

The reference side runs in-process via ref_harness (initial_setup is
shimmed to CPU + a 1-process gloo group so its unconditional
dist.barrier() at func/train.py:300 works, exactly like a single-GPU
submitit launch). Our side runs the real CLI path in a SUBPROCESS on a
single virtual CPU device (tests/_whole_trainer_worker.py) so the mesh is
1-device/1-process and the LR world-size scaling matches the reference's
world_size=1 (func/train.py:723).

Deliberate scope pins: batch divides the dataset exactly (our train
loader uses drop_last=True for static TPU shapes, the reference's is
False — docs/MIGRATION.md); dropout 0 so both train-mode forwards are
deterministic.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import ref_harness

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONF_DIR = os.path.join(REPO, "conf")

# ---- shared shape ----------------------------------------------------
C_FEAT = 16          # lmdb feature channels == backbone_dim
# every task needs >= 5 classes: the reference's compute_accuracy
# (notebooks/utils.py:262) argpartitions top-5 unconditionally
N_VERB, N_NOUN, N_ACT = 6, 5, 30
T_FRAMES = 10
BS = 3               # 12 samples -> exactly 4 iters/epoch on both sides
N_EPOCHS = 3
LR, WD, ETA_MIN = 0.02, 1e-4, 1e-5
WARMUP_EPOCHS, WARMUP_RATIO = 1, 0.1
LOSS_WTS = {"cls_action": 1.0, "cls_verb": 0.5, "cls_noun": 0.5,
            "feat": 1.0, "pred": 1.0, "reg": 1.0,
            "past_cls_action": 0.0, "past_cls_verb": 0.0,
            "past_cls_noun": 0.0}
AVTH_KW = dict(output_len=1, avg_last_n=1, inter_dim=32, n_layer=2,
               n_head=2, embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)

VIDEOS = {"P01_01": 3600, "P02_03": 2400}  # frames @ 30 fps


def _sec_to_timestr(sec: float) -> str:
    h = int(sec // 3600)
    m = int((sec % 3600) // 60)
    return f"{h:02d}:{m:02d}:{sec % 60:06.3f}"


def _write_tree(tmp_path):
    """EK100-format tree: pkl annotations, class csvs, RULSTM actions.csv
    covering the full 4x3 verb-noun product, one 16-ch lmdb feature store.
    12 anticipation-surviving rows (tau_a=1, tau_o=10), no discards."""
    import pandas as pd

    annot = tmp_path / "annot"
    annot.mkdir()
    verbs = [f"verb{i}" for i in range(N_VERB)]
    nouns = [f"noun{i}" for i in range(N_NOUN)]
    (annot / "EPIC_100_verb_classes.csv").write_text(
        "id,key,instances\n"
        + "".join(f"{i},{v},x\n" for i, v in enumerate(verbs))
    )
    (annot / "EPIC_100_noun_classes.csv").write_text(
        "id,key,instances\n"
        + "".join(f"{i},{n},x\n" for i, n in enumerate(nouns))
    )
    (annot / "actions.csv").write_text(
        "id,verb,noun,action\n"
        + "".join(
            f"{i},{i // N_NOUN},{i % N_NOUN},"
            f"{verbs[i // N_NOUN]}_{nouns[i % N_NOUN]}\n"
            for i in range(N_ACT)
        )
    )
    rows = []
    i = 0
    for vid, n_rows in (("P01_01", 7), ("P02_03", 5)):
        for j in range(n_rows):
            start = 15.0 + 10.0 * j
            rows.append((100 + i, vid, start, start + 2.0,
                         i % N_VERB, i % N_NOUN))
            i += 1
    assert len(rows) == 12
    df = pd.DataFrame(
        {
            "uid": [r[0] for r in rows],
            "participant_id": [r[1].split("_")[0] for r in rows],
            "video_id": [r[1] for r in rows],
            "start_timestamp": [_sec_to_timestr(r[2]) for r in rows],
            "stop_timestamp": [_sec_to_timestr(r[3]) for r in rows],
            "verb": [verbs[r[4]] for r in rows],
            "noun": [nouns[r[5]] for r in rows],
            "verb_class": [r[4] for r in rows],
            "noun_class": [r[5] for r in rows],
        }
    ).set_index("uid")
    df.to_pickle(annot / "EPIC_100_train.pkl")
    df.to_pickle(annot / "EPIC_100_validation.pkl")

    lmdb = ref_harness._load_fake_lmdb()
    rng = np.random.default_rng(17)
    env = lmdb.open(str(tmp_path / "rgb"), readonly=False)
    with env.begin(write=True) as txn:
        for vid, n_frames in VIDEOS.items():
            feats = rng.normal(size=(n_frames + 1, C_FEAT)).astype(np.float32)
            for f in range(1, n_frames + 1):
                txn.put(f"{vid}_frame_{f:010d}.jpg".encode(),
                        feats[f].tobytes())
    return annot


class _AttrDict(dict):
    """OmegaConf stand-in: attribute access over nested dicts (the
    reference reads cfg.train.loss_wts via operator.attrgetter)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _to_attr(node):
    if isinstance(node, dict):
        return _AttrDict({k: _to_attr(v) for k, v in node.items()})
    if isinstance(node, list):
        return [_to_attr(v) for v in node]
    return node


def _ref_model_cfg(project_dim_for_nce=None, future="avth",
                   temporal_agg="Identity"):
    if future == "avth":
        future_predictor = {
            "_target_": "models.future_prediction.AVTh",
            "future_pred_loss": {"_target_": "loss_fn.mse.NormedMSE"},
            **AVTH_KW,
        }
    else:
        # the SSL race uses the MLP future predictor: the reference's
        # AVTh crashes when PredFutureFeat calls model(video) with no
        # target_shape (future_prediction.py:123 len(None)); AVTh parity
        # is pinned by the basic variants
        future_predictor = {
            "_target_": "models.future_prediction.MLP",
            "num_layers": 2,
        }
    return _to_attr({
        "backbone": {"_target_": "torch.nn.Identity"},
        "backbone_last_n_modules_to_drop": 0,
        "backbone_dim": C_FEAT,
        "intermediate_featdim": None,
        "temporal_aggregator": {
            "_target_": f"models.temporal_aggregation.{temporal_agg}"},
        "same_temp_agg_dim": False,
        "future_predictor": future_predictor,
        "project_dim_for_nce": project_dim_for_nce,
        "temporal_aggregator_after_future_pred": {
            "_target_": "models.temporal_aggregation.Identity"},
        "dropout": 0.0,
        "use_cls_mappings": False,
        "classifier": {"_target_": "torch.nn.Linear"},
        "add_regression_head": False,
        "classifier_on_past": False,
        "bn": {"eps": 1e-5, "mom": 0.1},
    })


def _dataset_cfg(annot, tmp_path, pkl):
    return {
        "_target_": "datasets.epic_kitchens.EPICKitchens",
        "version": 0.2,
        "root": [str(tmp_path)],
        "annotation_path": [str(annot / pkl)],
        "annotation_dir": str(annot),
        "rulstm_annotation_dir": str(annot),
        "label_type": ["verb", "noun", "action"],
        "sample_strategy": "last_clip",
        "action_labels_fpath": str(annot / "actions.csv"),
        "conv_to_anticipate_fn": {
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 1.0,
            "tau_o": 10.0,
            "drop_style": "correct",
        },
        "reader_fn": {
            "_target_": "datasets.epic_kitchens.EpicRULSTMFeatsReader",
            "lmdb_path": [str(tmp_path / "rgb")],
            "read_type": "normal",
            "warn_if_using_closeby_frame": False,
        },
    }


def _data_cfg(subclip_frames=1):
    return {
        "num_frames": T_FRAMES,
        "frame_rate": 1.0,
        "subclips": {"num_frames": subclip_frames, "stride": subclip_frames},
        "load_seg_labels": False,
        "train_bs_multiplier": 5,
        "val_clips_per_video": 1,
        "workers": 0,
        "scale_h": 128,
        "scale_w": 174,
        "crop_size": None,
        "mean": [0.43216, 0.394666, 0.37645],
        "std": [0.22803, 0.22145, 0.216989],
        "flip_p": 0.5,
        "scale_pix_val": 1.0,
        "reverse_channels": False,
        "color_jitter_brightness": 0.0,
        "color_jitter_contrast": 0.0,
        "color_jitter_saturation": 0.0,
        "color_jitter_hue": 0.0,
        "use_dist_sampler": True,
        "eval_num_crops": 1,
        "eval_flip_crops": False,
    }


# scheduler variants: the flagship warmup-cosine at eval_freq=1, and
# ReduceLROnPlateau at eval_freq=2 — the latter pins the trainer's
# subtler couplings: eval only after epochs 0 and 2 (func/train.py:
# 820-825), acc1=0 fed to BOTH the best-checkpoint rule and the plateau
# step on the non-eval epoch (:826-834, so the plateau REDUCES the LR
# mid-run and epoch-3 losses shift), and best-checkpoint ties.
# ssl_nmse races the PredFutureFeat op (func/train_eval_ops.py:148-231):
# future clips concat into the forward batch, NormedMSE ties
# future_projected to the future clips' temp_agg_projected.
_VARIANTS = ("cosine_ef1", "plateau_ef2", "ssl_nmse")


def _sched_ref(variant):
    if variant in ("cosine_ef1", "ssl_nmse"):
        return {
            "scheduler": {
                "_target_": "common.scheduler.CosineLR",
                "num_epochs": N_EPOCHS - WARMUP_EPOCHS,
                "eta_min": ETA_MIN,
            },
            "warmup": {
                "_target_": "common.scheduler.Warmup",
                "init_lr_ratio": WARMUP_RATIO,
                "num_epochs": WARMUP_EPOCHS,
            },
            "eval_freq": 1,
        }
    return {
        "scheduler": {
            "_target_": "common.scheduler.ReduceLROnPlateau",
            "mode": "max",
            "factor": 0.1,
            "patience": 0,
        },
        "warmup": {
            "_target_": "common.scheduler.Warmup",
            "init_lr_ratio": 0.0,
            "num_epochs": 0,
        },
        "eval_freq": 2,
    }


def _ref_cfg(annot, tmp_path, init_ckpt, variant="cosine_ef1"):
    sched = _sched_ref(variant)
    ssl = variant == "ssl_nmse"
    dataset_train = _dataset_cfg(annot, tmp_path, "EPIC_100_train.pkl")
    if ssl:
        # future clips feed the SSL op (base_video_dataset.py:670-683);
        # eval never samples them (train_eval_ops.py:185-189)
        dataset_train["return_future_clips_too"] = True
    if ssl:
        train_eval_op = {
            "_target_": "func.train_eval_ops.PredFutureFeat",
            "cls_loss_acc_fn": {
                "_target_": "func.train_eval_ops.BasicLossAccuracy",
                "balance_classes": False,
            },
            "reg_criterion": {"_target_": "loss_fn.mse.NormedMSE"},
            "future_target": "temp_agg_projected",
            "incur_loss_style": "separately",
            "combine_future_losses": {"_target_": "torch.min"},
            "cumulative_future": False,
        }
    else:
        train_eval_op = {
            "_target_": "func.train_eval_ops.Basic",
            "cls_loss_acc_fn": {
                "_target_": "func.train_eval_ops.BasicLossAccuracy",
                "balance_classes": False,
            },
            "reg_criterion": None,
        }
    loss_wts = dict(LOSS_WTS)
    if ssl:
        # the op's dead `losses['cls']` passthrough (train_eval_ops.py:201)
        # is fed a zero by the test shim; weight 0 excludes it from the sum
        loss_wts["cls"] = 0.0
    return _to_attr({
        "data_parallel": False,
        "sync_bn": False,
        "test_only": False,
        "dist_backend": "gloo",
        "pytorch": {"video_backend": "video_reader"},
        "dataset_train": dataset_train,
        # ssl: one subclip covering all frames — the op cats future clips
        # into the batch and the reference's future clips lack the #clips
        # dim (base_video_dataset.py:670-683 vs :793), so per-frame
        # subclips can never cat; (T, T) subclips + the unsqueeze shim in
        # _run_reference line the shapes up on the reference side
        "dataset_eval": _dataset_cfg(
            annot, tmp_path, "EPIC_100_validation.pkl"),
        "data_train": _data_cfg(T_FRAMES if ssl else 1),
        "data_eval": _data_cfg(T_FRAMES if ssl else 1),
        "train": {
            "batch_size": BS,
            "init_from_model": [[str(init_ckpt)]],
            "num_epochs": N_EPOCHS,
            "eval_freq": sched["eval_freq"],
            "shuffle_data": False,
            "store_best": True,
            "train_one_epoch_fn": {
                "_target_": "func.train.train_one_epoch",
                "print_freq": 10,
                "print_large_freq": 1000,
                "grad_clip_params": {"max_norm": None, "norm_type": 2},
                "save_freq": None,
                "save_freq_min": None,
                "save_intermediates": False,
                "loss_wts": loss_wts,
            },
        },
        "eval": {
            "batch_size": None,  # -> 4x train bs (func/train.py:646-648)
            "eval_fn": {
                "_target_": "func.train.evaluate",
                "store": True,
                "store_endpoint": "logits",
                "only_run_featext": False,
            },
        },
        "train_eval_op": train_eval_op,
        "model": _ref_model_cfg(
            16 if ssl else None, future="mlp" if ssl else "avth",
            temporal_agg="Mean" if ssl else "Identity"),
        "opt": {
            "lr_wd": [["__all__", LR, WD]],
            "scale_lr_by_bs": False,
            "classifier_only": False,
            "bias_bn_wd_scale": 1.0,
            "grad_clip": {"max_norm": None, "norm_type": 2},
            "optimizer": {
                "_target_": "torch.optim.SGD",
                "momentum": 0.9,
                "nesterov": True,
            },
            "scheduler": sched["scheduler"],
            "warmup": sched["warmup"],
        },
    })


def _sched_ours(variant):
    if variant in ("cosine_ef1", "ssl_nmse"):
        return [
            "train.eval_freq=1",
            "opt/scheduler=cosine",
            f"opt.scheduler.eta_min={ETA_MIN:.8f}",  # no sci-notation str
            f"opt.warmup.num_epochs={WARMUP_EPOCHS}",
            f"opt.warmup.init_lr_ratio={WARMUP_RATIO}",
        ]
    return [
        "train.eval_freq=2",
        "opt/scheduler=reduce_lr_on_plateau",
        "+opt.scheduler.mode=max",
        "opt.scheduler.factor=0.1",
        "opt.scheduler.patience=0",
        "opt.warmup.num_epochs=0",
        "opt.warmup.init_lr_ratio=0.0",
    ]


def _our_overrides(annot, tmp_path, variant="cosine_ef1"):
    ssl_extra = []
    sub = 1
    if variant == "ssl_nmse":
        sub = T_FRAMES  # see the subclips note in _ref_cfg
        ssl_extra = [
            "train_eval_op=pred_future_feat",  # reg_criterion default: mse
            "model.project_dim_for_nce=16",
            "+dataset_train.return_future_clips_too=true",
        ]
    return ssl_extra + [
        f"train.batch_size={BS}",
        f"train.num_epochs={N_EPOCHS}",
        "train.shuffle_data=false",
        "train.store_best=true",
        "train.unroll_steps=1",
        "train.train_one_epoch_fn.save_freq_min=null",
        *[
            f"train.train_one_epoch_fn.loss_wts.{k}={v}"
            for k, v in LOSS_WTS.items()
        ],
        "model/backbone=identity",
        f"model.backbone_dim={C_FEAT}",
        ("model/temporal_aggregator=mean" if variant == "ssl_nmse"
         else "model/temporal_aggregator=identity"),
        "model.dropout=0.0",
        "model.classifier_on_past=false",
        *(
            ["model/future_predictor=mlp",
             "+model.future_predictor.num_layers=2"]
            if variant == "ssl_nmse" else
            ["model/future_predictor=avth",
             *[f"+model.future_predictor.{k}={v}"
               for k, v in AVTH_KW.items()],
             "+model.future_predictor.future_pred_loss="
             "{_target_: loss_fn.mse.NormedMSE}"]
        ),
        "opt/optimizer=sgd",
        f"opt.lr_wd=[[__all__,{LR},{WD}]]",
        "opt.optimizer.nesterov=true",
        *_sched_ours(variant),
        f"data_train.num_frames={T_FRAMES}",
        "data_train.frame_rate=1",
        f"data_train.subclips.num_frames={sub}",
        f"data_train.subclips.stride={sub}",
        "data_train.workers=0",
        f"data_eval.num_frames={T_FRAMES}",
        "data_eval.frame_rate=1",
        f"data_eval.subclips.num_frames={sub}",
        f"data_eval.subclips.stride={sub}",
        "data_eval.workers=0",
        "dataset@dataset_train=epic_kitchens100/anticipation_train",
        "dataset@dataset_eval=epic_kitchens100/anticipation_val",
        "dataset_train.sample_strategy=last_clip",
        "dataset_eval.sample_strategy=last_clip",
        "dataset.epic_kitchens100.common.tau_a=1",
        "dataset.epic_kitchens100.common.tau_o=10",
        "dataset.epic_kitchens100.common.label_type=[verb,noun,action]",
        f"dataset.epic_kitchens100.common.annot_dir={annot}",
        f"dataset.epic_kitchens100.common.rulstm_annot_dir={annot}",
        f"dataset.epic_kitchens100.common.data_dir_extension={tmp_path}",
        "+dataset_train.conv_to_anticipate_fn.drop_style=correct",
        "+dataset_eval.conv_to_anticipate_fn.drop_style=correct",
        "+dataset_train.reader_fn={_target_: "
        "datasets.epic_kitchens.EpicRULSTMFeatsReader, "
        f"lmdb_path: [{tmp_path}/rgb], read_type: normal, "
        "warn_if_using_closeby_frame: false}",
        "+dataset_eval.reader_fn={_target_: "
        "datasets.epic_kitchens.EpicRULSTMFeatsReader, "
        f"lmdb_path: [{tmp_path}/rgb], read_type: normal, "
        "warn_if_using_closeby_frame: false}",
    ]


def _run_reference(ref_cfg, run_dir, monkeypatch, ssl=False):
    """Run the genuine func.train.main() chdir'd into run_dir, capturing
    per-iter losses, per-eval metrics + bundles."""
    ref_harness.install_train_stubs()
    ref_train = ref_harness.import_ref("func.train")
    import torch.distributed as dist

    if ssl:
        # environment shim, not behavior: PredFutureFeat reads
        # losses['cls'] (train_eval_ops.py:201) — a key BasicLossAccuracy
        # never produces (it emits cls_<task>), so the op as shipped
        # KeyErrors with any real cls fn. Feed it a zero; weight 0.0 in
        # loss_wts keeps it out of the weighted sum (func/train.py:212-214)
        ref_ops = ref_harness.import_ref("func.train_eval_ops")
        orig_cls_fwd = ref_ops.BasicLossAccuracy.forward

        # (the op also calls the cls fn with TWO args, train_eval_ops.py:
        # 199, vs BasicLossAccuracy's three — default the third; it is
        # only read on the classifier_on_past path, off here)
        def fwd_with_cls(self, outputs, target, target_subclips=None):
            losses, accs = orig_cls_fwd(self, outputs, target,
                                        target_subclips)
            # per-sample zeros: eval appends unreduced losses to H5
            # (scalar datasets reject the gzip filter)
            bsz = next(iter(target.values())).shape[0]
            losses.setdefault("cls", torch.zeros(bsz))
            return losses, accs

        monkeypatch.setattr(
            ref_ops.BasicLossAccuracy, "forward", fwd_with_cls)

        # environment shim #2: the reference stores the main video with a
        # leading #clips dim but future clips WITHOUT it
        # (base_video_dataset.py:670-683 vs :793), so PredFutureFeat's
        # torch.cat of the two (train_eval_ops.py:190-193) dimension-errors
        # on every shipped data config. Align the ranks so the op's own
        # code can run; our dataset gives futures the #clips dim natively
        # (a documented deliberate delta, avt_tpu/data/dataset.py:397)
        orig_op_call = ref_ops.PredFutureFeat.__call__

        def call_rank_aligned(self, data, train_mode=True):
            if train_mode and isinstance(data, dict):
                vnd = data["video"].ndim
                for k in list(data):
                    if (k.startswith("future_") and k.endswith("_video")
                            and data[k].ndim == vnd - 1):
                        data[k] = data[k].unsqueeze(1)
            return orig_op_call(self, data, train_mode=train_mode)

        monkeypatch.setattr(
            ref_ops.PredFutureFeat, "__call__", call_rank_aligned)

    if not dist.is_initialized():
        # single-process gloo group: the reference barriers unconditionally
        # inside eval (func/train.py:300) — under submitit it always has a
        # group, even world_size=1
        dist.init_process_group(
            "gloo", init_method=f"file://{run_dir}/dist_init",
            world_size=1, rank=0,
        )
    monkeypatch.setattr(
        ref_train, "initial_setup",
        lambda cfg, logger: (
            {"distributed": False, "rank": 0, "world_size": 1, "gpu": 0},
            torch.device("cpu"),
            None,
        ),
    )

    losses, eval_metrics, acc_bundles = [], [], []
    orig_toe = ref_train.train_one_epoch

    def toe_rec(op, optimizer, sched, loader, epoch, partial, mlog,
                logger, last_saved, **kw):
        orig_update = mlog.update

        def update_rec(**kwargs):
            if "loss" in kwargs:
                losses.append(float(kwargs["loss"]))
            return orig_update(**kwargs)

        mlog.update = update_rec
        try:
            return orig_toe(op, optimizer, sched, loader, epoch, partial,
                            mlog, logger, last_saved, **kw)
        finally:
            mlog.update = orig_update

    monkeypatch.setattr(ref_train, "train_one_epoch", toe_rec)

    orig_eval = ref_train.evaluate

    def eval_rec(op, loaders, writer, logger, epoch, **kw):
        m = orig_eval(op, loaders, writer, logger, epoch, **kw)
        eval_metrics.append((float(epoch), float(m)))
        return m

    monkeypatch.setattr(ref_train, "evaluate", eval_rec)

    orig_cfas = ref_train._compute_final_acc_from_stored

    def cfas_rec(results_dir, dataset):
        accs = orig_cfas(results_dir, dataset)
        acc_bundles.append({k: float(v) for k, v in accs.items()})
        return accs

    monkeypatch.setattr(
        ref_train, "_compute_final_acc_from_stored", cfas_rec)

    # environment shim, not behavior: the reference stores raw torch
    # tensors ('loss/...') into h5py via `(None,) + val.shape[1:]`
    # (func/train.py:280); this env's newer torch routes that through
    # torch.Size.__radd__, which rejects the None. Same data, numpy-ified.
    orig_sah = ref_train.store_append_h5

    def sah_np(endpoints, output_dir):
        return orig_sah(
            {k: (v.numpy() if isinstance(v, torch.Tensor) else v)
             for k, v in endpoints.items()},
            output_dir,
        )

    monkeypatch.setattr(ref_train, "store_append_h5", sah_np)

    # environment shim: SmoothedValue.synchronize_between_processes
    # hardcodes device='cuda' (common/log.py:46-48); same all_reduce on cpu
    ref_log = ref_harness.import_ref("common.log")
    import torch.distributed as _dist

    def sync_cpu(self):
        if not _dist.is_available() or not _dist.is_initialized():
            return
        t = torch.tensor([self.count, self.total], dtype=torch.float64)
        _dist.barrier()
        _dist.all_reduce(t)
        t = t.tolist()
        self.count = int(t[0])
        self.total = t[1]

    monkeypatch.setattr(
        ref_log.SmoothedValue, "synchronize_between_processes", sync_cpu)

    monkeypatch.chdir(run_dir)
    ref_train.main(ref_cfg)

    ckpt = torch.load(os.path.join(run_dir, "checkpoint.pth"),
                      map_location="cpu")
    best = torch.load(os.path.join(run_dir, "checkpoint_best.pth"),
                      map_location="cpu")
    return {
        "losses": np.asarray(losses),
        "eval_metrics": eval_metrics,
        "acc_bundles": acc_bundles,
        "final_sd": ckpt["model"],
        "final_epoch": ckpt["epoch"],
        "best_sd": best["model"],
        "best_epoch": best["epoch"],
        "results_dir": os.path.join(run_dir, "results"),
    }


def _run_ours(annot, tmp_path, init_ckpt, run_dir, variant="cosine_ef1"):
    spec = {
        "conf_dir": CONF_DIR,
        "overrides": _our_overrides(annot, tmp_path, variant),
        "init_ckpt": str(init_ckpt),
        "work_dir": str(run_dir),
    }
    spec_path = os.path.join(run_dir, "spec.json")
    out_path = os.path.join(run_dir, "out.npz")
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "_whole_trainer_worker.py"),
         spec_path, out_path],
        capture_output=True, text=True, env=env, timeout=3000,
    )
    assert proc.returncode == 0, (
        f"worker failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-6000:]}"
    )
    return np.load(out_path)


def _converted_tree(sd):
    from avt_tpu.models.import_torch import avt_checkpoint_to_flax

    filtered = {
        k: v.detach().numpy() for k, v in sd.items()
        if not k.endswith(".attn.bias")
        and not k.endswith(".attn.masked_bias")
        # class-mapping matrices are registered buffers on the reference
        # BaseModel; ours are closure constants, not params
        and not k.startswith("cls_map_")
    }
    return avt_checkpoint_to_flax(filtered)


def _assert_params_match(npz, prefix, sd, rtol=2e-3, atol=3e-5):
    import jax

    want = _converted_tree(sd)
    want_flat = jax.tree_util.tree_flatten_with_path(want)[0]
    assert want_flat
    got_keys = {k for k in npz.files if k.startswith(prefix)}
    matched = set()
    for path, val in want_flat:
        # state.params is the full flax variables dict: {'params': {...}}
        key = prefix + "['params']" + jax.tree_util.keystr(path)
        assert key in got_keys, f"our params missing {key}"
        matched.add(key)
        np.testing.assert_allclose(
            npz[key], np.asarray(val), rtol=rtol, atol=atol,
            err_msg=f"param {key} diverged",
        )
    # full coverage both ways: every one of OUR params tracked torch
    assert matched == got_keys, (
        f"uncompared params on our side: {sorted(got_keys - matched)[:8]}"
    )


def _read_h5_logits(results_dir):
    import h5py

    path = os.path.join(results_dir, "0.h5")
    out = {}
    with h5py.File(path, "r") as f:
        for k in ("logits/verb", "logits/noun", "logits/action", "idx"):
            out[k] = np.asarray(f[k])
    return out


@pytest.mark.parametrize("variant", _VARIANTS)
def test_whole_trainer_vs_reference(tmp_path, monkeypatch, variant):
    annot = _write_tree(tmp_path)

    # ---- shared initial weights ------------------------------------
    ref_bm = ref_harness.import_ref("models.base_model")
    ref_ek = ref_harness.import_ref("datasets.epic_kitchens")
    ds_probe = ref_ek.EPICKitchens(
        **{k: v for k, v in
           _dataset_cfg(annot, tmp_path, "EPIC_100_train.pkl").items()
           if k != "_target_"},
        frames_per_clip=T_FRAMES, frame_rate=1.0,
        subclips_options={"num_frames": 1, "stride": 1},
    )
    assert len(ds_probe) == 12, "fixture rows must all survive anticipation"
    torch.manual_seed(7)
    init_model = ref_bm.BaseModel(
        _ref_model_cfg(
            16 if variant == "ssl_nmse" else None,
            future="mlp" if variant == "ssl_nmse" else "avth",
            temporal_agg="Mean" if variant == "ssl_nmse" else "Identity"),
        num_classes={k: len(v) for k, v in ds_probe.classes.items()},
        class_mappings=ds_probe.class_mappings,
    )
    init_ckpt = tmp_path / "init.pth"
    torch.save({"model": init_model.state_dict()}, init_ckpt)

    # ---- reference side ---------------------------------------------
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    ref = _run_reference(_ref_cfg(annot, tmp_path, init_ckpt, variant),
                         str(ref_dir), monkeypatch,
                         ssl=variant == "ssl_nmse")

    # ---- our side (subprocess, 1 CPU device) ------------------------
    ours_dir = tmp_path / "ours"
    ours_dir.mkdir()
    ours = _run_ours(annot, tmp_path, init_ckpt, ours_dir, variant)

    # 1. per-iteration loss traces
    ipe = 12 // BS
    assert len(ref["losses"]) == N_EPOCHS * ipe
    np.testing.assert_allclose(
        ours["losses"], ref["losses"], rtol=5e-4, atol=1e-5,
        err_msg="per-iteration training loss traces diverged",
    )

    # 2. per-epoch eval primary metric (AR5, %) on the variant's cadence
    want_epochs = (
        [1.0, 3.0] if variant == "plateau_ef2" else [1.0, 2.0, 3.0]
    )
    assert [e for e, _ in ref["eval_metrics"]] == want_epochs
    np.testing.assert_array_equal(ours["eval_epochs"], want_epochs)
    np.testing.assert_allclose(
        ours["eval_metrics"], [m for _, m in ref["eval_metrics"]],
        atol=1e-6, err_msg="per-epoch eval AR5 diverged",
    )
    np.testing.assert_allclose(
        float(ours["returned_metric"]), ref["eval_metrics"][-1][1],
        atol=1e-6,
    )

    # 3a. final-epoch H5 logits, row-aligned by idx
    ref_h5 = _read_h5_logits(ref["results_dir"])
    our_h5 = _read_h5_logits(os.path.join(ours_dir, "results"))
    np.testing.assert_array_equal(
        np.sort(our_h5["idx"]), np.sort(ref_h5["idx"]))
    ro = np.argsort(ref_h5["idx"], kind="stable")
    oo = np.argsort(our_h5["idx"], kind="stable")
    for task in ("verb", "noun", "action"):
        np.testing.assert_allclose(
            our_h5[f"logits/{task}"][oo], ref_h5[f"logits/{task}"][ro],
            rtol=2e-3, atol=2e-4,
            err_msg=f"stored eval logits/{task} diverged",
        )

    # 3b. recomputed metric bundle from each side's final H5 dir
    from avt_tpu.evaluate.metrics import final_accuracies_from_results
    from avt_tpu.evaluate.results import read_results

    our_accs = final_accuracies_from_results(
        read_results(os.path.join(ours_dir, "results")),
        {t: dict(v) for t, v in ds_probe.classes_manyshot.items()},
    )
    ref_accs = ref["acc_bundles"][-1]
    assert set(ref_accs) <= set(our_accs), (
        set(ref_accs) - set(our_accs))
    for k in ref_accs:
        np.testing.assert_allclose(
            our_accs[k], ref_accs[k], atol=1e-6,
            err_msg=f"final metric bundle key {k}",
        )

    # 4. best-checkpoint selection
    assert int(ref["best_epoch"]) == int(float(ours["best_epoch"])), (
        ref["best_epoch"], ours["best_epoch"])

    # 5. final (and best) parameters leaf-for-leaf
    assert float(ref["final_epoch"]) == float(N_EPOCHS)
    _assert_params_match(ours, "param:", ref["final_sd"])
    _assert_params_match(ours, "best:", ref["best_sd"])
