"""End-to-end trainer smoke on the CURRENT JAX backend (TPU or CPU).

Fabricates a tiny learnable EK100-shaped dataset (RULSTM-style csv
annotations + npy feature store), then drives the REAL CLI path:
compose(conf/) -> train_net.main -> jitted training -> eval -> H5 -> AR5.
The synthetic task plants the class id in the feature channels of the
pre-action window, so a couple of epochs must push AR5 far above chance.

Usage:  python tools/smoke_train.py [--epochs 4] [--workdir DIR]
Exit code 0 iff the final primary metric clears the learnability bar.
"""
import argparse
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CLS = 6
C = 16
FPS = 30.0


def make_dataset(root: Path):
    annot = root / "annot"
    annot.mkdir(parents=True)
    (annot / "EPIC_100_verb_classes.csv").write_text(
        "id,key\n" + "\n".join(f"{i},v{i}" for i in range(3))
    )
    (annot / "EPIC_100_noun_classes.csv").write_text(
        "id,key\n" + "\n".join(f"{i},n{i}" for i in range(2))
    )
    (annot / "actions.csv").write_text(
        "id,verb,noun,action\n"
        + "\n".join(f"{i},{i % 3},{i % 2},a{i}" for i in range(N_CLS))
    )
    rng = np.random.default_rng(0)
    feats = root / "feats"
    feats.mkdir()
    rows_tr, rows_ev = [], []
    uid = 0
    for v in range(3):
        n_frames = 9000
        arr = rng.normal(scale=0.3, size=(n_frames, C)).astype(np.float32)
        t = 20.0
        while t < n_frames / FPS - 20:
            cls = int(rng.integers(N_CLS))
            lo, hi = int((t - 12) * FPS), int(t * FPS)
            arr[lo:hi, cls] += 3.0
            line = (
                f"{uid},P0{v}_01,{int(t*FPS)},{int((t+2)*FPS)},"
                f"{cls%3},{cls%2},{cls}"
            )
            (rows_ev if v == 2 else rows_tr).append(line)
            uid += 1
            t += 15.0
        np.save(feats / f"P0{v}_01.npy", arr)
    (annot / "training.csv").write_text("\n".join(rows_tr))
    (annot / "validation.csv").write_text("\n".join(rows_ev))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--min-metric", type=float, default=60.0,
                    help="AR5 bar the run must clear (chance is ~17)")
    args = ap.parse_args()

    from avt_tpu.config import Composer, parse_override
    from avt_tpu.train_net import CONF_DIR, main as train_main
    from avt_tpu.utils import enable_compile_cache

    enable_compile_cache()
    tmp = Path(tempfile.mkdtemp(prefix="avt_smoke_"))
    make_dataset(tmp)
    overrides = [
        "train.batch_size=16",
        "eval.batch_size=16",
        f"train.num_epochs={args.epochs}",
        f"train.eval_freq={args.epochs}",
        "train.train_one_epoch_fn.loss_wts.feat=1.0",
        "train.train_one_epoch_fn.loss_wts.past_cls_action=1.0",
        "train.train_one_epoch_fn.save_freq_min=null",
        "model/backbone=identity",
        f"model.backbone_dim={C}",
        "model/temporal_aggregator=identity",
        "model/future_predictor=avth",
        "model.dropout=0.1",
        "model.classifier_on_past=true",
        "+model.future_predictor.n_head=2",
        "+model.future_predictor.n_layer=2",
        "+model.future_predictor.inter_dim=32",
        "+model.future_predictor.output_len=1",
        "+model.future_predictor.avg_last_n=1",
        "+model.future_predictor.return_past_too=true",
        "+model.future_predictor.future_pred_loss={_target_: torch.nn.MSELoss}",
        "opt/scheduler=cosine",
        "opt.lr_wd=[[__all__,0.01,0.000001]]",
        "opt.optimizer.nesterov=true",
        "opt.warmup.num_epochs=1",
        "data_train.num_frames=10",
        "data_train.frame_rate=1",
        "data_train.subclips.num_frames=1",
        "data_train.subclips.stride=1",
        "data_train.workers=2",
        "data_eval.num_frames=10",
        "data_eval.frame_rate=1",
        "data_eval.subclips.num_frames=1",
        "data_eval.subclips.stride=1",
        "data_eval.workers=2",
        "dataset_train.sample_strategy=last_clip",
        "dataset_eval.sample_strategy=last_clip",
        "dataset_train.conv_to_anticipate_fn.tau_a=1",
        "dataset_train.conv_to_anticipate_fn.tau_o=10",
        "dataset_eval.conv_to_anticipate_fn.tau_a=1",
        "dataset_eval.conv_to_anticipate_fn.tau_o=10",
        f"dataset_train.annotation_path=[{tmp}/annot/training.csv]",
        f"dataset_eval.annotation_path=[{tmp}/annot/validation.csv]",
        f"dataset.epic_kitchens100.common.annot_dir={tmp}/annot/",
        f"dataset.epic_kitchens100.common.rulstm_annot_dir={tmp}/annot/",
        f"dataset_train.root={tmp}/feats",
        f"dataset_eval.root={tmp}/feats",
        "+dataset_train.reader_fn={_target_: avt_tpu.data.NpyFeatsReader, "
        f"root: {tmp}/feats, read_type: normal}}",
        "+dataset_eval.reader_fn={_target_: avt_tpu.data.NpyFeatsReader, "
        f"root: {tmp}/feats, read_type: normal}}",
    ]
    cfg = Composer(str(CONF_DIR)).compose(
        "config", [parse_override(o) for o in overrides]
    )
    work_dir = args.workdir or str(tmp / "run")
    os.makedirs(work_dir, exist_ok=True)

    import jax

    print(f"# smoke: backend={jax.default_backend()} "
          f"devices={jax.device_count()} workdir={work_dir}", flush=True)
    metric = train_main(cfg, work_dir)
    print(f"# smoke: final primary metric (AR5 %) = {metric:.2f}")
    ok = metric > args.min_metric
    print("SMOKE OK" if ok else "SMOKE FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
