"""Raw-video end-to-end: native decoder -> device preprocessing -> tiny ViT.

The full expts/01-shaped path at toy scale: cv2-written videos where the
pre-action window is tinted by class, decoded by the native libav library,
preprocessed on-device (resize+crop+flip inside the jitted step), subclip
fold on device, ViT backbone + AVT-h head, 3-crop eval.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pathlib import Path

from avt_tpu.config import Composer, parse_override
from avt_tpu.data.video_decoder import have_native_decoder
from avt_tpu.train_net import main

pytestmark = [
    pytest.mark.skipif(
        not have_native_decoder(), reason="native decoder not available"
    ),
    pytest.mark.slow,  # whole-main train+eval on raw video
]

CONF_DIR = Path(__file__).resolve().parent.parent / "conf"
FPS = 10.0
N_CLS = 3


@pytest.fixture(scope="module")
def video_tree(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rawvid")
    annot = tmp / "annot"
    annot.mkdir()
    (annot / "EPIC_100_verb_classes.csv").write_text("id,key\n0,v0\n1,v1\n2,v2")
    (annot / "EPIC_100_noun_classes.csv").write_text("id,key\n0,n0\n1,n1\n2,n2")
    (annot / "actions.csv").write_text(
        "id,verb,noun,action\n" + "\n".join(f"{i},{i},{i},a{i}" for i in range(N_CLS))
    )
    rng = np.random.default_rng(0)
    vids = tmp / "vids"
    (vids / "P00").mkdir(parents=True)
    (vids / "P01").mkdir(parents=True)
    rows = []
    uid = 0
    for v, part in enumerate(["P00", "P01"]):
        path = str(vids / part / f"{part}_01.MP4")
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (64, 48)
        )
        n_frames = 1200
        # schedule actions every 12 s; tint the 6 s before each action
        actions = []
        t = 10.0
        while t < n_frames / FPS - 5:
            cls = int(rng.integers(N_CLS))
            actions.append((t, cls))
            t += 12.0
        for i in range(n_frames):
            sec = i / FPS
            frame = np.full((48, 64, 3), 100, np.uint8)
            for (at, cls) in actions:
                if at - 6 <= sec < at:
                    frame[:, :, cls] = 230  # strong class tint (BGR ok: cls<3)
            writer.write(frame)
        writer.release()
        # RULSTM-format csv uses 30fps frame numbers = sec * 30
        for (at, cls) in actions:
            rows.append(
                f"{uid},{part}_01,{int(at*30)},{int((at+2)*30)},{cls},{cls},{cls}"
            )
            uid += 1
    (annot / "training.csv").write_text("\n".join(rows))
    return tmp


def test_raw_video_train_eval(video_tree):
    tmp = video_tree
    overrides = [
        "train.batch_size=1",  # x8 devices = 8 global
        "eval.batch_size=1",
        "train.num_epochs=3",
        "train.eval_freq=3",
        "train.train_one_epoch_fn.loss_wts.feat=1.0",
        "train.train_one_epoch_fn.save_freq_min=null",
        # tiny frame-level ViT via config passthrough
        "model/backbone=avt_b",
        # ViT is already headless; reference expts set 0 (expts/01:11)
        "model.backbone_last_n_modules_to_drop=0",
        "+model.backbone.img_size=32",
        "+model.backbone.patch_size=16",
        "+model.backbone.embed_dim=32",
        "+model.backbone.depth=2",
        "+model.backbone.num_heads=2",
        "model.backbone_dim=32",
        "model/temporal_aggregator=identity",
        "model/future_predictor=avth",
        "+model.future_predictor.n_head=2",
        "+model.future_predictor.n_layer=2",
        "+model.future_predictor.inter_dim=32",
        "+model.future_predictor.output_len=1",
        "+model.future_predictor.avg_last_n=1",
        "+model.future_predictor.return_past_too=true",
        "+model.future_predictor.future_pred_loss={_target_: torch.nn.MSELoss}",
        "opt/scheduler=cosine",
        "opt.lr_wd=[[__all__,0.02,0.000001]]",
        "opt.warmup.num_epochs=1",
        # device preprocessing config (raw path)
        "data_train.num_frames=4",
        "data_train.frame_rate=1",
        "data_train.subclips.num_frames=1",
        "data_train.subclips.stride=1",
        "data_train.scale_h=36-44",
        "data_train.scale_w=-1",
        "data_train.crop_size=32",
        "data_train.mean=[0.5, 0.5, 0.5]",
        "data_train.std=[0.5, 0.5, 0.5]",
        "data_train.workers=4",
        "data_eval.num_frames=4",
        "data_eval.frame_rate=1",
        "data_eval.subclips.num_frames=1",
        "data_eval.subclips.stride=1",
        "data_eval.scale_h=36",
        "data_eval.scale_w=-1",
        "data_eval.crop_size=32",
        "data_eval.mean=[0.5, 0.5, 0.5]",
        "data_eval.std=[0.5, 0.5, 0.5]",
        "data_eval.eval_num_crops=3",
        "data_eval.eval_flip_crops=true",
        "data_eval.workers=4",
        "dataset_train.sample_strategy=last_clip",
        "dataset_eval.sample_strategy=last_clip",
        "dataset_train.conv_to_anticipate_fn.tau_a=1",
        "dataset_train.conv_to_anticipate_fn.tau_o=4",
        "dataset_eval.conv_to_anticipate_fn.tau_a=1",
        "dataset_eval.conv_to_anticipate_fn.tau_o=4",
        f"dataset_train.annotation_path=[{tmp}/annot/training.csv]",
        f"dataset_eval.annotation_path=[{tmp}/annot/training.csv]",
        f"dataset.epic_kitchens100.common.annot_dir={tmp}/annot/",
        f"dataset.epic_kitchens100.common.rulstm_annot_dir={tmp}/annot/",
        f"dataset_train.root=[{tmp}/vids]",
        f"dataset_eval.root=[{tmp}/vids]",
    ]
    cfg = Composer(CONF_DIR).compose(
        "config", [parse_override(o) for o in overrides]
    )
    import os
    import tempfile

    work_dir = tempfile.mkdtemp()
    metric = main(cfg, work_dir)
    # 4s observed window covers the 6s tint: near-perfectly learnable;
    # just require clearly above the 33% chance level given 3 tiny epochs
    assert metric > 50.0, metric
