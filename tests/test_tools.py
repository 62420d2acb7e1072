"""tools/resize_videos_256px.py: the dataset-prep step the reference ships
as sample_scripts/resize_epic_256px.sh (pre-resize videos to 256px height
so the loader decodes near the training scale)."""
import importlib.util
import sys
from pathlib import Path

import cv2
import numpy as np

_TOOL = Path(__file__).resolve().parent.parent / "tools" / "resize_videos_256px.py"
spec = importlib.util.spec_from_file_location("resize_tool", _TOOL)
resize_tool = importlib.util.module_from_spec(spec)
spec.loader.exec_module(resize_tool)


def _write_video(path: Path, w=640, h=480, n=30, fps=30.0):
    path.parent.mkdir(parents=True, exist_ok=True)
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, 2] = (i * 8) % 256
        wr.write(f)
    wr.release()


def test_resize_tree_resumable(tmp_path, capsys):
    src, out = tmp_path / "in", tmp_path / "out"
    _write_video(src / "P01" / "clip.MP4")
    assert resize_tool.main([str(src), str(out)]) == 0
    dst = out / "P01" / "clip.MP4"
    cap = cv2.VideoCapture(str(dst))
    shape = (
        int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
    )
    cap.release()
    # 480 -> 256, width 640*256/480 = 341.3 rounded to even = 342
    assert shape == (256, 342, 30), shape
    # no stray .part temp files
    assert not list(out.rglob("*.part*"))
    # second run skips completed outputs (featext-style resume)
    capsys.readouterr()
    assert resize_tool.main([str(src), str(out)]) == 0
    assert "skip (done)" in capsys.readouterr().out


def test_resize_empty_tree_errors(tmp_path):
    (tmp_path / "in").mkdir()
    assert resize_tool.main([str(tmp_path / "in"), str(tmp_path / "out")]) == 1


def test_smoke_train_tool_composes(tmp_path):
    """tools/smoke_train.py: both synthetic dataset fabricators produce
    trees the config path can compose and build datasets from (the full
    training runs are exercised on-chip; this pins the mechanics)."""
    _SMOKE = Path(__file__).resolve().parent.parent / "tools" / "smoke_train.py"
    sspec = importlib.util.spec_from_file_location("smoke_tool", _SMOKE)
    smoke = importlib.util.module_from_spec(sspec)
    sspec.loader.exec_module(smoke)

    from avt_tpu.config import Composer, parse_override
    from avt_tpu.config.build import build_all_datasets
    from avt_tpu.train_net import CONF_DIR

    feat_root = tmp_path / "feat"
    smoke.make_dataset(feat_root)
    assert (feat_root / "annot" / "training.csv").exists()
    raw_root = tmp_path / "raw"
    smoke.make_video_dataset(raw_root)
    assert (raw_root / "vids" / "P00" / "P00_01.MP4").exists()

    cfg = Composer(str(CONF_DIR)).compose(
        "config", [parse_override(o) for o in smoke.raw_overrides(raw_root, 1)]
    )
    train_ds, eval_ds = build_all_datasets(cfg)
    assert len(train_ds) == 1 and len(train_ds[0]) > 0
    assert set(eval_ds) == {""} and len(eval_ds[""]) > 0


# ---------------------------------------------- tools/compute_centroids.py
_CENT = Path(__file__).resolve().parent.parent / "tools" / "compute_centroids.py"
_cent_spec = importlib.util.spec_from_file_location("centroid_tool", _CENT)
centroid_tool = importlib.util.module_from_spec(_cent_spec)
_cent_spec.loader.exec_module(centroid_tool)


def _blobs(rng, centers, n_per):
    pts = [
        c + 0.05 * rng.normal(size=(n_per, len(c))) for c in centers
    ]
    return np.concatenate(pts).astype(np.float32)


def test_kmeans_fit_recovers_blobs():
    from avt_tpu.models.cluster import KmeansAssigner, kmeans_fit

    rng = np.random.default_rng(0)
    true = np.array([[0.0, 0.0], [3.0, 3.0], [-3.0, 2.0]], np.float32)
    feats = _blobs(rng, true, 200)
    cents = kmeans_fit(feats, k=3, iters=20, seed=1, chunk=128)
    # each true center has a recovered centroid within the blob scale
    d = np.linalg.norm(true[:, None] - cents[None], axis=-1)
    assert (d.min(axis=1) < 0.05).all(), d
    # assigner groups each blob consistently
    assigner = KmeansAssigner(cents)
    labels = np.asarray(assigner(feats)).reshape(3, 200)
    for row in labels:
        assert (row == row[0]).all()


def test_kmeans_fit_empty_cluster_reseed():
    from avt_tpu.models.cluster import kmeans_fit

    rng = np.random.default_rng(2)
    feats = _blobs(rng, np.zeros((1, 4), np.float32), 64)
    # k close to n with duplicate-heavy data still returns k usable rows:
    # finite, pairwise distinct (no stale/dead codewords), every centroid
    # refined (non-empty on the final assignment)
    cents = kmeans_fit(feats, k=16, iters=5, seed=0, chunk=32)
    assert cents.shape == (16, 4)
    assert np.isfinite(cents).all()
    d = np.linalg.norm(cents[:, None] - cents[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0, "duplicate centroids survived reseeding"
    from avt_tpu.models.cluster import KmeansAssigner

    labels = np.asarray(KmeansAssigner(cents)(feats))
    assert set(labels.tolist()) == set(range(16)), "dead codewords"


def test_compute_centroids_cli_npy(tmp_path):
    rng = np.random.default_rng(3)
    true = np.array([[1.0, 0.0, 0.0], [0.0, 4.0, 0.0]], np.float32)
    np.save(tmp_path / "a.npy", _blobs(rng, true, 100))
    np.save(tmp_path / "b.npy",
            _blobs(rng, true, 50).reshape(2 * 50, 1, 3))  # (N, T, C) form
    out = tmp_path / "cent.npy"
    centroid_tool.main([
        str(tmp_path / "a.npy"), str(tmp_path / "b.npy"),
        "-k", "2", "-o", str(out), "--iters", "10", "--max-samples", "250",
    ])
    cents = np.load(out)
    assert cents.shape == (2, 3)
    d = np.linalg.norm(true[:, None] - cents[None], axis=-1)
    assert (d.min(axis=1) < 0.1).all()


def test_viz_attention_tool(tmp_path):
    """tools/viz_attention.py end to end on a synthetic clip: decode ->
    eval preprocess -> AVTh forward with output_attentions -> rendered
    head-grid + frame-strip overlay PNGs per rollout step (the reference's
    paper-figure path, models/future_prediction.py:184-188 +
    notebooks/utils.py:232-244)."""
    import pytest as _pytest

    from avt_tpu.data.video_decoder import have_native_decoder

    if not have_native_decoder():
        _pytest.skip("native decoder not available")
    _viz_spec = importlib.util.spec_from_file_location(
        "viz_tool", Path(__file__).parent.parent / "tools" / "viz_attention.py"
    )
    viz_tool = importlib.util.module_from_spec(_viz_spec)
    _viz_spec.loader.exec_module(viz_tool)

    vid = tmp_path / "clip.mp4"
    rng = np.random.default_rng(5)
    w = cv2.VideoWriter(
        str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    for i in range(40):
        frame = np.full((48, 64, 3), 20 + 5 * i, np.uint8)
        frame[:10, :10] = rng.integers(0, 255, size=(10, 10, 3))
        w.write(frame)
    w.release()

    expt = tmp_path / "viz_expt.txt"
    expt.write_text("\n".join([
        "model/backbone=avt_b",
        "model.backbone_last_n_modules_to_drop=0",
        "+model.backbone.img_size=32",
        "+model.backbone.patch_size=16",
        "+model.backbone.embed_dim=32",
        "+model.backbone.depth=1",
        "+model.backbone.num_heads=2",
        "model.backbone_dim=32",
        "model/temporal_aggregator=identity",
        "model/future_predictor=avth",
        "+model.future_predictor.n_head=2",
        "+model.future_predictor.n_layer=2",
        "+model.future_predictor.inter_dim=32",
        "+model.future_predictor.output_len=3",
        "+model.future_predictor.avg_last_n=1",
        "+model.future_predictor.future_pred_loss={_target_: torch.nn.MSELoss}",
        "data_eval.num_frames=6",
        "data_eval.frame_rate=2",
        "data_eval.subclips.num_frames=1",
        "data_eval.subclips.stride=1",
        "data_eval.scale_h=36",
        "data_eval.scale_w=-1",
        "data_eval.crop_size=32",
        "data_eval.mean=[0.5, 0.5, 0.5]",
        "data_eval.std=[0.5, 0.5, 0.5]",
    ]) + "\n")

    out_dir = tmp_path / "viz"
    written = viz_tool.main([
        str(vid), "-c", str(expt), "-o", str(out_dir),
        "--num-classes", "5", "--start", "0", "--end", "3.5",
    ])
    # output_len=3 -> steps 0..2, two PNGs each
    assert len(written) == 6
    for step in range(3):
        for kind in ("heads", "overlay"):
            p = out_dir / f"step{step}_{kind}.png"
            assert p.exists() and p.stat().st_size > 1000, p
