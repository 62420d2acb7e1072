"""Breakfast/50Salads parsing + RULSTM aggregator + quantize-CE tests."""
import gzip

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from avt_tpu.data.breakfast_50salads import (
    Breakfast50Salads,
    GZFormatReader,
    NPYFormatReader,
    SenerFeatsReader,
    bundle_entry_to_video_fname_50salads,
    load_mappings_file,
    read_abu_farha_annotations,
)
from avt_tpu.data import convert_to_anticipation
from avt_tpu.losses import quantize_and_cross_entropy
from avt_tpu.models import RULSTMAgg

RNG = np.random.default_rng(17)


@pytest.fixture
def salads_tree(tmp_path):
    """Abu-Farha-style 50Salads tree with per-frame labels + features."""
    splits = tmp_path / "splits"
    splits.mkdir()
    annots = tmp_path / "groundTruth"
    annots.mkdir()
    feats = tmp_path / "feats"
    feats.mkdir()
    (tmp_path / "mapping.txt").write_text(
        "0 cut_tomato\n1 peel_cucumber\n2 mix\n"
    )
    FPS = 30.0
    names = ["rgb-01-1.txt", "rgb-02-1.txt"]
    (splits / "train.split1.bundle").write_text(
        "#bundle.txt\n" + "\n".join(names) + "\n"
    )
    for name in names:
        # 2400 frames: 800 of each class (80s video at 30fps)
        labels = (["cut_tomato"] * 800 + ["peel_cucumber"] * 800 + ["mix"] * 800)
        (annots / name).write_text("\n".join(labels) + "\n")
        # gz features: frame i has feature [i, i]
        with gzip.open(feats / name.replace(".txt", ".gz"), "wt") as fout:
            for i in range(2400):
                fout.write(f"{i} {i}\n")
    return tmp_path, FPS


def test_abu_farha_segments(salads_tree):
    tmp, FPS = salads_tree
    classes = load_mappings_file(tmp / "mapping.txt")
    assert classes == {"cut_tomato": 0, "peel_cucumber": 1, "mix": 2}
    segs = read_abu_farha_annotations(
        ["rgb-01-1.txt"], str(tmp),
        classes, str(tmp / "groundTruth"),
        bundle_entry_to_video_fname_50salads, frame_rate=FPS,
    )
    assert len(segs) == 3
    # contiguous segments, no gaps (end of one == start of next)
    assert segs[0][2] == 0.0 and segs[0][3] == pytest.approx(800 / FPS)
    assert segs[1][2] == pytest.approx(800 / FPS)
    assert [s[-1] for s in segs] == [0, 1, 2]


def test_breakfast50salads_dataset_with_sener_feats(salads_tree):
    tmp, FPS = salads_tree
    reader = SenerFeatsReader(
        str(tmp / "feats"), GZFormatReader(),
        video_info_fn=lambda p: {"fps": FPS},
    )
    ds = Breakfast50Salads(
        which="50Salads",
        root=str(tmp),
        splits_dir=str(tmp / "splits"),
        classes_fpath=str(tmp / "mapping.txt"),
        is_train=True,
        fold=1,
        annot_reader_fn=lambda videos, root, classes: read_abu_farha_annotations(
            videos, root, classes, str(tmp / "groundTruth"),
            bundle_entry_to_video_fname_50salads, frame_rate=FPS,
        ),
        frames_per_clip=8,
        frame_rate=1.0,
        subclips_options={"num_frames": 1, "stride": 1},
        reader=reader,
        sample_strategy="last_clip",
        conv_to_anticipate_fn=lambda d: convert_to_anticipation(d, 1.0, 8.0),
    )
    # first segment per video starts at 0 -> dropped (window ends < 1 frame);
    # segments 2,3 of each of the 2 videos remain
    assert len(ds) == 4
    assert ds.primary_metric == "final_acc/action/top1"
    item = ds[0]
    assert item["video"].shape == (8, 2, 1, 1, 1)
    assert item["target"]["action"] == 1


def test_npy_format_reader(tmp_path):
    feats = RNG.normal(size=(4, 100)).astype(np.float32)  # (C, T)
    np.save(tmp_path / "vid.npy", feats)
    reader = NPYFormatReader()
    out = reader(str(tmp_path / "vid.txt"), 10, 19)
    assert out.shape == (10, 4)
    np.testing.assert_allclose(out, feats[:, 10:20].T)


def test_rulstm_agg_shapes():
    agg = RULSTMAgg(in_features=16, intermediate_featdim=32, num_pad_feats=3,
                    dropout=0.0)
    feats = jnp.asarray(RNG.normal(size=(2, 6, 16)).astype(np.float32))
    params = agg.init(jax.random.PRNGKey(0), feats)
    out, aux = agg.apply(params, feats)
    assert out.shape == (2, 32)
    assert aux == {}
    assert np.isfinite(np.asarray(out)).all()


def test_quantize_and_cross_entropy_matches_torch():
    K, C = 7, 12
    centroids = RNG.normal(size=(K, C)).astype(np.float32)
    inp = RNG.normal(size=(3, 4, C)).astype(np.float32)
    tgt = RNG.normal(size=(3, 4, C)).astype(np.float32)
    ours = quantize_and_cross_entropy(
        jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(centroids),
        reduction="none",
    )
    # torch reference (loss_fn/multidim_xentropy.py:36-54 semantics)
    tin = torch.nn.functional.normalize(torch.from_numpy(inp), dim=-1, p=2)
    ttg = torch.nn.functional.normalize(torch.from_numpy(tgt), dim=-1, p=2)
    tc = torch.from_numpy(centroids)
    logits = tin.flatten(0, 1) @ tc.t()
    d = torch.cdist(ttg.flatten(0, 1).unsqueeze(0), tc.unsqueeze(0))[0]
    ids = torch.argmin(d, dim=-1)
    ref = torch.nn.functional.cross_entropy(
        logits, ids, reduction="none"
    ).reshape(3, 4)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)
