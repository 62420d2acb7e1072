"""Breakfast / 50Salads differential against the upstream reference.

Covers reference datasets/breakfast_50salads.py end to end: the Abu-Farha
mapping file, the three annotation readers, init_df (including its float16
timestamp quantization quirk), the Sener feature readers (gz + npy window
math with the round(sec*fps - 1) frame convention), and a full
Breakfast50Salads `__getitem__` diff on a synthetic Breakfast tree
(per-frame label files -> segments -> anticipation windows -> npy feature
reads -> subclip folding).
"""
import functools
import gzip

import numpy as np
import pandas as pd
import pytest
import torch

import ref_harness

ref_bfs = ref_harness.import_ref("datasets.breakfast_50salads")

import avt_tpu.data.breakfast_50salads as bfs

FPS = 15  # breakfast videos are fixed 15 fps in both implementations


# ------------------------------------------------------------ fixture tree
@pytest.fixture(scope="module")
def bf_tree(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("breakfast")
    (tmp / "P03").mkdir()
    (tmp / "P03" / "cam01").mkdir()
    (tmp / "P03" / "stereo").mkdir()
    (tmp / "labels").mkdir()
    (tmp / "splits").mkdir()
    (tmp / "mapping.txt").write_text(
        "0 SIL\n1 pour_milk\n2 cut_fruit\n3 stir_milk\n"
    )
    classes = ["SIL", "pour_milk", "cut_fruit", "stir_milk"]
    bundles = ["P03_cam01_P03_milk.txt", "P03_stereo01_P03_fruit.txt"]
    (tmp / "splits" / "train.split1.bundle").write_text(
        "#bundle\n" + "\n".join(bundles) + "\n"
    )
    # Abu-Farha per-frame label files (runs of repeated labels). 120+ frames
    # per segment at 15 fps -> ~8 s segments so anticipation windows fit.
    runs = {
        bundles[0]: [("SIL", 130), ("pour_milk", 150), ("stir_milk", 140),
                     ("SIL", 120)],
        bundles[1]: [("SIL", 125), ("cut_fruit", 160), ("pour_milk", 135)],
    }
    for name, segs in runs.items():
        labels = sum(([lab] * n for lab, n in segs), [])
        (tmp / "labels" / name).write_text("\n".join(labels) + "\n")
    # original-format .labels files next to the videos ('start-end activity',
    # incl. one unknown activity that must be skipped)
    (tmp / "P03" / "cam01" / "P03_milk.avi.labels").write_text(
        "1-130 SIL\n131-280 pour_milk\n281-420 stir_milk\n"
        "421-540 garnish_plate\n"
    )
    (tmp / "P03" / "stereo" / "P03_fruit_ch1.avi.labels").write_text(
        "1-125 SIL\n126-285 cut_fruit\n286-420 pour_milk\n"
    )
    # npy Sener features: (C, T) per video, keyed by bundle name
    rng = np.random.default_rng(0)
    (tmp / "feats").mkdir()
    for name, segs in runs.items():
        n = sum(c for _, c in segs)
        np.save(tmp / "feats" / name.replace(".txt", ".npy"),
                rng.normal(size=(6, n)).astype(np.float32))
    return tmp, classes, bundles, runs


# --------------------------------------------------------- mapping + annots
def test_load_mappings_vs_reference(bf_tree):
    tmp, classes, *_ = bf_tree
    ref = ref_bfs.load_mappings_file(tmp / "mapping.txt")
    ours = bfs.load_mappings_file(tmp / "mapping.txt")
    assert ours == ref == {c: i for i, c in enumerate(classes)}


def test_orig_breakfast_annotations_vs_reference(bf_tree):
    """Values parity. Tuple shapes differ by design: the reference emits
    4-tuples that its own 5-column init_df cannot frame (latent crash on
    the orig-annotation path); ours prepends the bundle name."""
    tmp, classes, bundles, _ = bf_tree
    action_classes = {c: i for i, c in enumerate(classes)}
    ref = ref_bfs.read_orig_breakfast_annotations(
        [b + "\n" for b in bundles], tmp, action_classes)
    ours = bfs.read_orig_breakfast_annotations(
        [b + "\n" for b in bundles], tmp, action_classes)
    assert len(ours) == len(ref) == 6  # garnish_plate skipped
    for (fname, s, e, lab), (_, ofname, os_, oe, olab) in zip(ref, ours):
        assert (ofname, os_, oe, olab) == (fname, s, e, lab)
    # the stereo bundle resolved to the existing _ch1 annotation file
    assert any("stereo/P03_fruit_ch1.avi" in r[1] for r in ours)


def test_orig_50salads_annotations_vs_reference(tmp_path, monkeypatch):
    (tmp_path / "annots").mkdir()
    (tmp_path / "ts").mkdir()
    # hardware timestamps: consecutive ints with an offset (the annotation
    # files reference these VALUES; index() maps them back to frame ids)
    frame_ts = list(range(1000, 1000 + 900))
    (tmp_path / "ts" / "timestamps-01-1.txt").write_text(
        "\n".join(f"{t} x" for t in frame_ts) + "\n"
    )
    (tmp_path / "annots" / "01-1-activityAnnotation.txt").write_text(
        "1000 1149 cut_tomato_prep\n1150 1399 cut_tomato_core\n"
        "1400 1599 serve_salad\n"   # coarse label: skipped
        "1600 1898 mix_dressing_post\n"
    )
    action_classes = {"cut_tomato": 0, "mix_dressing": 1}
    monkeypatch.setattr(ref_bfs, "get_video_info",
                        lambda p, keys: {"fps": 30.0})
    ref = ref_bfs.read_orig_50salads_annotations(
        ["rgb-01-1.txt\n"], tmp_path, action_classes,
        tmp_path / "annots", tmp_path / "ts")
    ours = bfs.read_orig_50salads_annotations(
        ["rgb-01-1.txt\n"], tmp_path, action_classes,
        tmp_path / "annots", tmp_path / "ts",
        video_info_fn=lambda p: {"fps": 30.0})
    assert len(ours) == len(ref) == 3
    for (fname, s, e, lab), (_, ofname, os_, oe, olab) in zip(ref, ours):
        assert (ofname, olab) == (fname, lab)
        assert os_ == pytest.approx(s) and oe == pytest.approx(e)


def _ref_annot_conf(tmp):
    return {
        "_target_": "datasets.breakfast_50salads.read_abu_farha_annotations",
        "annots_dir": str(tmp / "labels"),
        "bundle_entry_to_vname_fn": {
            "_target_":
                "datasets.breakfast_50salads."
                "bundle_entry_to_video_fname_breakfast",
        },
        "frame_rate": FPS,
    }


def _our_annot_fn(tmp):
    return functools.partial(
        bfs.read_abu_farha_annotations,
        annots_dir=tmp / "labels",
        bundle_entry_to_vname_fn=bfs.bundle_entry_to_video_fname_breakfast,
        frame_rate=FPS,
    )


def test_abu_farha_init_df_vs_reference(bf_tree):
    """Full df parity incl. the float16 start/end quantization quirk."""
    tmp, classes, bundles, runs = bf_tree
    action_classes = {c: i for i, c in enumerate(classes)}
    bundle = tmp / "splits" / "train.split1.bundle"
    ref_df = ref_bfs.init_df(bundle, _ref_annot_conf(tmp), tmp,
                             action_classes)
    our_df = bfs.init_df(bundle, _our_annot_fn(tmp), tmp, action_classes)
    assert list(our_df.columns) == list(ref_df.columns)
    assert {c: str(t) for c, t in our_df.dtypes.items()} == {
        c: str(t) for c, t in ref_df.dtypes.items()
    }
    assert len(our_df) == len(ref_df) == 7
    for col in our_df.columns:
        np.testing.assert_array_equal(
            our_df[col].to_numpy(), ref_df[col].to_numpy(), err_msg=col)


# ------------------------------------------------------------ feat readers
@pytest.mark.parametrize("fmt", ["gz", "npy"])
def test_sener_feats_reader_vs_reference(tmp_path, fmt):
    rng = np.random.default_rng(1)
    T, C = 60, 5
    feats = rng.normal(size=(T, C)).astype(np.float32)
    if fmt == "gz":
        with gzip.open(tmp_path / "vid.gz", "wb") as f:
            for row in feats:
                f.write((" ".join(f"{v:.6f}" for v in row) + "\n").encode())
        ref_fmt, our_fmt = ref_bfs.GZFormatReader(), bfs.GZFormatReader()
    else:
        np.save(tmp_path / "vid.npy", np.ascontiguousarray(feats.T))
        ref_fmt, our_fmt = ref_bfs.NPYFormatReader(), bfs.NPYFormatReader()

    ref_reader = ref_bfs.SenerFeatsReader(tmp_path, ref_fmt)
    our_reader = bfs.SenerFeatsReader(tmp_path, our_fmt)
    row = {"video_bundle_name": "vid.txt "}
    # exercises the int(round(sec*fps - 1)) frame convention incl. the
    # start<0 clamp (npy) / lno-range filter (gz) at the window edges
    for start_sec, end_sec in [(0.0, 2.0), (1.0 / FPS, 1.0), (2.5, 60 / FPS)]:
        ref_out, d1, d2 = ref_reader(
            "unused", start_sec, end_sec, FPS,
            pd.Series(row))
        our_out, _ = our_reader("unused", start_sec, end_sec, FPS, row)
        assert d1 == {} and d2 == {}
        np.testing.assert_allclose(
            np.asarray(our_out), ref_out.numpy(), rtol=0, atol=1e-6,
            err_msg=f"{fmt} {start_sec}-{end_sec}")


# ------------------------------------------------------------- full dataset
def test_breakfast_dataset_getitem_vs_reference(bf_tree):
    import sys

    tmp, classes, bundles, runs = bf_tree
    tv = sys.modules["torchvision"]
    common = dict(
        which="Breakfast",
        root=str(tmp),
        splits_dir=str(tmp / "splits"),
        classes_fpath=str(tmp / "mapping.txt"),
        is_train=True,
        fold=1,
        frames_per_clip=8,
        frame_rate=3.0,
        sample_strategy="last_clip",
        subclips_options={"num_frames": 1, "stride": 1},
        load_seg_labels=True,
    )
    ref_ds = ref_bfs.Breakfast50Salads(
        annot_reader_fn=_ref_annot_conf(tmp),
        reader_fn={
            "_target_": "datasets.breakfast_50salads.SenerFeatsReader",
            "feat_dir": str(tmp / "feats"),
            "format_reader": {
                "_target_": "datasets.breakfast_50salads.NPYFormatReader",
            },
        },
        transform=tv.transforms.Compose([]),
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 0.5,
            "tau_o": 5.0,
            "drop_style": "correct",
        },
        **common,
    )
    # reference SenerFeatsReader.get_frame_rate probes the video file; the
    # abu-farha features are at the fixed 15 fps annotation rate
    ref_ds.reader_fn.get_frame_rate = lambda *a, **k: float(FPS)

    from avt_tpu.data import convert_to_anticipation

    ours = bfs.Breakfast50Salads(
        annot_reader_fn=_our_annot_fn(tmp),
        reader=bfs.SenerFeatsReader(
            tmp / "feats", bfs.NPYFormatReader(),
            video_info_fn=lambda p: {"fps": float(FPS)}),
        conv_to_anticipate_fn=lambda d: convert_to_anticipation(
            d, 0.5, 5.0, drop_style="correct"),
        **common,
    )

    assert len(ours) == len(ref_ds)
    # both sides normalize the scalar label_type to a list
    assert ours.label_type == ref_ds.label_type == ["action"]
    np.testing.assert_array_equal(
        ours.df["action_class"].to_numpy(),
        ref_ds.df["action_class"].to_numpy())
    for col in ("start", "end", "orig_start", "orig_end"):
        np.testing.assert_array_equal(
            ours.df[col].to_numpy(np.float64),
            ref_ds.df[col].to_numpy(np.float64), err_msg=col)

    for idx in range(len(ours)):
        got, want = ours[idx], ref_ds[idx]
        msg = f"idx={idx}"
        np.testing.assert_allclose(
            np.asarray(got["video"], dtype=np.float32),
            want["video"].numpy(), rtol=0, atol=0, err_msg=msg)
        assert int(got["target"]["action"]) == int(want["target"]["action"]), msg
        np.testing.assert_array_equal(
            np.asarray(got["target_subclips"]["action"]),
            want["target_subclips"]["action"].numpy(),
            err_msg=msg)
