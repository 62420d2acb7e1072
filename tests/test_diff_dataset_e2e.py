"""Full-init END-TO-END dataset differential against the upstream reference.

Builds a synthetic EK100-style tree (original-format pkl annotations, class
csvs, RULSTM action mapping, LMDB feature stores) and instantiates BOTH
  * the reference `datasets.epic_kitchens.EPICKitchens` (via ref_harness,
    with its real `EpicRULSTMFeatsReader` running on the in-tree fake lmdb)
  * our `avt_tpu.data.epic_kitchens.EpicKitchens` with `LMDBFeatsReader`
mirroring the expts/02_ek100_avt_tsn.txt configuration (TSN features,
frames_per_clip=10, frame_rate=1, subclips, last_clip sampling,
conv_to_anticipation tau_a=1/tau_o=10 drop_style=correct, label_type
[verb,noun,action], load_seg_labels as set by classifier_on_past=true),
then diffs every `__getitem__` output end to end: annotation parsing,
timestamp math, anticipation window conversion + discards, feature-store
reads incl. missing-frame backward search, fps resampling, the pad path
for windows clipped at t=0, subclip folding, per-frame segmentation
labels (incl. the overlapping-annotation half-duration rule), and the
class-count stats.

Reference surfaces covered: datasets/epic_kitchens.py:28-119 (EPICKitchens
init), datasets/base_video_dataset.py:270-446 (BaseVideoDataset init),
:518-637 (_sample), :639-686 (_get_video), :688-701 (_get_subclips),
:703-741 (_get_vidseg_labels), :769-838 (__getitem__), :840-851
(_repeat_process_idx).
"""
import numpy as np
import pandas as pd
import pytest

import ref_harness

C_RGB, C_OBJ = 6, 3
VIDEOS = {"P01_01": 3600, "P02_03": 2400}  # frames at 30 fps


# ------------------------------------------------------------ fixture tree
def _sec_to_timestr(sec: float) -> str:
    h = int(sec // 3600)
    m = int((sec % 3600) // 60)
    s = sec % 60
    return f"{h:02d}:{m:02d}:{s:06.3f}"


def _write_annotations(tmp_path):
    annot = tmp_path / "annot"
    annot.mkdir()
    (annot / "EPIC_100_verb_classes.csv").write_text(
        "id,key,instances\n0,take,x\n1,put,x\n2,wash,x\n"
    )
    (annot / "EPIC_100_noun_classes.csv").write_text(
        "id,key,instances\n0,plate,x\n1,knife,x\n"
    )
    # RULSTM action space: NOT the full verb x noun cross product, so some
    # (verb, noun) pairs below map to action -1
    (annot / "actions.csv").write_text(
        "id,verb,noun,action\n0,0,0,take_plate\n1,0,1,take_knife\n"
        "2,1,0,put_plate\n3,2,1,wash_knife\n"
    )
    rows = [
        # uid, video_id, start, end, verb_class, noun_class
        (101, "P01_01", 15.0, 18.0, 0, 0),
        (102, "P01_01", 20.5, 23.0, 0, 1),
        (103, "P01_01", 22.0, 26.0, 1, 0),   # overlaps uid 102 in time
        (104, "P01_01", 40.0, 45.0, 2, 1),   # window hits missing frames
        (105, "P01_01", 8.0, 9.5, 1, 0),     # window clipped at t=0 (pad)
        (110, "P01_01", 100.0, 110.0, 0, 1),
        (106, "P02_03", 30.0, 33.0, 2, 0),   # (2,0) -> action -1
        (107, "P02_03", 50.0, 55.0, 0, 0),
        (108, "P02_03", 70.0, 75.0, 1, 1),   # (1,1) -> action -1
        (109, "P02_03", 0.5, 1.2, 0, 1),     # too early: discarded
    ]
    verbs = {0: "take", 1: "put-down", 2: "wash-up"}
    nouns = {0: "plate", 1: "knife:small"}  # exercises the ":" reversal
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
    return annot


def _make_store(path, channels, missing, seed):
    """One fake-lmdb store over all videos; frame i of video v gets a seeded
    random feature row. `missing` = set of (video_id, frame) to drop, which
    exercises the <=10-frame backward search and zero-fill inside the e2e."""
    lmdb = ref_harness._load_fake_lmdb()
    rng = np.random.default_rng(seed)
    env = lmdb.open(str(path), readonly=False)
    with env.begin(write=True) as txn:
        for vid, n_frames in VIDEOS.items():
            feats = rng.normal(size=(n_frames + 1, channels)).astype(np.float32)
            for i in range(1, n_frames + 1):
                if (vid, i) in missing:
                    continue
                txn.put(f"{vid}_frame_{i:010d}.jpg".encode(), feats[i].tobytes())


@pytest.fixture(scope="module")
def ek_tree(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ek100")
    annot = _write_annotations(tmp_path)
    # uid 104's window [29, 39] reads frames ~870..1170: 900..920 is a gap
    # deeper than the backward radius (zero-fill), 1000 a single miss
    missing = {("P01_01", i) for i in range(900, 921)} | {("P01_01", 1000)}
    _make_store(tmp_path / "rgb", C_RGB, missing, seed=3)
    _make_store(tmp_path / "obj", C_OBJ, missing, seed=4)
    return tmp_path, annot


def _feat_paths(tmp_path):
    return [str(tmp_path / "rgb"), str(tmp_path / "obj")]


def _build_reference(tmp_path, annot, subclips, **kw):
    import sys

    ref_ek = ref_harness.import_ref("datasets.epic_kitchens")
    tv = sys.modules["torchvision"]
    return ref_ek.EPICKitchens(
        annotation_path=[str(annot / "EPIC_100_train.pkl")],
        annotation_dir=str(annot),
        action_labels_fpath=str(annot / "actions.csv"),
        version=ref_ek.EPIC100_VERSION,
        root=[str(tmp_path)],
        frames_per_clip=10,
        frame_rate=1.0,
        subclips_options=dict(subclips),
        load_seg_labels=True,
        reader_fn={
            "_target_": "datasets.epic_kitchens.EpicRULSTMFeatsReader",
            "lmdb_path": _feat_paths(tmp_path),
            "read_type": "normal",
            "warn_if_using_closeby_frame": False,
        },
        # real configs always compose a transform, which routes feature
        # "videos" through the permute branch (base_video_dataset.py:747-757)
        transform=tv.transforms.Compose([]),
        label_type=["verb", "noun", "action"],
        sample_strategy="last_clip",
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 1.0,
            "tau_o": 10.0,
            "drop_style": "correct",
        },
        **kw,
    )


def _build_ours(tmp_path, annot, subclips, monkeypatch, **kw):
    import avt_tpu.data.readers as readers
    from avt_tpu.data import convert_to_anticipation
    from avt_tpu.data.epic_kitchens import EPIC100_VERSION, EpicKitchens

    monkeypatch.setattr(readers, "lmdb", ref_harness._load_fake_lmdb(),
                        raising=False)
    monkeypatch.setattr(readers, "HAVE_LMDB", True)
    return EpicKitchens(
        annotation_path=[str(annot / "EPIC_100_train.pkl")],
        annotation_dir=str(annot),
        action_labels_fpath=str(annot / "actions.csv"),
        version=EPIC100_VERSION,
        root=str(tmp_path),
        frames_per_clip=10,
        frame_rate=1.0,
        subclips_options=dict(subclips),
        load_seg_labels=True,
        reader=readers.LMDBFeatsReader(_feat_paths(tmp_path),
                                       read_type="normal"),
        label_type=["verb", "noun", "action"],
        sample_strategy="last_clip",
        conv_to_anticipate_fn=lambda d: convert_to_anticipation(
            d, 1.0, 10.0, drop_style="correct"
        ),
        **kw,
    )


def _assert_item_equal(got, want, uid):
    msg = f"uid={uid}"
    np.testing.assert_allclose(
        np.asarray(got["video"], dtype=np.float32),
        want["video"].numpy(),
        rtol=0, atol=0, err_msg=msg,
    )
    np.testing.assert_allclose(
        np.asarray(got["video_frame_sec"], dtype=np.float64),
        want["video_frame_sec"].numpy().astype(np.float64),
        atol=1e-5, err_msg=msg,
    )
    assert got["uid"] == want["uid"], msg
    assert got["idx"] == want["idx"], msg
    assert got["start"] == pytest.approx(want["start"]), msg
    assert got["end"] == pytest.approx(want["end"]), msg
    assert list(got["target"]) == list(want["target"]), msg
    for t in got["target"]:
        assert int(got["target"][t]) == int(want["target"][t]), f"{msg} {t}"
    assert list(got["target_subclips"]) == list(want["target_subclips"]), msg
    for t in got["target_subclips"]:
        np.testing.assert_array_equal(
            got["target_subclips"][t],
            want["target_subclips"][t].numpy(),
            err_msg=f"{msg} seg:{t}",
        )


@pytest.mark.parametrize("subclips", [
    {"num_frames": 1, "stride": 1},   # expts/02 configuration
    {"num_frames": 2, "stride": 2},   # multi-frame subclip fold
])
def test_epic_dataset_getitem_vs_reference(ek_tree, monkeypatch, subclips):
    tmp_path, annot = ek_tree
    ref_ds = _build_reference(tmp_path, annot, subclips)
    ds = _build_ours(tmp_path, annot, subclips, monkeypatch)

    # annotation parsing + anticipation conversion parity at the df level
    assert len(ds) == len(ref_ds) == 9  # uid 109 discarded as too early
    assert list(ds.df["uid"]) == list(ref_ds.df["uid"])
    assert [str(p) for p in ds.df["video_path"]] == [
        str(p) for p in ref_ds.df["video_path"]
    ]
    # the reference's odd string normalizations (token reversal on ":")
    assert list(ds.df["noun"]) == list(ref_ds.df["noun"])
    assert list(ds.df["verb"]) == list(ref_ds.df["verb"])
    for col in ("start", "end", "orig_start", "orig_end",
                "future_0_start", "future_0_end"):
        np.testing.assert_allclose(
            ds.df[col].to_numpy(float), ref_ds.df[col].to_numpy(float),
            rtol=1e-9, err_msg=col,
        )
    assert len(ds.action_classes) == len(ref_ds.action_classes) == 4
    for tname in ("verb", "noun", "action"):
        assert dict(ds.classes_counts[tname]) == {
            k: int(v) for k, v in ref_ds.classes_counts[tname].items()
        }

    for idx in range(len(ds)):
        _assert_item_equal(ds[idx], ref_ds[idx], uid=ds.df.loc[idx, "uid"])


def test_epic_dataset_repeat_and_uid_subset_vs_reference(ek_tree, monkeypatch):
    tmp_path, annot = ek_tree
    subclips = {"num_frames": 1, "stride": 1}
    uids = [104, 101, 107]  # order-preserving subset incl. the pad/miss rows
    kw = dict(repeat_data_times=2.0, uid_subset=uids)
    ref_ds = _build_reference(tmp_path, annot, subclips, **kw)
    ds = _build_ours(tmp_path, annot, subclips, monkeypatch, **kw)

    assert len(ds) == len(ref_ds) == 6
    assert list(ds.df["uid"]) == list(ref_ds.df["uid"]) == uids
    for idx in range(len(ds)):
        _assert_item_equal(ds[idx], ref_ds[idx], uid=idx)
