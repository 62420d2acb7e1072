"""Tests for the annotation/window-math/dataset core.

Fixtures are hand-derived from the reference semantics
(datasets/base_video_dataset.py, datasets/epic_kitchens.py) since the
reference itself cannot be imported here (needs torchvision).
"""
import numpy as np
import pandas as pd
import pytest

from avt_tpu.data import (
    FUTURE_PREFIX,
    NpyFeatsReader,
    RULSTM_TSN_FPS,
    SAMPLE_STRAT_LAST,
    VideoDataset,
    convert_to_anticipation,
    dense_labels_to_segments,
    sample_clip_frames,
    subsample_indices,
    pad_or_crop_indices,
)
from avt_tpu.data.sampling import compute_read_window


def _mk_df(n=6, start0=5.0, gap=20.0, dur=3.0):
    rows = []
    for i in range(n):
        s = start0 + i * gap
        rows.append(
            dict(
                uid=i + 1,
                video_path="P01_01.MP4",
                start=s,
                end=s + dur,
                verb_class=i % 3,
                noun_class=i % 4,
                action_class=i % 5,
                participant_id="P01",
            )
        )
    return pd.DataFrame(rows)


# ------------------------------------------------------------ anticipation
def test_convert_to_anticipation_window_math():
    df = _mk_df()
    out, disc = convert_to_anticipation(df.copy(), tau_a=1.0, tau_o=10.0)
    # observed window = [start - 11, start - 1]
    np.testing.assert_allclose(out["end"], out["orig_start"] - 1.0)
    np.testing.assert_allclose(out["start"], out["orig_start"] - 11.0)
    # original times preserved
    np.testing.assert_allclose(out["orig_start"], df.set_index("uid").loc[out.uid, "start"])
    # default future clip = the action window shifted: starts at end'+tau_a
    np.testing.assert_allclose(out[f"{FUTURE_PREFIX}_0_start"], out["end"] + 1.0)
    np.testing.assert_allclose(
        out[f"{FUTURE_PREFIX}_0_end"], out[f"{FUTURE_PREFIX}_0_start"] + 10.0
    )
    # first action starts at 5.0 -> window end = 4.0 >= 1/30 -> kept
    assert len(out) == 6 and len(disc) == 0


def test_convert_to_anticipation_drop_styles():
    df = _mk_df(start0=0.5)  # first action window ends at -0.5 -> dropped
    out, disc = convert_to_anticipation(df.copy(), tau_a=1.0, tau_o=10.0)
    assert len(out) == 5 and len(disc) == 1
    assert disc.iloc[0]["uid"] == 1
    # index is reset
    assert list(out.index) == list(range(5))

    out_f, _ = convert_to_anticipation(
        df.copy(), tau_a=1.0, tau_o=10.0, drop_style="full_context_in"
    )
    # full context needs start' = start - 11 >= 1/30: starts at 0.5+20i
    # 0.5: -10.5 no; 20.5: 9.5 no->yes(9.5>=0.033) yes; so drops only i=0
    assert len(out_f) == 5

    out_ab, _ = convert_to_anticipation(
        df.copy(), tau_a=1.0, tau_o=10.0, drop_style="action_banks"
    )
    # end' = start-1 >= 2 -> start >= 3: drops 0.5 only
    assert len(out_ab) == 5


def test_convert_to_anticipation_recognition_mode():
    df = _mk_df()
    out, _ = convert_to_anticipation(df.copy(), tau_a=-999, tau_o=0)
    np.testing.assert_allclose(out["start"], out["orig_start"])
    np.testing.assert_allclose(out["end"], out["orig_end"])
    # future clip == the observed clip
    np.testing.assert_allclose(out[f"{FUTURE_PREFIX}_0_start"], out["start"], atol=1e-9)


def test_convert_future_clip_special_ratio():
    df = _mk_df()
    out, _ = convert_to_anticipation(
        df.copy(), tau_a=1.0, tau_o=10.0, future_clip_ratios=(-999, 0.5)
    )
    np.testing.assert_allclose(out[f"{FUTURE_PREFIX}_0_start"], out["start"])
    np.testing.assert_allclose(out[f"{FUTURE_PREFIX}_0_end"], out["end"])
    np.testing.assert_allclose(out[f"{FUTURE_PREFIX}_1_start"], out["end"] + 0.5)
    with pytest.raises(ValueError):
        convert_to_anticipation(df.copy(), 1.0, 10.0, future_clip_ratios=(50,))


# ---------------------------------------------------------------- sampling
def test_compute_read_window_last_clip():
    ns, ne, fps = compute_read_window(
        1.0, 11.0, 30.0, 10, 1.0, SAMPLE_STRAT_LAST, np.random.default_rng(0)
    )
    assert (ns, ne, fps) == (1.0, 11.0, 30.0)


def test_compute_read_window_clamps_at_zero():
    # anticipation can push start negative; window must clamp
    ns, ne, _ = compute_read_window(
        -5.0, 3.0, 30.0, 10, 1.0, SAMPLE_STRAT_LAST, np.random.default_rng(0)
    )
    assert ns >= 0 and ne <= 3.0


def test_subsample_last_keeps_final_frame():
    idx = subsample_indices(300, 30.0, 1.0, SAMPLE_STRAT_LAST)
    assert idx[-1] == 299 and len(idx) == 10
    np.testing.assert_array_equal(idx, np.arange(29, 300, 30))


def test_subsample_first_keeps_first_frame():
    idx = subsample_indices(300, 30.0, 1.0, "first_clip")
    np.testing.assert_array_equal(idx, np.arange(0, 300, 30))


def test_pad_last_repeats_first_frame():
    idx = pad_or_crop_indices(np.asarray([29, 59, 89]), 10, SAMPLE_STRAT_LAST)
    np.testing.assert_array_equal(idx, [29] * 7 + [29, 59, 89])


def test_pad_other_repeats_last_frame():
    idx = pad_or_crop_indices(np.asarray([0, 30]), 5, "first_clip")
    np.testing.assert_array_equal(idx, [0, 30, 30, 30, 30])


def test_sample_clip_frames_seconds():
    idx, secs = sample_clip_frames(300, 1.0, 11.0, 30.0, 1.0, 10, SAMPLE_STRAT_LAST)
    # timestamps linspace(1, 11, 300) at the kept indices
    expect = np.linspace(1.0, 11.0, 300)[idx]
    np.testing.assert_allclose(secs, expect)


# ------------------------------------------------------------ segments
def test_dense_labels_to_segments():
    dense = [(0.0, 2.0, 7), (3.0, 4.0, 8)]
    segs = dense_labels_to_segments(dense, 0.0, 4.0)
    # [2s of 7], [1s gap dummy], [1s of 8]
    assert segs == [[2.0, 7], [1.0, -1], [1.0, 8]]
    segs_fixed = dense_labels_to_segments(dense, 0.0, 4.0, pred_steps=6, fixed_duration=1.0)
    assert segs_fixed == [[1.0, 7], [1.0, 7], [1.0, -1], [1.0, 8], [-1, -1], [-1, -1]]


# ---------------------------------------------------- dataset end-to-end
@pytest.fixture
def feat_store(tmp_path):
    """Synthetic feature store: feature of frame i == [i]*C."""
    C = 8
    n_frames = 2000
    arr = np.tile(np.arange(1, n_frames + 1, dtype=np.float32)[:, None], (1, C))
    np.save(tmp_path / "P01_01.npy", arr)
    return tmp_path, C


def _mk_dataset(feat_root, tau_a=1.0, tau_o=10.0, **kwargs):
    df = _mk_df(start0=15.0, gap=10.0)
    conv = lambda d: convert_to_anticipation(d, tau_a=tau_a, tau_o=tau_o)  # noqa: E731
    defaults = dict(
        root=str(feat_root),
        frames_per_clip=10,
        frame_rate=1.0,
        subclips_options={"num_frames": 1, "stride": 1},
        reader=NpyFeatsReader(str(feat_root), read_type="normal"),
        label_type=["verb", "noun", "action"],
        sample_strategy=SAMPLE_STRAT_LAST,
        conv_to_anticipate_fn=conv,
        verb_classes={f"v{i}": i for i in range(3)},
        noun_classes={f"n{i}": i for i in range(4)},
        action_classes={f"a{i}": i for i in range(5)},
    )
    defaults.update(kwargs)
    return VideoDataset(df, **defaults)


def test_dataset_feature_path_exact_frames(feat_store):
    root, C = feat_store
    ds = _mk_dataset(root)
    assert len(ds) == 6
    item = ds[0]
    # First action at t=15 -> window [4, 14]; RULSTM 'normal' read @30fps:
    # frames floor(4*30)+1 .. floor(14*30) = [121..420]; last_clip @1fps
    # strides 30 from the back -> frames 150, 180, ..., 420.
    video = item["video"]  # (#clips=10, C, T'=1, 1, 1)
    assert video.shape == (10, C, 1, 1, 1)
    got = video[:, 0, 0, 0, 0]
    np.testing.assert_allclose(got, np.arange(150, 421, 30, dtype=np.float32))
    assert item["target"]["verb"] == 0
    assert item["target"]["action"] == 0
    assert item["uid"] == 1
    # video_frame_sec: (#clips, 1), increasing, ending at ~14
    secs = item["video_frame_sec"]
    assert secs.shape == (10, 1)
    assert secs[-1, 0] == pytest.approx(14.0, abs=0.05)


def test_dataset_seg_labels(feat_store):
    root, _ = feat_store
    ds = _mk_dataset(root, load_seg_labels=True)
    # Item 2's window [14+10-11+... ] overlaps item 1's action segment:
    # actions at [15,18],[25,28],... item1 (uid2) window = [14,24]: frames at
    # seconds 15..24; action0 spans [15,18] -> those frames labeled 0
    item = ds[1]
    tsc = item["target_subclips"]["action"]  # (#clips, T')
    assert tsc.shape == (10, 1)
    secs = item["video_frame_sec"][:, 0]
    expect = np.where((secs >= 15.0) & (secs <= 18.0), 0, -1)
    np.testing.assert_array_equal(tsc[:, 0], expect)


def test_dataset_seg_labels_overlap_resolution(feat_store):
    root, _ = feat_store
    # Two overlapping annotations; reference resolves by min |t - (end-start)/2|
    df = pd.DataFrame(
        [
            dict(uid=1, video_path="P01_01.MP4", start=20.0, end=30.0,
                 verb_class=1, noun_class=1, action_class=1, participant_id="P01"),
            dict(uid=2, video_path="P01_01.MP4", start=22.0, end=24.0,
                 verb_class=2, noun_class=2, action_class=2, participant_id="P01"),
            dict(uid=3, video_path="P01_01.MP4", start=40.0, end=42.0,
                 verb_class=0, noun_class=0, action_class=0, participant_id="P01"),
        ]
    )
    ds = VideoDataset(
        df,
        root=str(root),
        frames_per_clip=10,
        frame_rate=1.0,
        subclips_options={"num_frames": 1, "stride": 1},
        reader=NpyFeatsReader(str(root), read_type="normal"),
        label_type=["action"],
        sample_strategy=SAMPLE_STRAT_LAST,
        conv_to_anticipate_fn=lambda d: convert_to_anticipation(d, 1.0, 10.0),
        load_seg_labels=True,
        action_classes={"a0": 0, "a1": 1, "a2": 2},
    )
    item = ds[2]  # uid3: window [29, 39]; frame at t=30 overlaps only uid1
    secs = item["video_frame_sec"][:, 0]
    lbl = item["target_subclips"]["action"][:, 0]
    # t=30: only uid1 (span [20,30]) matches -> label 1. t>30: nothing -> -1
    for t, l in zip(secs, lbl):
        if 20 <= t <= 30:
            assert l == 1
        else:
            assert l == -1
    # overlap region: t=23 matches both; reference's quirky resolver picks
    # argmin |t - (end-start)/2| = |23-5|=18 (uid1) vs |23-1|=22 (uid2)
    # -> uid1 wins despite uid2 being the tighter annotation.
    labels = ds._get_vidseg_labels(ds.df.loc[2], np.asarray([[23.0]]))
    assert labels["action"][0, 0] == 1
    # away from uid1's coverage the tight annotation is unopposed
    labels2 = ds._get_vidseg_labels(ds.df.loc[2], np.asarray([[41.0]]))
    assert labels2["action"][0, 0] == 0


def test_dataset_repeat_and_balance(feat_store):
    root, _ = feat_store
    ds = _mk_dataset(root, repeat_data_times=2.0)
    assert len(ds) == 12
    assert ds[7]["uid"] == ds.df.loc[3, "uid"]

    ds_bal = _mk_dataset(root, class_balanced_sampling=False)
    assert ds_bal[0]["idx"] == 0


def test_dataset_future_clips(feat_store):
    root, C = feat_store
    ds = _mk_dataset(root, return_future_clips_too=True)
    item = ds[0]
    key = f"{FUTURE_PREFIX}_0_video"
    assert key in item
    assert item[key].shape == (10, C, 1, 1, 1)
    # future clip = [start'+tau_a .. +tau_o] = [15, 25] read first_clip:
    # frames [floor(15*30)+1 .. floor(25*30)] = [451..750], first_clip @1fps
    # strides from front: 451, 481, ...
    got = item[key][:, 0, 0, 0, 0]
    np.testing.assert_allclose(got, np.arange(451, 750, 30, dtype=np.float32)[:10])


def test_dataset_uid_subset(feat_store):
    root, _ = feat_store
    ds = _mk_dataset(root, uid_subset=[3, 1])
    assert len(ds) == 2
    assert ds[0]["uid"] == 3 and ds[1]["uid"] == 1


def test_conv_to_anticipate_fn_runtime_hook(feat_store):
    """Per-row runtime anticipation (reference base_video_dataset.py:773-778):
    the hook rewrites each row at __getitem__ time; None rows are skipped
    items; mutually exclusive with the offline conversion."""
    from avt_tpu.data.anticipation import convert_to_anticipation

    root, C = feat_store
    calls = []

    def runtime_conv(row, df):
        calls.append(row["uid"])
        if row["uid"] == 2:
            return None  # simulates a row whose window falls off the video
        row = row.copy()
        converted, _ = convert_to_anticipation(
            pd.DataFrame([row]), tau_a=1.0, tau_o=10.0
        )
        return None if converted.empty else converted.iloc[0]

    ds = _mk_dataset(
        root, conv_to_anticipate_fn=None,
        conv_to_anticipate_fn_runtime=runtime_conv,
    )
    item0 = ds[0]
    assert item0 is not None and calls, "hook never invoked"
    # compare against the offline conversion of the same row
    ds_off = _mk_dataset(root)
    item_off = ds_off[0]
    np.testing.assert_allclose(item0["video"], item_off["video"])
    # a None from the hook drops the item (loader backfills)
    uid2_idx = int(ds.df.index[ds.df["uid"] == 2][0])
    assert ds[uid2_idx] is None
    # mutual exclusion enforced
    with pytest.raises(AssertionError):
        _mk_dataset(root, conv_to_anticipate_fn_runtime=runtime_conv)
