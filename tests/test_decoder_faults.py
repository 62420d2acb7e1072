"""Decoder fault matrix: corrupt/truncated/streamless containers through
the reader, the FULL dataset __getitem__, and the loader backfill path.

Parity target: the reference's tolerance surface — unreadable videos yield
None items filtered by collate (func/train.py:500-508), zero-FPS/empty
clips become black frames (base_video_dataset.py:536-539,598-605) — never
a crash.
"""
import os
import wave

import numpy as np
import pandas as pd
import pytest

cv2 = pytest.importorskip("cv2")

from avt_tpu.data.dataset import VideoDataset
from avt_tpu.data.loader import DataLoader
from avt_tpu.data.readers import Reader
from avt_tpu.data.video_decoder import (
    LibavVideoReader,
    get_video_info,
    have_native_decoder,
)

pytestmark = pytest.mark.skipif(
    not have_native_decoder(), reason="native decoder not available"
)

FPS = 10.0
W, H = 64, 48


def _write_video(path, n_frames=100, fourcc="mp4v"):
    ext = {"mp4v": ".mp4", "MJPG": ".avi"}[fourcc]
    path = str(path) + ext
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*fourcc), FPS, (W, H))
    for i in range(n_frames):
        frame = np.full((H, W, 3), 100, np.uint8)
        frame[:, :, 2] = i % 256
        writer.write(frame)
    writer.release()
    return path


@pytest.fixture()
def good_video(tmp_path):
    return _write_video(tmp_path / "good")


@pytest.fixture()
def truncated_mp4(tmp_path):
    """An mp4 cut mid-file: the moov index (written at close) is gone."""
    path = _write_video(tmp_path / "trunc")
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[: len(data) // 2])
    return path


@pytest.fixture()
def truncated_avi(tmp_path):
    """A streamable container cut mid-GOP: a decodable prefix remains."""
    path = _write_video(tmp_path / "trunc_gop", fourcc="MJPG")
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[: int(len(data) * 0.6)])
    return path


@pytest.fixture()
def audio_only(tmp_path):
    """A real container (WAV) with zero video streams."""
    path = str(tmp_path / "audio.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 8000)
    return path


@pytest.fixture()
def garbage_file(tmp_path):
    path = str(tmp_path / "garbage.mp4")
    with open(path, "wb") as f:
        f.write(os.urandom(4096))
    return path


def test_reader_tolerates_corrupt_containers(
    truncated_mp4, audio_only, garbage_file
):
    """Unopenable/streamless inputs: fps probe reports 0, a read returns
    zero frames or raises IOError — never a segfault/abort."""
    reader = LibavVideoReader()
    for path in (truncated_mp4, audio_only, garbage_file):
        fps = reader.get_frame_rate(path)
        assert fps == 0.0 or not np.isfinite(fps) or fps > 0, fps
        try:
            frames, _ = reader(path, 0.0, 2.0, None, None)
        except IOError:
            continue  # loader backfill path
        assert frames.shape[0] == 0 or frames.shape[-1] == 3


def test_probe_corrupt_raises_cleanly(garbage_file):
    with pytest.raises(IOError):
        get_video_info(garbage_file)


def test_truncated_avi_decodes_prefix(truncated_avi):
    """Mid-GOP truncation of a streamable container: the decoder returns
    the intact prefix frames and stops at the damage, no crash."""
    reader = LibavVideoReader()
    fps = reader.get_frame_rate(truncated_avi)
    assert fps == pytest.approx(FPS, abs=0.5)
    try:
        frames, info = reader(truncated_avi, 0.0, 10.0, None, None)
    except IOError:
        pytest.skip("demuxer refuses the truncated index entirely (also ok)")
    assert 0 < frames.shape[0] <= 100
    assert frames.shape[1:] == (H, W, 3)
    # the prefix really is the original content (red channel = frame idx)
    assert int(frames[5, 0, 0, 0]) in range(3, 9)


def _df(video_path, n=4):
    return pd.DataFrame(
        [dict(uid=i + 1, video_path=video_path, start=2.0 + i, end=4.0 + i,
              verb_class=0, noun_class=0, action_class=i % 2,
              participant_id="P0")
         for i in range(n)]
    )


def _make_ds(video_path, reader=None):
    return VideoDataset(
        _df(os.path.basename(video_path)),
        root=os.path.dirname(video_path),
        frames_per_clip=4, frame_rate=2.0,
        reader=reader or LibavVideoReader(),
        label_type=["action"], sample_strategy="last_clip",
        action_classes={"a": 0, "b": 1},
    )


def test_getitem_corrupt_video_backfills(good_video, truncated_mp4):
    """Full __getitem__ + loader: a corrupt video's items fail and are
    backfilled; the epoch still yields full static-shape batches and the
    failure is counted (reference collate_fn_remove_audio semantics)."""
    import logging

    ds_good = _make_ds(good_video)
    item = ds_good[0]
    assert item["video"].shape[0] >= 1

    ds_bad = _make_ds(truncated_mp4)
    # item-level: corrupt read must either raise (-> loader None) or give
    # zeros, never crash the process
    try:
        bad_item = ds_bad[0]
        assert np.all(np.asarray(bad_item["video"]) == 0)
    except Exception as e:  # noqa: BLE001 - any clean python error is fine
        logging.getLogger(__name__).info("corrupt item raised: %s", e)

    # loader-level over a mixed dataset: batches stay full-size
    from avt_tpu.data.dataset import ConcatDataset

    mixed = ConcatDataset([ds_good, ds_bad])
    loader = DataLoader(
        mixed, 4, shuffle=False, drop_last=True, num_workers=2,
        keys=["video", "target", "idx"], backfill="repeat",
    )
    batches = list(loader)
    assert all(b["video"].shape[0] == 4 for b in batches)


def test_getitem_zero_fps_black_frames(tmp_path):
    """A reader reporting fps=0 / empty decode yields BLACK frames through
    the full __getitem__ (reference base_video_dataset.py:536-539,598-605):
    the item keeps its labels, the video is zeros at the dataset's frame
    geometry — not a crash, not a dropped item."""

    class FlakyReader(Reader):
        """good.mp4 decodes; anything else probes fps=0 and decodes empty."""

        def get_frame_rate(self, video_path):
            return FPS if "good" in str(video_path) else 0.0

        def __call__(self, video_path, start, end, fps, row):
            if "good" in str(video_path):
                n = max(1, int((end - start) * FPS))
                return np.full((n, H, W, 3), 7, dtype=np.uint8), {}
            return np.zeros((0, H, W, 3), dtype=np.uint8), {}

    reader = FlakyReader()
    df = pd.concat([_df("good.mp4", n=2), _df("dead.mp4", n=2)],
                   ignore_index=True)
    df["uid"] = range(1, len(df) + 1)
    ds = VideoDataset(
        df, root=str(tmp_path), frames_per_clip=4, frame_rate=2.0,
        reader=reader, label_type=["action"], sample_strategy="last_clip",
        action_classes={"a": 0, "b": 1},
    )
    good_item = ds[0]  # primes the frame geometry
    assert np.asarray(good_item["video"]).max() == 7
    bad_item = ds[2]
    assert bad_item is not None, "zero-fps item must not be dropped"
    video = np.asarray(bad_item["video"])
    assert video.size > 0 and np.all(video == 0)
    assert bad_item["target"]["action"] == 0
    # before any successful read the geometry is unknown -> None (loader
    # backfill), never a crash
    ds2 = VideoDataset(
        _df("dead.mp4"), root=str(tmp_path), frames_per_clip=4,
        frame_rate=2.0, reader=reader, label_type=["action"],
        sample_strategy="last_clip", action_classes={"a": 0, "b": 1},
    )
    assert ds2[0] is None


def test_vfr_timestamps_respected(tmp_path):
    """VFR stream (pts != frame_idx/fps, via the native remuxer's
    quadratic re-timing): the decoder returns PTS-based seconds, and a
    ranged read selects frames by TIME, not by frame index."""
    from avt_tpu.data.video_decoder import remux

    src = _write_video(tmp_path / "cfr", n_frames=60)
    vfr = str(tmp_path / "vfr.mp4")
    # sec' = sec + 0.05*sec^2: frame spacing stretches by (1 + 0.1*sec),
    # from 0.100 s at the start to ~0.159 s at sec=5.9
    remux(src, vfr, pts_scale=1.0, pts_quad=0.05)
    reader = LibavVideoReader()
    handle = reader._pool.acquire(vfr)
    frames, pts = handle.read_range(0.0, 10.0)
    assert frames.shape[0] > 10
    d = np.diff(pts)
    assert d.min() > 0
    # non-uniform spacing is the point: the last gap is clearly larger
    assert d[-1] > 1.4 * d[0]
    # each frame's pts matches the quadratic re-timing of its source time
    src_sec = np.arange(frames.shape[0]) / FPS
    np.testing.assert_allclose(
        pts, src_sec + 0.05 * src_sec**2, atol=1.5 / FPS)
    # a ranged read by TIME picks the right content: at t~4.0 s the
    # original time solves s + 0.05 s^2 = 4 -> s ~= 3.32 -> frame ~33
    sub, sub_pts = handle.read_range(3.9, 4.1)
    assert sub.shape[0] >= 1
    content_idx = int(sub[0, 0, 0, 0])  # red channel = source frame index
    assert abs(content_idx - 33) <= 2, content_idx


def test_rotation_metadata_tolerated(tmp_path):
    """Rotation metadata must not break decode: the reference's
    torchvision reader ignores display matrices (frames come out in coded
    orientation); ours does the same — and never crashes."""
    from avt_tpu.data.video_decoder import remux

    src = _write_video(tmp_path / "src", n_frames=30)
    rot = str(tmp_path / "rot.mp4")
    remux(src, rot, rotation_deg=90)
    info = get_video_info(rot)
    assert info["fps"] == pytest.approx(FPS, abs=0.5)
    reader = LibavVideoReader()
    frames, _ = reader(rot, 0.0, 2.0, None, None)
    assert frames.shape[0] >= 10
    # coded orientation preserved (no implicit rotation)
    assert frames.shape[1:] == (H, W, 3)
