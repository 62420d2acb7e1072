"""Native libav decoder tests (synthetic videos written via OpenCV)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from avt_tpu.data.video_decoder import (
    LibavVideoReader,
    get_video_info,
    have_native_decoder,
)

pytestmark = pytest.mark.skipif(
    not have_native_decoder(), reason="native decoder not available"
)

FPS = 30.0
W, H, N = 64, 48, 150


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    """Each frame's red channel encodes its index (mp4v survives this)."""
    path = str(tmp_path_factory.mktemp("vid") / "test.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H))
    for i in range(N):
        frame = np.full((H, W, 3), 128, np.uint8)
        frame[:, :, 2] = i  # BGR red channel = frame index
        writer.write(frame)
    writer.release()
    return path


def test_probe(video):
    info = get_video_info(video)
    assert info["fps"] == pytest.approx(FPS, abs=0.1)
    assert info["len"] == pytest.approx(N / FPS, abs=0.1)


def test_read_range_exact_frames(video):
    reader = LibavVideoReader()
    assert reader.get_frame_rate(video) == pytest.approx(FPS, abs=0.1)
    # [1.0, 2.0] inclusive at 30 fps -> frames 30..60 (31 frames) with
    # exact presentation timestamps
    handle = reader._pool.acquire(str(video))
    frames, pts = handle.read_range(1.0, 2.0)
    assert frames.shape[1:] == (H, W, 3)
    assert frames.shape[0] == 31
    np.testing.assert_allclose(pts, np.arange(30, 61) / FPS, atol=1e-6)
    # pixel-exact parity with OpenCV's decode of the same frames
    cap = cv2.VideoCapture(video)
    cap.set(cv2.CAP_PROP_POS_FRAMES, 30)
    for i in range(31):
        ok, ref_bgr = cap.read()
        assert ok
        ref_rgb = cv2.cvtColor(ref_bgr, cv2.COLOR_BGR2RGB)
        np.testing.assert_allclose(
            frames[i].astype(int), ref_rgb.astype(int), atol=2
        )
    cap.release()


def test_read_from_start_and_past_end(video):
    reader = LibavVideoReader()
    frames, _ = reader(video, 0.0, 0.2, FPS, None)
    assert frames.shape[0] >= 6
    assert frames[0, :, :, 0].mean() < 2  # frame 0
    # range past the end clamps to available frames
    frames2, _ = reader(video, 4.5, 99.0, FPS, None)
    assert 12 <= frames2.shape[0] <= 17  # frames 135..149


def test_missing_file_yields_empty(tmp_path):
    reader = LibavVideoReader()
    assert reader.get_frame_rate(tmp_path / "nope.mp4") == 0.0
    frames, _ = reader(tmp_path / "nope.mp4", 0, 1, 30.0, None)
    assert frames.shape[0] == 0


def test_dataset_end_to_end_with_native_decoder(video, tmp_path):
    """Raw-video path: dataset + native decoder + device-side transforms."""
    import pandas as pd

    from avt_tpu.data import VideoDataset, convert_to_anticipation

    df = pd.DataFrame(
        [dict(uid=1, video_path="test.mp4", start=3.5, end=4.5,
              verb_class=0, noun_class=0, action_class=0,
              participant_id="P01")]
    )
    import os

    ds = VideoDataset(
        df,
        root=os.path.dirname(video),
        frames_per_clip=8,
        frame_rate=8.0,
        reader=LibavVideoReader(),
        label_type=["action"],
        sample_strategy="last_clip",
        conv_to_anticipate_fn=lambda d: convert_to_anticipation(d, 1.0, 2.0),
        action_classes={"a0": 0},
    )
    item = ds[0]
    # raw-video path: (T, H, W, 3) uint8; preprocessing + subclip fold
    # happen on-device inside the jitted step
    vid = item["video"]
    assert vid.shape == (8, 48, 64, 3) and vid.dtype == np.uint8
    secs = item["video_frame_sec"]
    assert float(secs.max()) <= 2.51


def test_handle_pool_concurrent_same_path(video):
    """Threads reading clips from the SAME video must not share a decode
    context (EK-style datasets have hundreds of clips per video); the pool
    hands out independent handles and recycles them."""
    from concurrent.futures import ThreadPoolExecutor

    reader = LibavVideoReader()

    def work(i):
        frames, _ = reader(video, 0.5 + 0.1 * i, 1.5 + 0.1 * i, None, None)
        return frames.shape[0]

    with ThreadPoolExecutor(4) as ex:
        counts = list(ex.map(work, range(8)))
    assert all(c == 31 for c in counts), counts
    # handles were recycled, not leaked: pool holds at most the burst size
    assert 1 <= len(reader._pool._free[str(video)]) <= 8
