"""Host-side data layer: annotations, anticipation window math, readers.

The pandas/NumPy annotation pipeline is kept bit-compatible with the
reference (datasets/base_video_dataset.py) because every downstream number
depends on it; the device feed (loader.py, transforms.py) is TPU-native:
fixed-shape uint8/float batches, device-side preprocessing, double-buffered
prefetch.
"""
from avt_tpu.data.anticipation import (
    convert_to_anticipation,
    dense_clip_sampler,
    dense_labels_to_segments,
    RULSTM_TSN_FPS,
    FUTURE_PREFIX,
)
from avt_tpu.data.sampling import (
    SAMPLE_STRAT_CNTR,
    SAMPLE_STRAT_RAND,
    SAMPLE_STRAT_LAST,
    SAMPLE_STRAT_FIRST,
    compute_read_window,
    subsample_indices,
    pad_or_crop_indices,
    sample_clip_frames,
)
from avt_tpu.data.dataset import VideoDataset
from avt_tpu.data.readers import (
    Reader,
    NpyFeatsReader,
    LMDBFeatsReader,
    VideoAsLabelOnehotReader,
    OpenCVVideoReader,
)

__all__ = [
    "convert_to_anticipation",
    "dense_clip_sampler",
    "dense_labels_to_segments",
    "RULSTM_TSN_FPS",
    "FUTURE_PREFIX",
    "SAMPLE_STRAT_CNTR",
    "SAMPLE_STRAT_RAND",
    "SAMPLE_STRAT_LAST",
    "SAMPLE_STRAT_FIRST",
    "compute_read_window",
    "subsample_indices",
    "pad_or_crop_indices",
    "sample_clip_frames",
    "VideoDataset",
    "Reader",
    "NpyFeatsReader",
    "LMDBFeatsReader",
    "VideoAsLabelOnehotReader",
    "OpenCVVideoReader",
]
