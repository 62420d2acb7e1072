"""Differential parity: eval preprocessing vs the ACTUAL reference transforms.

Imports the genuine `common.transforms` (reference common/transforms.py) and
pins avt_tpu's fused device-side eval path against the reference's composed
per-clip pipeline (func/train.py:570-584):

  ToTensorVideo -> Resize -> x scale_pix_val -> [BGR reverse] ->
  NormalizeVideo -> MultiCropVideo(num_crops, flips)

plus the standalone index-math pieces: the smaller-side resize target
computation (common/transforms.py:60-91), temporal_center_crop (:303-308),
and UnfoldClips (:311-324). The golden-fixture tests in test_transforms pin
pixel values vs torch ops directly; this file pins the COMPOSITION against
the reference's own classes.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ref_harness

ref_harness.install_train_stubs()  # common.transforms pulls 5 tv names
ref_T = ref_harness.import_ref("common.transforms")

from avt_tpu.data.transforms import (  # noqa: E402
    VideoPreprocessor,
    temporal_center_crop,
    unfold_clips,
)

RNG = np.random.default_rng(11)

MEAN = (0.45, 0.43, 0.41)
STD = (0.225, 0.224, 0.229)


def _reference_eval(frames_thwc, scale, crop, num_crops, flips,
                    scale_pix_val=1.0, reverse_channels=False):
    x = ref_T.ToTensorVideo()(torch.from_numpy(frames_thwc))
    x = ref_T.Resize(scale)(x)
    x = x * scale_pix_val
    if reverse_channels:
        x = x[[2, 1, 0], ...]
    x = ref_T.NormalizeVideo(mean=MEAN, std=STD)(x)
    x = ref_T.MultiCropVideo((crop, crop), num_crops, flips)(x)
    return x.numpy()  # (#crops[, x2 flips], C, T, crop, crop)


@pytest.mark.parametrize("num_crops,flips,scale_pix,reverse", [
    (1, False, 1.0, False),   # default single center crop
    (3, True, 1.0, False),    # the challenge-submission 3-crop+flip path
    (3, False, 255.0, True),  # BN-Inception-style BGR 0..255 inputs
])
def test_eval_pipeline_vs_reference(num_crops, flips, scale_pix, reverse):
    T, H, W, scale, crop = 3, 48, 60, 40, 32
    frames = RNG.integers(0, 256, size=(T, H, W, 3), dtype=np.uint8)
    want = _reference_eval(
        frames, scale, crop, num_crops, flips,
        scale_pix_val=scale_pix, reverse_channels=reverse,
    )
    pre = VideoPreprocessor(
        crop_size=crop, scale_h=scale, scale_w=-1, mean=MEAN, std=STD,
        scale_pix_val=scale_pix, reverse_channels=reverse,
        eval_num_crops=num_crops, eval_flip_crops=flips,
    )
    got = np.asarray(pre.eval_fn(jnp.asarray(frames)[None]))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-5)


def test_resize_target_shape_vs_reference():
    """The max(int(side*scale), target) smaller-side math, incl. the pixel-
    truncation edge the reference comments about (common/transforms.py:85-88).
    """
    for H, W, target in [
        (31, 32, 24), (32, 31, 24), (33, 65, 32), (65, 33, 32),
        (40, 40, 37), (37, 41, 37), (48, 60, 40), (60, 48, 40),
    ]:
        clip = torch.zeros((3, 2, H, W))
        want = tuple(ref_T.resize(clip, target, "bilinear").shape[-2:])
        pre = VideoPreprocessor(scale_h=target, scale_w=-1)
        assert pre._eval_resize_shape(H, W) == want, (H, W, target)


@pytest.mark.parametrize("T,L", [(4, 3), (6, 3), (5, 2), (7, 4), (8, 8)])
def test_temporal_center_crop_vs_reference(T, L):
    clip = RNG.normal(size=(3, T, 5, 6)).astype(np.float32)
    want = ref_T.temporal_center_crop(torch.from_numpy(clip), L).numpy()
    got = np.asarray(temporal_center_crop(jnp.asarray(clip), L))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("T,L,overlap", [(10, 4, 1.0), (9, 4, 0.5), (3, 4, 1.0)])
def test_unfold_clips_vs_reference(T, L, overlap):
    clip = RNG.normal(size=(3, T, 5, 6)).astype(np.float32)
    want = ref_T.UnfoldClips(L, overlap)(torch.from_numpy(clip)).numpy()
    got = np.asarray(unfold_clips(jnp.asarray(clip), L, overlap))
    np.testing.assert_array_equal(got, want)
