"""Device preprocessing tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avt_tpu.data.transforms import VideoPreprocessor, color_jitter

RNG = np.random.default_rng(5)


def _frames(B=2, T=4, H=64, W=86):
    return jnp.asarray(
        RNG.integers(0, 256, size=(B, T, H, W, 3)).astype(np.uint8)
    )


def test_train_fn_shapes_and_range():
    pp = VideoPreprocessor(
        crop_size=32, scale_h="36-44", scale_w=-1,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), flip_p=0.5,
    )
    out = pp.train_fn(_frames(), jax.random.PRNGKey(0))
    assert out.shape == (2, 3, 4, 32, 32)
    # normalized with mean=std=0.5: range ~[-1, 1]
    assert float(jnp.min(out)) >= -1.001 and float(jnp.max(out)) <= 1.001


def test_train_fn_randomness_differs_per_clip_and_rng():
    pp = VideoPreprocessor(crop_size=32, scale_h="36-44", scale_w=-1, flip_p=0.5)
    f = _frames()
    o1 = pp.train_fn(f, jax.random.PRNGKey(0))
    o2 = pp.train_fn(f, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_eval_fn_center_crop_identity_on_exact_size():
    """No resize (scale == input smaller side), center crop == slice."""
    H = W = 40
    frames = jnp.asarray(RNG.integers(0, 256, size=(1, 2, H, W, 3)).astype(np.uint8))
    pp = VideoPreprocessor(
        crop_size=32, scale_h=40, scale_w=-1,
        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), eval_num_crops=1,
    )
    out = pp.eval_fn(frames)
    assert out.shape == (1, 1, 3, 2, 32, 32)
    ref = np.asarray(frames, dtype=np.float32)[0, :, 4:36, 4:36, :] / 255.0
    np.testing.assert_allclose(
        np.asarray(out[0, 0]).transpose(1, 2, 3, 0), ref, atol=1e-6
    )


def test_eval_fn_three_crops_and_flips():
    pp = VideoPreprocessor(
        crop_size=32, scale_h=36, scale_w=-1,
        eval_num_crops=3, eval_flip_crops=True,
    )
    out = pp.eval_fn(_frames())
    assert out.shape == (2, 6, 3, 4, 32, 32)
    # flipped copies mirror the unflipped ones on W
    np.testing.assert_allclose(
        np.asarray(out[:, 3]), np.asarray(out[:, 0])[..., ::-1], atol=1e-6
    )


def test_reverse_channels_and_scale_pix():
    frames = _frames(1, 1, 40, 40)
    pp = VideoPreprocessor(
        crop_size=40, scale_h=40, scale_w=-1, scale_pix_val=255.0,
        reverse_channels=True, mean=(0, 0, 0), std=(1, 1, 1),
        eval_num_crops=1,
    )
    out = np.asarray(pp.eval_fn(frames))  # (1,1,3,1,40,40)
    raw = np.asarray(frames, dtype=np.float32)[0, 0]
    np.testing.assert_allclose(out[0, 0, 0, 0], raw[..., 2], atol=1e-4)
    np.testing.assert_allclose(out[0, 0, 2, 0], raw[..., 0], atol=1e-4)


def test_color_jitter_brightness_only():
    x = jnp.full((2, 8, 8, 3), 0.25, dtype=jnp.float32)
    out = color_jitter(x, jax.random.PRNGKey(0), brightness=0.4)
    f = float(out[0, 0, 0, 0]) / 0.25
    assert 0.6 - 1e-5 <= f <= 1.4 + 1e-5
    # consistent across time
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-6)


def test_train_fn_scale_jitter_changes_content_scale():
    """With a wide scale range, different seeds give different crops."""
    pp = VideoPreprocessor(crop_size=16, scale_h="20-60", scale_w=-1, flip_p=0.0)
    f = _frames(1, 1, 64, 64)
    outs = [np.asarray(pp.train_fn(f, jax.random.PRNGKey(i))) for i in range(4)]
    diffs = [np.abs(outs[0] - o).mean() for o in outs[1:]]
    assert all(d > 1e-3 for d in diffs)


def test_temporal_center_crop_and_unfold_clips():
    """Parity with the reference's (exported, unused) temporal transforms
    (common/transforms.py:303-324): torch-checked semantics."""
    from avt_tpu.data.transforms import temporal_center_crop, unfold_clips

    vid = jnp.arange(3 * 10 * 2 * 2, dtype=jnp.float32).reshape(3, 10, 2, 2)
    out = temporal_center_crop(vid, 4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(vid[:, 3:7]))
    assert temporal_center_crop(vid, 12).shape == vid.shape

    clips = unfold_clips(vid, 4, 1.0)
    # torch: clip.unfold(1, 4, 4).permute(1, 0, 4, 2, 3) -> 2 clips of 4
    assert clips.shape == (2, 3, 4, 2, 2)
    np.testing.assert_array_equal(np.asarray(clips[0]), np.asarray(vid[:, :4]))
    np.testing.assert_array_equal(np.asarray(clips[1]), np.asarray(vid[:, 4:8]))
    # shorter than clip_len: whole video as one clip
    short = unfold_clips(vid[:, :3], 4, 1.0)
    assert short.shape == (1, 3, 3, 2, 2)


def test_resize_bilinear_matches_torch_interpolate():
    """resize_bilinear_torch == torch.nn.functional.interpolate(bilinear,
    antialias=False) — the reference's eval resize (common/transforms.py:
    60-91). Golden comparison against torch itself on random frames, both
    down- and up-scaling, non-square targets."""
    import torch

    from avt_tpu.data.transforms import resize_bilinear_torch

    rng = np.random.default_rng(3)
    for (H, W), (nh, nw) in [
        ((256, 456), (248, 442)),   # EK 256px videos -> scale-jitter low end
        ((100, 80), (224, 180)),    # upscale
        ((64, 64), (64, 64)),       # identity
        ((31, 57), (17, 119)),      # odd sizes, mixed down/up
    ]:
        frames = rng.integers(0, 256, size=(2, 3, H, W, 3)).astype(np.float32)
        got = np.asarray(resize_bilinear_torch(jnp.asarray(frames), nh, nw))
        # torch wants (N, C, H, W); fold (B, T) and move channels
        t = torch.from_numpy(frames).reshape(6, H, W, 3).permute(0, 3, 1, 2)
        want = torch.nn.functional.interpolate(
            t, size=(nh, nw), mode="bilinear", antialias=False
        ).permute(0, 2, 3, 1).reshape(2, 3, nh, nw, 3).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_resize_bilinear_exact_under_bf16_inputs():
    """A bfloat16 compute_dtype must NOT break the exactness claim: uint8
    pixel values are exactly representable in bf16 and the 2-tap
    interpolation always runs in f32, so bf16-input output == f32-input
    output bit for bit (and both match torch per the golden test)."""
    from avt_tpu.data.transforms import resize_bilinear_torch

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(2, 3, 64, 86, 3))
    f32 = np.asarray(
        resize_bilinear_torch(jnp.asarray(frames, jnp.float32), 56, 70))
    bf16 = np.asarray(
        resize_bilinear_torch(jnp.asarray(frames, jnp.bfloat16), 56, 70))
    assert f32.dtype == bf16.dtype == np.float32
    np.testing.assert_array_equal(bf16, f32)


def test_eval_fn_uses_torch_exact_resize():
    """The jitted eval path end-to-end equals a torch-computed reference:
    interpolate -> /255 -> normalize -> center crop."""
    import torch

    from avt_tpu.data.transforms import VideoPreprocessor

    rng = np.random.default_rng(4)
    H, W, cs = 120, 160, 64
    frames = rng.integers(0, 256, size=(1, 2, H, W, 3)).astype(np.uint8)
    mean, std = (0.45, 0.43, 0.41), (0.22, 0.23, 0.24)
    pp = VideoPreprocessor(crop_size=cs, scale_h=90, scale_w=-1,
                           mean=mean, std=std, eval_num_crops=1)
    got = np.asarray(pp.eval_fn(jnp.asarray(frames)))  # (1,1,3,T,cs,cs)

    t = torch.from_numpy(frames.astype(np.float32)).reshape(2, H, W, 3)
    t = t.permute(0, 3, 1, 2)
    nh, nw = pp._eval_resize_shape(H, W)
    t = torch.nn.functional.interpolate(t, size=(nh, nw), mode="bilinear")
    t = t / 255.0
    t = (t - torch.tensor(mean)[:, None, None]) / torch.tensor(std)[:, None, None]
    i, j = int(round((nh - cs) / 2.0)), int(round((nw - cs) / 2.0))
    want = t[:, :, i:i + cs, j:j + cs].permute(1, 0, 2, 3).numpy()[None, None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resized_crop_dynamic_vs_torch():
    """resized_crop_bilinear_torch with a traced (i, j, h, w) box ==
    torch crop + F.interpolate(bilinear, antialias=False). The dynamic
    path computes the scale as a traced f32 (no FMA emulation possible),
    so parity is to float noise (~1e-2 on 0..255 pixels), not bit-exact
    like the static-tap eval resize."""
    import torch
    import torch.nn.functional as F

    x = RNG.integers(0, 256, size=(2, 37, 53, 3)).astype(np.float32)
    for (i, j, h, w, oh, ow) in [
        (3, 5, 20, 30, 16, 16),    # downscale
        (0, 0, 37, 53, 24, 24),    # full image
        (10, 40, 7, 13, 32, 8),    # upscale rows, downscale cols
        (36, 52, 1, 1, 8, 8),      # degenerate 1x1 box -> constant
    ]:
        from avt_tpu.data.transforms import resized_crop_bilinear_torch

        fn = jax.jit(
            lambda a, ii, jj, hh, ww, o1=oh, o2=ow:
            resized_crop_bilinear_torch(a, ii, jj, hh, ww, o1, o2)
        )
        ours = np.asarray(fn(jnp.asarray(x), i, j, h, w))
        crop = torch.tensor(
            x[:, i:i + h, j:j + w, :].transpose(0, 3, 1, 2)
        )
        ref = F.interpolate(
            crop, (oh, ow), mode="bilinear", align_corners=False
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(
            ours, ref, atol=1.5e-2, rtol=0,
            err_msg=f"box {(i, j, h, w)} -> {(oh, ow)}",
        )


def test_random_resized_crop_contract():
    """random_resized_crop (reference common/transforms.py:195-230 /
    torchvision get_params): static output shape under jit, time-consistent
    box, degenerate scale/ratio reduces to a plain full-image resize, and
    the no-fit fallback takes the aspect-clamped center crop."""
    from avt_tpu.data.transforms import (
        random_resized_crop,
        resize_bilinear_torch,
        resized_crop_bilinear_torch,
    )

    x = jnp.asarray(RNG.random((4, 32, 48, 3)).astype(np.float32))
    out = jax.jit(
        lambda a, k: random_resized_crop(a, k, 16)
    )(x, jax.random.PRNGKey(0))
    assert out.shape == (4, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # interpolation cannot leave the source value range
    assert float(out.min()) >= float(x.min()) - 1e-6
    assert float(out.max()) <= float(x.max()) + 1e-6

    # scale=(1,1) ratio=(1,1) on a square image: the only fitting box is
    # the full image -> equals the plain bilinear resize
    sq = x[:, :, :32]
    a = np.asarray(
        random_resized_crop(sq, jax.random.PRNGKey(1), 16,
                            scale=(1.0, 1.0), ratio=(1.0, 1.0))
    )
    b = np.asarray(resize_bilinear_torch(sq, 16, 16))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=0)

    # impossible ratio range -> torchvision fallback: in_ratio(1.5) <
    # ratio[0] -> w=W, h=round(W/ratio[0]), centered
    fb = np.asarray(
        random_resized_crop(x, jax.random.PRNGKey(2), 16,
                            ratio=(50.0, 60.0))
    )
    h = round(48 / 50.0)  # 1
    expected = np.asarray(
        resized_crop_bilinear_torch(x, (32 - h) // 2, 0, h, 48, 16, 16)
    )
    np.testing.assert_allclose(fb, expected, atol=1e-6, rtol=0)
