"""Serving/export layer: jax.export round-trips of the eval forward.

The reference has no deployment path (its `test_only` mode re-runs the
trainer); avt_tpu/serve.py is added TPU-native capability. These tests pin
the export/deserialize/call round trip on the CPU backend: fused
preproc+forward artifacts, baked vs runtime params, multi-platform
lowering, the batch_predict pad/trim host loop, and the config+checkpoint
CLI (tools/export_model.py) on the smoke synthetic dataset.
"""
import importlib.util
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avt_tpu.data.transforms import VideoPreprocessor
from avt_tpu.losses import mse
from avt_tpu.models import (
    AVTh,
    AVTModel,
    IdentityAgg,
    LinearClassifier,
    ViT,
)
from avt_tpu.serve import (
    batch_predict,
    export_eval_forward,
    load_exported,
    make_eval_forward,
    save_exported,
)

B, T, N_CLS, DIM = 2, 4, 8, 64


@pytest.fixture(scope="module")
def tiny():
    model = AVTModel(
        backbone=ViT(img_size=32, patch_size=16, embed_dim=DIM, depth=2,
                     num_heads=2),
        temporal_aggregator=IdentityAgg(in_features=DIM),
        future_predictor=AVTh(
            in_features=DIM, inter_dim=DIM, n_layer=2, n_head=2,
            output_len=1, avg_last_n=1, return_past_too=True,
            future_pred_loss=lambda p, t: mse(p, t, reduction="none"),
        ),
        temporal_aggregator_after_future_pred=IdentityAgg(in_features=DIM),
        classifiers={"action": LinearClassifier(out_features=N_CLS)},
        num_classes=(("action", N_CLS),),
        backbone_dim=DIM,
        dropout=0.0,
        classifier_on_past=True,
    )
    pp = VideoPreprocessor(
        crop_size=32, scale_h=36, scale_w=-1,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        eval_num_crops=3, eval_flip_crops=True,
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(B, T, 48, 64, 3)).astype(np.uint8)
    video0 = pp.eval_fn(jnp.asarray(frames))[:, None]
    params = model.init(jax.random.PRNGKey(0), video0, (B,))
    return model, pp, params, frames


def test_export_roundtrip_baked(tiny, tmp_path):
    model, pp, params, frames = tiny
    direct = jax.jit(make_eval_forward(model, pp))(params, frames)

    exported = export_eval_forward(
        model, params, frames.shape, preprocessor=pp, platforms=("cpu",))
    path = tmp_path / "avt.stablehlo"
    save_exported(exported, str(path))
    back = load_exported(str(path))
    assert back.platforms == ("cpu",)

    got = back.call(frames)
    assert set(got) == {"logits/action"}
    np.testing.assert_allclose(
        np.asarray(got["logits/action"]),
        np.asarray(direct["logits/action"]), atol=1e-5)


def test_batch_predict_pads_and_trims(tiny):
    model, pp, params, frames = tiny
    exported = export_eval_forward(
        model, params, frames.shape, preprocessor=pp, platforms=("cpu",))
    rng = np.random.default_rng(1)
    many = rng.integers(0, 256, size=(2 * B + 1, T, 48, 64, 3)).astype(np.uint8)
    out = batch_predict(exported, many)
    assert out["logits/action"].shape == (2 * B + 1, N_CLS)
    # rows are the same as feeding aligned batches directly
    direct = np.asarray(exported.call(many[:B])["logits/action"])
    np.testing.assert_allclose(out["logits/action"][:B], direct, atol=1e-5)


def test_batch_predict_empty_input(tiny):
    model, pp, params, frames = tiny
    exported = export_eval_forward(
        model, params, frames.shape, preprocessor=pp, platforms=("cpu",))
    out = batch_predict(exported, frames[:0])
    assert set(out) == {"logits/action"}
    assert out["logits/action"].shape == (0, N_CLS)


def test_export_separate_params(tiny):
    model, pp, params, frames = tiny
    exported = export_eval_forward(
        model, params, frames.shape, preprocessor=pp,
        platforms=("cpu",), bake_params=False)
    got = exported.call(params, frames)
    direct = jax.jit(make_eval_forward(model, pp))(params, frames)
    np.testing.assert_allclose(
        np.asarray(got["logits/action"]),
        np.asarray(direct["logits/action"]), atol=1e-5)
    with pytest.raises(ValueError, match="params-baked"):
        batch_predict(exported, frames)


def test_export_multi_platform_and_no_preproc(tiny):
    model, pp, params, frames = tiny
    video = np.asarray(pp.eval_fn(jnp.asarray(frames))[:, None])
    exported = export_eval_forward(
        model, params, video.shape, platforms=("cpu", "tpu"))
    assert exported.platforms == ("cpu", "tpu")
    got = exported.call(video)
    direct = jax.jit(make_eval_forward(model, None))(params, video)
    np.testing.assert_allclose(
        np.asarray(got["logits/action"]),
        np.asarray(direct["logits/action"]), atol=1e-5)


def test_export_cli_on_smoke_dataset(tmp_path):
    _SMOKE = Path(__file__).resolve().parent.parent / "tools" / "smoke_train.py"
    sspec = importlib.util.spec_from_file_location("smoke_tool", _SMOKE)
    smoke = importlib.util.module_from_spec(sspec)
    sspec.loader.exec_module(smoke)
    _EXPORT = Path(__file__).resolve().parent.parent / "tools" / "export_model.py"
    espec = importlib.util.spec_from_file_location("export_tool", _EXPORT)
    export_tool = importlib.util.module_from_spec(espec)
    espec.loader.exec_module(export_tool)

    raw_root = tmp_path / "raw"
    smoke.make_video_dataset(raw_root)
    conf = tmp_path / "expt.txt"
    conf.write_text("\n".join(smoke.raw_overrides(raw_root, 1)) + "\n")

    out = tmp_path / "model.stablehlo"
    export_tool.main([
        "-c", str(conf), "-o", str(out),
        "-B", "2", "-T", "4", "--raw-hw", "48", "64",
        "--platforms", "cpu",
        # positional overrides compose on top of the file (train_net
        # grammar, incl. values containing spaces)
        "data_eval.mean=[0.5, 0.5, 0.5]",
    ])
    exported = load_exported(str(out))
    frames = np.zeros((2, 4, 48, 64, 3), np.uint8)
    got = exported.call(frames)
    assert np.asarray(got["logits/action"]).shape[0] == 2
    assert np.isfinite(np.asarray(got["logits/action"])).all()
