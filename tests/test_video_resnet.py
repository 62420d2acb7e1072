"""Video resnet backbones: shapes, BN running stats, train-step updates."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avt_tpu.models import AVTModel, IdentityFuture, LinearClassifier, MeanAgg
from avt_tpu.models.temporal_agg import IdentityAgg
from avt_tpu.models.video_resnet import (
    VideoResNet,
    BasicBlock3D,
    Bottleneck3D,
    Conv2Plus1D,
    Conv3DDepthwise,
    IPConv3DDepthwise,
    Conv3DSimple,
    r2plus1d_18,
)
from avt_tpu.train import TrainState, build_optimizer, make_train_step

RNG = np.random.default_rng(13)


@pytest.mark.parametrize("block,maker,expansion", [
    (BasicBlock3D, Conv3DSimple, 1),
    (BasicBlock3D, Conv2Plus1D, 1),
    (Bottleneck3D, Conv3DDepthwise, 4),
    (Bottleneck3D, IPConv3DDepthwise, 4),
])
def test_video_resnet_shapes(block, maker, expansion):
    net = VideoResNet(
        block=block, conv_maker=maker, layers=(1, 1, 1, 1),
        stem="basic_pool" if maker in (Conv3DDepthwise, IPConv3DDepthwise)
        else "r2plus1d",
    )
    video = jnp.asarray(RNG.normal(size=(1, 3, 4, 64, 64)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), video)
    out = net.apply(variables, video)
    # stem /2 (+pool /2 for csn) then 3 stride-2 stages
    assert out.shape[0] == 1 and out.shape[1] == 512 * expansion
    assert "batch_stats" in variables
    assert np.isfinite(np.asarray(out)).all()


def test_r2plus1d_18_in_avt_model_with_bn_updates():
    model = AVTModel(
        backbone=r2plus1d_18(),
        temporal_aggregator=MeanAgg(in_features=512),
        future_predictor=IdentityFuture(in_features=512),
        temporal_aggregator_after_future_pred=IdentityAgg(in_features=512),
        classifiers={"action": LinearClassifier(out_features=7)},
        num_classes=(("action", 7),),
        backbone_dim=512,
    )
    video = jnp.asarray(RNG.normal(size=(2, 1, 3, 4, 64, 64)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), video, (2,))
    assert "batch_stats" in variables
    tx, _ = build_optimizer(
        variables, lr_wd=[["__all__", 0.01, 1e-4]],
        optimizer_name="sgd", scheduler_name="constant",
        iters_per_epoch=10, num_epochs=1,
    )
    step = make_train_step(
        model, tx, loss_wts={"cls_action": 1.0},
        num_classes={"action": 7}, donate=False,
    )
    state = TrainState.create(variables, tx)
    batch = {
        "video": video,
        "target": {"action": jnp.asarray(RNG.integers(0, 7, size=(2,)))},
    }
    stats_before = jax.tree.leaves(variables["batch_stats"])[0]
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    stats_after = jax.tree.leaves(state.params["batch_stats"])[0]
    # running stats moved (mutable update ran)
    assert not np.allclose(np.asarray(stats_before), np.asarray(stats_after))
    # params moved too
    p0 = jax.tree.leaves(variables["params"])[0]
    p1 = jax.tree.leaves(state.params["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # eval path (running averages) works
    out, _ = model.apply(state.params, video, train=False)
    assert np.isfinite(np.asarray(out["logits/action"])).all()


def test_bninception_shapes():
    from avt_tpu.models import BNInceptionVideo

    net = BNInceptionVideo()
    video = jnp.asarray(RNG.normal(size=(1, 3, 2, 96, 96)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), video)
    out = net.apply(variables, video)
    assert out.shape == (1, 1024, 2, 1, 1)
    assert "batch_stats" in variables
    assert np.isfinite(np.asarray(out)).all()


def test_torch_exact_bn_running_stats_vs_torch():
    """Train-mode BN trajectory differential vs torch.nn.BatchNorm3d.

    flax's stock BatchNorm folds the BIASED batch variance into the
    running average; torch accumulates the UNBIASED one (var * n/(n-1),
    torch/nn/modules/batchnorm.py). TorchExactBatchNorm replicates torch:
    feed the same input sequence through both in train mode and the
    normalized outputs AND the running stats must track step for step,
    then agree on the eval-mode forward that uses them."""
    import torch

    from avt_tpu.models.norm import TorchExactBatchNorm

    feat, steps = 5, 4
    # small spatial extent so the n/(n-1) correction is far above tolerance
    shape = (2, 3, 4, 4, feat)  # N, T, H, W, C  (n = 96 per channel)
    tbn = torch.nn.BatchNorm3d(feat, eps=1e-3, momentum=0.1).train()
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(feat) + 0.5)
        tbn.bias.copy_(torch.rand(feat) - 0.5)

    jbn = TorchExactBatchNorm(use_running_average=False, momentum=0.9,
                              epsilon=1e-3)
    xs = RNG.normal(size=(steps,) + shape).astype(np.float32) * 2 + 1
    variables = jbn.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]))
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy().copy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy().copy()),
        },
        "batch_stats": variables["batch_stats"],
    }
    for i in range(steps):
        got, mut = jbn.apply(variables, jnp.asarray(xs[i]),
                             mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
        with torch.no_grad():
            # torch layout (N, C, T, H, W)
            want = tbn(torch.from_numpy(
                xs[i].transpose(0, 4, 1, 2, 3))).numpy()
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 4, 1, 2, 3), want,
            rtol=1e-5, atol=1e-5, err_msg=f"train output, step {i}")
        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"running mean, step {i}")
        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"]["var"]),
            tbn.running_var.numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"running var, step {i}")

    jbn_eval = TorchExactBatchNorm(use_running_average=True, momentum=0.9,
                                   epsilon=1e-3)
    got = jbn_eval.apply(variables, jnp.asarray(xs[0]))
    with torch.no_grad():
        want = tbn.eval()(torch.from_numpy(
            xs[0].transpose(0, 4, 1, 2, 3))).numpy()
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), want,
        rtol=1e-5, atol=1e-5, err_msg="eval output on trained stats")


def test_conv_init_matches_torchvision_kaiming_fan_out():
    """From-scratch init parity: torchvision VideoResNet._initialize_weights
    applies kaiming_normal_(mode='fan_out', nonlinearity='relu') to every
    conv — std = sqrt(2 / (out_channels * receptive_field))."""
    from avt_tpu.models.video_resnet import r2plus1d_18

    net = r2plus1d_18()
    video = jnp.asarray(RNG.normal(size=(1, 3, 4, 32, 32)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), video)

    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    checked = 0
    for path, leaf in flat:
        if leaf.ndim == 5:  # conv kernels (kd, kh, kw, in, out)
            fan_out = leaf.shape[-1] * int(np.prod(leaf.shape[:3]))
            want_std = np.sqrt(2.0 / fan_out)
            got_std = float(np.std(np.asarray(leaf)))
            if leaf.size < 2000:  # too few samples for a tight estimate
                continue
            np.testing.assert_allclose(got_std, want_std, rtol=0.15)
            checked += 1
    assert checked >= 10
