"""3D-convolutional video backbones: R3D, R(2+1)D, ir/ip-CSN.

Parity target: reference models/video_classification.py:26-210, which builds
torchvision video resnets with custom conv makers:
  * Conv2Plus1D (:85-113): (1,3,3) spatial conv -> BN -> ReLU -> (3,1,1)
    temporal conv, midplanes chosen to match 3D conv param count
  * Conv3DDepthwise (:45-66): 3x3x3 depthwise (ir-CSN)
  * IPConv3DDepthwise (:69-82): 1x1x1 pointwise -> BN -> 3x3x3 depthwise
  * stems: R2Plus1dStem, BasicStem_Pool (:26-42)
  * BN eps=1e-3 defaults (:116-125)

TPU-native: channels-last (NDHWC) layout throughout (XLA's preferred conv
layout), flax BatchNorm running stats in the 'batch_stats' collection
(flax momentum = 1 - torch momentum). The classifier head is omitted: the
reference drops it anyway (backbone_last_n_modules_to_drop=2), so these
return the (B, C', T', H', W') feature map the AVTModel contract expects.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avt_tpu.models.norm import TorchExactBatchNorm


class _BN(nn.Module):
    eps: float = 1e-3
    momentum_torch: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return TorchExactBatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum_torch,
            epsilon=self.eps,
            name="bn",
        )(x)


def _tv_midplanes(in_planes: int, planes: int) -> int:
    """torchvision's per-block Conv2Plus1D mid-channel count."""
    return (in_planes * planes * 3 * 3 * 3) // (in_planes * 3 * 3 + 3 * planes)


def _conv(features, kernel, stride=1, padding=0, groups=1, name=None):
    if isinstance(stride, int):
        stride = (stride, stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding),) * 3
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = tuple((p, p) for p in padding)
    return nn.Conv(
        features, kernel_size=kernel, strides=stride, padding=padding,
        use_bias=False, feature_group_count=groups, name=name,
        # torchvision VideoResNet._initialize_weights: kaiming_normal_
        # (fan_out, relu) on every conv — matters for the from-scratch
        # training configs (flax's default is lecun fan_in)
        kernel_init=nn.initializers.variance_scaling(
            2.0, "fan_out", "normal"),
    )


class Conv3DSimple(nn.Module):
    """Plain 3x3x3 conv (r3d)."""

    out_planes: int
    stride: int = 1
    bn_eps: float = 1e-3
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return _conv(self.out_planes, (3, 3, 3), self.stride, 1, name="conv")(x)

    downsample_stride = staticmethod(lambda s: (s, s, s))


class Conv2Plus1D(nn.Module):
    """(1,3,3) then (3,1,1) with a BN+ReLU between (R(2+1)D).

    midplanes: explicit mid-channel count. torchvision/VMZ blocks compute
    it ONCE per block from (block_in, planes) and pass it to both convs —
    the convention every released r2plus1d checkpoint follows (torchvision
    r2plus1d_18, ig65m VMZ trunks), so blocks here pass it explicitly.
    None falls back to recomputing from this conv's own (in, out) — the
    reference's custom maker behavior (video_classification.py:88-90),
    which diverges from the passed value only on stage-transition convs.
    """

    out_planes: int
    in_planes: int
    stride: int = 1
    midplanes: Optional[int] = None
    bn_eps: float = 1e-3
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        mid = self.midplanes
        if mid is None:
            mid = (self.in_planes * self.out_planes * 3 * 3 * 3) // (
                self.in_planes * 3 * 3 + 3 * self.out_planes
            )
        x = _conv(mid, (1, 3, 3), (1, self.stride, self.stride),
                  (0, 1, 1), name="conv_s")(x)
        x = _BN(self.bn_eps, self.bn_mom, name="bn_mid")(x, train=train)
        x = nn.relu(x)
        return _conv(self.out_planes, (3, 1, 1), (self.stride, 1, 1),
                     (1, 0, 0), name="conv_t")(x)

    downsample_stride = staticmethod(lambda s: (s, s, s))


class Conv3DDepthwise(nn.Module):
    """3x3x3 depthwise conv (ir-CSN)."""

    out_planes: int
    stride: int = 1
    bn_eps: float = 1e-3
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert x.shape[-1] == self.out_planes
        return _conv(self.out_planes, (3, 3, 3), self.stride, 1,
                     groups=self.out_planes, name="conv")(x)

    downsample_stride = staticmethod(lambda s: (s, s, s))


class IPConv3DDepthwise(nn.Module):
    """1x1x1 pointwise -> BN -> 3x3x3 depthwise (ip-CSN)."""

    out_planes: int
    stride: int = 1
    bn_eps: float = 1e-3
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert x.shape[-1] == self.out_planes
        x = _conv(self.out_planes, (1, 1, 1), 1, 0, name="conv_p")(x)
        x = _BN(self.bn_eps, self.bn_mom, name="bn_mid")(x, train=train)
        return _conv(self.out_planes, (3, 3, 3), self.stride, 1,
                     groups=self.out_planes, name="conv_dw")(x)

    downsample_stride = staticmethod(lambda s: (s, s, s))


class BasicBlock3D(nn.Module):
    planes: int
    conv_maker: Any
    stride: int = 1
    downsample: bool = False
    bn_eps: float = 1e-3
    bn_mom: float = 0.1
    expansion = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        identity = x
        # torchvision convention: ONE midplanes per block, from the block's
        # (in, planes) — both convs share it (released ckpt layout)
        mid = _tv_midplanes(x.shape[-1], self.planes)
        h = self._make(self.planes, x.shape[-1], self.stride, mid, "conv1")(
            x, train=train
        )
        h = _BN(self.bn_eps, self.bn_mom, name="bn1")(h, train=train)
        h = nn.relu(h)
        h = self._make(self.planes, self.planes, 1, mid, "conv2")(h, train=train)
        h = _BN(self.bn_eps, self.bn_mom, name="bn2")(h, train=train)
        if self.downsample:
            ds = self.conv_maker.downsample_stride(self.stride)
            identity = _conv(self.planes, (1, 1, 1), ds, 0, name="ds_conv")(x)
            identity = _BN(self.bn_eps, self.bn_mom, name="ds_bn")(
                identity, train=train
            )
        return nn.relu(h + identity)

    def _make(self, planes, in_planes, stride, midplanes, name):
        kwargs = dict(out_planes=planes, stride=stride,
                      bn_eps=self.bn_eps, bn_mom=self.bn_mom, name=name)
        if self.conv_maker is Conv2Plus1D:
            kwargs["in_planes"] = in_planes
            kwargs["midplanes"] = midplanes
        return self.conv_maker(**kwargs)


class Bottleneck3D(nn.Module):
    planes: int
    conv_maker: Any
    stride: int = 1
    downsample: bool = False
    bn_eps: float = 1e-3
    bn_mom: float = 0.1
    expansion = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        identity = x
        h = _conv(self.planes, (1, 1, 1), 1, 0, name="conv1")(x)
        h = _BN(self.bn_eps, self.bn_mom, name="bn1")(h, train=train)
        h = nn.relu(h)
        kwargs = dict(out_planes=self.planes, stride=self.stride,
                      bn_eps=self.bn_eps, bn_mom=self.bn_mom, name="conv2")
        if self.conv_maker is Conv2Plus1D:
            kwargs["in_planes"] = self.planes
            kwargs["midplanes"] = _tv_midplanes(x.shape[-1], self.planes)
        h = self.conv_maker(**kwargs)(h, train=train)
        h = _BN(self.bn_eps, self.bn_mom, name="bn2")(h, train=train)
        h = nn.relu(h)
        h = _conv(self.planes * 4, (1, 1, 1), 1, 0, name="conv3")(h)
        h = _BN(self.bn_eps, self.bn_mom, name="bn3")(h, train=train)
        if self.downsample:
            ds = self.conv_maker.downsample_stride(self.stride)
            identity = _conv(self.planes * 4, (1, 1, 1), ds, 0, name="ds_conv")(x)
            identity = _BN(self.bn_eps, self.bn_mom, name="ds_bn")(
                identity, train=train
            )
        return nn.relu(h + identity)


class VideoResNet(nn.Module):
    """Generic video resnet over NDHWC; input/output in the reference's
    (B, C, T, H, W) contract."""

    block: Any  # BasicBlock3D | Bottleneck3D
    conv_maker: Any
    layers: Sequence[int]
    stem: str  # 'basic' | 'r2plus1d' | 'basic_pool'
    bn_eps: float = 1e-3
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, video, *, train: bool = False):
        x = video.transpose(0, 2, 3, 4, 1)  # -> (B, T, H, W, C)
        if self.stem == "r2plus1d":
            x = _conv(45, (1, 7, 7), (1, 2, 2), (0, 3, 3), name="stem_conv1")(x)
            x = _BN(self.bn_eps, self.bn_mom, name="stem_bn1")(x, train=train)
            x = nn.relu(x)
            x = _conv(64, (3, 1, 1), 1, (1, 0, 0), name="stem_conv2")(x)
            x = _BN(self.bn_eps, self.bn_mom, name="stem_bn2")(x, train=train)
            x = nn.relu(x)
        else:
            x = _conv(64, (3, 7, 7), (1, 2, 2), (1, 3, 3), name="stem_conv")(x)
            x = _BN(self.bn_eps, self.bn_mom, name="stem_bn")(x, train=train)
            x = nn.relu(x)
            if self.stem == "basic_pool":
                x = nn.max_pool(
                    x, (1, 3, 3), strides=(1, 2, 2),
                    padding=((0, 0), (1, 1), (1, 1)),
                )
        planes = [64, 128, 256, 512]
        strides = [1, 2, 2, 2]
        for stage, (p, s, n) in enumerate(zip(planes, strides, self.layers)):
            for i in range(n):
                stride = s if i == 0 else 1
                in_ch = x.shape[-1]
                needs_ds = stride != 1 or in_ch != p * self.block.expansion
                x = self.block(
                    planes=p,
                    conv_maker=self.conv_maker,
                    stride=stride,
                    downsample=needs_ds and i == 0,
                    bn_eps=self.bn_eps,
                    bn_mom=self.bn_mom,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)
        return x.transpose(0, 4, 1, 2, 3)  # -> (B, C', T', H', W')

    @property
    def output_dim(self):
        return 512 * self.block.expansion


def r3d_18(bn_eps=1e-3, bn_mom=0.1):
    return VideoResNet(block=BasicBlock3D, conv_maker=Conv3DSimple,
                       layers=(2, 2, 2, 2), stem="basic",
                       bn_eps=bn_eps, bn_mom=bn_mom)


def r2plus1d_18(bn_eps=1e-3, bn_mom=0.1):
    return VideoResNet(block=BasicBlock3D, conv_maker=Conv2Plus1D,
                       layers=(2, 2, 2, 2), stem="r2plus1d",
                       bn_eps=bn_eps, bn_mom=bn_mom)


def r2plus1d_34(bn_eps=1e-3, bn_mom=0.1):
    return VideoResNet(block=BasicBlock3D, conv_maker=Conv2Plus1D,
                       layers=(3, 4, 6, 3), stem="r2plus1d",
                       bn_eps=bn_eps, bn_mom=bn_mom)


def r2plus1d_152(bn_eps=1e-3, bn_mom=0.1):
    return VideoResNet(block=Bottleneck3D, conv_maker=Conv2Plus1D,
                       layers=(3, 8, 36, 3), stem="r2plus1d",
                       bn_eps=bn_eps, bn_mom=bn_mom)


def ir_csn_152(bn_eps=1e-3, bn_mom=0.1):
    return VideoResNet(block=Bottleneck3D, conv_maker=Conv3DDepthwise,
                       layers=(3, 8, 36, 3), stem="basic_pool",
                       bn_eps=bn_eps, bn_mom=bn_mom)


def ip_csn_152(bn_eps=1e-3, bn_mom=0.1):
    return VideoResNet(block=Bottleneck3D, conv_maker=IPConv3DDepthwise,
                       layers=(3, 8, 36, 3), stem="basic_pool",
                       bn_eps=bn_eps, bn_mom=bn_mom)


def ip_csn_50(bn_eps=0.3, bn_mom=0.1):
    return VideoResNet(block=Bottleneck3D, conv_maker=IPConv3DDepthwise,
                       layers=(3, 8, 6, 3), stem="basic_pool",
                       bn_eps=bn_eps, bn_mom=bn_mom)
