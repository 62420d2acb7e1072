"""BN-Inception (Inception-v2) frame-level backbone.

Parity target: reference models/video_classification.py:241-246
(BNInceptionVideo): the `pretrainedmodels.bninception` 2D CNN run per frame
with the classifier dropped and global average pooling — the TSN-style
backbone. Architecture follows the standard BN-Inception (Ioffe & Szegedy
'15 / Caffe model) channel configuration; channels-last 2D convs (XLA's
preferred layout), BatchNorm running stats in 'batch_stats'.

Output contract: (B, 3, T, H, W) -> (B, 1024, T, 1, 1).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from avt_tpu.models.norm import TorchExactBatchNorm


class _ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    bn_eps: float = 1e-3
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        pad = tuple((k // 2, k // 2) for k in self.kernel)
        # use_bias: the Caffe->pretrainedmodels conversion kept conv biases
        # (redundant with BN mathematically, but the pretrained running
        # stats were computed WITH them — dropping the bias would shift
        # every imported activation)
        x = nn.Conv(self.features, self.kernel, strides=(self.stride,) * 2,
                    padding=pad, use_bias=True, name="conv")(x)
        x = TorchExactBatchNorm(use_running_average=not train,
                                momentum=1.0 - self.bn_mom,
                                epsilon=self.bn_eps, name="bn")(x)
        return nn.relu(x)


class _Inception(nn.Module):
    """4-branch inception: 1x1 | 3x3 | double-3x3 | pool-proj.

    c1 == 0 marks a stride-2 reduction block (no 1x1 branch, max-pool
    passthrough, 3x3 branches strided).
    """

    c1: int
    c3r: int
    c3: int
    cd3r: int
    cd3: int
    cpool: int
    pool_type: str = "avg"
    bn_eps: float = 1e-3
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        stride = 2 if self.c1 == 0 else 1
        branches = []
        if self.c1 > 0:
            branches.append(
                _ConvBN(self.c1, (1, 1), name="b1")(x, train=train)
            )
        b3 = _ConvBN(self.c3r, (1, 1), name="b3r")(x, train=train)
        branches.append(
            _ConvBN(self.c3, (3, 3), stride, name="b3")(b3, train=train)
        )
        bd = _ConvBN(self.cd3r, (1, 1), name="bd3r")(x, train=train)
        bd = _ConvBN(self.cd3, (3, 3), name="bd3a")(bd, train=train)
        branches.append(
            _ConvBN(self.cd3, (3, 3), stride, name="bd3b")(bd, train=train)
        )
        if stride == 2:
            # pad=0 + ceil_mode like pretrainedmodels (see stem pools)
            bp = nn.max_pool(x, (3, 3), strides=(2, 2),
                             padding=((0, 1), (0, 1)))
        else:
            if self.pool_type == "avg":
                bp = nn.avg_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
            else:
                bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
            bp = _ConvBN(self.cpool, (1, 1), name="bpool")(bp, train=train)
        branches.append(bp)
        return jnp.concatenate(branches, axis=-1)


# (c1, 3x3r, 3x3, d3x3r, d3x3, pool, pool_type) — standard BN-Inception
_BLOCKS = [
    ("3a", (64, 64, 64, 64, 96, 32, "avg")),
    ("3b", (64, 64, 96, 64, 96, 64, "avg")),
    ("3c", (0, 128, 160, 64, 96, 0, "max")),
    ("4a", (224, 64, 96, 96, 128, 128, "avg")),
    ("4b", (192, 96, 128, 96, 128, 128, "avg")),
    ("4c", (160, 128, 160, 128, 160, 128, "avg")),
    ("4d", (96, 128, 192, 160, 192, 128, "avg")),
    ("4e", (0, 128, 192, 192, 256, 0, "max")),
    ("5a", (352, 192, 320, 160, 224, 128, "avg")),
    ("5b", (352, 192, 320, 192, 224, 128, "max")),
]


class BNInceptionVideo(nn.Module):
    """Per-frame BN-Inception: (B, 3, T, H, W) -> (B, 1024, T, 1, 1)."""

    bn_eps: float = 1e-3
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, video, *, train: bool = False):
        B, C, T, H, W = video.shape
        x = video.transpose(0, 2, 3, 4, 1).reshape(B * T, H, W, C)
        kw = dict(bn_eps=self.bn_eps, bn_mom=self.bn_mom)
        x = _ConvBN(64, (7, 7), 2, name="conv1", **kw)(x, train=train)
        # pretrainedmodels' stride-2 pools are pad=0 + ceil_mode=True:
        # windows start at 0,2,... with the tail window clipped — identical
        # to right/bottom-only padding (max_pool pads with -inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
        x = _ConvBN(64, (1, 1), name="conv2r", **kw)(x, train=train)
        x = _ConvBN(192, (3, 3), name="conv2", **kw)(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
        for name, cfg in _BLOCKS:
            c1, c3r, c3, cd3r, cd3, cpool, ptype = cfg
            x = _Inception(
                c1=c1, c3r=c3r, c3=c3, cd3r=cd3r, cd3=cd3, cpool=cpool,
                pool_type=ptype, name=f"inc_{name}", **kw,
            )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B*T, 1024)
        return x.reshape(B, T, -1).transpose(0, 2, 1)[..., None, None]

    output_dim = 1024
