"""Backbones: (B, C, T, H, W) -> (B, C', T', H', W').

The identity backbone serves pre-extracted-feature configs (the reference's
conf/model/backbone/identity.yaml). The frame-level ViT (AVT-b) lives in
vit.py; 3D convnets (R(2+1)D, CSN) in video_resnet.py; BN-Inception (TSN)
in bninception.py.
"""
from __future__ import annotations

from flax import linen as nn


class IdentityBackbone(nn.Module):
    """Pass-through for pre-extracted features."""

    def __call__(self, video, *, train: bool = False):
        return video

    output_dim = None
