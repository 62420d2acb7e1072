"""Flagship model builders: the paper's headline configurations.

build_avt() = AVT-b (ViT-B/16) backbone + AVT-h head, the expts/01
end-to-end configuration (README.md:193: EK100 AR5 14.9); feature-path
variant = expts/02 (TSN features + AVT-h).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from avt_tpu.losses import mse
from avt_tpu.models.base import AVTModel
from avt_tpu.models.backbones import IdentityBackbone
from avt_tpu.models.classifiers import LinearClassifier
from avt_tpu.models.future import AVTh
from avt_tpu.models.temporal_agg import IdentityAgg
from avt_tpu.models.vit import ViT


def build_avt(
    *,
    num_actions: int = 3806,
    backbone: str = "avt_b",  # 'avt_b' (ViT-B/16) or 'identity'
    backbone_dim: Optional[int] = None,
    inter_dim: int = 2048,
    n_layer: int = 6,
    n_head: int = 4,
    output_len: int = 1,
    avg_last_n: int = 1,
    dropout: float = 0.2,
    classifier_on_past: bool = True,
    vit_dtype=None,
    class_mappings=(),
    num_classes_extra=(),
) -> AVTModel:
    """The AVT-b + AVT-h flagship (expts/01) or its feature-path variant."""
    if backbone == "avt_b":
        bb = ViT(dtype=vit_dtype)
        bb_dim = 768
    elif backbone == "identity":
        bb = IdentityBackbone()
        bb_dim = backbone_dim or 1024
    else:
        raise NotImplementedError(backbone)
    num_classes = (("action", num_actions),) + tuple(num_classes_extra)
    return AVTModel(
        backbone=bb,
        temporal_aggregator=IdentityAgg(in_features=bb_dim),
        future_predictor=AVTh(
            in_features=bb_dim,
            inter_dim=inter_dim,
            n_layer=n_layer,
            n_head=n_head,
            output_len=output_len,
            avg_last_n=avg_last_n,
            return_past_too=True,
            future_pred_loss=lambda p, t: mse(p, t, reduction="none"),
            dtype=vit_dtype,  # head compute matches the backbone dtype
        ),
        temporal_aggregator_after_future_pred=IdentityAgg(in_features=bb_dim),
        classifiers={"action": LinearClassifier(out_features=num_actions)},
        num_classes=num_classes,
        class_mappings=class_mappings,
        backbone_dim=bb_dim,
        dropout=dropout,
        classifier_on_past=classifier_on_past,
        use_cls_mappings=len(num_classes_extra) > 0,
    )
