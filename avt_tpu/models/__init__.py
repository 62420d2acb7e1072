"""Model zoo (flax.linen): composition root, backbones, heads.

Mirrors the reference's models/ package (base_model.py,
video_classification.py, temporal_aggregation.py, future_prediction.py,
classifiers.py) re-designed functionally for XLA: every module is a pure
apply over a params pytree; endpoints are returned as a dict keyed
identically to the reference ('logits/<task>', 'past_logits/<task>',
'temp_agg', 'future', ...), since losses and eval key off those names.
"""
from avt_tpu.models.base import AVTModel, CLS_MAP_PREFIX, PAST_LOGITS_PREFIX
from avt_tpu.models.future import AVTh, IdentityFuture, MLPFuture
from avt_tpu.models.temporal_agg import IdentityAgg, MeanAgg, RULSTMAgg, TransformerAgg
from avt_tpu.models.classifiers import LinearClassifier, MLPClassifier
from avt_tpu.models.backbones import IdentityBackbone
from avt_tpu.models.bninception import BNInceptionVideo
from avt_tpu.models.vit import ViT
from avt_tpu.models.video_resnet import (
    VideoResNet,
    ir_csn_152,
    ip_csn_50,
    ip_csn_152,
    r2plus1d_18,
    r2plus1d_34,
    r2plus1d_152,
    r3d_18,
)
from avt_tpu.models.import_torch import (
    avt_checkpoint_to_flax,
    gpt2_to_flax,
    init_from_model,
    load_torch_state_dict,
    merge_params,
    timm_vit_to_flax,
)

__all__ = [
    "ViT",
    "VideoResNet",
    "ir_csn_152",
    "ip_csn_50",
    "ip_csn_152",
    "r2plus1d_18",
    "r2plus1d_34",
    "r2plus1d_152",
    "r3d_18",
    "avt_checkpoint_to_flax",
    "gpt2_to_flax",
    "init_from_model",
    "load_torch_state_dict",
    "merge_params",
    "timm_vit_to_flax",
    "AVTModel",
    "CLS_MAP_PREFIX",
    "PAST_LOGITS_PREFIX",
    "AVTh",
    "IdentityFuture",
    "MLPFuture",
    "IdentityAgg",
    "MeanAgg",
    "TransformerAgg",
    "RULSTMAgg",
    "LinearClassifier",
    "MLPClassifier",
    "IdentityBackbone",
    "BNInceptionVideo",
]
