"""AVTModel: the composition root.

Parity target: reference models/base_model.py (BaseModel). The endpoint
dict contract is preserved exactly — downstream losses/eval key off it:
  backbone, backbone_mean, backbone_mean_projected, temp_agg,
  temp_agg_projected, past, future, future_projected, future_agg,
  logits/<task>, past_logits/<task>, logits_regression
Pipeline: backbone -> spatial mean -> optional mapper to intermediate dim
-> temporal aggregator -> optional dim reset -> unfold clips into time ->
future predictor -> (past classifier) -> second aggregator -> dropout ->
per-task classifiers or class-mapping matmul marginalization.

Replication quirks kept on purpose (they are what the reference trained):
  * 'future_projected' projects feats_agg (the aggregated PAST features,
    base_model.py:209), not the predicted future.
  * linear layers outside the GPT core init to N(0, 0.01), bias 0
    (base_model.py:110-127); the GPT core keeps its own 0.02 init.

Multi-crop eval (video with a #crops dim) batches all crops into ONE
forward (crop-major on the batch dim) and averages outputs/losses per crop
afterwards — numerically the reference's per-crop loop, but with 3-6x
bigger matmuls for the MXU.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CLS_MAP_PREFIX = "cls_map_"
PAST_LOGITS_PREFIX = "past_"

_init01 = nn.initializers.normal(stddev=0.01)


class _ProjectMLP(nn.Module):
    """2-layer projection head for NCE (base_model.py:70-75)."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, kernel_init=_init01, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, kernel_init=_init01, name="fc2")(x)


class AVTModel(nn.Module):
    """Composition root.

    Submodules (backbone, aggregators, future predictor, classifiers) are
    passed in as linen module instances, mirroring the reference's
    hydra-instantiated composition. `num_classes` is a tuple of
    (task, n_classes) pairs; `class_mappings` maps (src, dst) task names to
    0/1 (n_dst, n_src) matrices used to marginalize e.g. verb logits out of
    action logits when `use_cls_mappings` is set.
    """

    backbone: nn.Module
    temporal_aggregator: nn.Module
    future_predictor: nn.Module
    temporal_aggregator_after_future_pred: nn.Module
    classifiers: Any  # dict: task -> module
    num_classes: Any  # tuple of (task, n) pairs
    class_mappings: Any = ()  # tuple of ((src, dst), np.ndarray) pairs
    backbone_dim: int = 2048
    intermediate_featdim: Optional[int] = None
    temp_agg_output_dim: Optional[int] = None
    same_temp_agg_dim: bool = False
    project_dim_for_nce: Optional[int] = None
    dropout: float = 0.0
    use_cls_mappings: bool = False
    classifier_on_past: bool = False
    add_regression_head: bool = False

    def setup(self):
        inter_dim = self.intermediate_featdim or self.backbone_dim
        self._inter_dim = inter_dim
        if self.backbone_dim != inter_dim:
            self.mapper_to_inter = nn.Dense(
                inter_dim, use_bias=False, kernel_init=_init01, name="mapper_to_inter"
            )
        agg_dim = self.temp_agg_output_dim or inter_dim
        self._agg_out_dim = agg_dim
        if self.same_temp_agg_dim and agg_dim != inter_dim:
            self.reset_temp_agg_feat_dim = nn.Dense(
                inter_dim, kernel_init=_init01, name="reset_temp_agg_feat_dim"
            )
            self._agg_out_dim = inter_dim
        if self.project_dim_for_nce is not None:
            self.project_mlp = _ProjectMLP(
                hidden_dim=self._agg_out_dim, out_dim=self.project_dim_for_nce
            )
        if self.add_regression_head:
            self.regression_head = nn.Dense(
                1, kernel_init=_init01, name="regression_head"
            )
        self.dropout_layer = nn.Dropout(self.dropout)
        self._cls_maps = {
            (src, dst): jnp.asarray(m) for (src, dst), m in self.class_mappings
        }

    # ------------------------------------------------------------------
    def _project(self, x):
        if self.project_dim_for_nce is None:
            return x
        return self.project_mlp(x)

    def _apply_classifier(self, feat, outputs_prefix: str = "") -> Dict[str, jax.Array]:
        outputs = {}
        cls_dict = self.classifiers
        for key, _n in self.num_classes:
            if key in cls_dict:
                outputs[f"{outputs_prefix}logits/{key}"] = cls_dict[key](feat)
            else:
                # Marginalize from the first classified task via the 0/1
                # mapping matrix (base_model.py:222-238).
                src_key = next(iter(cls_dict.keys()))
                src = outputs[f"{outputs_prefix}logits/{src_key}"]
                mapper = self._cls_maps[(key, src_key)]
                outputs[f"{outputs_prefix}logits/{key}"] = src @ mapper
        return outputs

    def forward_singlecrop(
        self, video, target_shape=None, *, train: bool = False
    ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        """video: (B, #clips, C, T, H, W)."""
        outputs: Dict[str, jax.Array] = {}
        aux_losses: Dict[str, jax.Array] = {}
        B, num_clips = video.shape[:2]
        video = video.reshape((B * num_clips,) + video.shape[2:])
        feats = self.backbone(video, train=train)  # (B', C', T', H', W')
        outputs["backbone"] = feats
        feats = jnp.mean(feats, axis=(-1, -2))  # (B', C', T')
        outputs["backbone_mean"] = jnp.mean(feats, axis=-1)  # (B', C')
        if (
            self.project_dim_for_nce is not None
            and outputs["backbone_mean"].shape[-1] == self._agg_out_dim
        ):
            outputs["backbone_mean_projected"] = self._project(
                outputs["backbone_mean"]
            )
        feats = jnp.transpose(feats, (0, 2, 1))  # (B', T', C')
        if feats.shape[-1] != self._inter_dim:
            if self.backbone_dim == self._inter_dim:
                # setup only builds the mapper when the CONFIGURED dims
                # differ; reaching here means backbone_dim was set wrong
                # (reference asserts the same, base_model.py:170-173)
                raise ValueError(
                    f"Backbone produced {feats.shape[-1]}-d features but "
                    f"model.backbone_dim={self.backbone_dim}; set "
                    f"model.backbone_dim to the real feature dim"
                )
            feats = self.mapper_to_inter(feats)
        feats_agg, agg_losses = self.temporal_aggregator(feats, train=train)
        aux_losses.update(agg_losses)
        if self.same_temp_agg_dim and (self.temp_agg_output_dim or self._inter_dim) != self._inter_dim:
            feats_agg = self.reset_temp_agg_feat_dim(feats_agg)
        outputs["temp_agg"] = feats_agg
        outputs["temp_agg_projected"] = self._project(feats_agg)
        # Unfold the clips dim back out into time (base_model.py:183-192)
        if num_clips > 1:
            assert feats_agg.ndim == 2 or (
                feats_agg.ndim == 3 and feats_agg.shape[1] == 1
            ), "Use temporal aggregation when using subclips"
            feats_agg = feats_agg.reshape((B, num_clips) + feats_agg.shape[1:])
            if feats_agg.ndim == 4:
                feats_agg = feats_agg.reshape(
                    (B, num_clips * feats_agg.shape[2]) + feats_agg.shape[3:]
                )
        feats_past = feats_agg
        feats_past, feats_future, fut_losses, endpoints = self.future_predictor(
            feats_past, target_shape, train=train
        )
        aux_losses.update(fut_losses)
        outputs.update(endpoints)
        outputs["future"] = feats_future
        outputs["past"] = feats_past
        if self.classifier_on_past:
            past_drop = self.dropout_layer(feats_past, deterministic=not train)
            outputs.update(
                self._apply_classifier(past_drop, outputs_prefix=PAST_LOGITS_PREFIX)
            )
        # NOTE reference quirk: this projects feats_agg (the PAST), kept as-is
        outputs["future_projected"] = self._project(feats_agg)
        feats_future_agg, fagg_losses = self.temporal_aggregator_after_future_pred(
            feats_future, train=train
        )
        aux_losses.update(fagg_losses)
        outputs["future_agg"] = feats_future_agg
        feats_drop = self.dropout_layer(feats_future_agg, deterministic=not train)
        outputs.update(self._apply_classifier(feats_drop))
        if self.add_regression_head:
            outputs["logits_regression"] = self.regression_head(feats_drop)
        return outputs, aux_losses

    def __call__(self, video, target_shape=None, *, train: bool = False):
        """video: (B, #clips, C, T, H, W) or (B, #clips, #crops, C, T, H, W).

        Multi-crop inputs batch the crops into ONE forward (crops stacked
        crop-major onto the batch dim) and average the outputs/losses per
        crop afterwards — same math as the reference's per-crop loop
        (base_model.py:240-273) but with 3-6x bigger matmuls, which is what
        the MXU wants at eval batch sizes. Scalar aux losses come out of
        the stacked batch already crop-averaged (mean over crops of means
        == mean over the concatenated batch).
        """
        if video.ndim == 6:
            return self.forward_singlecrop(video, target_shape, train=train)
        if video.ndim == 7 and video.shape[2] == 1:
            return self.forward_singlecrop(
                video[:, :, 0], target_shape, train=train
            )
        if video.ndim != 7:
            raise NotImplementedError(f"Unsupported video shape {video.shape}")
        B, num_clips, n = video.shape[:3]
        stacked = jnp.concatenate(
            [video[:, :, i] for i in range(n)], axis=0
        )  # (n*B, #clips, C, T, H, W), crop-major
        outputs, losses = self.forward_singlecrop(
            stacked, target_shape, train=train
        )

        # leading dims that carry the crop factor: n*B (most endpoints) or
        # n*B*num_clips (pre-aggregation endpoints like 'backbone')
        crop_leading = (n * B, n * B * num_clips)

        def avg(v):
            if v.ndim >= 1 and v.shape[0] in crop_leading:
                return jnp.mean(
                    v.reshape((n, v.shape[0] // n) + v.shape[1:]), axis=0
                )
            return v

        outputs = {k: avg(v) for k, v in outputs.items()}
        losses = {k: avg(v) for k, v in losses.items()}
        return outputs, losses
