"""Torch checkpoint import: timm ViT / HF GPT-2 / full AVT state_dicts.

Replaces the reference's init_model (func/train.py:457-497): load released
torch checkpoints (timm ViT-B weights, AVT model zoo, VISSL trunks) onto
our flax param pytrees, with per-module prefix remapping and silent
shape-mismatch skip.

Key layout transforms (the reference's "hard part" #4, SURVEY.md §7):
  * torch nn.Linear weight (out, in)  -> flax Dense kernel (in, out): .T
  * torch conv2d weight (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O)
  * HF GPT-2 Conv1D weight is ALREADY (in, out): no transpose
  * torch LayerNorm weight/bias -> flax scale/bias
"""
from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

LOG = logging.getLogger(__name__)


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def load_torch_state_dict(fpath: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into numpy, detecting the wrapper format.

    Handles the reference's formats (func/train.py:467-477): raw state_dict,
    {'model': sd}, {'state_dict': sd}, {'classy_state_dict': ...} (VISSL).
    """
    import torch

    obj = torch.load(fpath, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        if "classy_state_dict" in obj:
            obj = obj["classy_state_dict"]["base_model"]["model"]["trunk"]
        elif "model" in obj and isinstance(obj["model"], dict):
            obj = obj["model"]
        elif "state_dict" in obj:
            obj = obj["state_dict"]
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in obj.items()}


# ------------------------------------------------------------------ ViT
def timm_vit_to_flax(sd: Mapping[str, np.ndarray]) -> Dict:
    """timm vit_base_patch16_224 state_dict -> avt_tpu.models.vit.ViT params."""
    p: Dict = {}
    _set(p, "cls_token", sd["cls_token"])
    _set(p, "pos_embed", sd["pos_embed"])
    # (O, I, kh, kw) -> (kh, kw, I, O)
    _set(p, "patch_embed/kernel",
         np.transpose(np.asarray(sd["patch_embed.proj.weight"]), (2, 3, 1, 0)))
    _set(p, "patch_embed/bias", sd["patch_embed.proj.bias"])
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(depth):
        src = f"blocks.{i}"
        dst = f"blocks_{i}"
        _set(p, f"{dst}/norm1/scale", sd[f"{src}.norm1.weight"])
        _set(p, f"{dst}/norm1/bias", sd[f"{src}.norm1.bias"])
        _set(p, f"{dst}/attn/qkv/kernel", _t(sd[f"{src}.attn.qkv.weight"]))
        _set(p, f"{dst}/attn/qkv/bias", sd[f"{src}.attn.qkv.bias"])
        _set(p, f"{dst}/attn/proj/kernel", _t(sd[f"{src}.attn.proj.weight"]))
        _set(p, f"{dst}/attn/proj/bias", sd[f"{src}.attn.proj.bias"])
        _set(p, f"{dst}/norm2/scale", sd[f"{src}.norm2.weight"])
        _set(p, f"{dst}/norm2/bias", sd[f"{src}.norm2.bias"])
        _set(p, f"{dst}/mlp_fc1/kernel", _t(sd[f"{src}.mlp.fc1.weight"]))
        _set(p, f"{dst}/mlp_fc1/bias", sd[f"{src}.mlp.fc1.bias"])
        _set(p, f"{dst}/mlp_fc2/kernel", _t(sd[f"{src}.mlp.fc2.weight"]))
        _set(p, f"{dst}/mlp_fc2/bias", sd[f"{src}.mlp.fc2.bias"])
    _set(p, "norm/scale", sd["norm.weight"])
    _set(p, "norm/bias", sd["norm.bias"])
    return p


# ---------------------------------------------------------------- GPT-2
def gpt2_to_flax(sd: Mapping[str, np.ndarray], prefix: str = "") -> Dict:
    """HF transformers GPT2Model state_dict -> GPT2Core params.

    HF Conv1D weights are (in, out) already; LayerNorm weight -> scale.
    """
    g = lambda k: sd[prefix + k]  # noqa: E731
    p: Dict = {}
    _set(p, "wpe", g("wpe.weight"))
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(re.escape(prefix) + r"h\.(\d+)\.", k))
    )
    for i in range(depth):
        src = f"h.{i}"
        dst = f"h_{i}"
        _set(p, f"{dst}/ln_1/scale", g(f"{src}.ln_1.weight"))
        _set(p, f"{dst}/ln_1/bias", g(f"{src}.ln_1.bias"))
        _set(p, f"{dst}/attn/qkv/kernel", g(f"{src}.attn.c_attn.weight"))
        _set(p, f"{dst}/attn/qkv/bias", g(f"{src}.attn.c_attn.bias"))
        _set(p, f"{dst}/attn/proj/kernel", g(f"{src}.attn.c_proj.weight"))
        _set(p, f"{dst}/attn/proj/bias", g(f"{src}.attn.c_proj.bias"))
        _set(p, f"{dst}/ln_2/scale", g(f"{src}.ln_2.weight"))
        _set(p, f"{dst}/ln_2/bias", g(f"{src}.ln_2.bias"))
        _set(p, f"{dst}/mlp_fc/kernel", g(f"{src}.mlp.c_fc.weight"))
        _set(p, f"{dst}/mlp_fc/bias", g(f"{src}.mlp.c_fc.bias"))
        _set(p, f"{dst}/mlp_proj/kernel", g(f"{src}.mlp.c_proj.weight"))
        _set(p, f"{dst}/mlp_proj/bias", g(f"{src}.mlp.c_proj.bias"))
    _set(p, "ln_f/scale", g("ln_f.weight"))
    _set(p, "ln_f/bias", g("ln_f.bias"))
    return p


# ----------------------------------------------------- conv backbones
def _conv2d_k(w) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _conv3d_k(w) -> np.ndarray:
    """torch Conv3d weight (O, I/g, kt, kh, kw) -> (kt, kh, kw, I/g, O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def _bn_to_flax(sd, src: str, dst: str, p: Dict, stats: Dict):
    """torch BatchNorm 'src.*' -> flax params 'dst/{scale,bias}' +
    batch_stats 'dst/{mean,var}'."""
    _set(p, f"{dst}/scale", sd[f"{src}.weight"])
    _set(p, f"{dst}/bias", sd[f"{src}.bias"])
    _set(stats, f"{dst}/mean", sd[f"{src}.running_mean"])
    _set(stats, f"{dst}/var", sd[f"{src}.running_var"])


def bninception_to_flax(sd: Mapping[str, np.ndarray]) -> Dict:
    """pretrainedmodels bninception state_dict -> BNInceptionVideo variables.

    Returns {'params': ..., 'batch_stats': ...}. Source layout: Caffe-named
    units 'conv1_7x7_s2(_bn)', 'inception_3a_1x1(_bn)', ... (the checkpoint
    the reference loads at models/video_classification.py:241-246). The
    classifier 'last_linear' is dropped (the reference replaces it with
    Identity).
    """
    from avt_tpu.models.bninception import _BLOCKS

    p: Dict = {}
    stats: Dict = {}

    def unit(src: str, dst: str):
        _set(p, f"{dst}/conv/kernel", _conv2d_k(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            _set(p, f"{dst}/conv/bias", sd[f"{src}.bias"])
        _bn_to_flax(sd, f"{src}_bn", f"{dst}/bn", p, stats)

    unit("conv1_7x7_s2", "conv1")
    unit("conv2_3x3_reduce", "conv2r")
    unit("conv2_3x3", "conv2")
    branch_map = [
        ("1x1", "b1"),
        ("3x3_reduce", "b3r"),
        ("3x3", "b3"),
        ("double_3x3_reduce", "bd3r"),
        ("double_3x3_1", "bd3a"),
        ("double_3x3_2", "bd3b"),
        ("pool_proj", "bpool"),
    ]
    for name, _cfg in _BLOCKS:
        for src_suffix, dst_name in branch_map:
            src = f"inception_{name}_{src_suffix}"
            if f"{src}.weight" in sd:  # reduction blocks lack 1x1/pool_proj
                unit(src, f"inc_{name}/{dst_name}")
    return {"params": p, "batch_stats": stats}


def video_resnet_to_flax(sd: Mapping[str, np.ndarray]) -> Dict:
    """torchvision-layout VideoResNet state_dict -> VideoResNet variables.

    Returns {'params': ..., 'batch_stats': ...}. Handles every conv maker
    the reference uses (models/video_classification.py:45-113 +
    torchvision video resnets): plain Conv3d, Conv2Plus1D
    (Sequential conv/bn/relu/conv), IPConv3DDepthwise (Sequential
    conv/bn/conv), and both stems. VISSL ig65m trunks ('_feature_blocks.'
    prefix, func/train.py:467-477) are unwrapped first; the classifier
    'fc.*' is dropped (backbone_last_n_modules_to_drop).
    """
    if any(k.startswith("_feature_blocks.") for k in sd):
        sd = {
            k[len("_feature_blocks."):]: v
            for k, v in sd.items()
            if k.startswith("_feature_blocks.")
        }
    p: Dict = {}
    stats: Dict = {}

    def maker_unit(src: str, dst: str):
        """Convert one conv_builder module at torch prefix `src`."""
        if f"{src}.weight" in sd:  # plain Conv3d (Conv3DSimple/Conv3DDepthwise)
            _set(p, f"{dst}/conv/kernel", _conv3d_k(sd[f"{src}.weight"]))
        elif f"{src}.3.weight" in sd:  # Conv2Plus1D: conv, bn, relu, conv
            _set(p, f"{dst}/conv_s/kernel", _conv3d_k(sd[f"{src}.0.weight"]))
            _bn_to_flax(sd, f"{src}.1", f"{dst}/bn_mid/bn", p, stats)
            _set(p, f"{dst}/conv_t/kernel", _conv3d_k(sd[f"{src}.3.weight"]))
        elif f"{src}.2.weight" in sd:  # IPConv3DDepthwise: conv, bn, conv
            _set(p, f"{dst}/conv_p/kernel", _conv3d_k(sd[f"{src}.0.weight"]))
            _bn_to_flax(sd, f"{src}.1", f"{dst}/bn_mid/bn", p, stats)
            _set(p, f"{dst}/conv_dw/kernel", _conv3d_k(sd[f"{src}.2.weight"]))
        else:
            raise ValueError(f"unrecognized conv maker layout at {src}")

    if "stem.3.weight" in sd:  # R2Plus1dStem: conv bn relu conv bn relu
        _set(p, "stem_conv1/kernel", _conv3d_k(sd["stem.0.weight"]))
        _bn_to_flax(sd, "stem.1", "stem_bn1/bn", p, stats)
        _set(p, "stem_conv2/kernel", _conv3d_k(sd["stem.3.weight"]))
        _bn_to_flax(sd, "stem.4", "stem_bn2/bn", p, stats)
    else:  # BasicStem / BasicStem_Pool: conv bn relu [pool]
        _set(p, "stem_conv/kernel", _conv3d_k(sd["stem.0.weight"]))
        _bn_to_flax(sd, "stem.1", "stem_bn/bn", p, stats)

    for layer in range(1, 5):
        i = 0
        while f"layer{layer}.{i}.conv1.1.weight" in sd:
            base = f"layer{layer}.{i}"
            dst = f"layer{layer}_{i}"
            if f"{base}.conv3.1.weight" in sd:  # Bottleneck
                _set(p, f"{dst}/conv1/kernel",
                     _conv3d_k(sd[f"{base}.conv1.0.weight"]))
                _bn_to_flax(sd, f"{base}.conv1.1", f"{dst}/bn1/bn", p, stats)
                maker_unit(f"{base}.conv2.0", f"{dst}/conv2")
                _bn_to_flax(sd, f"{base}.conv2.1", f"{dst}/bn2/bn", p, stats)
                _set(p, f"{dst}/conv3/kernel",
                     _conv3d_k(sd[f"{base}.conv3.0.weight"]))
                _bn_to_flax(sd, f"{base}.conv3.1", f"{dst}/bn3/bn", p, stats)
            else:  # BasicBlock
                maker_unit(f"{base}.conv1.0", f"{dst}/conv1")
                _bn_to_flax(sd, f"{base}.conv1.1", f"{dst}/bn1/bn", p, stats)
                maker_unit(f"{base}.conv2.0", f"{dst}/conv2")
                _bn_to_flax(sd, f"{base}.conv2.1", f"{dst}/bn2/bn", p, stats)
            if f"{base}.downsample.0.weight" in sd:
                _set(p, f"{dst}/ds_conv/kernel",
                     _conv3d_k(sd[f"{base}.downsample.0.weight"]))
                _bn_to_flax(sd, f"{base}.downsample.1", f"{dst}/ds_bn/bn",
                            p, stats)
            i += 1
    return {"params": p, "batch_stats": stats}


# ----------------------------------------------------------- RULSTM
def _lstm_cell_to_flax(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """One torch nn.LSTM layer -> flax OptimizedLSTMCell params.

    torch packs gates row-wise as [i|f|g|o] chunks of weight_ih_l0 (4H, C)
    / weight_hh_l0 (4H, H) with two bias vectors (both added); flax keeps
    per-gate Dense kernels i{i,f,g,o} (no bias) and h{i,f,g,o} (bias) —
    both biases fold into the h-side bias.
    """
    w_ih = np.asarray(sd[f"{prefix}.weight_ih_l0"])
    w_hh = np.asarray(sd[f"{prefix}.weight_hh_l0"])
    b = np.asarray(sd[f"{prefix}.bias_ih_l0"]) + np.asarray(
        sd[f"{prefix}.bias_hh_l0"]
    )
    H = w_hh.shape[1]
    out: Dict = {}
    for idx, g in enumerate("ifgo"):
        sl = slice(idx * H, (idx + 1) * H)
        out[f"i{g}"] = {"kernel": _t(w_ih[sl])}
        out[f"h{g}"] = {"kernel": _t(w_hh[sl]), "bias": b[sl]}
    return out


def rulstm_to_flax(sd: Mapping[str, np.ndarray]) -> Dict:
    """Original RULSTM checkpoint (fpv-iplab/rulstm .pth; the weights the
    reference wraps at models/temporal_aggregation.py:150-201) ->
    avt_tpu RULSTMAgg params {rolling, unrolling}.

    Handles both the bare nn.LSTM layout ('rolling_lstm.weight_ih_l0')
    and the OpenLSTM nesting ('rolling_lstm.lstm.weight_ih_l0'); the
    classifier head is dropped (the reference replaces it with an empty
    Sequential).
    """
    sd = {k.replace(".lstm.", "."): v for k, v in sd.items()}
    return {
        "rolling": _lstm_cell_to_flax(sd, "rolling_lstm"),
        "unrolling": _lstm_cell_to_flax(sd, "unrolling_lstm"),
    }


def transformer_agg_to_flax(sd: Mapping[str, np.ndarray]) -> Dict:
    """torch temporal_aggregation.Transformer (reference
    temporal_aggregation.py:73-147: Linear downproject + PositionalEncoding
    + nn.TransformerEncoder + final LayerNorm) -> TransformerAgg params.

    torch MultiheadAttention packs q/k/v as a stacked (3E, E)
    in_proj_weight; transposed it is exactly our fused qkv Dense kernel
    (E, 3E) with the same contiguous per-head split.
    """
    p: Dict = {}
    _set(p, "downproject/kernel", _t(sd["downproject.weight"]))
    _set(p, "downproject/bias", sd["downproject.bias"])
    _set(p, "norm/scale", sd["transformer_encoder.norm.weight"])
    _set(p, "norm/bias", sd["transformer_encoder.norm.bias"])
    i = 0
    while f"transformer_encoder.layers.{i}.self_attn.in_proj_weight" in sd:
        base = f"transformer_encoder.layers.{i}"
        for src, dst in (
            (f"{base}.self_attn.in_proj_weight", f"layer_{i}/attn/qkv/kernel"),
            (f"{base}.self_attn.out_proj.weight", f"layer_{i}/attn/proj/kernel"),
            (f"{base}.linear1.weight", f"layer_{i}/ffn_fc/kernel"),
            (f"{base}.linear2.weight", f"layer_{i}/ffn_proj/kernel"),
        ):
            _set(p, dst, _t(sd[src]))
        for src, dst in (
            (f"{base}.self_attn.in_proj_bias", f"layer_{i}/attn/qkv/bias"),
            (f"{base}.self_attn.out_proj.bias", f"layer_{i}/attn/proj/bias"),
            (f"{base}.linear1.bias", f"layer_{i}/ffn_fc/bias"),
            (f"{base}.linear2.bias", f"layer_{i}/ffn_proj/bias"),
            (f"{base}.norm1.weight", f"layer_{i}/ln_1/scale"),
            (f"{base}.norm1.bias", f"layer_{i}/ln_1/bias"),
            (f"{base}.norm2.weight", f"layer_{i}/ln_2/scale"),
            (f"{base}.norm2.bias", f"layer_{i}/ln_2/bias"),
        ):
            _set(p, dst, sd[src])
        i += 1
    if "extra_embeddings.weight" in sd:
        # [MASK] embedding: torch nn.Embedding(1, C) -> (1, 1, C) param
        _set(p, "mask_embed",
             np.asarray(sd["extra_embeddings.weight"])[None])
    return p


def _temporal_agg_subtree(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """Convert a temporal_aggregator.* / ..._after_future_pred.* subtree:
    Transformer and RULSTM layouts carry params; Identity/Mean carry none."""
    sub = {
        k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
    }
    if not sub:
        return {}
    if "downproject.weight" in sub:
        return transformer_agg_to_flax(sub)
    if any("rolling_lstm" in k for k in sub):
        return rulstm_to_flax(sub)
    LOG.warning("Unrecognized %s layout: %s", prefix, sorted(sub)[:5])
    return {}


# ------------------------------------------------------------ AVT model
def avt_checkpoint_to_flax(sd: Mapping[str, np.ndarray]) -> Dict:
    """Full reference BaseModel state_dict -> AVTModel params subtree."""
    p: Dict = {}
    vit_sd = {
        k[len("backbone.model."):]: v
        for k, v in sd.items()
        if k.startswith("backbone.model.")
    }
    if vit_sd:
        p["backbone"] = timm_vit_to_flax(vit_sd)
    gpt_sd = {
        k[len("future_predictor.gpt_model."):]: v
        for k, v in sd.items()
        if k.startswith("future_predictor.gpt_model.")
    }
    if gpt_sd:
        p.setdefault("future_predictor", {})["gpt"] = gpt2_to_flax(gpt_sd)
    if "future_predictor.encoder.weight" in sd:
        enc = np.asarray(sd["future_predictor.encoder.weight"])
        dec = sd.get("future_predictor.decoder.weight")
        if enc.ndim == 2 and dec is not None:
            dec = np.asarray(dec)
            if enc.shape == dec.shape and np.array_equal(enc, dec):
                # tied weights => nn.Embedding mode (quantized inputs,
                # future_prediction.py:83-87): flax side is encoder_embed
                _set(p, "future_predictor/encoder_embed/embedding", enc)
            else:
                _set(p, "future_predictor/encoder/kernel", _t(enc))
                _set(p, "future_predictor/decoder/kernel", _t(dec))
    # MLP future predictor: Sequential of [Linear, ReLU]*n minus the last
    # ReLU (reference future_prediction.py:32-40) — Linears sit at even
    # indices; ours are fc_<i> (models/future.py:MLPFuture)
    for key, val in sd.items():
        m = re.match(r"future_predictor\.model\.(\d+)\.(weight|bias)", key)
        if m:
            layer_i = int(m.group(1)) // 2
            if m.group(2) == "weight":
                _set(p, f"future_predictor/fc_{layer_i}/kernel", _t(val))
            else:
                _set(p, f"future_predictor/fc_{layer_i}/bias", val)
    for key, val in sd.items():
        m = re.match(r"classifiers\.([^.]+)\.(weight|bias)", key)
        if m:
            task, kind = m.groups()
            if kind == "weight":
                _set(p, f"classifiers_{task}/fc/kernel", _t(val))
            else:
                _set(p, f"classifiers_{task}/fc/bias", val)
    for name in ("mapper_to_inter", "reset_temp_agg_feat_dim"):
        if f"{name}.weight" in sd:
            _set(p, f"{name}/kernel", _t(sd[f"{name}.weight"]))
        if f"{name}.bias" in sd:
            _set(p, f"{name}/bias", sd[f"{name}.bias"])
    # project_mlp = Sequential(Linear, ReLU, Linear) (base_model.py:72-75)
    for src, dst in (("project_mlp.0", "project_mlp/fc1"),
                     ("project_mlp.2", "project_mlp/fc2")):
        if f"{src}.weight" in sd:
            _set(p, f"{dst}/kernel", _t(sd[f"{src}.weight"]))
            _set(p, f"{dst}/bias", sd[f"{src}.bias"])
    # regression_head = nn.Linear(cls_input_dim, 1) (base_model.py:101-103)
    if "regression_head.weight" in sd:
        _set(p, "regression_head/kernel", _t(sd["regression_head.weight"]))
        _set(p, "regression_head/bias", sd["regression_head.bias"])
    for agg_name in ("temporal_aggregator",
                     "temporal_aggregator_after_future_pred"):
        agg = _temporal_agg_subtree(sd, agg_name + ".")
        if agg:
            p[agg_name] = agg
    handled = {
        "backbone", "future_predictor", "classifiers", "mapper_to_inter",
        "reset_temp_agg_feat_dim", "project_mlp", "regression_head",
        "temporal_aggregator", "temporal_aggregator_after_future_pred",
    }
    leftovers = sorted(
        {k.split(".")[0] for k in sd} - handled - {"cls_map_verb_action",
                                                   "cls_map_noun_action"}
    )
    if leftovers:
        LOG.warning(
            "avt_checkpoint_to_flax: no conversion for module(s) %s — "
            "they keep the model's init", leftovers,
        )
    return p


# ------------------------------------------------------ partial loading
def merge_params(
    target: Dict,
    source: Dict,
    path: str = "",
) -> Dict:
    """Copy source leaves into target where names AND shapes match.

    Shape mismatches are skipped with a warning (func/train.py:489-494:
    'removing keys ... since size mismatch'); unknown keys warn too.
    """
    out = dict(target)
    for key, val in source.items():
        if key not in out:
            LOG.warning("Unexpected key %s%s in checkpoint; skipped", path, key)
            continue
        if isinstance(val, Mapping) and isinstance(out[key], Mapping):
            out[key] = merge_params(out[key], val, path + key + "/")
        else:
            tgt = np.asarray(out[key])
            src = np.asarray(val)
            if tgt.shape != src.shape:
                LOG.warning(
                    "Shape mismatch at %s%s: ckpt %s vs model %s; skipped",
                    path, key, src.shape, tgt.shape,
                )
                continue
            out[key] = src.astype(tgt.dtype)
    return out


def _module_to_flax_name(module: str) -> str:
    """Reference torch module path -> our flax param subtree name.

    The expts files use the reference's torch names: 'backbone.model'
    (the timm model inside FrameLevelModel), 'classifiers.action' (a
    ModuleDict entry). Our tree flattens those.
    """
    if module in ("backbone.model", "backbone"):
        return "backbone"
    m = re.match(r"^classifiers\.(.+)$", module)
    if m:
        return f"classifiers_{m.group(1)}"
    return module


def _convert_checkpoint(sd: Mapping[str, np.ndarray]):
    """Detect the checkpoint layout and convert to flax params.

    Returns (tree, is_full_tree): is_full_tree=True when the tree is an
    AVTModel-level tree (subtrees per module); False when it is the params
    of ONE module (e.g. a raw timm ViT or HF GPT-2 state_dict).
    """
    keys = set(sd)
    if any(
        k.startswith(("backbone.", "future_predictor.", "classifiers."))
        or k.startswith(("mapper_to_inter.", "reset_temp_agg_feat_dim."))
        for k in keys
    ):
        return avt_checkpoint_to_flax(sd), True
    if "cls_token" in keys and "patch_embed.proj.weight" in keys:
        return timm_vit_to_flax(sd), False  # raw timm ViT
    if "wpe.weight" in keys:
        return gpt2_to_flax(sd), False  # raw HF GPT2Model
    if "conv1_7x7_s2.weight" in keys:
        return bninception_to_flax(sd), False  # pretrainedmodels BNInception
    if any("rolling_lstm" in k for k in keys):
        return rulstm_to_flax(sd), False  # original RULSTM .pth
    if "stem.0.weight" in keys or "_feature_blocks.stem.0.weight" in keys:
        return video_resnet_to_flax(sd), False  # torchvision/VISSL video resnet
    if "weight" in keys and keys <= {"weight", "bias"}:
        p: Dict = {"fc": {"kernel": _t(sd["weight"])}}  # bare nn.Linear
        if "bias" in sd:
            p["fc"]["bias"] = np.asarray(sd["bias"])
        return p, False
    raise ValueError(
        f"init_from_model: unrecognized checkpoint layout (keys like "
        f"{sorted(keys)[:5]}); no torch->flax conversion available"
    )


def init_from_model(params: Dict, specs, loader=load_torch_state_dict) -> Dict:
    """Reference-style partial init (func/train.py:669-688).

    specs: list of (module_name, ckpt_module_prefix_or_None, ckpt_path);
    module names use the REFERENCE's torch paths (e.g. 'backbone.model',
    'classifiers.action' — how the expts files are written). module ''
    or None loads into the full model. Unresolvable specs RAISE: a
    requested pretrained init silently not happening is the worst outcome.
    """
    new_params = params
    for spec in specs:
        if len(spec) == 1:
            module, ckpt_prefix, path = None, None, spec[0]
        elif len(spec) == 2:
            module, ckpt_prefix, path = spec[0], None, spec[1]
        else:
            module, ckpt_prefix, path = spec
        if os.path.isdir(str(path)):
            # our own orbax checkpoint (train/checkpoint.py layout): merge
            # the saved TrainState's variables directly, no torch->flax
            # conversion — the fine-tune-from-own-run path the reference's
            # expts use with their .pth run dirs (e.g. expts/01 testonly)
            if module or ckpt_prefix:
                raise ValueError(
                    "init_from_model: module/prefix specs are for torch "
                    f"checkpoints; {path} is an avt_tpu checkpoint dir "
                    "(whole-model init only)"
                )
            import orbax.checkpoint as ocp

            restored = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(str(path))
            )
            try:
                variables = restored["state"]["params"]
            except (KeyError, TypeError, IndexError):
                variables = None
            if not (isinstance(variables, Mapping) and "params" in variables):
                raise ValueError(
                    f"init_from_model: {path} does not look like a saved "
                    "TrainState (missing state/params/params) — point at "
                    "the run dir's `checkpoint` subdirectory"
                )
            if isinstance(new_params, Mapping) and "params" in new_params:
                extra = sorted(set(variables) - set(new_params))
                if extra:
                    # unresolvable specs RAISE (same contract as the torch
                    # path): a checkpoint collection the model lacks means
                    # the wrong checkpoint/model pairing, not a no-op
                    raise KeyError(
                        f"init_from_model: checkpoint {path} carries "
                        f"collections {extra} absent from the target model"
                    )
                new_params = {
                    coll: merge_params(new_params[coll], ctree)
                    for coll, ctree in variables.items()
                } | {
                    coll: tree for coll, tree in new_params.items()
                    if coll not in variables
                }
            else:
                new_params = merge_params(new_params, variables["params"])
            continue
        sd = loader(path)
        if ckpt_prefix:
            sd = {
                k[len(ckpt_prefix):]: v
                for k, v in sd.items()
                if k.startswith(ckpt_prefix)
            }
            if not sd:
                raise ValueError(
                    f"init_from_model: prefix {ckpt_prefix!r} matches no "
                    f"keys in {path}"
                )
        converted, is_full_tree = _convert_checkpoint(sd)
        if not converted:
            raise ValueError(
                f"init_from_model: nothing converted from {path} "
                f"(spec module={module!r})"
            )
        # conv-backbone converters return per-collection trees (BatchNorm
        # running stats live in 'batch_stats', not 'params')
        if (
            isinstance(converted, Mapping)
            and "params" in converted
            and set(converted) <= {"params", "batch_stats"}
        ):
            collections = dict(converted)
        else:
            collections = {"params": converted}
        has_colls = "params" in new_params
        for coll, ctree in collections.items():
            if has_colls:
                inner = new_params.get(coll)
                if inner is None:
                    raise KeyError(
                        f"init_from_model: checkpoint {path} carries a "
                        f"{coll!r} collection but the model has none (is the "
                        f"backbone BatchNorm-free?)"
                    )
            elif coll == "params":
                inner = new_params
            else:
                raise ValueError(
                    f"init_from_model: checkpoint {path} carries {coll!r} "
                    f"but a bare params tree was given; pass the full "
                    f"variables dict"
                )
            if module:
                flax_name = _module_to_flax_name(module)
                if flax_name not in inner:
                    raise KeyError(
                        f"init_from_model: module {module!r} (flax "
                        f"{flax_name!r}) not in model {coll} {sorted(inner)}"
                    )
                sub = (
                    ctree.get(flax_name, ctree) if is_full_tree else ctree
                )
                merged = dict(inner)
                merged[flax_name] = merge_params(inner[flax_name], sub)
            else:
                if not is_full_tree:
                    raise ValueError(
                        f"init_from_model: {path} is a module-level "
                        f"checkpoint; give the spec a module name to load "
                        f"it into"
                    )
                merged = merge_params(inner, ctree)
            new_params = (
                {**new_params, coll: merged} if has_colls else merged
            )
    return new_params
