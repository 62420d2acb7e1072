"""_target_ registry: maps target strings to avt_tpu constructors.

The reference's extension mechanism is hydra.utils.instantiate over
'_target_' strings (SURVEY.md §2.2). We keep the exact surface — including
the REFERENCE'S target names, aliased onto our classes — so the shipped
expts/ override files work against this framework unchanged.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_target(name: str, fn: Callable = None):
    """Register a constructor under a target name (usable as decorator)."""
    if fn is None:
        return lambda f: register_target(name, f)
    _REGISTRY[name] = fn
    return fn


def resolve_target(name: str) -> Callable:
    if name in _REGISTRY:
        return _REGISTRY[name]
    raise KeyError(
        f"Unknown _target_ {name!r}; registered: {sorted(_REGISTRY)}"
    )


def instantiate(cfg: Any, *args, _partial_: bool = False, **kwargs):
    """Build the object described by a {'_target_': ...} dict.

    Like hydra.utils.instantiate with _recursive_=False: nested dicts are
    passed through as plain data; explicit kwargs override config keys.
    """
    if cfg is None:
        return None
    if not isinstance(cfg, dict) or "_target_" not in cfg:
        raise ValueError(f"instantiate needs a dict with _target_: {cfg!r}")
    cfg = dict(cfg)
    target = resolve_target(cfg.pop("_target_"))
    params = {**cfg, **kwargs}
    if _partial_ or params.pop("_partial_", False):
        return functools.partial(target, *args, **params)
    return target(*args, **params)


def _default_video_reader(**kwargs):
    """Production raw-video reader: native libav decoder, OpenCV fallback."""
    from avt_tpu.data.video_decoder import LibavVideoReader, have_native_decoder

    if have_native_decoder():
        return LibavVideoReader(**kwargs)
    from avt_tpu.data.readers import OpenCVVideoReader

    return OpenCVVideoReader(**kwargs)


def _register_builtin_targets():
    """Alias the reference's target strings + our native names."""
    from avt_tpu.data.anticipation import (
        convert_to_anticipation,
        dense_clip_sampler,
    )
    from avt_tpu.data.epic_kitchens import EpicKitchens
    from avt_tpu.data.readers import (
        LMDBFeatsReader,
        NpyFeatsReader,
        OpenCVVideoReader,
        VideoAsLabelOnehotReader,
    )
    from avt_tpu.data.breakfast_50salads import (
        Breakfast50Salads,
        GZFormatReader,
        NPYFormatReader,
        SenerFeatsReader,
        bundle_entry_to_video_fname_50salads,
        bundle_entry_to_video_fname_breakfast,
        read_abu_farha_annotations,
        read_orig_50salads_annotations,
        read_orig_breakfast_annotations,
    )
    from avt_tpu.losses import (
        MSELoss,
        MultiDimCrossEntropy,
        MultiDimSimclrInfoNCE,
        NormedMSE,
        QuantizeAndCrossEntropy,
        SimclrInfoNCE,
    )

    pairs = {
        # datasets + annotation fns (reference names)
        "datasets.epic_kitchens.EPICKitchens": EpicKitchens,
        "datasets.base_video_dataset.convert_to_anticipation":
            convert_to_anticipation,
        "datasets.base_video_dataset.dense_clip_sampler": dense_clip_sampler,
        "datasets.epic_kitchens.EpicRULSTMFeatsReader": LMDBFeatsReader,
        "datasets.reader_fns.DefaultReader": _default_video_reader,
        "datasets.reader_fns.VideoAsLabelOnehotReader": VideoAsLabelOnehotReader,
        # losses
        "torch.nn.MSELoss": MSELoss,
        "loss_fn.mse.NormedMSE": NormedMSE,
        "loss_fn.multidim_xentropy.MultiDimCrossEntropy": MultiDimCrossEntropy,
        "loss_fn.multidim_xentropy.QuantizeAndCrossEntropy": QuantizeAndCrossEntropy,
        "datasets.breakfast_50salads.Breakfast50Salads": Breakfast50Salads,
        "datasets.breakfast_50salads.SenerFeatsReader": SenerFeatsReader,
        "datasets.breakfast_50salads.GZFormatReader": GZFormatReader,
        "datasets.breakfast_50salads.NPYFormatReader": NPYFormatReader,
        "datasets.breakfast_50salads.read_abu_farha_annotations": read_abu_farha_annotations,
        "datasets.breakfast_50salads.read_orig_50salads_annotations": read_orig_50salads_annotations,
        "datasets.breakfast_50salads.read_orig_breakfast_annotations": read_orig_breakfast_annotations,
        "datasets.breakfast_50salads.bundle_entry_to_video_fname_50salads": bundle_entry_to_video_fname_50salads,
        "datasets.breakfast_50salads.bundle_entry_to_video_fname_breakfast": bundle_entry_to_video_fname_breakfast,
        "avt_tpu.data.Breakfast50Salads": Breakfast50Salads,
        "loss_fn.simclr_infonce.DistributedSimclrInfoNCELoss": SimclrInfoNCE,
        "loss_fn.simclr_infonce.MultiDimDistributedSimclrInfoNCELoss":
            MultiDimSimclrInfoNCE,
        # native names
        "avt_tpu.data.EpicKitchens": EpicKitchens,
        "avt_tpu.data.NpyFeatsReader": NpyFeatsReader,
        "avt_tpu.data.LibavVideoReader": _default_video_reader,
        "avt_tpu.data.LMDBFeatsReader": LMDBFeatsReader,
        "avt_tpu.data.convert_to_anticipation": convert_to_anticipation,
        "avt_tpu.losses.NormedMSE": NormedMSE,
        "avt_tpu.losses.MSELoss": MSELoss,
    }
    for name, fn in pairs.items():
        register_target(name, fn)


_register_builtin_targets()
