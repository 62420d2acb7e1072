"""Serving / deployment export: the eval forward as serialized StableHLO.

The reference repo has no deployment story beyond re-running its trainer
in `test_only` mode (func/train.py:319-430); serving is added TPU-native
capability. `jax.export` packages ONE static-shape program — device-side
preprocessing (torch-exact resize, 1/3 crops +/- flips) fused with the
multi-crop model forward — into a versioned StableHLO artifact that:

  * runs on any JAX runtime with a cpu/tpu backend (multi-platform
    lowering) WITHOUT the avt_tpu Python stack or its config engine;
  * carries StableHLO's forward-compatibility guarantees (the jax.export
    serialization calling convention), so artifacts survive framework
    upgrades on the serving fleet;
  * optionally bakes the trained parameters in as constants (a single
    self-contained file), or keeps them as a runtime argument so one
    artifact serves many checkpoints (A/B, sweeps).

Build artifacts with `tools/export_model.py` (config + checkpoint ->
.stablehlo file); load them anywhere with `load_exported(path).call(...)`.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jax_export

DEFAULT_OUTPUTS = ("logits/action",)


def make_eval_forward(
    model,
    preprocessor=None,
    outputs: Sequence[str] = DEFAULT_OUTPUTS,
) -> Callable:
    """(params, frames_or_video) -> dict of requested endpoints.

    With a preprocessor, the input is raw (B, T, H, W, 3) uint8 frames and
    the program runs preproc + forward fused (the bench.py main_eval
    topology). Without, the input is an already-preprocessed
    (B, #clips, [#crops,] C, T, H, W) video tensor.
    """

    def fwd(params, frames):
        if preprocessor is not None:
            video = preprocessor.eval_fn(frames)[:, None]
        else:
            video = frames
        outs, _ = model.apply(params, video, train=False)
        return {k: outs[k] for k in outputs}

    return fwd


def export_eval_forward(
    model,
    params,
    frame_shape: Tuple[int, ...],
    *,
    preprocessor=None,
    outputs: Sequence[str] = DEFAULT_OUTPUTS,
    platforms: Sequence[str] = ("cpu", "tpu"),
    bake_params: bool = True,
    frame_dtype=None,
) -> jax_export.Exported:
    """Export the eval forward for `frame_shape` inputs.

    frame_shape: raw-frame shape (with preprocessor) or video shape
    (without). bake_params=True embeds `params` as constants -> the
    artifact's only argument is the input tensor; False exports a
    two-argument (params, input) program.
    """
    import jax.numpy as jnp

    if frame_dtype is None:
        frame_dtype = jnp.uint8 if preprocessor is not None else jnp.float32
    fwd = make_eval_forward(model, preprocessor, outputs)
    in_spec = jax.ShapeDtypeStruct(tuple(frame_shape), frame_dtype)
    if bake_params:
        fn = jax.jit(functools.partial(fwd, params))
        args = (in_spec,)
    else:
        fn = jax.jit(fwd)
        args = (jax.eval_shape(lambda: params), in_spec)
    return jax_export.export(fn, platforms=list(platforms))(*args)


def save_exported(exported: jax_export.Exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str) -> jax_export.Exported:
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def serving_fn(exported: jax_export.Exported) -> Callable:
    """jit-wrapped call on the current backend (compiles once per shape)."""
    return jax.jit(exported.call)


def batch_predict(
    exported: jax_export.Exported,
    frames: np.ndarray,
    batch_size: Optional[int] = None,
) -> dict:
    """Convenience host loop: split frames on axis 0 into the exported
    program's static batch size (the artifact's first input dim) and
    concatenate outputs. Tail batches pad + trim to keep ONE compiled
    shape."""
    if len(exported.in_avals) != 1:
        raise ValueError(
            "batch_predict needs a params-baked artifact (single input); "
            f"this one takes {len(exported.in_avals)} arrays"
        )
    call = serving_fn(exported)
    want_b = exported.in_avals[0].shape[0]
    if batch_size is not None and batch_size != want_b:
        raise ValueError(
            f"artifact is compiled for batch {want_b}, got {batch_size}"
        )
    n = frames.shape[0]
    if n == 0:  # empty shard: empty per-key outputs, not a crash
        leaves = [
            np.zeros((0,) + tuple(a.shape[1:]), a.dtype)
            for a in exported.out_avals
        ]
        return jax.tree.unflatten(exported.out_tree, leaves)
    outs = []
    for i in range(0, n, want_b):
        chunk = frames[i : i + want_b]
        pad = want_b - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, axis=0)]
            )
        res = call(chunk)
        if pad:
            res = {k: v[: want_b - pad] for k, v in res.items()}
        outs.append(jax.device_get(res))
    return {
        k: np.concatenate([o[k] for o in outs]) for k in outs[0]
    }
