"""Attention-map visualization for AVT-h rollouts (the paper-figure path).

Parity target: the reference exports per-rollout-step GPT-2 attention
maps as `gpt2_att_<k>` endpoints (models/future_prediction.py:184-188)
and renders its qualitative figures from them in notebook code
(notebooks/utils.py:232-244 clip overlays). This tool reproduces that
workflow end to end: decode a clip with the native decoder, run the
config's eval device-preprocess, forward the model with
output_attentions=True, and render

  * per rollout step: a (layer x head) grid of (Tq, Tk) attention
    heatmaps — `step<k>_heads.png`
  * per rollout step: the observed frames in a strip with a bar under
    each frame showing how much the final (anticipation) query attends
    to it, averaged over layers and heads — `step<k>_overlay.png`

Usage:
  python tools/viz_attention.py VIDEO -c expts/01_ek100_avt.txt \
      [--ckpt CKPT] [--num-classes 3806] [--start 0 --end 4] \
      [-o attention_viz] [extra key=value overrides]

The config must use the AVTh future predictor and a raw-video backbone
(feature-store configs have no clip to decode).
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONF_DIR = Path(__file__).resolve().parent.parent / "conf"


def _decode_frames(video: str, start: float, end: float, num_frames: int):
    from avt_tpu.data.video_decoder import LibavVideoReader

    reader = LibavVideoReader()
    frames, _info = reader(video, start, end, None, None)
    if frames.shape[0] == 0:
        raise SystemExit(f"could not decode any frames from {video}")
    # uniform temporal subsample to the config's num_frames
    idx = np.linspace(0, frames.shape[0] - 1, num_frames).round().astype(int)
    return frames[idx]  # (T, H, W, 3) uint8


def _render_heads(att, out_path: str, step: int):
    """att: (L, H, Tq, Tk) post-softmax probabilities."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    L, H = att.shape[:2]
    fig, axes = plt.subplots(
        L, H, figsize=(2.2 * H, 2.0 * L), squeeze=False)
    for li in range(L):
        for hi in range(H):
            ax = axes[li][hi]
            ax.imshow(att[li, hi], cmap="viridis", vmin=0.0,
                      aspect="auto", interpolation="nearest")
            ax.set_xticks([])
            ax.set_yticks([])
            if li == 0:
                ax.set_title(f"head {hi}", fontsize=8)
            if hi == 0:
                ax.set_ylabel(f"layer {li}", fontsize=8)
    fig.suptitle(f"gpt2_att_{step}: query x key attention")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def _render_overlay(att, frames, out_path: str, step: int):
    """Frame strip + per-frame attention bar for the FINAL query.

    att: (L, H, Tq, Tk); frames: (T, H, W, 3) uint8. The final query is
    the anticipation position; its key weights over the T observed frames
    (layer/head-averaged) say which past frames drove the prediction —
    the reference's qualitative-figure signal."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w = att.mean(axis=(0, 1))[-1]  # (Tk,)
    T = frames.shape[0]
    w = w[:T]  # keys beyond the observed frames (rollout) are dropped
    w = w / max(float(w.max()), 1e-9)
    fig, axes = plt.subplots(
        2, T, figsize=(1.6 * T, 2.4),
        gridspec_kw={"height_ratios": [4, 1]}, squeeze=False)
    for t in range(T):
        axes[0][t].imshow(frames[t])
        axes[0][t].set_xticks([])
        axes[0][t].set_yticks([])
        axes[0][t].set_title(f"t={t}", fontsize=7)
        axes[1][t].bar([0], [float(w[t])], color="crimson")
        axes[1][t].set_ylim(0, 1)
        axes[1][t].set_xticks([])
        axes[1][t].set_yticks([])
    fig.suptitle(f"step {step}: final-query attention over observed frames")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("video", help="video file to decode")
    ap.add_argument("-c", "--config-file", required=True,
                    help="TXT experiment file (raw-video AVTh config)")
    ap.add_argument("--conf-dir", default=str(CONF_DIR))
    ap.add_argument("-o", "--out", default="attention_viz")
    ap.add_argument("--ckpt", default=None,
                    help="init_from_model checkpoint (torch .pth or an "
                         "avt_tpu run checkpoint dir)")
    ap.add_argument("--num-classes", type=int, default=3806,
                    help="action classes for the classifier head (EK100 "
                         "default; irrelevant for the attention maps)")
    ap.add_argument("--start", type=float, default=0.0)
    ap.add_argument("--end", type=float, default=4.0)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    from avt_tpu.config import Composer, parse_override, parse_overrides_file
    from avt_tpu.config.build import (
        build_model,
        build_preprocess_fns,
    )
    from avt_tpu.utils import enable_compile_cache, get_logger

    logger = get_logger("avt_tpu.viz_attention")
    overrides = parse_overrides_file(args.config_file)
    overrides += [parse_override(o) for o in args.overrides]
    cfg = Composer(args.conf_dir).compose("config", overrides)

    fp_target = cfg["model"]["future_predictor"].get("_target_", "")
    if "AVTh" not in fp_target:
        raise SystemExit(
            f"config's future predictor is {fp_target!r}; attention maps "
            "need the AVTh GPT-2 head (model/future_predictor=avth)"
        )
    cfg["model"]["future_predictor"]["output_attentions"] = True
    if "Identity" in cfg["model"]["backbone"]["_target_"]:
        raise SystemExit(
            "feature-store config: nothing to decode — use a raw-video "
            "expt (e.g. expts/01) or extract features upstream"
        )

    import jax
    import jax.numpy as jnp

    enable_compile_cache()
    num_frames = cfg["data_eval"]["num_frames"]
    frames = _decode_frames(args.video, args.start, args.end, num_frames)
    logger.info("Decoded %s -> %s frames of %s", args.video,
                frames.shape[0], frames.shape[1:3])

    _, eval_pp_fn = build_preprocess_fns(cfg)
    video = eval_pp_fn(jnp.asarray(frames[None]))  # (1, clips, crops, 3, T, s, s)

    num_classes = {"action": args.num_classes}
    model = build_model(cfg, num_classes, class_mappings={})
    variables = model.init(jax.random.PRNGKey(0), video, (1,))
    if args.ckpt:
        from avt_tpu.models.import_torch import init_from_model

        variables = init_from_model(variables, [[args.ckpt]])
        logger.info("Initialized from %s", args.ckpt)
    outputs, _aux = model.apply(variables, video, (1,))

    att_keys = sorted(
        (k for k in outputs if k.startswith("gpt2_att_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    if not att_keys:
        raise SystemExit("model returned no gpt2_att_* endpoints")
    os.makedirs(args.out, exist_ok=True)
    written = []
    for key in att_keys:
        step = int(key.rsplit("_", 1)[1])
        att = np.asarray(outputs[key])
        # crop/clip views fold into the leading dim; visualize the first
        att = att.reshape((-1,) + att.shape[-4:])[0]
        heads_png = os.path.join(args.out, f"step{step}_heads.png")
        overlay_png = os.path.join(args.out, f"step{step}_overlay.png")
        _render_heads(att, heads_png, step)
        _render_overlay(att, frames, overlay_png, step)
        written += [heads_png, overlay_png]
        logger.info("%s: %s  (maps %s)", key, att.shape,
                    ", ".join(written[-2:]))
    print("\n".join(written))
    return written


if __name__ == "__main__":
    main()
