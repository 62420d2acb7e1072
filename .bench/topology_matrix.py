"""TPU topology matrix: one real train step per distinct compiled topology.

Round-4 hardware validation (VERDICT r3 'next' #2): the 27-expt matrix runs
on the CPU mesh, but Mosaic/XLA:TPU lowering has its own constraints
(lane-granularity, (8,128) tiling), so every distinct topology the config
groups can compose must compile + step on the actual chip once. Covers the
backbones (r2plus1d_18/34, r3d_18, ir_csn_152, ip_csn_50, BN-Inception),
the RULSTM and transformer+cloze aggregators, quantized/embedding AVTh,
and the PredFutureFeat+InfoNCE SSL op — everything bench.py/smoke_train
(ViT+AVTh only) never touches. Reference topology sources:
models/video_classification.py:128-257, temporal_aggregation.py:150-201,
future_prediction.py:66-95, func/train_eval_ops.py:148-231.

Run (axon TPU, nohup discipline — NO timeout wrappers):
  cd /root/repo && nohup python -u .bench/topology_matrix.py \
      > /tmp/topology_matrix.log 2>&1 &
Appends one JSON line per topology to .bench/topology_matrix.jsonl.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np

LEDGER = os.path.join(os.path.dirname(__file__), "topology_matrix.jsonl")
N_CLS = 3806  # EK100 action vocab
CENTROIDS_NPY = "/tmp/topology_centroids.npy"

AVTH_LINES = [
    "model/future_predictor=avth",
    "+model.future_predictor.n_head=4",
    "+model.future_predictor.n_layer=6",
    "+model.future_predictor.output_len=1",
    "+model.future_predictor.inter_dim=2048",
    "+model.future_predictor.return_past_too=true",
    "+model.future_predictor.future_pred_loss={_target_: torch.nn.MSELoss}",
    "+model.future_predictor.avg_last_n=1",
    "train.train_one_epoch_fn.loss_wts.feat=1.0",
]

# name -> dict(overrides, video shape (B, #clips, [C], T, H, W), extras)
TOPOLOGIES = {
    # conv video backbones, clip input (B, 1, 3, T, H, W), 112px recipe
    "r2plus1d_18_avth": {
        "overrides": [
            "model/backbone=r2plus1d_18",
            "model/temporal_aggregator=identity",
        ] + AVTH_LINES,
        "video": (2, 1, 3, 16, 112, 112),
    },
    "r2plus1d_34_mean": {
        "overrides": [
            "model/backbone=r2plus1d_34",
            "model/temporal_aggregator=mean",
            "model/future_predictor=identity",
        ],
        "video": (2, 1, 3, 16, 112, 112),
    },
    "r3d_18_mean": {
        "overrides": [
            "model/backbone=r3d_18",
            "model/temporal_aggregator=mean",
            "model/future_predictor=identity",
        ],
        "video": (2, 1, 3, 16, 112, 112),
    },
    "ir_csn_152_mean": {
        "overrides": [
            "model/backbone=identity",  # replaced by direct build below
            "model/temporal_aggregator=mean",
            "model/future_predictor=identity",
            "model.backbone_dim=2048",
        ],
        "direct_backbone": "ir_csn_152",
        "video": (1, 1, 3, 8, 112, 112),
    },
    "ip_csn_50_mean": {
        "overrides": [
            "model/backbone=identity",
            "model/temporal_aggregator=mean",
            "model/future_predictor=identity",
            "model.backbone_dim=2048",
        ],
        "direct_backbone": "ip_csn_50",
        "video": (1, 1, 3, 8, 112, 112),
    },
    # per-frame BN-Inception (TSN-style), frame clips like the flagship
    "bn_inception_avth": {
        "overrides": [
            "model/backbone=bn_inception",
            "model.backbone_dim=1024",
            "model.backbone_last_n_modules_to_drop=0",
            "model/temporal_aggregator=identity",
        ] + AVTH_LINES,
        "video": (2, 10, 3, 1, 224, 224),
    },
    # RULSTM aggregator on TSN features (expt 05 topology, train step)
    "rulstm_agg": {
        "overrides": [
            "model/backbone=identity",
            "model.backbone_dim=1024",
            "model/temporal_aggregator=rulstm",
            "model.temporal_aggregator.num_pad_feats=3",
            "model/future_predictor=identity",
        ],
        "video": (8, 1, 1024, 11, 1, 1),  # one clip of 11 RULSTM frames
    },
    # transformer aggregator with the cloze/MLM aux loss over a T=10 clip
    "transformer_cloze": {
        "overrides": [
            "model/backbone=identity",
            "model.backbone_dim=1024",
            "model/temporal_aggregator=transformer",
            "+model.temporal_aggregator.cloze_loss_ratio=0.25",
            "+model.temporal_aggregator.cloze_loss_wt=1.0",
            "model/future_predictor=identity",
        ],
        "video": (8, 1, 1024, 10, 1, 1),
    },
    # AVTh with on-the-fly k-means assignment + quantized rollout feedback;
    # feat loss is CE over cluster assignments (future_prediction.py:222-227)
    "avth_quantized": {
        "overrides": [
            "model/backbone=identity",
            "model.backbone_dim=1024",
            "model/temporal_aggregator=identity",
            "model/future_predictor=avth",
            "+model.future_predictor.n_head=4",
            "+model.future_predictor.n_layer=6",
            "+model.future_predictor.inter_dim=2048",
            "+model.future_predictor.return_past_too=true",
            "+model.future_predictor.avg_last_n=1",
            "train.train_one_epoch_fn.loss_wts.feat=1.0",
            "+model.future_predictor.quantize_before_rollout=true",
            "+model.future_predictor.output_len=2",  # real feedback step
            "+model.future_predictor.num_cluster_centers=64",
            f"+model.future_predictor.centroids={CENTROIDS_NPY}",
            # assigner mode already turns targets into cluster ids, so the
            # teacher-forced loss is plain CE over ids (future_prediction.py
            # :207-215 with assign_to_centroids set)
            "+model.future_predictor.future_pred_loss="
            "{_target_: loss_fn.multidim_xentropy.MultiDimCrossEntropy}",
        ],
        "video": (8, 10, 1024, 1, 1, 1),
    },
    # AVTh in embedding mode: inputs are cluster ids (in_features == 1)
    "avth_embedding": {
        "overrides": [
            "model/backbone=identity",
            "model.backbone_dim=1",
            "model/temporal_aggregator=identity",
            "model/future_predictor=avth",
            "+model.future_predictor.n_head=4",
            "+model.future_predictor.n_layer=6",
            "+model.future_predictor.output_len=1",
            "+model.future_predictor.inter_dim=512",
            "+model.future_predictor.avg_last_n=1",
            "+model.future_predictor.num_cluster_centers=64",
        ],
        "video": "ids",  # (8, 10, 1, 1, 1, 1) cluster ids
    },
    # PredFutureFeat + SimCLR-InfoNCE SSL op (func/train_eval_ops.py:148):
    # mean-agg projections of observed vs future clips, MIL 'together' style
    "ssl_infonce": {
        "overrides": [
            "model/backbone=identity",
            "model.backbone_dim=1024",
            "model/temporal_aggregator=mean",
            "model/future_predictor=identity",
            "model.project_dim_for_nce=512",
        ],
        "video": (8, 1, 1024, 10, 1, 1),
        "ssl": True,
    },
}


def log(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", flush=True)


def fetch(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))  # fetch-forced sync (axon block_until_ready lies)


def run_one(name, spec):
    import jax
    import jax.numpy as jnp

    from avt_tpu.config import Composer, parse_override
    from avt_tpu.config.build import (
        build_model,
        build_optimizer_from_cfg,
        loss_weights,
    )
    from avt_tpu.train import TrainState, make_train_step

    cfg = Composer("/root/repo/conf").compose(
        "config", [parse_override(ln) for ln in spec["overrides"]]
    )
    num_classes = {"action": N_CLS}
    model = build_model(cfg, num_classes, {})
    if spec.get("direct_backbone"):  # CSNs have no conf group (not shipped
        # in any expt) but ARE in the model zoo surface; swap the backbone
        import avt_tpu.models as _m
        import dataclasses

        bk = getattr(_m, spec["direct_backbone"])()
        model = dataclasses.replace(model, backbone=bk, backbone_dim=2048)
    rng = np.random.default_rng(0)
    if spec["video"] == "ids":
        video = jnp.asarray(
            rng.integers(0, 64, size=(8, 10, 1, 1, 1, 1)).astype(np.float32)
        )
    else:
        video = jnp.asarray(rng.normal(size=spec["video"]).astype(np.float32))
    B = video.shape[0]
    target = {"action": jnp.asarray(rng.integers(0, N_CLS, size=(B,)))}
    t0 = time.time()
    params = model.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "cloze": jax.random.PRNGKey(2),
        },
        video, (B,), train=True,
    )
    init_s = time.time() - t0
    tx, _ = build_optimizer_from_cfg(cfg, params, iters_per_epoch=10)
    wts = loss_weights(cfg)
    if spec.get("ssl"):
        from avt_tpu.losses import SimclrInfoNCE
        from avt_tpu.train.step import make_ssl_train_step

        nfut = 2
        step = make_ssl_train_step(
            model, tx, wts, num_classes,
            reg_criterion=SimclrInfoNCE(),
            nfutures=nfut, incur_loss_style="together", donate=False,
        )
        batch = {"video": video, "target": target}
        for i in range(nfut):
            batch[f"future_{i}_video"] = jnp.asarray(
                rng.normal(size=spec["video"]).astype(np.float32)
            )
    else:
        step = make_train_step(
            model, tx, wts, num_classes=num_classes, donate=False
        )
        batch = {"video": video, "target": target}
    state = TrainState.create(params, tx)
    t0 = time.time()
    state, m = step(state, batch, jax.random.PRNGKey(3))
    loss0 = fetch(m["loss"])
    compile_s = time.time() - t0
    n = 5
    t0 = time.time()
    for i in range(n):
        state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(4), i))
    loss = fetch(m["loss"]) / 1.0
    step_ms = (time.time() - t0) / n * 1000.0
    return {
        "topology": name,
        "ok": bool(np.isfinite(loss0)) and bool(np.isfinite(loss)),
        "loss_first": round(loss0, 4),
        "loss_last": round(loss, 4),
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "step_ms": round(step_ms, 1),
        "batch": list(np.shape(np.asarray(batch["video"]))),
    }


def main():
    if os.environ.get("AVT_TOPO_CPU"):  # API smoke without the chip
        import jax

        jax.config.update("jax_platforms", "cpu")
    from avt_tpu.utils import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(7)
    np.save(CENTROIDS_NPY, rng.normal(size=(64, 1024)).astype(np.float32))
    only = sys.argv[1:] or list(TOPOLOGIES)
    with open(LEDGER, "a") as f:
        f.write(json.dumps({"run_started": time.strftime("%F %T")}) + "\n")
        f.flush()
        for name in only:
            log(f"=== {name}")
            try:
                rec = run_one(name, TOPOLOGIES[name])
            except Exception as e:
                traceback.print_exc()
                rec = {"topology": name, "ok": False,
                       "error": f"{type(e).__name__}: {e}"}
            log(json.dumps(rec))
            f.write(json.dumps(rec) + "\n")
            f.flush()
    log("done")


if __name__ == "__main__":
    main()
