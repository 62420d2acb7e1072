"""Benchmark: end-to-end AVT-b + AVT-h training throughput on one chip.

Measures the full flagship pipeline the reference runs in expts/01
(README.md:193): device-side preprocessing (scale-jitter resize + crop +
flip + normalize) -> ViT-B/16 per frame -> AVT-h causal head -> cls + past
+ feat losses -> SGD update, batch of 10-frame clips, forward+backward,
one TPU chip. Prints ONE JSON line.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6);
its hardware was V100-16GB at batch 3/GPU, fp32, no AMP (func/train.py has
no scaler). A generous fp32 V100 estimate for this model is ~20 clips/s
(ViT-B ~17.6 GFLOPs/frame x 10 frames x 3 for fwd+bwd ~= 0.53 TFLOPs/clip
vs ~10-12 TFLOP/s achieved fp32) -- vs_baseline = measured / 20.0, i.e.
how many V100s one TPU chip replaces on this workload.
"""
import json
import time

V100_CLIPS_PER_SEC_EST = 20.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from avt_tpu.data.transforms import VideoPreprocessor
    from avt_tpu.models.flagship import build_avt
    from avt_tpu.train import TrainState, build_optimizer, make_train_step

    B, T, H, W = 8, 10, 256, 342
    N_CLS = 3806
    model = build_avt(num_actions=N_CLS)
    pp = VideoPreprocessor(
        crop_size=224, scale_h="248-280", scale_w=-1,
        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), flip_p=0.5,
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, size=(B, T, H, W, 3)).astype(np.uint8))
    target = jnp.asarray(rng.integers(0, N_CLS, size=(B,)))
    tsub = jnp.asarray(rng.integers(-1, N_CLS, size=(B, T, 1)))

    import sys

    def log(msg):
        print(f"# bench: {msg}", file=sys.stderr, flush=True)

    video0 = pp.train_fn(frames, jax.random.PRNGKey(0))
    # (B, 3, T, 224, 224) -> subclips (B, T, 3, 1, 224, 224)
    video0 = video0.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), video0, (B,))
    log(f"init done in {time.time() - t0:.0f}s")
    tx, _ = build_optimizer(
        params,
        lr_wd=[["__all__", 1e-4, 1e-5]],
        optimizer_name="sgd",
        scheduler_name="cosine",
        iters_per_epoch=1000,
        num_epochs=30,
        warmup_epochs=20,
        optimizer_kwargs={"nesterov": True},
    )
    inner_step = make_train_step(
        model, tx,
        loss_wts={"cls_action": 1.0, "past_cls_action": 1.0, "feat": 1.0},
        num_classes={"action": N_CLS},
        donate=False,
    )

    def full_step(state, frames, target, tsub, rng):
        k1, k2 = jax.random.split(rng)
        video = pp.train_fn(frames, k1)  # (B, 3, T, 224, 224)
        video = video.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
        batch = {
            "video": video,
            "target": {"action": target},
            "target_subclips": {"action": tsub},
        }
        return inner_step(state, batch, k2)

    full_step = jax.jit(full_step)
    state = TrainState.create(params, tx)
    t0 = time.time()
    state, m = full_step(state, frames, target, tsub, jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    log(f"train step compiled in {time.time() - t0:.0f}s, loss={float(m['loss']):.3f}")
    # steady state
    n_iters = 20
    t0 = time.time()
    for i in range(n_iters):
        state, m = full_step(state, frames, target, tsub, jax.random.PRNGKey(i))
    jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / n_iters
    clips_per_sec = B / dt
    print(
        json.dumps(
            {
                "metric": "clips/sec/chip (e2e AVT-b ViT-B/16 + AVT-h, "
                          "10-frame 224px clips, fwd+bwd incl. device preproc)",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / V100_CLIPS_PER_SEC_EST, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
