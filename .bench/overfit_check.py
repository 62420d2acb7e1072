"""Overfit the FULL flagship (ViT-B + AVT-h) on one fixed batch on-chip.

A correctness probe for the end-to-end optimization path at real scale:
with a fixed 16-clip batch and enough steps, the 3806-way classification
losses must approach zero. Plateauing high would indicate an init/LR/
grad-path bug that tiny-model tests can't see.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from avt_tpu.utils import enable_compile_cache

enable_compile_cache()

B, T, H, W = 16, 10, 256, 342
N_CLS = 3806
K = 8

from avt_tpu.data.transforms import VideoPreprocessor
from avt_tpu.models.flagship import build_avt
from avt_tpu.train import TrainState, build_optimizer, make_train_step
from avt_tpu.train.step import make_multi_step

model = build_avt(num_actions=N_CLS, vit_dtype=jnp.bfloat16)
pp = VideoPreprocessor(
    crop_size=224, scale_h="248-280", scale_w=-1,
    mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), flip_p=0.5,
    compute_dtype=jnp.bfloat16,
)
rng = np.random.default_rng(0)
# per-clip DISTINCTIVE content that survives random crop/flip/scale: a
# clip-specific broad color wash + noise (pure-noise clips are NOT
# memorizable under per-step augmentation — the loss plateaus at ln(B),
# the "right label set, indistinguishable clips" point)
frames1 = rng.integers(80, 176, size=(B, T, H, W, 3)).astype(np.uint8)
wash = rng.integers(0, 80, size=(B, 1, 1, 1, 3)).astype(np.uint8)
frames1 = np.clip(frames1 + wash, 0, 255).astype(np.uint8)
target1 = rng.integers(0, N_CLS, size=(B,))
tsub1 = np.repeat(target1[:, None, None], T, axis=1)  # consistent past labels
frames = jnp.asarray(np.broadcast_to(frames1, (K,) + frames1.shape))
target = jnp.asarray(np.broadcast_to(target1, (K, B)))
tsub = jnp.asarray(np.broadcast_to(tsub1, (K, B, T, 1)))

video0 = pp.train_fn(frames[0], jax.random.PRNGKey(0))
video0 = video0.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
params = model.init(jax.random.PRNGKey(0), video0, (B,))
tx, _ = build_optimizer(
    params, lr_wd=[["__all__", 2e-3, 0.0]], optimizer_name="sgd",
    scheduler_name="cosine", iters_per_epoch=100, num_epochs=4,
    warmup_epochs=1,
    optimizer_kwargs={"nesterov": True, "momentum_dtype": "bfloat16"},
)
inner = make_train_step(
    model, tx,
    loss_wts={"cls_action": 1.0, "past_cls_action": 1.0, "feat": 1.0},
    num_classes={"action": N_CLS}, jit_compile=False,
)


def step_with_pp(state, batch, rng):
    k1, k2 = jax.random.split(rng)
    video = pp.train_fn(batch["frames"], k1)
    video = video.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
    return inner(state, {
        "video": video,
        "target": {"action": batch["target"]},
        "target_subclips": {"action": batch["tsub"]},
    }, k2)


multi = make_multi_step(step_with_pp, K)
state = TrainState.create(params, tx)
batches = {"frames": frames, "target": target, "tsub": tsub}
t0 = time.time()
for r in range(40):
    state, m = multi(state, batches, jax.random.PRNGKey(r))
    if r % 5 == 0 or r == 39:
        loss = float(m["loss"][-1])
        cls = float(m["loss/cls_action"][-1]) if "loss/cls_action" in m else -1
        acc = float(m.get("acc1/action", [np.nan] * K)[-1])
        print(f"step {(r+1)*K:4d}  loss {loss:7.4f}  cls {cls:7.4f}  "
              f"acc1 {acc:5.1f}  ({time.time()-t0:.0f}s)", flush=True)
final_cls = float(m["loss/cls_action"][-1])
final_acc = float(m.get("acc1/action", [0] * K)[-1])
ok = final_cls < 0.5 and final_acc > 95.0
print(f"OVERFIT {'OK' if ok else 'FAILED'}: cls {final_cls:.4f} "
      f"acc1 {final_acc:.1f}")
sys.exit(0 if ok else 1)
