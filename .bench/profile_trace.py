"""Capture a jax.profiler trace of the bench train step and parse the
xplane with xprof to print op-level self times."""
import glob, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from avt_tpu.utils import enable_compile_cache

enable_compile_cache()

B, K, T, H, W = 16, 8, 10, 256, 342
N_CLS = 3806

from avt_tpu.data.transforms import VideoPreprocessor
from avt_tpu.models.flagship import build_avt
from avt_tpu.train import TrainState, build_optimizer, make_train_step
from avt_tpu.train.step import make_multi_step

model = build_avt(num_actions=N_CLS, vit_dtype=jnp.bfloat16)
pp = VideoPreprocessor(crop_size=224, scale_h="248-280", scale_w=-1,
                       mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), flip_p=0.5,
                       compute_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, size=(K, B, T, H, W, 3)).astype(np.uint8))
target = jnp.asarray(rng.integers(0, N_CLS, size=(K, B)))
tsub = jnp.asarray(rng.integers(-1, N_CLS, size=(K, B, T, 1)))
video0 = pp.train_fn(frames[0], jax.random.PRNGKey(0))
video0 = video0.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
params = model.init(jax.random.PRNGKey(0), video0, (B,))
tx, _ = build_optimizer(params, lr_wd=[["__all__", 1e-4, 1e-5]],
                        optimizer_name="sgd", scheduler_name="cosine",
                        iters_per_epoch=1000, num_epochs=30, warmup_epochs=20,
                        optimizer_kwargs={"nesterov": True,
                                          "momentum_dtype": "bfloat16"})
inner = make_train_step(model, tx,
                        loss_wts={"cls_action": 1.0, "past_cls_action": 1.0,
                                  "feat": 1.0},
                        num_classes={"action": N_CLS}, jit_compile=False)


def step_with_pp(state, batch, rng_):
    k1, k2 = jax.random.split(rng_)
    video = pp.train_fn(batch["frames"], k1)
    video = video.transpose(0, 2, 1, 3, 4)[:, :, :, None, :, :]
    return inner(state, {"video": video,
                         "target": {"action": batch["target"]},
                         "target_subclips": {"action": batch["tsub"]}}, k2)


multi = make_multi_step(step_with_pp, K)
state = TrainState.create(params, tx)
batches = {"frames": frames, "target": target, "tsub": tsub}
state, m = multi(state, batches, jax.random.PRNGKey(0))
_ = float(m["loss"][-1])
print("# warmed up", flush=True)

logdir = "/tmp/avt_trace"
with jax.profiler.trace(logdir):
    state, m = multi(state, batches, jax.random.PRNGKey(1))
    _ = float(m["loss"][-1])
print("# traced", flush=True)

paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
print("# xplanes:", paths)
from tensorboard_plugin_profile.convert import raw_to_tool_data

data, _ = raw_to_tool_data.xspace_to_tool_data(
    [paths[0]], "framework_op_stats^", {}
)
out = "/tmp/avt_trace/op_stats.csv"
with open(out, "wb") as f:
    f.write(data if isinstance(data, bytes) else data.encode())
print("# wrote", out)
