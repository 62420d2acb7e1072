import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from avt_tpu.data.transforms import VideoPreprocessor
from avt_tpu.models.flagship import build_avt
from avt_tpu.train import TrainState, build_optimizer, make_train_step
from avt_tpu.train.step import make_multi_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
T, H, W, N_CLS = 10, 256, 342, 3806
rng = np.random.default_rng(0)
model = build_avt(num_actions=N_CLS, vit_dtype=jnp.bfloat16)
pp = VideoPreprocessor(crop_size=224, scale_h="248-280", scale_w=-1,
                       mean=(0.5,0.5,0.5), std=(0.5,0.5,0.5))
frames = jnp.asarray(rng.integers(0,256,size=(K,B,T,H,W,3)).astype(np.uint8))
target = jnp.asarray(rng.integers(0,N_CLS,size=(K,B)))
tsub = jnp.asarray(rng.integers(-1,N_CLS,size=(K,B,T,1)))
video0 = pp.train_fn(frames[0], jax.random.PRNGKey(0)).transpose(0,2,1,3,4)[:,:,:,None,:,:]
t0=time.time()
params = model.init(jax.random.PRNGKey(0), video0, (B,))
print(f"init {time.time()-t0:.0f}s", flush=True)
tx, _ = build_optimizer(params, lr_wd=[["__all__",1e-4,1e-5]],
    optimizer_name="sgd", scheduler_name="cosine",
    iters_per_epoch=1000, num_epochs=30, warmup_epochs=20,
    optimizer_kwargs={"nesterov": True})
inner = make_train_step(model, tx,
    loss_wts={"cls_action":1.0,"past_cls_action":1.0,"feat":1.0},
    num_classes={"action":N_CLS}, jit_compile=False)

def step_with_pp(state, batch, rng):
    k1,k2 = jax.random.split(rng)
    video = pp.train_fn(batch["frames"], k1).transpose(0,2,1,3,4)[:,:,:,None,:,:]
    return inner(state, {"video": video, "target":{"action":batch["target"]},
                         "target_subclips":{"action":batch["tsub"]}}, k2)

multi = make_multi_step(step_with_pp, K)
state = TrainState.create(params, tx)
batches = {"frames": frames, "target": target, "tsub": tsub}
t0=time.time()
state, m = multi(state, batches, jax.random.PRNGKey(1))
print(f"compile {time.time()-t0:.0f}s loss={float(m['loss']):.3f}", flush=True)
n=4
t0=time.time()
for i in range(n):
    state, m = multi(state, batches, jax.random.PRNGKey(i))
_ = float(m["loss"])
dt = (time.time()-t0)/(n*K)
print(f"B={B} K={K}: {dt*1000:.1f} ms/step -> {B/dt:.1f} clips/s", flush=True)
