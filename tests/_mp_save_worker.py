"""2-process drive of train_one_epoch's save_freq_min collective trigger.

Usage: python mp_save_trigger_worker.py <pid> <nproc> <port> <ckpt_dir> <scenario>

scenario 'skew_rank1_due': rank 1's local clock says a save is overdue but
rank 0's does not — the OLD host-local trigger would send rank 1 alone into
the orbax save collective (deadlock); the broadcast trigger must complete
with NO save.
scenario 'rank0_due': rank 0 is overdue — broadcast True, BOTH ranks save.
"""
import datetime
import json
import os
import sys

pid, nproc, port, ckpt_dir, scenario = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from avt_tpu.parallel import setup_distributed

setup_distributed()
assert jax.process_count() == nproc

from avt_tpu.train.loop import train_one_epoch

state = {"w": jnp.ones((4,), jnp.float32)}


@jax.jit
def train_step(state, batch, rng):
    new = {"w": state["w"] + 0.01}
    return new, {"loss": jnp.sum(new["w"]) * 0.0 + 0.1}


loader = [
    {"target": {"action": np.zeros((4,), np.int64)}} for _ in range(20)
]
now = datetime.datetime.now()
overdue = now - datetime.timedelta(minutes=120)
if scenario == "skew_rank1_due":
    last_saved = overdue if pid == 1 else now + datetime.timedelta(minutes=5)
else:  # rank0_due
    last_saved = overdue if pid == 0 else now

state, _ = train_one_epoch(
    train_step,
    state,
    loader,
    epoch=0,
    rng=jax.random.key(0),
    save_freq_min=60.0,
    ckpt_dir=ckpt_dir,
    last_saved_time=last_saved,
    rank=pid,
    print_freq=1000,
    print_large_freq=0,
)
saved = sorted(os.listdir(ckpt_dir)) if os.path.isdir(ckpt_dir) else []
print(json.dumps({"pid": pid, "saved": saved,
                  "w0": float(np.asarray(state["w"])[0])}))
