"""Worker process for the real multi-process distributed tests.

Run as:  python tests/_mp_worker.py <process_id> <num_processes> <port>

Each worker is a fresh interpreter that forces a 4-device virtual CPU
topology, rendezvouses through ``avt_tpu.parallel.setup_distributed``'s
env-var surface (the reference reads RANK/WORLD_SIZE the same way,
common/utils.py:106-150), and then exercises every ``process_count() > 1``
branch of the parallel layer against a hand-checkable linear model:

  * ``shard_params``: same-seed host arrays -> replicated global params
    (the DDP "every rank holds the full model" contract)
  * ``shard_batch``: each process feeds only ITS loader shard; the global
    batch is assembled across hosts (host_local_array_to_global_array)
  * global-batch loss/grad under jit: the mean spans BOTH hosts' rows —
    XLA inserts the gradient psum the reference got from DDP all-reduce
  * ``unshard_results``: per-sample outputs come back as this host's rows
  * ``shard_batch`` rejects non-divisible multi-host batches loudly
  * ``MetricLogger.synchronize_between_processes``: meter totals averaged
    across hosts (reference common/log.py:40-54)

Prints ONE JSON line the parent test compares against a numpy ground truth.
"""
import json
import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from avt_tpu.parallel import (
        make_mesh,
        setup_distributed,
        shard_batch,
        shard_params,
        unshard_results,
    )
    from avt_tpu.train.meters import MetricLogger

    setup_distributed()
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert len(jax.local_devices()) == 4

    # Same seed on every host -> identical replicated params.
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 4)).astype(np.float32)
    x_global = rng.normal(size=(16, 8)).astype(np.float32)
    y_global = rng.normal(size=(16, 4)).astype(np.float32)
    per = 16 // nproc
    local = slice(pid * per, (pid + 1) * per)

    mesh = make_mesh(4 * nproc, 1)
    params = shard_params({"fc": {"kernel": w}}, mesh)

    @jax.jit
    def step(params, batch):
        def loss_fn(p):
            pred = batch["x"] @ p["fc"]["kernel"]
            return jnp.mean((pred - batch["y"]) ** 2), pred

        (loss, pred), grad = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new = jax.tree.map(lambda p, g: p - 0.1 * g, params, grad)
        return new, loss, pred

    batch = shard_batch({"x": x_global[local], "y": y_global[local]}, mesh)
    assert "data" in str(batch["x"].sharding.spec), batch["x"].sharding
    params, loss, pred = step(params, batch)

    local_pred = unshard_results(pred, mesh)
    assert local_pred.shape == (per, 4), local_pred.shape

    # Non-divisible multi-host batches must fail loudly, not silently
    # disagree across hosts (mesh.py shard_batch docstring).
    try:
        shard_batch({"x": x_global[:3]}, mesh)
    except ValueError:
        pass
    else:
        raise AssertionError("non-divisible multi-host batch was accepted")

    ml = MetricLogger()
    ml.update(loss=float(pid + 1), n=1)
    ml.synchronize_between_processes()

    # Replicated global arrays are fully addressable on every host.
    new_w = np.asarray(jax.device_get(params["fc"]["kernel"]))
    print(json.dumps({
        "pid": pid,
        "loss": float(loss),
        "pred_sum": float(local_pred.sum()),
        "w_sum": float(new_w.sum()),
        "meter_total": ml["loss"].total,
        "meter_count": ml["loss"].count,
    }), flush=True)


if __name__ == "__main__":
    main()
