"""Device mesh + sharding helpers.

Replaces the reference's entire distributed surface (DDP + NCCL process
groups + DistributedSampler, SURVEY.md §2.8) with the JAX mesh model:

  * 'data' axis: batch sharded, params replicated — the reference's DDP.
    Gradient all-reduce is inserted by XLA over ICI, not hand-written.
  * 'model' axis: a tensor-parallel seam the reference never had. The big
    classifier matmul (e.g. 2048 x 3806 actions) and the AVT-h MLP widths
    shard naturally here; kept available so scaling past DP needs no API
    change (SURVEY.md §7 'hard parts').

The train step itself stays written over the GLOBAL batch (see
train/step.py): jit + shardings compile to the right collectives.
"""
from __future__ import annotations

import os
import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_distributed(logger=None) -> None:
    """Multi-host process init (reference common/utils.py:106-150).

    The reference rendezvouses torch.distributed over a sync file and reads
    rank/world from submitit/RANK/SLURM_PROCID. The JAX equivalent is one
    jax.distributed.initialize() per host process, coordinated over DCN;
    afterwards jax.devices() spans every host and the mesh/shardings below
    make one SPMD program of the whole slice.

    Single-host runs (no coordinator configured) are a no-op, like the
    reference's not-distributed fallback.
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    n_proc = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get("WORLD_SIZE")
    proc_id = os.environ.get("JAX_PROCESS_ID") or os.environ.get("RANK")
    in_slurm = int(os.environ.get("SLURM_NTASKS", "1") or 1) > 1
    if not coord and not in_slurm:
        return
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
    if n_proc is not None:
        kwargs["num_processes"] = int(n_proc)
    if proc_id is not None:
        kwargs["process_id"] = int(proc_id)
    # SLURM (and other cluster envs) auto-detect when kwargs are omitted.
    jax.distributed.initialize(**kwargs)
    if logger:
        logger.info(
            "jax.distributed initialized: process %d/%d, %d devices",
            jax.process_index(), jax.process_count(), jax.device_count(),
        )

# param-path regex -> PartitionSpec rules for the 'model' axis.
# Matched against 'a/b/c' joined param paths; first match wins; default
# replicated. These cover the fat matmuls worth sharding at AVT's scale.
DEFAULT_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    (r"classifiers_.*/fc/kernel$", P(None, "model")),   # (C, n_classes)
    (r".*/mlp_fc/kernel$", P(None, "model")),           # GPT-2 MLP up
    (r".*/mlp_proj/kernel$", P("model", None)),         # GPT-2 MLP down
    (r".*/mlp_fc1/kernel$", P(None, "model")),          # ViT MLP up
    (r".*/mlp_fc2/kernel$", P("model", None)),          # ViT MLP down
    (r".*/attn/qkv/kernel$", P(None, "model")),         # attention heads
    (r".*/attn/proj/kernel$", P("model", None)),
)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh; n_data defaults to len(devices)/n_model."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def param_spec(
    path_str: str,
    leaf,
    rules: Tuple[Tuple[str, P], ...] = DEFAULT_PARAM_RULES,
) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path_str):
            # only shard if the dimension divides evenly; else replicate
            return spec
    return P()


def _put_global(leaf, mesh: Mesh, spec: P):
    """Host array -> global sharded array.

    Single-process: plain device_put. Multi-host: the local array is this
    process's shard along the sharded axes (replicated axes must hold
    identical values on every host, e.g. same-seed param init) — the JAX
    equivalent of 'each DDP rank holds its slice'.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            leaf, mesh, spec
        )
    return jax.device_put(leaf, NamedSharding(mesh, spec))


def shard_params(
    params,
    mesh: Mesh,
    rules: Tuple[Tuple[str, P], ...] = DEFAULT_PARAM_RULES,
):
    """Place params on the mesh: matmul weights sharded on 'model', rest
    replicated. Falls back to replication when a dim doesn't divide."""

    def place(path, leaf):
        spec = param_spec(_path_str(path), leaf, rules)
        # check divisibility of sharded dims; replicate if it doesn't fit
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis]
            if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                spec = P()
                break
        return _put_global(leaf, mesh, spec)

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Shard every array's batch dim over 'data'.

    batch_axis=0 for a plain batch; 1 for K-step stacked batches (leading
    scan axis stays unsharded). Arrays whose batch dim doesn't divide the
    data axis (e.g. the last eval batch) are replicated instead — correct,
    just not parallel.
    """
    # the local batch must divide this process's share of the data axis
    n_data = max(1, mesh.shape["data"] // jax.process_count())
    spec = P(*([None] * batch_axis + ["data"]))

    def place(leaf):
        leaf = np.asarray(leaf) if not isinstance(leaf, jax.Array) else leaf
        if leaf.ndim <= batch_axis or leaf.shape[batch_axis] % n_data != 0:
            if jax.process_count() > 1:
                # replication would claim every host holds the SAME values,
                # but each host's loader yields a different shard -> the
                # "global" array would silently disagree across hosts
                raise ValueError(
                    f"multi-host batch dim {leaf.shape} must divide the "
                    f"per-process data-axis share ({n_data}); pad the "
                    f"batch or make batch_size divisible"
                )
            return _put_global(leaf, mesh, P())
        return _put_global(leaf, mesh, spec)

    return jax.tree.map(place, batch)


def unshard_results(res, mesh: Mesh):
    """Global per-sample result arrays -> THIS host's rows (numpy).

    Single-process: plain device_get. Multi-host: per-sample outputs of a
    'data'-sharded eval batch live sharded across hosts, where device_get
    would touch non-addressable devices; the host-local slice is exactly
    the rows of this process's loader shard, aligned with its local
    idx/uid arrays.
    """
    if jax.process_count() == 1:
        return jax.device_get(res)
    from jax.experimental import multihost_utils

    def pull(leaf):
        if not isinstance(leaf, jax.Array) or leaf.ndim == 0:
            return jax.device_get(leaf)
        return multihost_utils.global_array_to_host_local_array(
            leaf, mesh, P("data")
        )

    return jax.tree.map(pull, res)


# NOTE: there is deliberately no "sharded step" wrapper: the step function
# is written over the GLOBAL batch, so a plain jax.jit over sharded inputs
# (shard_params/shard_batch above) is the whole distribution story — GSPMD
# partitions the program and inserts the data-axis gradient psum and
# model-axis collectives (see train_net.main).
