from avt_tpu.parallel.mesh import (
    make_mesh,
    setup_distributed,
    shard_batch,
    shard_params,
    unshard_results,
)

__all__ = [
    "make_mesh",
    "setup_distributed",
    "shard_batch",
    "shard_params",
    "unshard_results",
]
