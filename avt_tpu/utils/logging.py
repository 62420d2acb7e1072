"""Logging setup: process-0-only console logging.

Replaces the reference's common/utils.py:55-74 rank-0 print hijack with
standard logging filtered by jax.process_index().
"""
from __future__ import annotations

import logging
import os
import sys


def _process_rank():
    """Rank WITHOUT initializing the XLA backend: jax.process_index()
    before jax.distributed.initialize() would pin the backend and break
    the rendezvous (jax raises). Env vars are authoritative pre-init."""
    rank = os.environ.get("JAX_PROCESS_ID") or os.environ.get("RANK")
    if rank is not None:
        return int(rank)
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            import jax

            return jax.process_index()
    except Exception:
        pass
    return 0


def get_logger(name: str = "avt_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter(
            "%(asctime)s %(levelname).1s %(name)s: %(message)s",
            datefmt="%H:%M:%S",
        )
    )
    logger.addHandler(handler)
    if _process_rank() != 0:
        logger.setLevel(logging.WARNING)
    return logger
