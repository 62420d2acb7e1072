"""Logging setup: process-0-only console logging.

Replaces the reference's common/utils.py:55-74 rank-0 print hijack with
standard logging filtered by jax.process_index().
"""
from __future__ import annotations

import logging
import sys


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
    try:
        import jax

        if jax.process_index() != 0:
            logger.setLevel(logging.WARNING)
    except Exception:  # jax not initialized yet; stay at INFO
        pass
    return logger
