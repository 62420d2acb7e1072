"""Persistent XLA compilation cache.

The flagship train step takes minutes to compile cold on a small host;
caching compiled executables on disk makes every process after the first
(bench runs, restarts, auto-resume after preemption) start in seconds.
The reference has no analog — torch eager pays no compile — so this is
pure TPU-runtime plumbing, not a parity component.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point JAX at a persistent on-disk compilation cache.

    Safe to call any time before (or after) backend init; subsequent
    compilations of an already-seen HLO load from disk. AVT_TPU_NO_CACHE=1
    disables (e.g. when benchmarking compile time itself).

    Note: on CPU, loading cached AOT results can log "machine feature ...
    not supported" errors when XLA's tuning flags (+prefer-no-scatter
    etc.) differ between the writing and reading process on the SAME
    machine. These are warnings from an over-strict feature comparison —
    the entry still loads and executes correctly (verified: cached and
    uncached runs produce identical losses).
    """
    if os.environ.get("AVT_TPU_NO_CACHE"):
        return
    import jax

    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                            _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes noticeable time; tiny programs recompile
    # faster than they deserialize
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
