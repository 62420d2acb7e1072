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


def _intended_platform() -> str:
    """Best-effort platform WITHOUT initializing the backend (the platform
    choice freezes at first device query, so we must not trigger one)."""
    try:
        import jax

        cfg = jax.config.jax_platforms
    except Exception:
        cfg = None
    plat = cfg or os.environ.get("JAX_PLATFORMS") or ""
    return plat.split(",")[0].strip() or "default"


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point JAX at a persistent on-disk compilation cache.

    Safe to call any time before (or after) backend init; subsequent
    compilations of an already-seen HLO load from disk. AVT_TPU_NO_CACHE=1
    disables (e.g. when benchmarking compile time itself).

    TPU-only: CPU processes (the virtual-mesh dryrun / tests) get NO
    persistence. XLA:CPU cache entries are host AOT machine code whose
    embedded feature list includes compiler tuning pseudo-features
    (+prefer-no-scatter, ...) that a host CPU probe never reports, so
    every reload — even same-machine — trips cpu_aot_loader's feature
    check (SIGILL risk on a genuinely different host). Cold CPU compiles
    of the tiny-shape dryrun are ~100 s total (measured), cheaper than the
    risk; TPU executables are compiled server-side and host-portable.
    """
    if os.environ.get("AVT_TPU_NO_CACHE"):
        return
    plat = _intended_platform()
    if plat == "default":
        # platform not explicitly configured: resolve the ACTUAL backend
        # (a host without the TPU tunnel falls back to CPU and must not
        # persist). This freezes the platform choice — acceptable here,
        # since every caller uses jax right after enabling the cache.
        import jax

        plat = jax.default_backend()
    if plat == "cpu":
        return
    import jax

    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                            _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes noticeable time; tiny programs recompile
    # faster than they deserialize
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
