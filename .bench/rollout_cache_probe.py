"""Probe: AVTh rollout recompute vs KV-cache decode at increasing lengths.

The shipped configs roll out L<=5 steps, where the static recompute wins
(no cache plumbing, growing-buffer forwards stay MXU-friendly). The cache
path processes O(T0+L) tokens instead of O(L*(T0+L)); this probe measures
the crossover on the real chip at the flagship AVT-h shape
(inter_dim=2048, n_layer=6, n_head=4, in_features=1024, B=16, T0=10).

Run: python .bench/rollout_cache_probe.py   (needs the TPU; ~minutes)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from avt_tpu.models.future import AVTh
from avt_tpu.utils import enable_compile_cache


def timeit(fn, *args, iters=20):
    # fetch-forced completion: on the axon platform block_until_ready
    # returns before server-side execution finishes (same reason bench.py
    # times via float() fetches)
    float(jnp.sum(fn(*args)[1]))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[1]))
    return (time.perf_counter() - t0) / iters


def main():
    enable_compile_cache()
    B, T0, C = 16, 10, 1024
    feats = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, T0, C)).astype(np.float32)
    )
    print(f"# backend={jax.default_backend()} B={B} T0={T0} C={C}")
    # L=64 omitted: the recompute side's 64 unrolled growing-buffer
    # forwards make a huge HLO whose compile dwarfs the measurement
    for L in (2, 4, 8, 16, 32):
        row = {"L": L}
        for mode in ("recompute", "cache"):
            m = AVTh(
                in_features=C, inter_dim=2048, n_layer=6, n_head=4,
                output_len=L, avg_last_n=1, return_past_too=False,
                rollout_mode=mode,
            )
            params = m.init(jax.random.PRNGKey(0), feats)
            apply = jax.jit(lambda p, f, m=m: m.apply(p, f))
            row[mode] = timeit(apply, params, feats) * 1e3
        row["speedup"] = row["recompute"] / row["cache"]
        print(
            f"L={row['L']:3d}  recompute={row['recompute']:8.2f} ms  "
            f"cache={row['cache']:8.2f} ms  cache_speedup={row['speedup']:.2f}x"
        )


if __name__ == "__main__":
    main()
