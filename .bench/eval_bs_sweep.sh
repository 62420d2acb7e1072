#!/bin/bash
# Eval-bench batch sweep (VERDICT r2 item 6): AVT_BENCH_MODE=eval at
# B in {16, 32, 64}. K scaled down at bigger B to bound host frame memory.
cd /root/repo
for cfg in "16 16" "32 8" "64 4"; do
  set -- $cfg
  echo "=== B=$1 K=$2 ==="
  AVT_BENCH_MODE=eval AVT_BENCH_B=$1 AVT_BENCH_K=$2 python -u bench.py
done
