#!/bin/bash
# Clean-chip sampling-bench sweep: decides bench.py defaults.
#
# Round-3 history: this sweep was cut short when the sandbox's TPU relay
# died (BASELINE.md "tunnel post-mortem") — re-run it on a healthy chip.
# Columns: fused stack (none|xla|pallas), triplet_knn, scan_layers,
# edge-MLP apply style (split|concat). BENCH_CHUNK=250 keeps single
# executions under relay wall-time caps (bit-identical math/PRNG).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

for spec in \
    "none 8 0 concat" \
    "none 8 0 split" \
    "pallas 8 1 split" \
    "pallas3 8 1 split" \
    "pallas2 8 1 split" \
    "xla 8 1 split" \
    "pallas 32 1 split" \
    "none 32 0 concat" \
    "none 0 0 concat"; do        # knn=0: exact triplet attention
  set -- $spec
  echo "== fused=$1 knn=$2 scan=$3 apply=$4 $(date) =="
  BENCH_FUSED=$1 BENCH_KNN=$2 BENCH_SCAN_LAYERS=$3 BENCH_APPLY=$4 \
    BENCH_CHUNK=250 BENCH_ITERS=2 \
    timeout 4200 python bench.py 2>&1 | tail -1
done
echo "SWEEP DONE $(date)"
