#!/usr/bin/env bash
# Canonical sampling invocation (parity with reference `sample.sh:21-34`):
# 100 samples per pharmacophore, batch 30, normal-mode atom-count sampling
# with scale 6.0, atom-proximity + center-proximity validity guidance.
set -euo pipefail

CKPT=${CKPT:-./results/dock_cpx_finetune/best_model}
PHORES=${PHORES:-./data/phores_for_sampling}
OUT=${OUT:-./results/sampling}
# On runtimes that cap single-execution wall time (e.g. tunneled relays),
# add: --chunk_steps 250 (identical math/PRNG, bounded device calls) and/or
# --triplet_knn 8 (faster restricted attention, quality cost in
# KNN_QUALITY.json). Batch 30 at full exact attention can exceed such caps.

python sample_all.py \
  --ckpt "$CKPT" \
  --phore "$PHORES" \
  --result_path "$OUT" \
  --num_samples 100 \
  --batch_size 30 \
  --sample_nodes_mode normal \
  --normal_scale 6.0 \
  --add_edge predicted \
  --pos_guidance_opt '[{"type":"atom_prox","min_d":1.0,"max_d":3.0},{"type":"center_prox"}]' \
  "$@"
