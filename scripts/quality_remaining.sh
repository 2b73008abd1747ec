#!/bin/bash
# Quality rows over the bundled sampling pharmacophores, resumable.
#
# Round 3 mode (default): finish QUALITY_r03's real-phore rows — skips the
# rows that completed before the TPU relay died and merges new rows into
# QUALITY_r03.json.
#
# Round >=4 mode (new checkpoint): rows are checkpoint-specific, so nothing
# is skipped from older rounds; previously-completed rows of THIS round's
# file are skipped, making reruns resumable after an interrupt. Output goes
# to QUALITY_r0<round>.json.
#
# Each phore gets a wall-time budget so one failure-heavy large-interval
# phore (observed: 104 min without completing) cannot starve the pass.
#
# Usage: bash scripts/quality_remaining.sh <ckpt-prefix> [round]
set -u
cd "$(dirname "$0")/.."
CKPT=${1:-release/flagship_r3}
ROUND=${2:-3}
OUT="QUALITY_r0${ROUND}.json"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

SKIP=$(OUT="$OUT" python - <<'EOF'
import json, os
names = set()
path = os.environ["OUT"]
if os.path.exists(path):
    for row in json.load(open(path)).get("per_phore", []):
        names.add(row["phore"])
print(','.join(n for n in names if not n.startswith('synthetic')))
EOF
)
echo "skipping completed: $SKIP"
python scripts/quality_eval.py --ckpt "$CKPT" \
  --num_samples 100 --batch_size 30 --round "$ROUND" --triplet_knn 32 \
  --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
  --time_budget 3600 \
  --phore_glob 'data/phores_for_sampling/*.phore' \
  --synthetic_phores 0 --skip "$SKIP" \
  --out "QUALITY_r0${ROUND}_cont.json"

MERGE_IN="$OUT"
[ -f "$MERGE_IN" ] || MERGE_IN=""
python scripts/merge_quality_rows.py --round "$ROUND" \
  --inputs $MERGE_IN "QUALITY_r0${ROUND}_cont.json.rows" \
  --meta "QUALITY_r0${ROUND}_cont.json" \
  --out "$OUT"
echo "DONE $(date)"
