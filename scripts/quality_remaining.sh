#!/bin/bash
# Finish QUALITY_r03's real-phore rows on a healthy chip (round-3's TPU
# relay died after 4 rows — see QUALITY_r03.json "note"). Runs the
# reference-scale recipe over the 8 real pharmacophores that have no row,
# with a per-phore wall-time budget so one failure-heavy large-interval
# phore (observed: 104 min without completing) cannot starve the pass,
# then merges everything into QUALITY_r03.json.
#
# Usage: bash scripts/quality_remaining.sh <ckpt-prefix> [round]
set -u
cd "$(dirname "$0")/.."
CKPT=${1:-release/flagship_r3}
ROUND=${2:-3}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

SKIP=$(python - <<'EOF'
import json, os
names = set()
path = f"QUALITY_r03.json"
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

python scripts/merge_quality_rows.py --round "$ROUND" \
  --inputs QUALITY_r03.json "QUALITY_r0${ROUND}_cont.json.rows" \
  --meta "QUALITY_r0${ROUND}_cont.json" \
  --out QUALITY_r03.json
echo "DONE $(date)"
