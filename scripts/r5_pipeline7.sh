#!/bin/bash
# Round-5 pipeline, block 7: recovery of the block-5 queue after the
# 04:53 session death (the stage-2 training had COMPLETED its 1500 steps;
# release/stage2_r4 was packaged from the surviving checkpoint outside
# this script). Remaining chip work, highest value first for a short
# session:
#
#   1. TRAIN_SWEEP2_r05 — post-NaN-fix xla2-under-grad ladder
#      (VERDICT r4 item 6: makes the 106 g/s row claimable)
#   2. QUALITY_r05_stage2 — quality row on the stage-2 weights
#      (VERDICT r4 item 2b evidence)
#   3. the four wall-cut QUALITY_r05 phores (item 4)
#
# Every stage is idempotent (guarded by its artifact) and commits its
# outputs incrementally. Usage: DEADLINE_MIN=42 bash scripts/r5_pipeline7.sh
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
DEADLINE=$(( $(date +%s) + ${DEADLINE_MIN:-42} * 60 ))

log() { echo "[r5g $(date +%H:%M:%S)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

commit_artifacts() { # msg file...
    local msg=$1; shift
    local f present=()
    for f in "$@"; do [ -s "$f" ] && present+=("$f"); done
    [ ${#present[@]} -eq 0 ] && { log "no non-empty artifacts for: $msg"; return 1; }
    git add -f "${present[@]}" 2>/dev/null
    git diff --cached --quiet && return 0
    git commit -q -m "$msg

No-Verification-Needed: measurement artifacts only" && log "committed: $msg"
}

run_stage() { # name budget cmd...
    local name=$1 budget=$2; shift 2
    local l; l=$(left)
    if [ "$l" -lt 180 ]; then log "SKIP $name (deadline)"; return 1; fi
    [ "$budget" -gt "$l" ] && budget=$l
    log "START $name (budget ${budget}s)"
    timeout --signal=INT --kill-after=60 "$budget" "$@"
    local rc=$?
    log "END $name rc=$rc"
    sleep 90
    return $rc
}

# ---- 0. verify the backend is actually usable (half-up relay guard) ----
if ! timeout 300 python - >/dev/null 2>&1 <<'EOF'
import jax, numpy as np
x = jax.numpy.ones((8, 8))
np.asarray(x @ x)
EOF
then
    log "relay backend not usable; exiting"
    exit 1
fi
log "relay backend verified usable"

# ---- 1. post-NaN-fix xla2 training ladder ----
if [ ! -s TRAIN_SWEEP2_r05.json ]; then
    run_stage train_sweep2 1500 \
        bash -c "python scripts/bench_train_sweep.py --steps 12 --configs \
nl32_b16_knn32_bf16_xla2,nl48_b16_knn32_bf16_xla2,nl64_b16_knn32_bf16_xla2,nl80_b8_knn32_bf16_xla2 \
            2>/tmp/train_sweep2.err | tee /tmp/train_sweep2.out"
    # keep only result lines (drop the backend banner)
    grep '^{' /tmp/train_sweep2.out > TRAIN_SWEEP2_r05.json 2>/dev/null
    commit_artifacts "TRAIN_SWEEP2_r05: xla2-under-grad ladder after the NaN fix" \
        TRAIN_SWEEP2_r05.json
fi

# ---- 2. stage-2 quality row ----
if [ -f release/stage2_r4.msgpack ] && [ ! -s QUALITY_r05_stage2.json ]; then
    run_stage quality_stage2 1200 \
        python scripts/quality_eval.py --ckpt release/stage2_r4 \
            --num_samples 60 --batch_size 16 --round 5 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 2 --fail_budget_factor 3 \
            --time_budget 900 --eval_acc_batches 0 \
            --phore_glob 'data/phores_for_sampling/B1MDI3_merge.phore' \
            --synthetic_phores 0 --out QUALITY_r05_stage2.json
    commit_artifacts "QUALITY_r05_stage2: quality row on the stage-2 weights" \
        QUALITY_r05_stage2.json QUALITY_r05_stage2.json.rows
fi

# ---- 3. the four missing QUALITY_r05 phores (as many as fit) ----
if [ ! -s QUALITY_r05_missing.json ]; then
    mkdir -p /tmp/r5_missing_phores
    for n in Q6L5H6_merge Q6NYC1_merge Q9BZX2_merge Q9H7Z6_merge; do
        ln -sf "$PWD/data/phores_for_sampling/$n.phore" /tmp/r5_missing_phores/
    done
    L=$(left)
    PER=$(( (L - 240) / 4 ))
    [ "$PER" -gt 500 ] && PER=500
    if [ "$PER" -ge 180 ]; then
        run_stage quality_missing $(( L - 180 )) \
            python scripts/quality_eval.py --ckpt release/flagship_r4 \
                --num_samples 100 --batch_size 16 --round 5 --triplet_knn 32 \
                --chunk_steps 250 --recon_workers 2 --fail_budget_factor 3 \
                --time_budget $PER --eval_acc_batches 0 \
                --phore_glob '/tmp/r5_missing_phores/*.phore' \
                --synthetic_phores 0 --out QUALITY_r05_missing.json
        python scripts/merge_quality_rows.py --round 5 \
            --inputs QUALITY_r05.json QUALITY_r05_missing.json \
                     QUALITY_r05_missing.json.rows \
            --out QUALITY_r05.json 2>/dev/null
        commit_artifacts "QUALITY_r05: +wall-cut phores (flagship_r4)" \
            QUALITY_r05.json QUALITY_r05_missing.json QUALITY_r05_missing.json.rows
    fi
fi

log "PIPELINE7 DONE ($(left)s to deadline)"
