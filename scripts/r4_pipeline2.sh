#!/bin/bash
# Round-4 chip pipeline, part 2 — launched after the quality stage of
# r4_pipeline.sh completes (the first script's fixed order would starve
# the training stages; this one runs the remaining VERDICT items with
# budgets trimmed to the leftover wall clock). Same discipline: one TPU
# client at a time, timeout-bounded, 120 s claim-release gaps,
# deadline-gated, artifacts committed as they land.
#
# Usage: DEADLINE_MIN=50 bash scripts/r4_pipeline2.sh
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
DEADLINE=$(( $(date +%s) + ${DEADLINE_MIN:-50} * 60 ))

log() { echo "[r4b $(date +%H:%M:%S)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

commit_artifacts() { # msg file...
    local msg=$1; shift
    git add -f "$@" 2>/dev/null
    git diff --cached --quiet && return 0
    git commit -q -m "$msg

No-Verification-Needed: measurement/checkpoint artifacts only" \
        && log "committed: $msg"
}

run_stage() { # name budget cmd...
    local name=$1 budget=$2; shift 2
    local l; l=$(left)
    if [ "$l" -lt 180 ]; then log "SKIP $name (deadline reached)"; return 1; fi
    [ "$budget" -gt "$l" ] && budget=$l
    log "START $name (budget ${budget}s, ${l}s to deadline)"
    timeout --signal=INT --kill-after=60 "$budget" "$@"
    local rc=$?
    log "END $name rc=$rc"
    sleep 120
    return 0
}

# 0. Merge + commit whatever quality rows part 1 produced (its own merge
#    step may have been skipped if it was killed mid-stage).
python scripts/merge_quality_rows.py --round 4 \
    --inputs QUALITY_r04.json QUALITY_r04.json.rows \
    --out QUALITY_r04.json 2>/dev/null
commit_artifacts "QUALITY_r04: sampling-phore table rows (flagship_r3)" \
    QUALITY_r04.json QUALITY_r04.json.rows

# 1. kNN acceptance grounding (VERDICT item 5), trimmed pools.
run_stage knn_accept 1800 \
    python scripts/knn_acceptance.py --ckpt release/flagship_r3 \
        --knns 16 32 0 --pool 24 --time_budget 240 --out KNN_ACCEPT_r04.json
commit_artifacts "KNN_ACCEPT_r04: acceptance-grounded kNN operating point" \
    KNN_ACCEPT_r04.json

# 2. Stage-2 fine-tune demonstration (VERDICT item 6): warm start ->
#    freeze_pos -> NL=80 complex-like corpus -> release + one quality row.
run_stage stage2_train 1100 \
    python scripts/train_real.py --stage2 --warm_start release/flagship_r3 \
        --steps 2000 --batch_size 8 --out /tmp/stage2_r4
if [ -f /tmp/stage2_r4/best.msgpack ]; then
    python scripts/make_release.py --ckpt /tmp/stage2_r4/best \
        --out release/stage2_r4 \
        --note "r4: 2k-step stage-2 fine-tune (freeze_pos, NL=80 complex-like corpus) from flagship_r3"
    commit_artifacts "release/stage2_r4: stage-2 fine-tune checkpoint" \
        release/stage2_r4.json release/stage2_r4.msgpack
    run_stage quality_stage2 700 \
        python scripts/quality_eval.py --ckpt release/stage2_r4 \
            --num_samples 100 --batch_size 30 --round 4 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
            --time_budget 480 \
            --phore_glob 'data/phores_for_sampling/B1MDI3_merge.phore' \
            --synthetic_phores 0 --out QUALITY_r04_stage2.json
    commit_artifacts "QUALITY_r04_stage2: quality row on the stage-2 weights" \
        QUALITY_r04_stage2.json QUALITY_r04_stage2.json.rows
fi

# 3. Drug-sized warm-start continuation (VERDICT item 4) if clock remains.
run_stage drugsize_train 1500 \
    python scripts/train_real.py --steps 4000 --batch_size 16 \
        --warm_start release/flagship_r3 --out /tmp/train_r4
if [ -f /tmp/train_r4/best.msgpack ]; then
    python scripts/make_release.py --ckpt /tmp/train_r4/best \
        --out release/flagship_r4 \
        --note "r4: 4k-step drug-sized (size_mean 23) warm-start continuation from flagship_r3"
    commit_artifacts "release/flagship_r4: drug-sized warm-start weights" \
        release/flagship_r4.json release/flagship_r4.msgpack
    run_stage quality_r4w 700 \
        python scripts/quality_eval.py --ckpt release/flagship_r4 \
            --num_samples 100 --batch_size 30 --round 4 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
            --time_budget 480 \
            --phore_glob 'data/phores_for_sampling/O60674_merge.phore' \
            --synthetic_phores 0 --out QUALITY_r04_drugsize.json
    commit_artifacts "QUALITY_r04_drugsize: r4-weights size comparison row" \
        QUALITY_r04_drugsize.json QUALITY_r04_drugsize.json.rows
fi

# 4. Count-interval sweep on the new weights (CPU — no chip claim).
CKPT=release/flagship_r4
[ -f ${CKPT}.msgpack ] || CKPT=release/stage2_r4
if [ -f ${CKPT}.msgpack ]; then
    timeout 1200 python scripts/count_sweep.py --ckpt "$CKPT" \
        --round 4 --platform cpu --out COUNT_SWEEP_r04.json
    commit_artifacts "COUNT_SWEEP_r04: count intervals on round-4 weights" \
        COUNT_SWEEP_r04.json
fi

log "PIPELINE2 DONE ($(left)s to deadline)"
