#!/bin/bash
# Round-5 pipeline, block 4: runs after block 3 (scripts/r5_pipeline3.sh).
#
#   1. stage-2 fine-tune, attempt #4. Attempts 1-3 died on (a) a config
#      attribute path, (b) the freeze_pos param-mask assert, (c) a TPU
#      backend claim race right after the previous chip client exited
#      (UNAVAILABLE after ~25 min of claim retries). (a)+(b) are fixed and
#      CPU-smoke-tested; (c) gets a longer claim-release gap and one retry.
#   2. TRAIN_SWEEP2_r05: the xla2-under-grad training ladder re-measured
#      now that the masked-softmax VJP overflow is fixed (the round's
#      TRAIN_SWEEP_r05 xla2 rows were fast but loss_finite=false; those
#      numbers become claimable only with finite loss).
#
# Usage: DEADLINE_MIN=240 bash scripts/r5_pipeline4.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    for _ in $(seq 1 720); do
        kill -0 "$WAIT_PID" 2>/dev/null || break
        sleep 60
    done
fi
sleep 300   # full chip-claim release before the first client (failure (c))

DEADLINE=$(( $(date +%s) + ${DEADLINE_MIN:-240} * 60 ))
log() { echo "[r5d $(date +%H:%M:%S)] $*"; }
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
    sleep 180
    return $rc
}

# ---- 1. stage-2 fine-tune, with one claim-race retry ----
BASE=release/flagship_r4
[ -f ${BASE}.msgpack ] || BASE=release/flagship_r3
for attempt in 1 2; do
    [ -f release/stage2_r4.msgpack ] && break
    run_stage stage2_train_a$attempt 2400 \
        python scripts/train_real.py --stage2 --warm_start "$BASE" \
            --steps 1500 --batch_size 8 --out /tmp/stage2_r5 \
            --ckpt_every 500 --eval_every 500
    CK=/tmp/stage2_r5/best
    [ -f ${CK}.msgpack ] || CK=/tmp/stage2_r5/last
    if [ -f ${CK}.msgpack ]; then
        python scripts/make_release.py --ckpt $CK \
            --out release/stage2_r4 \
            --note "r5: 1500-step stage-2 fine-tune (freeze_pos, NL=80, size_mean 32) from $BASE"
        commit_artifacts "release/stage2_r4: stage-2 fine-tune checkpoint" \
            release/stage2_r4.json release/stage2_r4.msgpack
    else
        log "stage-2 attempt $attempt produced no checkpoint; retrying after gap"
        sleep 300
    fi
done

if [ -f release/stage2_r4.msgpack ] && [ ! -f QUALITY_r05_stage2.json ]; then
    run_stage quality_stage2 1300 \
        python scripts/quality_eval.py --ckpt release/stage2_r4 \
            --num_samples 60 --batch_size 16 --round 5 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 2 --fail_budget_factor 3 \
            --time_budget 900 --eval_acc_batches 0 \
            --phore_glob 'data/phores_for_sampling/B1MDI3_merge.phore' \
            --synthetic_phores 0 --out QUALITY_r05_stage2.json
    commit_artifacts "QUALITY_r05_stage2: quality row on the stage-2 weights" \
        QUALITY_r05_stage2.json QUALITY_r05_stage2.json.rows
fi

# ---- 2. post-fix xla2 training ladder ----
if [ ! -f TRAIN_SWEEP2_r05.json ]; then
    run_stage train_sweep2 2400 \
        bash -c "python scripts/bench_train_sweep.py --steps 12 --configs \
nl48_b16_knn32_bf16_xla2,nl32_b16_knn32_bf16_xla2,nl64_b16_knn32_bf16_xla2,nl80_b8_knn32_bf16_xla2 \
            > TRAIN_SWEEP2_r05.json 2>/tmp/train_sweep2.err"
    commit_artifacts "TRAIN_SWEEP2_r05: xla2-under-grad ladder after the NaN fix" \
        TRAIN_SWEEP2_r05.json
fi

log "PIPELINE4 DONE ($(left)s to deadline)"
