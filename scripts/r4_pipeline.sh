#!/bin/bash
# Round-4 sequential chip pipeline (VERDICT r3 items 3-6).
#
# One TPU client at a time, every stage timeout-bounded, >=120 s between
# client deaths (two live clients once raced the chip claim and killed the
# relay host-side — round-3 post-mortem, BASELINE.md). Stages are ordered
# by value-per-minute and gated on a wall-clock deadline so the chip is
# free again before the driver's end-of-round bench run. Each stage's
# artifacts are committed as they land (sessions die; artifacts must not).
#
# Usage: DEADLINE_MIN=150 bash scripts/r4_pipeline.sh
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
DEADLINE=$(( $(date +%s) + ${DEADLINE_MIN:-150} * 60 ))

log() { echo "[r4 $(date +%H:%M:%S)] $*"; }
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
    sleep 120   # let the subprocess's chip claim release fully
    return 0
}

# 1. Quality table over ALL 10 bundled sampling phores (VERDICT item 3) on
#    the round-3 flagship weights (the judge's literal recipe). Per-phore
#    wall budget keeps one failure-heavy phore from starving the pass;
#    rows land incrementally in QUALITY_r04.json.rows.
run_stage quality_r3w 5400 \
    python scripts/quality_eval.py --ckpt release/flagship_r3 \
        --num_samples 100 --batch_size 30 --round 4 --triplet_knn 32 \
        --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
        --time_budget 480 \
        --phore_glob 'data/phores_for_sampling/*.phore' \
        --synthetic_phores 0 --out QUALITY_r04.json
python scripts/merge_quality_rows.py --round 4 \
    --inputs QUALITY_r04.json.rows --meta QUALITY_r04.json \
    --out QUALITY_r04.json 2>/dev/null
commit_artifacts "QUALITY_r04: full sampling-phore table on flagship_r3" \
    QUALITY_r04.json QUALITY_r04.json.rows

# 2. kNN acceptance grounding (VERDICT item 5) on the round-3 flagship:
#    accepted/attempted per sampling-time knn in {16, 32, exact}.
run_stage knn_accept 2400 \
    python scripts/knn_acceptance.py --ckpt release/flagship_r3 \
        --knns 16 32 0 --pool 32 --time_budget 360 --out KNN_ACCEPT_r04.json
commit_artifacts "KNN_ACCEPT_r04: acceptance-grounded kNN operating point" \
    KNN_ACCEPT_r04.json

# 3. Drug-sized warm-start continuation (VERDICT item 4): corpus now
#    defaults to ZINC-like size_mean 23 (round-3 pools averaged 9-15
#    atoms); warm start from the round-3 flagship.
run_stage drugsize_train 2700 \
    python scripts/train_real.py --steps 6000 --batch_size 16 \
        --warm_start release/flagship_r3 --out /tmp/train_r4
if [ -f /tmp/train_r4/best.msgpack ] || [ -f /tmp/train_r4/best ]; then
    python scripts/make_release.py --ckpt /tmp/train_r4/best \
        --out release/flagship_r4 \
        --note "r4: 6k-step drug-sized (size_mean 23) warm-start from flagship_r3"
    commit_artifacts "release/flagship_r4: drug-sized warm-start weights" \
        release/flagship_r4.json release/flagship_r4.msgpack
fi

# 4. Drug-size quality comparison rows (same two real phores the round-3
#    table completed, plus P03211) on the new weights.
if [ -f release/flagship_r4.msgpack ]; then
    mkdir -p /tmp/r4_cmp_phores
    for n in B1MDI3_merge O60674_merge P03211_merge; do
        ln -sf "$PWD/data/phores_for_sampling/$n.phore" /tmp/r4_cmp_phores/
    done
    run_stage quality_r4w 2400 \
        python scripts/quality_eval.py --ckpt release/flagship_r4 \
            --num_samples 100 --batch_size 30 --round 4 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
            --time_budget 480 \
            --phore_glob '/tmp/r4_cmp_phores/*.phore' \
            --synthetic_phores 0 --out QUALITY_r04_drugsize.json
    commit_artifacts "QUALITY_r04_drugsize: r4 weights vs r3 size comparison" \
        QUALITY_r04_drugsize.json QUALITY_r04_drugsize.json.rows
fi

# 5. Stage-2 fine-tune demonstration (VERDICT item 6): warm start ->
#    freeze_pos -> NL=80 complex-like corpus -> release + one quality row.
BASE=release/flagship_r4
[ -f ${BASE}.msgpack ] || BASE=release/flagship_r3
run_stage stage2_train 1500 \
    python scripts/train_real.py --stage2 --warm_start "$BASE" \
        --steps 2000 --batch_size 8 --out /tmp/stage2_r4
if [ -f /tmp/stage2_r4/best.msgpack ] || [ -f /tmp/stage2_r4/best ]; then
    python scripts/make_release.py --ckpt /tmp/stage2_r4/best \
        --out release/stage2_r4 \
        --note "r4: 2k-step stage-2 fine-tune (freeze_pos, NL=80) from $BASE"
    commit_artifacts "release/stage2_r4: stage-2 fine-tune checkpoint" \
        release/stage2_r4.json release/stage2_r4.msgpack
    run_stage quality_stage2 1200 \
        python scripts/quality_eval.py --ckpt release/stage2_r4 \
            --num_samples 100 --batch_size 30 --round 4 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
            --time_budget 480 \
            --phore_glob 'data/phores_for_sampling/B1MDI3_merge.phore' \
            --synthetic_phores 0 --out QUALITY_r04_stage2.json
    commit_artifacts "QUALITY_r04_stage2: quality row on the stage-2 weights" \
        QUALITY_r04_stage2.json QUALITY_r04_stage2.json.rows
fi

# 6. Count-interval sweep on the new weights (CPU — no chip claim).
if [ -f release/flagship_r4.msgpack ]; then
    timeout 1200 python scripts/count_sweep.py --ckpt release/flagship_r4 \
        --round 4 --platform cpu --out COUNT_SWEEP_r04.json
    commit_artifacts "COUNT_SWEEP_r04: count intervals on drug-sized weights" \
        COUNT_SWEEP_r04.json
fi

log "PIPELINE DONE ($(left)s to deadline)"
