#!/bin/bash
# Round-5 remainder pipeline: takes over from scripts/r5_pipeline.sh after
# its frag_attract A/B stage (the stage-2 training in the original run
# crashed on a config-attribute bug in train_real.py --stage2, fixed since;
# the original's fixed order would also have starved the stage-2/cmp rows
# behind the long quality pass — the exact failure mode of round 4).
#
# Order: the never-ran stage-2 TRAINING first (VERDICT r4 item 2b), its
# quality row, then the full-pool quality table on the drug-size weights
# (items 2a/4), the evidence-grade kNN acceptance table (item 5), and the
# flagship_r3 comparability rows (item 4) with whatever budget remains.
# Every stage timeout-bounded, artifacts committed as they land, 120 s
# between chip clients (claim-release gap).
#
# Usage: DEADLINE_MIN=240 bash scripts/r5_pipeline2.sh
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
DEADLINE=$(( $(date +%s) + ${DEADLINE_MIN:-240} * 60 ))

log() { echo "[r5b $(date +%H:%M:%S)] $*"; }
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

# 1. Stage-2 fine-tune (VERDICT item 2b): warm start from the drug-size
#    flagship_r4 -> freeze_pos -> NL=80 complex-like corpus, matching the
#    reference two-stage recipe (run/run.py:54-56,216;
#    configs/train_dock-cpx-phore.yml:59-67). ~0.33 s/step at nl80_b8
#    (TRAIN_SWEEP_r05), so 1500 steps fit well inside the budget.
BASE=release/flagship_r4
[ -f ${BASE}.msgpack ] || BASE=release/flagship_r3
if [ ! -f release/stage2_r4.msgpack ]; then
    run_stage stage2_train 1800 \
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
    fi
fi

# Adopted frag_attract weight from the A/B (0 if the table is absent).
FRAG_W=$(python scripts/frag_pick.py --cells 'FRAG_AB_r05_w*.json' \
    --out FRAG_AB_r05.json 2>/dev/null) || FRAG_W=0
log "frag_attract adopted weight: $FRAG_W"
commit_artifacts "FRAG_AB_r05: connectivity-guidance A/B (adopted w=$FRAG_W)" \
    FRAG_AB_r05.json FRAG_AB_r05_w0.json FRAG_AB_r05_w0.5.json \
    FRAG_AB_r05_w2.0.json

# 2. Stage-2 quality row (VERDICT item 2b "one quality row").
if [ -f release/stage2_r4.msgpack ]; then
    run_stage quality_stage2 1100 \
        python scripts/quality_eval.py --ckpt release/stage2_r4 \
            --num_samples 60 --batch_size 16 --round 5 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
            --time_budget 800 \
            --phore_glob 'data/phores_for_sampling/B1MDI3_merge.phore' \
            --synthetic_phores 0 --out QUALITY_r05_stage2.json
    commit_artifacts "QUALITY_r05_stage2: quality row on the stage-2 weights" \
        QUALITY_r05_stage2.json QUALITY_r05_stage2.json.rows
fi

# 3. Full quality table on the drug-size weights (VERDICT items 2a/4):
#    all 10 sampling phores, 100-sample pools, adopted frag weight.
#    Rows commit incrementally via the .rows file.
CKPT=release/flagship_r4
[ -f ${CKPT}.msgpack ] || CKPT=release/flagship_r3
run_stage quality_r4w 7600 \
    python scripts/quality_eval.py --ckpt $CKPT \
        --num_samples 100 --batch_size 16 --round 5 --triplet_knn 32 \
        --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
        --time_budget 700 --frag_attract "$FRAG_W" \
        --phore_glob 'data/phores_for_sampling/*.phore' \
        --synthetic_phores 0 --out QUALITY_r05.json
python scripts/merge_quality_rows.py --round 5 \
    --inputs QUALITY_r05.json QUALITY_r05.json.rows \
    --out QUALITY_r05.json 2>/dev/null
commit_artifacts "QUALITY_r05: full sampling-phore table on $CKPT" \
    QUALITY_r05.json QUALITY_r05.json.rows

# 4. Evidence-grade kNN acceptance table (VERDICT item 5): 4 phores
#    (incl. the all-zero r4 case for diagnosis), pool 48, knn 32/16/exact.
run_stage knn_accept 3600 \
    python scripts/knn_acceptance.py --ckpt release/flagship_r3 \
        --knns 32 16 0 --pool 48 --batch 16 --phore_indices 0 1 2 3 \
        --time_budget 600 --out KNN_ACCEPT_r05.json
commit_artifacts "KNN_ACCEPT_r05: evidence-grade kNN acceptance table" \
    KNN_ACCEPT_r05.json

# 5. Cross-round comparability rows (VERDICT item 4 regression check):
#    flagship_r3 weights, the r3/r4 recipe (batch 30, no frag), full pools
#    on the two phores whose validity moved 42->32 / 33->28.
mkdir -p /tmp/r5_cmp_phores
for n in B1MDI3_merge O60674_merge; do
    ln -sf "$PWD/data/phores_for_sampling/$n.phore" /tmp/r5_cmp_phores/
done
run_stage quality_cmp 3600 \
    python scripts/quality_eval.py --ckpt release/flagship_r3 \
        --num_samples 100 --batch_size 30 --round 5 --triplet_knn 32 \
        --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
        --time_budget 1500 --eval_acc_batches 0 \
        --phore_glob '/tmp/r5_cmp_phores/*.phore' \
        --synthetic_phores 0 --out QUALITY_r05_r3w.json
commit_artifacts "QUALITY_r05_r3w: flagship_r3 comparability rows (full pools)" \
    QUALITY_r05_r3w.json QUALITY_r05_r3w.json.rows

# 6. Count-interval sweep on the new weights (CPU - no chip claim).
if [ -f release/flagship_r4.msgpack ] && [ ! -f COUNT_SWEEP_r05.json ]; then
    timeout 1200 python scripts/count_sweep.py --ckpt release/flagship_r4 \
        --round 5 --platform cpu --out COUNT_SWEEP_r05.json
    commit_artifacts "COUNT_SWEEP_r05: count intervals on drug-sized weights" \
        COUNT_SWEEP_r05.json
fi

log "PIPELINE2 DONE ($(left)s to deadline)"
