#!/bin/bash
# Round-5 sequential chip pipeline (VERDICT r4 items 2-7).
#
# Ordering lesson from round 4 (whose fixed order starved the training
# stages, leaving STATUS claims without artifacts): the two never-ran
# TRAININGS go first, then the frag_attract A/B (item 3), the
# evidence-grade kNN acceptance table (item 5), and only then the long
# quality passes (items 2a/4), which commit rows incrementally so a
# deadline kill loses nothing. One TPU client at a time, every stage
# timeout-bounded, 120 s between client deaths (claim-release gap), all
# artifacts committed as they land.
#
# Usage: DEADLINE_MIN=450 bash scripts/r5_pipeline.sh
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
DEADLINE=$(( $(date +%s) + ${DEADLINE_MIN:-450} * 60 ))

log() { echo "[r5 $(date +%H:%M:%S)] $*"; }
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

# 0. Training-throughput ladder (VERDICT item 6): the xla2 merged-operand
#    restatement under grad at the flagship train shapes.
run_stage train_sweep 2100 bash -c \
    "python scripts/bench_train_sweep.py --steps 10 --configs \
nl48_b16_knn32_bf16,nl48_b16_knn32_bf16_xla2,nl48_b16_knn32_bf16_xla,\
nl32_b16_knn32_bf16,nl32_b16_knn32_bf16_xla2,nl64_b16_knn32_bf16_xla2,\
nl80_b16_knn32_bf16_xla2,nl80_b8_knn32_bf16_xla2 \
        2>&1 | grep -v WARNING | tee TRAIN_SWEEP_r05.json"
commit_artifacts "TRAIN_SWEEP_r05: xla2-under-grad training ladder" \
    TRAIN_SWEEP_r05.json

# 1. Drug-sized warm-start retrain (VERDICT item 2a): corpus defaults to
#    ZINC-like size_mean 23; warm start from the round-3 flagship.
run_stage drugsize_train 5400 \
    python scripts/train_real.py --steps 12000 --batch_size 16 \
        --warm_start release/flagship_r3 --out /tmp/train_r5
if [ -f /tmp/train_r5/best.msgpack ]; then
    python scripts/make_release.py --ckpt /tmp/train_r5/best \
        --out release/flagship_r4 \
        --note "r5: 12k-step drug-sized (size_mean 23) warm-start from flagship_r3"
    commit_artifacts "release/flagship_r4: drug-sized warm-start weights" \
        release/flagship_r4.json release/flagship_r4.msgpack
fi

# 2. Stage-2 fine-tune (VERDICT item 2b): warm start -> freeze_pos ->
#    NL=80 complex-like corpus, matching the reference's two-stage recipe
#    (run/run.py:54-56,216; configs/train_dock-cpx-phore.yml:59-67).
BASE=release/flagship_r4
[ -f ${BASE}.msgpack ] || BASE=release/flagship_r3
run_stage stage2_train 2700 \
    python scripts/train_real.py --stage2 --warm_start "$BASE" \
        --steps 3000 --batch_size 8 --out /tmp/stage2_r5
if [ -f /tmp/stage2_r5/best.msgpack ]; then
    python scripts/make_release.py --ckpt /tmp/stage2_r5/best \
        --out release/stage2_r4 \
        --note "r5: 3k-step stage-2 fine-tune (freeze_pos, NL=80) from $BASE"
    commit_artifacts "release/stage2_r4: stage-2 fine-tune checkpoint" \
        release/stage2_r4.json release/stage2_r4.msgpack
fi

# 3. frag_attract A/B (VERDICT item 3) on the round-3 flagship (the
#    weights whose KNN_ACCEPT_r04 frag2plus data motivated the energy).
mkdir -p /tmp/r5_frag_phores
for n in B1MDI3_merge O60674_merge Q6NYC1_merge; do
    ln -sf "$PWD/data/phores_for_sampling/$n.phore" /tmp/r5_frag_phores/
done
for W in 0 0.5 2.0; do
    run_stage frag_w$W 1500 \
        python scripts/quality_eval.py --ckpt release/flagship_r3 \
            --num_samples 60 --batch_size 16 --round 5 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
            --time_budget 400 --frag_attract $W --eval_acc_batches 0 \
            --phore_glob '/tmp/r5_frag_phores/*.phore' \
            --synthetic_phores 0 --out FRAG_AB_r05_w$W.json
done
FRAG_W=$(python scripts/frag_pick.py --cells 'FRAG_AB_r05_w*.json' \
    --out FRAG_AB_r05.json) || FRAG_W=0
log "frag_attract adopted weight: $FRAG_W"
commit_artifacts "FRAG_AB_r05: connectivity-guidance A/B (adopted w=$FRAG_W)" \
    FRAG_AB_r05.json FRAG_AB_r05_w0.json FRAG_AB_r05_w0.5.json \
    FRAG_AB_r05_w2.0.json

# 4. Evidence-grade kNN acceptance table (VERDICT item 5): >=4 phores
#    (incl. the all-zero r4 case 4th index for diagnosis), pool >=48,
#    all three knn values.
run_stage knn_accept 4200 \
    python scripts/knn_acceptance.py --ckpt release/flagship_r3 \
        --knns 32 16 0 --pool 48 --batch 16 --phore_indices 0 1 2 3 \
        --time_budget 900 --out KNN_ACCEPT_r05.json
commit_artifacts "KNN_ACCEPT_r05: evidence-grade kNN acceptance table" \
    KNN_ACCEPT_r05.json

# 5. Full quality table on the drug-size weights (VERDICT items 2a/4):
#    all 10 sampling phores, 100-sample pools, adopted frag weight.
CKPT=release/flagship_r4
[ -f ${CKPT}.msgpack ] || CKPT=release/flagship_r3
run_stage quality_r4w 9000 \
    python scripts/quality_eval.py --ckpt $CKPT \
        --num_samples 100 --batch_size 16 --round 5 --triplet_knn 32 \
        --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
        --time_budget 800 --frag_attract "$FRAG_W" \
        --phore_glob 'data/phores_for_sampling/*.phore' \
        --synthetic_phores 0 --out QUALITY_r05.json
python scripts/merge_quality_rows.py --round 5 \
    --inputs QUALITY_r05.json QUALITY_r05.json.rows \
    --out QUALITY_r05.json 2>/dev/null
commit_artifacts "QUALITY_r05: full sampling-phore table on $CKPT" \
    QUALITY_r05.json QUALITY_r05.json.rows

# 6. Cross-round comparability rows (VERDICT item 4 regression check):
#    same weights (flagship_r3), same recipe as r3/r4 (batch 30, no
#    frag), bigger n — resolves the 42->32 / 33->28 movement.
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

# 7. Stage-2 quality row (VERDICT item 2b).
if [ -f release/stage2_r4.msgpack ]; then
    run_stage quality_stage2 1200 \
        python scripts/quality_eval.py --ckpt release/stage2_r4 \
            --num_samples 60 --batch_size 16 --round 5 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 6 --fail_budget_factor 3 \
            --time_budget 900 \
            --phore_glob 'data/phores_for_sampling/B1MDI3_merge.phore' \
            --synthetic_phores 0 --out QUALITY_r05_stage2.json
    commit_artifacts "QUALITY_r05_stage2: quality row on the stage-2 weights" \
        QUALITY_r05_stage2.json QUALITY_r05_stage2.json.rows
fi

# 8. Count-interval sweep on the new weights (CPU — no chip claim).
if [ -f release/flagship_r4.msgpack ]; then
    timeout 1200 python scripts/count_sweep.py --ckpt release/flagship_r4 \
        --round 5 --platform cpu --out COUNT_SWEEP_r05.json
    commit_artifacts "COUNT_SWEEP_r05: count intervals on drug-sized weights" \
        COUNT_SWEEP_r05.json
fi

log "PIPELINE DONE ($(left)s to deadline)"
