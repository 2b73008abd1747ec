#!/bin/bash
# Round-5 pipeline, block 3: runs after scripts/r5_pipeline2.sh releases the
# chip. Orders the round's remaining judge items by value-per-chip-second:
#
#   1. stage-2 fine-tune TRAINING (VERDICT r4 item 2b) — crashed twice in
#      earlier blocks (config-path bug, then the freeze_pos param-mask
#      assert; both fixed + CPU-smoke-tested at HEAD) — then its release
#      checkpoint + one quality row.
#   2. frag_attract A/B v2 (VERDICT item 3): the round's first A/B found the
#      w>0 cells bit-identical to w=0 — the exp(sigma=3) kernel was inert in
#      the 2.5-6 A gap regime (post-mortem in sampler.py). The kernel is now
#      rational (sigma=1.2, 2^7 hops) with measured activation; rerun the
#      candidate cells against the REUSED w=0 baseline cell (guidance-off
#      math is unchanged -> the baseline is still exact).
#   3. The four QUALITY_r05 phores the block-2 wall cap cut
#      (Q6L5H6/Q6NYC1/Q9BZX2/Q9H7Z6), at the adopted frag weight.
#   4. If a frag weight won: re-run the 6 block-2 phores with it
#      (QUALITY_r05_frag.json side-by-side, not a silent replacement).
#
# Usage: DEADLINE_MIN=300 bash scripts/r5_pipeline3.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

# Wait (bounded) for the previous block's chip claim to clear.
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    for _ in $(seq 1 720); do
        kill -0 "$WAIT_PID" 2>/dev/null || break
        sleep 60
    done
    sleep 120
fi

DEADLINE=$(( $(date +%s) + ${DEADLINE_MIN:-300} * 60 ))
log() { echo "[r5c $(date +%H:%M:%S)] $*"; }
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

# ---- 1. stage-2 fine-tune (freeze_pos, NL=80) ----
BASE=release/flagship_r4
[ -f ${BASE}.msgpack ] || BASE=release/flagship_r3
if [ ! -f release/stage2_r4.msgpack ]; then
    run_stage stage2_train 2100 \
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

if [ -f release/stage2_r4.msgpack ] && [ ! -f QUALITY_r05_stage2.json ]; then
    run_stage quality_stage2 1100 \
        python scripts/quality_eval.py --ckpt release/stage2_r4 \
            --num_samples 60 --batch_size 16 --round 5 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 2 --fail_budget_factor 3 \
            --time_budget 800 --eval_acc_batches 0 \
            --phore_glob 'data/phores_for_sampling/B1MDI3_merge.phore' \
            --synthetic_phores 0 --out QUALITY_r05_stage2.json
    commit_artifacts "QUALITY_r05_stage2: quality row on the stage-2 weights" \
        QUALITY_r05_stage2.json QUALITY_r05_stage2.json.rows
fi

# ---- 2. frag_attract A/B v2 (fixed kernel) ----
mkdir -p /tmp/r5_frag_phores
for n in B1MDI3_merge O60674_merge Q6NYC1_merge; do
    ln -sf "$PWD/data/phores_for_sampling/$n.phore" /tmp/r5_frag_phores/
done
cp -f FRAG_AB_r05_w0.json FRAG_AB2_r05_w0.json 2>/dev/null
for W in 1.0 3.0; do
    [ -f FRAG_AB2_r05_w${W}.json ] && continue
    run_stage frag_w${W} 1500 \
        python scripts/quality_eval.py --ckpt release/flagship_r3 \
            --num_samples 60 --batch_size 16 --round 5 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 2 --fail_budget_factor 3 \
            --time_budget 440 --eval_acc_batches 0 --frag_attract $W \
            --phore_glob '/tmp/r5_frag_phores/*.phore' \
            --synthetic_phores 0 --out FRAG_AB2_r05_w${W}.json
done
FRAG_W=$(python scripts/frag_pick.py --cells 'FRAG_AB2_r05_w*.json' \
    --out FRAG_AB2_r05.json 2>/dev/null) || FRAG_W=0
log "frag_attract v2 adopted weight: $FRAG_W"
commit_artifacts "FRAG_AB2_r05: connectivity-guidance A/B v2 (live kernel, adopted w=$FRAG_W)" \
    FRAG_AB2_r05.json FRAG_AB2_r05_w0.json FRAG_AB2_r05_w1.0.json \
    FRAG_AB2_r05_w3.0.json FRAG_AB2_r05_w1.0.json.rows \
    FRAG_AB2_r05_w3.0.json.rows

# ---- 3. the four missing QUALITY_r05 phores ----
mkdir -p /tmp/r5_missing_phores
for n in Q6L5H6_merge Q6NYC1_merge Q9BZX2_merge Q9H7Z6_merge; do
    ln -sf "$PWD/data/phores_for_sampling/$n.phore" /tmp/r5_missing_phores/
done
CKPT=release/flagship_r4
[ -f ${CKPT}.msgpack ] || CKPT=release/flagship_r3
run_stage quality_missing 4200 \
    python scripts/quality_eval.py --ckpt $CKPT \
        --num_samples 100 --batch_size 16 --round 5 --triplet_knn 32 \
        --chunk_steps 250 --recon_workers 2 --fail_budget_factor 3 \
        --time_budget 800 --eval_acc_batches 0 --frag_attract "$FRAG_W" \
        --phore_glob '/tmp/r5_missing_phores/*.phore' \
        --synthetic_phores 0 --out QUALITY_r05_missing.json
python scripts/merge_quality_rows.py --round 5 \
    --inputs QUALITY_r05.json QUALITY_r05_missing.json \
             QUALITY_r05_missing.json.rows \
    --out QUALITY_r05.json 2>/dev/null
commit_artifacts "QUALITY_r05: +4 wall-cut phores (10/10 rows)" \
    QUALITY_r05.json QUALITY_r05_missing.json QUALITY_r05_missing.json.rows

# ---- 4. frag re-run of the block-2 phores if a weight won ----
if [ "$FRAG_W" != "0" ] && [ "$FRAG_W" != "0.0" ]; then
    mkdir -p /tmp/r5_frag_rerun
    for n in B1MDI3_merge O60674_merge P03211_merge P43254_merge \
             P46598_merge P50120_merge; do
        ln -sf "$PWD/data/phores_for_sampling/$n.phore" /tmp/r5_frag_rerun/
    done
    run_stage quality_frag 5400 \
        python scripts/quality_eval.py --ckpt $CKPT \
            --num_samples 100 --batch_size 16 --round 5 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 2 --fail_budget_factor 3 \
            --time_budget 800 --eval_acc_batches 0 --frag_attract "$FRAG_W" \
            --phore_glob '/tmp/r5_frag_rerun/*.phore' \
            --synthetic_phores 0 --out QUALITY_r05_frag.json
    commit_artifacts "QUALITY_r05_frag: block-2 phores at adopted frag weight" \
        QUALITY_r05_frag.json QUALITY_r05_frag.json.rows
fi

log "PIPELINE3 DONE ($(left)s to deadline)"
