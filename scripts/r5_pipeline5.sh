#!/bin/bash
# Round-5 pipeline, block 5: the relay returned (2026-08-20 ~04:16) after
# the 00:17 death. Runs the watcher's remaining queue REORDERED for a
# short session: the two highest-value artifacts first.
#
#   1. stage-2 fine-tune -> release/stage2_r4   (VERDICT r4 item 2b)
#   2. TRAIN_SWEEP2_r05: post-NaN-fix xla2 ladder (item 6 claim)
#   3. stage-2 quality row                       (item 2b evidence)
#   4. frag A/B v2 candidate cells               (item 3, live kernel)
#   5. the four wall-cut QUALITY_r05 phores      (item 4)
#
# Every stage is idempotent (guarded by its artifact) and commits its
# outputs. Usage: DEADLINE_MIN=300 bash scripts/r5_pipeline5.sh
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
DEADLINE=$(( $(date +%s) + ${DEADLINE_MIN:-300} * 60 ))

log() { echo "[r5e $(date +%H:%M:%S)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

relay_up() {
    python - <<'EOF'
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8082), timeout=3).close()
    sys.exit(0)
except OSError:
    sys.exit(1)
EOF
}

commit_artifacts() { # msg file...
    local msg=$1; shift
    local f present=()
    for f in "$@"; do
        [ -s "$f" ] && present+=("$f")
    done
    [ ${#present[@]} -eq 0 ] && { log "no non-empty artifacts for: $msg"; return 1; }
    git add -f "${present[@]}" 2>/dev/null
    git diff --cached --quiet && return 0
    git commit -q -m "$msg

No-Verification-Needed: measurement/checkpoint artifacts only" \
        && log "committed: $msg"
}

run_stage() { # name budget cmd...
    local name=$1 budget=$2; shift 2
    local l; l=$(left)
    if [ "$l" -lt 180 ]; then log "SKIP $name (deadline)"; return 1; fi
    [ "$budget" -gt "$l" ] && budget=$l
    if ! relay_up; then log "SKIP $name (relay down)"; return 1; fi
    log "START $name (budget ${budget}s)"
    timeout --signal=INT --kill-after=60 "$budget" "$@"
    local rc=$?
    log "END $name rc=$rc"
    sleep 120
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
sleep 60   # claim-release gap before the first long client

# ---- 1. stage-2 fine-tune ----
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
        log "stage-2 attempt $attempt produced no checkpoint"
        sleep 240
    fi
done

# ---- 2. post-NaN-fix xla2 training ladder ----
if [ ! -s TRAIN_SWEEP2_r05.json ]; then
    run_stage train_sweep2 2400 \
        bash -c "python scripts/bench_train_sweep.py --steps 12 --configs \
nl48_b16_knn32_bf16_xla2,nl32_b16_knn32_bf16_xla2,nl64_b16_knn32_bf16_xla2,nl80_b8_knn32_bf16_xla2 \
            > /tmp/train_sweep2.out 2>/tmp/train_sweep2.err"
    if [ -s /tmp/train_sweep2.out ]; then
        mv /tmp/train_sweep2.out TRAIN_SWEEP2_r05.json
        commit_artifacts "TRAIN_SWEEP2_r05: xla2-under-grad ladder after the NaN fix" \
            TRAIN_SWEEP2_r05.json
    else
        log "train_sweep2 produced no output; not committing"
    fi
fi

# ---- 3. stage-2 quality row ----
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

# ---- 4. frag A/B v2 candidate cells ----
mkdir -p /tmp/r5_frag_phores
for n in B1MDI3_merge O60674_merge Q6NYC1_merge; do
    ln -sf "$PWD/data/phores_for_sampling/$n.phore" /tmp/r5_frag_phores/
done
cp -f FRAG_AB_r05_w0.json FRAG_AB2_r05_w0.json 2>/dev/null
for W in 1.0 3.0; do
    [ -f FRAG_AB2_r05_w${W}.json ] && continue
    run_stage frag_w${W} 2100 \
        python scripts/quality_eval.py --ckpt release/flagship_r3 \
            --num_samples 60 --batch_size 16 --round 5 --triplet_knn 32 \
            --chunk_steps 250 --recon_workers 2 --fail_budget_factor 3 \
            --time_budget 500 --eval_acc_batches 0 --frag_attract $W \
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

# ---- 5. the four missing QUALITY_r05 phores ----
if [ ! -f QUALITY_r05_missing.json ]; then
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
    commit_artifacts "QUALITY_r05: +4 wall-cut phores" \
        QUALITY_r05.json QUALITY_r05_missing.json QUALITY_r05_missing.json.rows
fi

log "PIPELINE5 DONE ($(left)s to deadline)"
