#!/bin/bash
# Round-5 pipeline, block 6: strided-sampling quality A/B.
#
# BASELINE.md has carried the strided-schedule throughput numbers since
# round 2 (10.5 mol/s @ S=100 vs ~1.1 at the full 1000-step schedule;
# exact multi-step posteriors) but its QUALITY COST was never measured —
# the one number a user needs before taking the 4-10x speed option.
# Cells: flagship_r3 weights, 2 real phores, S in {1000(full), 250, 100},
# same recipe as QUALITY_r05_r3w so the S=full column is already known
# (~31% on both phores).
#
# Waits for any running block-5 pipeline to finish before claiming the
# chip. Usage: DEADLINE_MIN=120 bash scripts/r5_pipeline6.sh
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
DEADLINE=$(( $(date +%s) + ${DEADLINE_MIN:-120} * 60 ))

log() { echo "[r5f $(date +%H:%M:%S)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

# wait (up to the deadline) for pipeline block 5 to release the chip
while pgrep -f r5_pipeline5.sh >/dev/null 2>&1; do
    [ "$(left)" -lt 600 ] && { log "block 5 still running at deadline"; exit 0; }
    sleep 60
done
sleep 120   # chip-claim release gap

commit_artifacts() { # msg file...
    local msg=$1; shift
    local f present=()
    for f in "$@"; do [ -s "$f" ] && present+=("$f"); done
    [ ${#present[@]} -eq 0 ] && { log "no artifacts for: $msg"; return 1; }
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
    sleep 120
    return $rc
}

mkdir -p /tmp/r5_stride_phores
for n in B1MDI3_merge O60674_merge; do
    ln -sf "$PWD/data/phores_for_sampling/$n.phore" /tmp/r5_stride_phores/
done

for S in 250 100; do
    [ -s STRIDE_QUALITY_r05_s${S}.json ] && continue
    run_stage stride_s${S} 1500 \
        python scripts/quality_eval.py --ckpt release/flagship_r3 \
            --num_samples 60 --batch_size 16 --round 5 --triplet_knn 32 \
            --sample_steps $S --recon_workers 2 --fail_budget_factor 3 \
            --time_budget 400 --eval_acc_batches 0 \
            --phore_glob '/tmp/r5_stride_phores/*.phore' \
            --synthetic_phores 0 --out STRIDE_QUALITY_r05_s${S}.json
done
commit_artifacts "STRIDE_QUALITY_r05: validity cost of the strided schedule (S=250/100)" \
    STRIDE_QUALITY_r05_s250.json STRIDE_QUALITY_r05_s250.json.rows \
    STRIDE_QUALITY_r05_s100.json STRIDE_QUALITY_r05_s100.json.rows

log "PIPELINE6 DONE ($(left)s to deadline)"
