"""Acceptance-rate grounding for the kNN operating point (VERDICT round-3
item 5): eval-loss deltas are demonstrably NOT a proxy for acceptance
(knn16 = +0.6% eval loss under knn32-trained weights, yet sampling at
knn16 collapsed acceptance 42% -> 0/304). This sweep measures what
matters: accepted/attempted through the FULL pipeline (count interval ->
guided reverse diffusion -> decode -> reconstruction -> sanitize+connected
acceptance, reference contract `sample_all.py:127-135`) per sampling-time
triplet_knn.

  python scripts/knn_acceptance.py --ckpt release/flagship_r3 \
      --knns 16 32 0 --pool 32 --out KNN_ACCEPT_r04.json

Writes one row per (phore, knn): {phore, knn, accepted, attempted,
validity, mean_atoms, frag2_frac}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import Counter

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="release/flagship_r3")
    ap.add_argument("--knns", type=int, nargs="+", default=[16, 32, 0])
    ap.add_argument("--pool", type=int, default=32,
                    help="attempted samples per (phore, knn)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chunk_steps", type=int, default=250)
    ap.add_argument("--phore_indices", type=int, nargs="+", default=[0, 1],
                    help="indices into load_real_phores() (first 10 = "
                         "held-out sampling dir)")
    ap.add_argument("--fused_stack", default="")
    ap.add_argument("--out", default="KNN_ACCEPT_r04.json")
    ap.add_argument("--time_budget", type=float, default=1800.0,
                    help="wall seconds per (phore, knn) row")
    args = ap.parse_args()

    import jax
    import numpy as np

    from phoregen_tpu.config import config_from_dict
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.realcorpus import load_real_phores
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.sample.chem import fragment_count
    from phoregen_tpu.sample.pipeline import GenerationPipeline
    from phoregen_tpu.sample.reconstruct import MolReconsError
    from phoregen_tpu.sample.sampler import GuidanceOpt
    from phoregen_tpu.train.checkpoint import load_checkpoint
    from phoregen_tpu.train.state import create_train_state

    with open(args.ckpt + ".json") as f:
        meta = json.load(f)

    phores = load_real_phores()   # parse the corpus once, not per row
    rows = []
    eval_acc = None
    for knn in args.knns:
        cfg = config_from_dict(meta["config"])
        cfg.dataset.ligand_buckets = [32, 48, 64, 80]
        cfg.model.denoiser.triplet_knn = knn
        if args.fused_stack:
            cfg.model.denoiser.fused_stack = args.fused_stack
        cfg.finalize()
        pg = PhoreGen(cfg)
        tmpl = synthetic_dataset(0, 8, max_atoms=30)
        params = pg.init_params(
            jax.random.PRNGKey(0),
            next(iter(PhoreDataLoader(tmpl, cfg, 8, shuffle=False))))
        state, _ = load_checkpoint(args.ckpt,
                                   create_train_state(cfg.train, params))
        if eval_acc is None:
            # once, at the first (sampling-time) knn config: discriminative
            # per-element accuracies (VERDICT r4 item 7; utils/evalacc.py)
            from phoregen_tpu.utils.evalacc import eval_accuracies
            eval_acc = eval_accuracies(pg, cfg, state.params)
            print(f"[knn_acceptance] eval accuracies: {eval_acc}",
                  flush=True)
        guidance = [GuidanceOpt(type="atom_prox", min_d=1.0, max_d=3.0),
                    GuidanceOpt(type="center_prox")]
        pipe = GenerationPipeline(pg, state.params, batch_size=args.batch,
                                  add_edge="predicted", seed=0,
                                  chunk_steps=args.chunk_steps,
                                  guidance=guidance)
        for pi in args.phore_indices:
            phore = phores[pi]
            prep = pipe.prepare_phore(phore)
            lower, upper = pipe._count_interval(prep)
            t0 = time.time()
            attempted = accepted = 0
            natoms, frags = [], Counter()
            while attempted < args.pool:
                if time.time() - t0 > args.time_budget:
                    break
                decoded, _ = pipe.sample_pool(
                    prep, min(args.batch, args.pool - attempted),
                    lower, upper)
                for info in decoded:
                    attempted += 1
                    n = len(info["element"])
                    bi, bt = info["bond_index"], info["bond_type"]
                    und = set()
                    if bi is not None and bi.size:
                        for (i, j), t in zip(bi.T, bt):
                            und.add((min(int(i), int(j)),
                                     max(int(i), int(j)), int(t)))
                    frags[fragment_count(n, list(und))] += 1
                    try:
                        pipe.reconstruct(info)
                        accepted += 1
                        natoms.append(n)
                    except MolReconsError:
                        pass
            row = {
                "phore": phore.name, "knn": knn,
                "trained_knn": meta["config"]["model"]["denoiser"]
                                   .get("triplet_knn", 0),
                "interval": [int(lower), int(upper)],
                "accepted": accepted, "attempted": attempted,
                "validity": round(accepted / max(attempted, 1), 4),
                "mean_atoms": (round(float(np.mean(natoms)), 2)
                               if natoms else None),
                "frag2plus_frac": round(
                    sum(v for k, v in frags.items() if k >= 2)
                    / max(sum(frags.values()), 1), 4),
                "seconds": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(args.out, "w") as f:
                json.dump({"rows": rows, "ckpt": args.ckpt,
                           "pool": args.pool, "eval_acc": eval_acc},
                          f, indent=1)

    print(f"[knn_acceptance] wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
