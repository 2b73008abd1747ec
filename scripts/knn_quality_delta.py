"""Quantify the quality cost of kNN-restricted triplet attention.

VERDICT round-2 item 1.ii: `denoiser.triplet_knn` shrinks the bond-update
triplet grid from [NL,NL,NL] to [NL,NL,K] — a big throughput lever through
the relay (per-iteration staging scales with per-step bytes) — but it
changes the computed attention. This script measures what that does to a
TRAINED model's posteriors, not just to throughput:

  1. quick-trains the flagship (exact attention) on the synthetic corpus,
     or loads --ckpt;
  2. evaluates the SAME parameters on the SAME fixed eval batches (same
     eval seeds => identical noise draws) with triplet_knn in
     {0 (exact), 16, 8}: full loss decomposition + node/edge accuracies.
     The pos-MSE and D3PM-KL terms are direct posterior-quality measures,
     so their deltas vs exact are the quality cost of the restriction.

Same-parameter evaluation is valid because the kNN restriction only masks
which triplets are enumerated; the parameter tree is unchanged.

Usage: python scripts/knn_quality_delta.py [--ckpt p] [--train_steps 300]
           [--eval_batches 4] [--platform cpu|tpu] [--knn 0,16,8]
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--train_steps", type=int, default=300)
    ap.add_argument("--eval_batches", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--knn", default="0,16,8")
    ap.add_argument("--corpus", default="chains",
                    choices=["chains", "mixed"],
                    help="eval-set generator; 'mixed' = the real-phore-"
                         "anchored corpus (use with checkpoints trained "
                         "on it)")
    ap.add_argument("--out_suffix", default="",
                    help="suffix for the output JSON (e.g. '_r03')")
    ap.add_argument("--bucket", type=int, default=32,
                    help="ligand bucket (32 = ZINC scale, 80 = fine-tune "
                         "stage shape with 78-atom molecules)")
    ap.add_argument("--platform", default="")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.train.state import create_train_state
    from phoregen_tpu.train.step import make_eval_step, make_train_step

    cfg = default_config("zinc_300")
    if args.corpus == "mixed":
        cfg.dataset.ligand_buckets = [args.bucket]
        cfg.dataset.max_phore = 96
    else:
        cfg.dataset.ligand_buckets = [args.bucket]
        cfg.dataset.max_phore = 32
    cfg.finalize()

    # ---- weights (exact-attention model) ----
    pg = PhoreGen(cfg)
    B = args.batch_size
    if args.ckpt:
        from phoregen_tpu.train.checkpoint import load_checkpoint
        if args.corpus == "mixed":
            from phoregen_tpu.data.realcorpus import mixed_corpus
            samples = mixed_corpus(args.seed, B)
        else:
            samples = synthetic_dataset(args.seed, B, max_atoms=30)
        loader = PhoreDataLoader(samples, cfg, B, shuffle=False)
        params = pg.init_params(jax.random.PRNGKey(0), next(iter(loader)))
        state, _ = load_checkpoint(args.ckpt,
                                   create_train_state(cfg.train, params))
        params = state.params
        src = args.ckpt
    else:
        if args.bucket > 32:
            from phoregen_tpu.data.synthetic import synthetic_raw
            rng0 = np.random.default_rng(args.seed)
            samples = [synthetic_raw(rng0, "zinc_300",
                                     n_atoms=args.bucket - 2)
                       for _ in range(256)]
        else:
            samples = synthetic_dataset(args.seed, 512, max_atoms=30)
        loader = PhoreDataLoader(samples, cfg, B, shuffle=True,
                                 seed=args.seed)
        params = pg.init_params(jax.random.PRNGKey(args.seed),
                                next(iter(loader)))
        state = create_train_state(cfg.train, params)
        step_fn = make_train_step(pg, cfg, mesh=None, donate=True)
        n, t0 = 0, time.time()
        while n < args.train_steps:
            for b in loader:
                state, metrics = step_fn(state, np.uint32(n), b)
                n += 1
                if n >= args.train_steps:
                    break
        print(f"[knn_delta] quick-train {n} steps in {time.time()-t0:.0f}s "
              f"loss {float(metrics['loss']):.3f}", flush=True)
        params = state.params
        src = f"quick-train x{args.train_steps}"

    # fixed eval batches (held-out seed)
    if args.corpus == "mixed":
        from phoregen_tpu.data.realcorpus import mixed_corpus
        ev = mixed_corpus(args.seed + 1, args.eval_batches * B * 2)
        ev = [s for s in ev if s.n_atoms <= args.bucket][
            : args.eval_batches * B]
    elif args.bucket > 32:
        from phoregen_tpu.data.synthetic import synthetic_raw
        rng1 = np.random.default_rng(args.seed + 1)
        ev = [synthetic_raw(rng1, "zinc_300", n_atoms=args.bucket - 2)
              for _ in range(args.eval_batches * B)]
    else:
        ev = synthetic_dataset(args.seed + 1, args.eval_batches * B,
                               max_atoms=30)
    ev_loader = PhoreDataLoader(ev, cfg, B, shuffle=False)
    ev_batches = list(ev_loader)[: args.eval_batches]

    results = {}
    ref_row = None
    for k in [int(x) for x in args.knn.split(",")]:
        cfg_k = copy.deepcopy(cfg)
        cfg_k.model.denoiser.triplet_knn = k
        pg_k = PhoreGen(cfg_k)
        eval_fn = make_eval_step(pg_k, cfg_k)
        acc = {}
        for i, b in enumerate(ev_batches):
            m = eval_fn(params, np.uint32(1000 + i), b)
            for kk, v in m.items():
                acc.setdefault(kk, []).append(float(jnp.mean(v)))
        row = {kk: round(float(np.mean(v)), 5) for kk, v in acc.items()}
        if k == 0:
            ref_row = row
        if ref_row is not None:
            row["delta_vs_exact"] = {
                kk: round(row[kk] - ref_row[kk], 5)
                for kk in ("loss", "loss_pos", "loss_node", "loss_edge",
                           "node_acc", "edge_acc") if kk in row}
        results[f"knn{k}" if k else "exact"] = row
        print(json.dumps({("knn%d" % k) if k else "exact": row}),
              flush=True)

    out = {"weights": src, "bucket": args.bucket,
           "eval_batches": args.eval_batches,
           "batch_size": B, "results": results}
    name = ("KNN_QUALITY" if args.bucket == 32
            else f"KNN_QUALITY_nl{args.bucket}") + args.out_suffix
    path = os.path.join(REPO, name + ".json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[knn_delta] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
