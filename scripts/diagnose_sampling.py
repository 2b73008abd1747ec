"""Diagnose why sampled molecules fail acceptance.

Trains the tiny (or flagship) model on the synthetic chain corpus, samples
pools, and breaks failures down by cause: mask-class atoms kept, bond-type
histogram, connectivity (fragment count), valence violations — instead of
the pipeline's single accepted/failed counter. This is the tool for
telling "undertrained model" apart from "sampler/decode bug".

Usage: python scripts/diagnose_sampling.py [--flagship] [--train_steps N]
           [--platform cpu] [--batch 8]
"""
from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true")
    ap.add_argument("--train_steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pools", type=int, default=2)
    ap.add_argument("--platform", default="")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.sample.chem import (SimpleMol, _connected,
                                          fragment_count, sanitize_simple)
    from phoregen_tpu.sample.pipeline import GenerationPipeline
    from phoregen_tpu.train.state import create_train_state
    from phoregen_tpu.train.step import make_train_step

    cfg = default_config("zinc_300")
    if not args.flagship:
        m = cfg.model
        m.hidden_dim = 32
        m.denoiser.hidden_dim = 32
        m.denoiser.num_layers = 2
        m.denoiser.n_heads = 4
        m.denoiser.knn = 8
        m.denoiser.num_r_gaussian = 8
        m.diff.num_timesteps = 100
        m.diff.time_dim = 4
    cfg.dataset.ligand_buckets = [32]
    cfg.dataset.max_phore = 32
    cfg.finalize()

    pg = PhoreGen(cfg)
    B = args.batch
    samples = synthetic_dataset(args.seed, 512, max_atoms=24)
    loader = PhoreDataLoader(samples, cfg, B, shuffle=True, seed=args.seed)
    params = pg.init_params(jax.random.PRNGKey(args.seed),
                            next(iter(loader)))
    state = create_train_state(cfg.train, params)
    step = make_train_step(pg, cfg, mesh=None, donate=True)
    import time
    print("[diag] compiling train step...", flush=True)
    n, t0, metrics = 0, time.time(), {}
    while n < args.train_steps:
        for b in loader:
            state, metrics = step(state, np.uint32(n), b)
            n += 1
            if n >= args.train_steps:
                break
    m = {k: round(float(np.asarray(v)), 4) for k, v in metrics.items()}
    print(f"[diag] trained {n} steps in {time.time()-t0:.0f}s: {m}",
          flush=True)

    # sample pools conditioned on a training-set phore (max in-distribution)
    pipe = GenerationPipeline(pg, state.params, batch_size=B,
                              add_edge="predicted", seed=args.seed + 1)
    src = samples[0]
    phore_sample = {
        "phore_x": src.phore_x, "phore_pos": src.phore_pos,
        "phore_norm": src.phore_norm, "center": src.center}
    # reuse prepare-style padding via pad_sample
    from phoregen_tpu.data.batching import pad_sample
    ps = pad_sample(np.zeros(0, np.int32), np.zeros((0, 3), np.float32),
                    None, None, src.phore_x, src.phore_pos, src.phore_norm,
                    src.center, min(cfg.dataset.ligand_buckets),
                    cfg.dataset.max_phore)
    true_n = src.lig_type.shape[0]
    print(f"[diag] conditioning phore from training sample 0 "
          f"(true molecule: {true_n} atoms)")

    print("[diag] compiling sampler...", flush=True)
    stats = Counter()
    bond_hist = Counter()
    frag_counts = []
    kept_atoms = []
    for pool in range(args.pools):
        decoded, raw = pipe.sample_pool(ps, B, max(4, true_n - 2),
                                        min(78, true_n + 2))
        for info in decoded:
            n_kept = len(info["element"])
            kept_atoms.append(n_kept)
            if n_kept == 0:
                stats["empty"] += 1
                continue
            mol = SimpleMol(list(info["element"]), info["atom_pos"],
                            info.get("bond_index"), info.get("bond_type"))
            bonds = mol.undirected_bonds()
            for _, _, t in bonds:
                bond_hist[int(t)] += 1
            conn = _connected(n_kept, bonds)
            ok_val = sanitize_simple(mol)
            frags = fragment_count(n_kept, bonds)
            frag_counts.append(frags)
            stats["connected" if conn else "disconnected"] += 1
            stats["valence_ok" if ok_val else "valence_bad"] += 1
            if conn and ok_val:
                stats["ACCEPTED"] += 1
    tot = args.pools * B
    print(f"[diag] pools: {tot} molecules")
    print(f"[diag] kept-atom counts: {sorted(kept_atoms)}")
    print(f"[diag] fragment counts:  {sorted(frag_counts)}")
    print(f"[diag] bond-type histogram (1=single..4=aromatic): "
          f"{dict(sorted(bond_hist.items()))}")
    print(f"[diag] outcomes: {dict(stats)}")


if __name__ == "__main__":
    main()
