"""One-off: why do samples from the round-3 40k checkpoint fail acceptance?

Samples a pool from a TRAINING-DISTRIBUTION phore (realcorpus: a real
testset pharmacophore, the same featurization the 40k run trained on) and
breaks failures down by cause (mask atoms, bond histogram, fragment count,
reconstruction error) instead of the pipeline's single accepted/failed
counter.

Usage: python scripts/diagnose_r3.py --ckpt /tmp/train_r3/best [--pool 32]
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
    ap.add_argument("--ckpt", default="/tmp/train_r3/best")
    ap.add_argument("--pool", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--triplet_knn", type=int, default=32)
    ap.add_argument("--chunk_steps", type=int, default=250)
    ap.add_argument("--phore_index", type=int, default=10,
                    help="index into load_real_phores() (first 10 = held-out "
                         "sampling dir)")
    ap.add_argument("--platform", default="")
    ap.add_argument("--no_guidance", action="store_true")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from phoregen_tpu.config import default_config
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

    cfg = default_config("zinc_300")
    cfg.dataset.ligand_buckets = [32, 48, 64, 80]
    cfg.model.denoiser.triplet_knn = args.triplet_knn
    cfg.finalize()
    pg = PhoreGen(cfg)

    tmpl = synthetic_dataset(0, 8, max_atoms=30)
    tmpl_loader = PhoreDataLoader(tmpl, cfg, 8, shuffle=False)
    params = pg.init_params(jax.random.PRNGKey(0), next(iter(tmpl_loader)))
    state, _ = load_checkpoint(args.ckpt,
                               create_train_state(cfg.train, params))
    params = state.params

    guidance = None
    if not args.no_guidance:
        guidance = [GuidanceOpt(type="atom_prox", min_d=1.0, max_d=3.0),
                    GuidanceOpt(type="center_prox")]
    pipe = GenerationPipeline(pg, params, batch_size=args.batch,
                              add_edge="predicted", seed=0,
                              chunk_steps=args.chunk_steps,
                              guidance=guidance)

    phore = load_real_phores()[args.phore_index]
    print(f"[diag] phore {phore.name!r}: {len(phore.features)} points",
          flush=True)
    prep = pipe.prepare_phore(phore)
    lower, upper = pipe._count_interval(prep)
    print(f"[diag] count interval [{lower}, {upper}]", flush=True)

    n_done = 0
    causes = Counter()
    bond_hist = Counter()
    frag_hist = Counter()
    natoms = []
    bonds_per_atom = []
    while n_done < args.pool:
        decoded, _raw = pipe.sample_pool(prep, min(args.batch,
                                                   args.pool - n_done),
                                         lower, upper)
        for info in decoded:
            n_done += 1
            n = len(info["element"])
            natoms.append(n)
            bi, bt = info["bond_index"], info["bond_type"]
            und = set()
            if bi is not None and bi.size:
                for (i, j), t in zip(bi.T, bt):
                    if i > j:
                        i, j = j, i
                    und.add((int(i), int(j), int(t)))
            for _, _, t in und:
                bond_hist[t] += 1
            bonds_per_atom.append(2 * len(und) / max(n, 1))
            nfrag = fragment_count(n, list(und))
            frag_hist[nfrag] += 1
            try:
                mol, smi = pipe.reconstruct(info)
                causes["ACCEPT"] += 1
            except MolReconsError as e:
                causes[f"recon:{str(e)[:40]}"] += 1
        print(f"[diag] {n_done} sampled; causes={dict(causes)}", flush=True)

    print("=== summary ===", flush=True)
    print("causes:", dict(causes))
    print("bond type histogram:", dict(bond_hist))
    print("fragment counts:", dict(sorted(frag_hist.items())))
    print("bonds/atom: mean=%.2f" % float(np.mean(bonds_per_atom)))
    print("atom counts: mean=%.1f min=%d max=%d" % (
        float(np.mean(natoms)), min(natoms), max(natoms)))


if __name__ == "__main__":
    main()
