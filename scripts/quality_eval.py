"""Quality-evidence harness: sample pools from real pharmacophore inputs
and record validity / connectivity / uniqueness / count-interval metrics.

VERDICT round-2 item 6: generates a pool per `.phore` fixture (real files
shipped by the reference for sampling, `tests/fixtures/phores/*.phore`),
runs the full pipeline (count interval -> reverse diffusion -> decode ->
reconstruction -> acceptance, parity with reference `sample_all.py:69-183`)
and writes a JSON artifact (QUALITY_r{N}.json at the repo root).

Without a trained checkpoint it first quick-trains the flagship model on the
synthetic corpus (chain pseudo-molecules), so the recorded numbers measure
the *pipeline*, not ZINC-level chemistry; the JSON records which weights
were used. With `--ckpt` it evaluates real trained weights.

Usage:
  python scripts/quality_eval.py [--ckpt path] [--num_samples 20]
      [--train_steps 300] [--round 2] [--platform tpu|cpu]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def graph_hash(mol) -> str:
    """Uniqueness key: canonical SMILES when the molecule is an RDKit Mol,
    else a sorted element-multiset + typed undirected bond list (the
    SimpleMol backend has no canonical SMILES)."""
    if not hasattr(mol, "elements"):  # RDKit Mol
        from rdkit import Chem  # type: ignore
        return Chem.MolToSmiles(mol)
    els = ",".join(str(int(z)) for z in sorted(mol.elements))
    bonds = sorted((min(i, j), max(i, j), t) for i, j, t in
                   mol.undirected_bonds())
    return els + "|" + ";".join(f"{i}-{j}:{t}" for i, j, t in bonds)


def n_heavy_atoms(mol) -> int:
    return (len(mol.elements) if hasattr(mol, "elements")
            else mol.GetNumAtoms())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--num_samples", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--train_steps", type=int, default=300)
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--platform", default="")
    ap.add_argument("--phore_glob",
                    default=os.path.join(REPO, "tests/fixtures/phores/*.phore"))
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--sample_steps", type=int, default=0,
                    help="strided (DDIM-style) reverse schedule: number of "
                         "denoiser evaluations (0 = full 1000-step "
                         "schedule; exact multi-step posteriors either way)")
    ap.add_argument("--chunk_steps", type=int, default=0,
                    help="chunked reverse process (identical math; keeps "
                         "each device call under relay wall-time caps)")
    ap.add_argument("--triplet_knn", type=int, default=-1,
                    help="override denoiser.triplet_knn for the sampling "
                         "pipeline (-1 = config default/exact); the "
                         "quick-trained weights are knn-agnostic")
    ap.add_argument("--fused_stack", default="",
                    choices=["", "none", "xla", "pallas", "pallas3", "pallas2"],
                    help="denoiser.fused_stack override for the sampling "
                         "pipeline (whole-layer-stack kernel)")
    ap.add_argument("--time_budget", type=float, default=0.0,
                    help="per-phore wall-time budget in seconds (0 = none);"
                         " abandons after the current batch, keeping the"
                         " accepted molecules (rows record timed_out)")
    ap.add_argument("--fail_budget_factor", type=int, default=3,
                    help="abandon a phore after factor*num_samples failed "
                         "attempts (reference fail-budget semantics)")
    ap.add_argument("--recon_workers", type=int, default=0,
                    help="host-side reconstruction worker processes "
                         "(overlaps with device sampling)")
    ap.add_argument("--no_guidance", action="store_true",
                    help="disable the canonical sample.sh guidance recipe "
                         "(atom_prox 1-3 A + center_prox)")
    ap.add_argument("--frag_attract", type=float, default=0.0,
                    help="add the connectivity guidance energy with this "
                         "weight (0 = off); attacks the dominant 2-fragment "
                         "disconnection failure (VERDICT round 3)")
    ap.add_argument("--synthetic_phores", type=int, default=2,
                    help="also sample this many in-distribution synthetic "
                         "pharmacophores (the quick-trained weights' "
                         "training distribution) as a pipeline-quality "
                         "control row set")
    ap.add_argument("--save_quick", default="/tmp/quality_quicktrain",
                    help="save the quick-trained state to this checkpoint "
                         "prefix (reusable via --ckpt on later runs; "
                         "empty = don't save)")
    ap.add_argument("--eval_acc_batches", type=int, default=4,
                    help="held-out batches for the per-element accuracy "
                         "meta block (0 = skip; ckpt runs only)")
    ap.add_argument("--out", default="")
    ap.add_argument("--skip", default="",
                    help="comma-separated phore names to skip (follow-up "
                         "runs after a timeout; merge rows afterwards with "
                         "scripts/merge_quality_rows.py)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.phore import parse_phore_file
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.sample.chem import HAVE_RDKIT
    from phoregen_tpu.sample.pipeline import GenerationPipeline
    from phoregen_tpu.train.state import create_train_state
    from phoregen_tpu.train.step import make_train_step

    cfg = default_config("zinc_300")
    cfg.dataset.ligand_buckets = [32, 48, 64, 80]
    if args.triplet_knn >= 0:
        cfg.model.denoiser.triplet_knn = args.triplet_knn
    if args.fused_stack:
        cfg.model.denoiser.fused_stack = args.fused_stack
    cfg.finalize()
    pg = PhoreGen(cfg)

    weights_src = args.ckpt or f"quick-train synthetic x{args.train_steps}"
    eval_acc = None
    if args.ckpt:
        from phoregen_tpu.train.checkpoint import load_checkpoint
        from phoregen_tpu.train.state import create_train_state
        tmpl = synthetic_dataset(args.seed, 8, max_atoms=30)
        tmpl_loader = PhoreDataLoader(tmpl, cfg, 8, shuffle=False)
        params = pg.init_params(jax.random.PRNGKey(0),
                                next(iter(tmpl_loader)))
        state, _ = load_checkpoint(args.ckpt,
                                   create_train_state(cfg.train, params))
        params = state.params
        if args.eval_acc_batches > 0:
            from phoregen_tpu.utils.evalacc import eval_accuracies
            eval_acc = eval_accuracies(pg, cfg, params,
                                       n_batches=args.eval_acc_batches)
            print(f"[quality_eval] eval accuracies: {eval_acc}", flush=True)
    else:
        # quick-train the flagship on the synthetic chain corpus so the
        # sampler has non-random posteriors to work with
        B = 8
        samples = synthetic_dataset(args.seed, 512, max_atoms=30)
        loader = PhoreDataLoader(samples, cfg, B, shuffle=True,
                                 seed=args.seed)
        batch = next(iter(loader))
        params = pg.init_params(jax.random.PRNGKey(args.seed), batch)
        state = create_train_state(cfg.train, params)
        step_fn = make_train_step(pg, cfg, mesh=None, donate=True)
        n_done, t0 = 0, time.time()
        while n_done < args.train_steps:
            for b in loader:
                state, metrics = step_fn(state, np.uint32(n_done), b)
                n_done += 1
                if n_done >= args.train_steps:
                    break
        loss = float(metrics["loss"])
        print(f"[quality_eval] quick-train {n_done} steps in "
              f"{time.time() - t0:.0f}s, final loss {loss:.3f}", flush=True)
        if args.save_quick:
            from phoregen_tpu.train.checkpoint import save_checkpoint
            save_checkpoint(args.save_quick, state, 0, cfg.to_dict(), {})
            print(f"[quality_eval] saved quick-train state to "
                  f"{args.save_quick}", flush=True)
        params = state.params

    guidance = None
    if not args.no_guidance:
        from phoregen_tpu.sample.sampler import GuidanceOpt
        guidance = [GuidanceOpt(type="atom_prox", min_d=1.0, max_d=3.0),
                    GuidanceOpt(type="center_prox")]
        if args.frag_attract > 0:
            guidance.append(GuidanceOpt(type="frag_attract",
                                        weight=args.frag_attract))
    pipe = GenerationPipeline(pg, params, batch_size=args.batch_size,
                              add_edge="predicted", seed=args.seed,
                              chunk_steps=args.chunk_steps,
                              sample_steps=args.sample_steps,
                              guidance=guidance,
                              recon_workers=args.recon_workers)
    per_phore, t_start = [], time.time()
    # in-distribution synthetic phores first (quality control for the
    # pipeline itself), then the real (OOD for quick-trained weights) set
    jobs = []
    if args.synthetic_phores:
        from phoregen_tpu.data.synthetic import synthetic_raw
        from phoregen_tpu.data.phore import Phore, PhoreFeature
        from phoregen_tpu.constants import PHORETYPES_13
        rng = np.random.default_rng(args.seed + 99)
        for i in range(args.synthetic_phores):
            raw = synthetic_raw(rng, "zinc_300", n_atoms=24)
            feats = []
            for k in range(raw.phore_x.shape[0]):
                onehot = raw.phore_x[k, :len(PHORETYPES_13)]
                t = PHORETYPES_13[int(np.argmax(onehot))]
                has_norm = bool(raw.phore_x[k, len(PHORETYPES_13) + 2] > 0.5)
                feats.append(PhoreFeature(
                    type=t, alpha=float(raw.phore_x[k, len(PHORETYPES_13)]),
                    weight=1.0, factor=1.0,
                    pos=tuple(float(x) for x in raw.phore_pos[k]),
                    has_norm=has_norm,
                    norm=tuple(float(x) for x in raw.phore_norm[k]),
                    label="0", anchor_weight=1.0))
            jobs.append(Phore(name=f"synthetic_{i}", features=feats))
    for path in sorted(glob.glob(args.phore_glob)):
        jobs.append(parse_phore_file(path))
    skip = {s for s in args.skip.split(",") if s}
    out_path = args.out or os.path.join(REPO, f"QUALITY_r{args.round:02d}.json")
    # incremental per-row artifact: the full run is hours long and may be
    # killed by wall-time caps; rows are recoverable via merge_quality_rows
    rows_path = out_path + ".rows"
    for phore in jobs:
        if phore.name in skip:
            print(f"[quality_eval] skip {phore.name}", flush=True)
            continue
        res = pipe.generate(phore, args.num_samples,
                            fail_budget_factor=args.fail_budget_factor,
                            time_budget=args.time_budget)
        mols = res["mols"]
        attempted = res["n_finished"] + res["n_failed"]
        lo, up = res["count_interval"]
        hashes = [graph_hash(m) for m in mols]
        n_atoms = [n_heavy_atoms(m) for m in mols]
        count_hits = [lo <= n <= up for n in n_atoms]
        row = {
            "phore": res["name"],
            "n_points": len(phore.features),
            "count_interval": [lo, up],
            "attempted": attempted,
            "accepted": res["n_finished"],
            # acceptance == sanitize + connectivity, so validity here IS the
            # acceptance rate (reference sample_all.py:127-135)
            "validity_pct": round(100.0 * res["n_finished"]
                                  / max(attempted, 1), 1),
            "uniqueness_pct": round(100.0 * len(set(hashes))
                                    / max(len(hashes), 1), 1),
            "count_interval_hit_pct": round(
                100.0 * sum(count_hits) / max(len(count_hits), 1), 1),
            "mean_atoms": round(float(np.mean(n_atoms)), 1) if n_atoms else 0,
            "seconds": round(res["seconds"], 1),
            "abandoned": res["abandoned"],
            "timed_out": res.get("timed_out", False),
        }
        per_phore.append(row)
        print(json.dumps(row), flush=True)
        with open(rows_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    acc = sum(r["accepted"] for r in per_phore)
    att = sum(r["attempted"] for r in per_phore)
    out = {
        "round": args.round,
        "weights": weights_src,
        "chem_backend": "rdkit" if HAVE_RDKIT else "simplemol",
        "triplet_knn": cfg.model.denoiser.triplet_knn,
        "sample_steps": args.sample_steps,
        "num_samples_per_phore": args.num_samples,
        "overall_validity_pct": round(100.0 * acc / max(att, 1), 1),
        "overall_accepted": acc,
        "total_seconds": round(time.time() - t_start, 1),
        # discriminative per-element accuracies of the loaded weights on
        # held-out eval batches (VERDICT r4 item 7; utils/evalacc.py)
        "eval_acc": eval_acc,
        "per_phore": per_phore,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[quality_eval] wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
