"""Atom-count-interval sweep over every bundled real pharmacophore.

VERDICT round-2 item 3: the count head must produce non-degenerate,
in-bounds [lower, upper] intervals on real 23-203-point phores (round 2 it
saturated at [30, 30] out of distribution). Sweeps all ~695 bundled
`.phore` files with a trained checkpoint and writes COUNT_SWEEP_r{N}.json:
per-set interval stats, degenerate count (upper <= lower), bounds
violations, and the hit rate against the anchored-corpus ligand sizes.

Usage: python scripts/count_sweep.py --ckpt /tmp/train_r3/best [--round 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--platform", default="")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from phoregen_tpu.config import config_from_dict
    from phoregen_tpu.constants import MAX_ATOMS, MIN_ATOMS
    from phoregen_tpu.data.batching import collate, pad_sample
    from phoregen_tpu.data.phore import featurize_phore
    from phoregen_tpu.data.realcorpus import (cap_phore,
                                              list_real_phore_files,
                                              load_real_phores)
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.sample.sampler import Sampler
    from phoregen_tpu.train.checkpoint import load_checkpoint
    from phoregen_tpu.train.state import create_train_state
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.realcorpus import mixed_corpus

    with open(args.ckpt + ".json") as f:
        meta = json.load(f)
    cfg = config_from_dict(meta["config"])
    pg = PhoreGen(cfg)
    tmpl = mixed_corpus(1, 4)
    loader = PhoreDataLoader(tmpl, cfg, 4, shuffle=False)
    params = pg.init_params(jax.random.PRNGKey(0), next(iter(loader)))
    state, _ = load_checkpoint(args.ckpt,
                               create_train_state(cfg.train, params))
    params = state.params
    sampler = Sampler(pg)
    count_fn = jax.jit(lambda p, b: sampler.predict_count_interval(p, b))

    rng = np.random.default_rng(0)
    ds = cfg.dataset
    rows = []
    batch_samples, batch_meta = [], []

    def flush():
        nonlocal batch_samples, batch_meta
        if not batch_samples:
            return
        n_real = len(batch_samples)
        while len(batch_samples) < args.batch:   # pad to the static batch
            batch_samples.append(batch_samples[-1])
        lo, up = count_fn(params, collate(batch_samples))
        lo, up = np.asarray(lo)[:n_real], np.asarray(up)[:n_real]
        for (name, n_pts, n_nonex), l, u in zip(batch_meta, lo, up):
            rows.append({"phore": name, "n_points": n_pts,
                         "n_typed": n_nonex, "lower": int(l),
                         "upper": int(u)})
        batch_samples, batch_meta = [], []

    for path in list_real_phore_files():
        from phoregen_tpu.data.phore import parse_phore_file
        phore = parse_phore_file(path)
        n_pts = len(phore.features)
        n_nonex = sum(1 for f_ in phore.features
                      if f_.type not in ("EX", "CR"))
        capped = cap_phore(phore, ds.max_phore, rng)
        feats, pos, norm, center = featurize_phore(capped, ds.data_name,
                                                   norm_mode="new")
        sample = pad_sample(np.zeros(0, np.int32),
                            np.zeros((0, 3), np.float32), None, None,
                            feats, pos - center, norm, center,
                            min(ds.ligand_buckets), ds.max_phore)
        batch_samples.append(sample)
        batch_meta.append((phore.name or os.path.basename(path), n_pts,
                           n_nonex))
        if len(batch_samples) == args.batch:
            flush()
    flush()

    lowers = np.array([r["lower"] for r in rows])
    uppers = np.array([r["upper"] for r in rows])
    degenerate = int((uppers <= lowers).sum())
    oob = int(((lowers < MIN_ATOMS) | (uppers > MAX_ATOMS)).sum())
    widths = uppers - lowers
    out = {
        "round": args.round,
        "ckpt": args.ckpt,
        "n_phores": len(rows),
        "degenerate_intervals": degenerate,
        "out_of_bounds": oob,
        "width_min": int(widths.min()),
        "width_mean": round(float(widths.mean()), 1),
        "width_max": int(widths.max()),
        "lower_mean": round(float(lowers.mean()), 1),
        "upper_mean": round(float(uppers.mean()), 1),
        "per_phore_sample": rows[:20],
    }
    out_path = args.out or os.path.join(REPO,
                                        f"COUNT_SWEEP_r{args.round:02d}.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k != "per_phore_sample"}, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
