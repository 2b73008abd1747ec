"""Inject per-element eval accuracies into the quality artifacts.

VERDICT r4 item 7: QUALITY/KNN_ACCEPT artifacts should carry the
discriminative per-element accuracies (node/edge overall + per-element
means, models/phoregen.py::element_accuracy) beside the sampling-side
acceptance numbers, so quality tracking has a trainable proxy.
Reference analogue: `/root/reference/models/common.py:284-297`.

Runs on CPU (the release checkpoints are ~5M params) so it never touches
the chip; computes `utils/evalacc.eval_accuracies` for each release
weight set and writes the block into every artifact that used those
weights.

Usage: python scripts/inject_eval_acc.py [--n_batches 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# artifact -> release prefix that produced its rows
ARTIFACTS = {
    "QUALITY_r05.json": "release/flagship_r4",
    "QUALITY_r05_r3w.json": "release/flagship_r3",
    "QUALITY_r05_stage2.json": "release/stage2_r4",
    "KNN_ACCEPT_r05.json": "release/flagship_r3",
}


def eval_acc_for(prefix: str, n_batches: int):
    import jax

    from phoregen_tpu.config import config_from_dict
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.train.checkpoint import load_checkpoint
    from phoregen_tpu.train.state import create_train_state
    from phoregen_tpu.utils.evalacc import eval_accuracies

    with open(prefix + ".json") as f:
        meta = json.load(f)
    cfg = config_from_dict(meta["config"])
    # eval on CPU: force the float32 module path (no fused stacks)
    cfg.model.denoiser.fused_stack = "none"
    cfg.train.dtype = "float32"
    pg = PhoreGen(cfg)
    tmpl = synthetic_dataset(0, 8, max_atoms=12)
    batch = next(iter(PhoreDataLoader(tmpl, cfg, 8, shuffle=False)))
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    state, _ = load_checkpoint(prefix, create_train_state(cfg.train, params))
    return eval_accuracies(pg, cfg, state.params, n_batches=n_batches)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_batches", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    cache: dict = {}
    for art, prefix in ARTIFACTS.items():
        path = os.path.join(REPO, art)
        if not os.path.exists(path) or not os.path.exists(prefix + ".json"):
            print(f"[inject] skip {art} (missing artifact or weights)")
            continue
        if prefix not in cache:
            print(f"[inject] evaluating {prefix} ...", flush=True)
            cache[prefix] = eval_acc_for(prefix, args.n_batches)
            print(f"[inject] {prefix}: {cache[prefix]}", flush=True)
        with open(path) as f:
            doc = json.load(f)
        doc["eval_acc"] = dict(cache[prefix],
                               weights=prefix,
                               n_batches=args.n_batches,
                               note="per-element discriminative accuracies "
                                    "on held-out mixed-corpus batches "
                                    "(utils/evalacc.py), CPU-computed")
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"[inject] wrote eval_acc -> {art}")


if __name__ == "__main__":
    main()
