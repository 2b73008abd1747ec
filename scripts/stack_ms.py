"""ms/iter + dispatch census per fused-stack rung (round-4 dispatch ladder).

Measures the forward-only reverse-scan iteration cost (the quantity round 3
pinned at 20.35 ms/iter unfused vs ~0.3 ms of MXU FLOPs) for each
`denoiser.fused_stack` mode, plus the post-fusion thunk count from the
optimized HLO — the two numbers the VERDICT round-3 item 2 asks to report
per rung. Reference hot loop being priced:
`/root/reference/models/uni_denoiser.py:260-298` x 1000 steps.

  python scripts/stack_ms.py --modes none xla pallas pallas3 pallas2 \
      [--iters 50] [--batch 16] [--knn 8]

Prints one JSON line per mode: {mode, ms_per_iter, batch, knn, apply}
(+ {fusions, custom_calls} from the optimized HLO with --census).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(mode: str, args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.constants import NUM_ATOM_CLASSES, NUM_BOND_CLASSES

    cfg = default_config("zinc_300")
    cfg.dataset.ligand_buckets = [args.bucket]
    cfg.dataset.max_phore = 32
    cfg.model.denoiser.triplet_knn = args.knn
    cfg.model.denoiser.scan_layers = mode != "none"
    cfg.model.denoiser.fused_stack = mode
    cfg.model.denoiser.edge_mlp_apply = args.apply
    cfg.model.compute_dtype = args.dtype
    cfg.model.denoiser.fused_block_dtype = args.block_dtype
    cfg.finalize()
    pg = PhoreGen(cfg)
    samples = synthetic_dataset(0, args.batch,
                                max_atoms=min(30, args.bucket - 2))
    batch = next(iter(PhoreDataLoader(samples, cfg, args.batch,
                                      shuffle=False)))
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    # packed/merged weights are loop-invariant: hoist them outside the scan
    # exactly like the real sampler does (sample/sampler.py _reverse_parts)
    fused_packed = pg.net.apply(params, method="pack_fused")
    B, NL = batch.lig_type.shape
    rng = np.random.default_rng(0)
    h_node = jnp.asarray(rng.normal(size=(B, NL, NUM_ATOM_CLASSES)),
                         jnp.float32)
    h_edge = jnp.asarray(rng.normal(size=(B, NL, NL, NUM_BOND_CLASSES)),
                         jnp.float32)

    def one_iter(carry, t):
        pos, seed = carry
        t_b = jnp.full((B,), t, jnp.int32)   # net.apply needs t of shape [B]
        out = pg.net.apply(params, h_node, pos, batch.lig_mask,
                           h_edge + seed, t_b, batch.phore_x, batch.phore_pos,
                           batch.phore_norm, batch.phore_mask,
                           fused_packed=fused_packed)
        # thread the pos output back so iterations are data-dependent
        return (out[1], seed), None

    def scan_fwd(pos0):
        ts = jnp.zeros((args.scan_iters,), jnp.int32)
        (pos, _), _ = jax.lax.scan(one_iter, (pos0, jnp.float32(0)), ts)
        return pos

    return jax.jit(scan_fwd), batch.lig_pos


def thunk_census(jitted, *a):
    compiled = jitted.lower(*a).compile()
    txt = compiled.as_text()
    fus = txt.count(" fusion(") + txt.count(" fusion.")
    cc = txt.count("custom-call")
    return fus, cc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+",
                    default=["none", "xla", "pallas", "pallas3", "pallas2"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--batches", type=int, nargs="*", default=None,
                    help="sweep several batch sizes per mode in ONE chip "
                         "client (overrides --batch)")
    ap.add_argument("--dtype", default="float32",
                    help="model compute dtype (float32|bfloat16)")
    ap.add_argument("--block_dtype", default="float32",
                    help="denoiser.fused_block_dtype (xla2: bf16 carries)")
    ap.add_argument("--bucket", type=int, default=32)
    ap.add_argument("--knn", type=int, default=8)
    ap.add_argument("--apply", default="split")
    ap.add_argument("--scan_iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--census", action="store_true",
                    help="also count fusions/custom-calls in the optimized "
                         "HLO (slow lower+compile text dump)")
    args = ap.parse_args()

    import copy

    import jax

    for mode in args.modes:
      for bsz in (args.batches or [args.batch]):
        args_b = copy.copy(args)
        args_b.batch = bsz
        try:
            fn, pos0 = build(mode, args_b)
            out = fn(pos0)
            jax.block_until_ready(out)        # compile + warm
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(pos0)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / (args.reps * args.scan_iters)
            row = {"mode": mode, "ms_per_iter": round(dt * 1e3, 3),
                   "batch": bsz, "knn": args.knn,
                   "apply": args.apply, "dtype": args.dtype,
                   "mol_per_s_equiv": round(bsz / (dt * 1e3), 3)}
            if args.census:
                fus, cc = thunk_census(fn, pos0)
                row.update({"fusions": fus, "custom_calls": cc})
            print(json.dumps(row), flush=True)
        except Exception as e:  # keep the sweep alive per-rung
            print(json.dumps({"mode": mode,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
