"""Loop-body op-count diagnostic for the reverse-diffusion sampler.

The round-2 measurement pinned the sampling cost model: per-scan-iteration
overhead through the sandboxed runtime tracks the compiled loop body's op
content (count x staged sizes), not wall compute. This script counts jaxpr
primitives (and total staged output bytes) in the jitted one-step sampler
body so layer-fusion work can be judged before burning a TPU run.

Usage: python scripts/op_count.py [--bucket 32] [--batch 16] [--knn 8]
"""
from __future__ import annotations

import argparse
import collections
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: sandbox pins axon (TPU); CPU analysis must not race the chip claim

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def count_jaxpr(jaxpr, counts, sizes):
    for eqn in jaxpr.eqns:
        counts[eqn.primitive.name] += 1
        for v in eqn.outvars:
            if hasattr(v, "aval") and hasattr(v.aval, "size"):
                dt = getattr(v.aval, "dtype", None)
                sizes[eqn.primitive.name] += (
                    v.aval.size * (dt.itemsize if dt is not None else 4))
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                count_jaxpr(sub.jaxpr, counts, sizes)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        count_jaxpr(s.jaxpr, counts, sizes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--knn", type=int, default=8)
    ap.add_argument("--scan_layers", action="store_true")
    ap.add_argument("--apply", default="split", choices=["split", "concat"])
    ap.add_argument("--fused", default="none",
                    choices=["none", "xla", "pallas"])
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    import jax
    # env var alone is not enough: the sandbox's sitecustomize pins
    # jax_platforms via config, and explicit config beats env
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen

    cfg = default_config("zinc_300")
    cfg.dataset.ligand_buckets = [args.bucket]
    cfg.dataset.max_phore = 32
    cfg.model.denoiser.triplet_knn = args.knn
    cfg.model.denoiser.scan_layers = args.scan_layers
    cfg.model.denoiser.edge_mlp_apply = args.apply
    cfg.model.denoiser.fused_stack = args.fused
    pg = PhoreGen(cfg)

    samples = synthetic_dataset(0, args.batch, max_atoms=min(30, args.bucket))
    loader = PhoreDataLoader(samples, cfg, args.batch, shuffle=False)
    batch = next(iter(loader))
    params = pg.init_params(jax.random.PRNGKey(0), batch)

    # one denoiser forward at sampling shapes — the scan body is dominated
    # by exactly this computation (posterior/RNG ops are O(N^2 K_classes))
    from phoregen_tpu.constants import NUM_ATOM_CLASSES, NUM_BOND_CLASSES
    B, NL = batch.lig_type.shape
    h_node = jnp.zeros((B, NL, NUM_ATOM_CLASSES), jnp.float32)
    h_edge = jnp.zeros((B, NL, NL, NUM_BOND_CLASSES), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)

    def fwd(p):
        return pg.net.apply(
            p, h_node, batch.lig_pos, batch.lig_mask, h_edge, t,
            batch.phore_x, batch.phore_pos, batch.phore_norm,
            batch.phore_mask)

    jaxpr = jax.make_jaxpr(fwd)(params)
    counts = collections.Counter()
    sizes = collections.Counter()
    count_jaxpr(jaxpr.jaxpr, counts, sizes)
    total_ops = sum(counts.values())
    total_mb = sum(sizes.values()) / 1e6
    print(f"shapes: B={args.batch} NL={args.bucket} NP=32 knn={args.knn} "
          f"scan_layers={args.scan_layers} apply={args.apply} "
          f"fused={args.fused}")
    print(f"jaxpr: TOTAL ops={total_ops}  staged-output={total_mb:.1f} MB")
    for name, n in counts.most_common(args.top):
        print(f"  {name:<22} x{n:<5} {sizes[name] / 1e6:9.1f} MB")

    # optimized-HLO view: what actually ships to the device each iteration
    compiled = jax.jit(fwd).lower(params).compile()
    hlo = compiled.as_text()
    import re
    kinds = collections.Counter()
    for m in re.finditer(r"^\s*(?:ROOT )?[%\w.-]+ = \S+ (\w+)\(", hlo,
                         re.M):
        kinds[m.group(1)] += 1
    print(f"optimized HLO: TOTAL instructions={sum(kinds.values())} "
          f"(fusions={kinds.get('fusion', 0)}, "
          f"dots={kinds.get('dot', 0)})")
    for name, n in kinds.most_common(args.top):
        print(f"  {name:<22} x{n}")


if __name__ == "__main__":
    main()
