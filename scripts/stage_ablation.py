"""Per-stage cost attribution of the xla2 fused stack by ablation.

Runs the 6-layer xla2 stack under a 50-iter scan at the bench shape with
each stage selectively no-op'd (monkeypatching module-level flags in
ops/layer_stack is intrusive; instead we time modified copies of
_layer_math_batched). Ablation changes fusion opportunities, so treat the
deltas as attribution bounds, not exact costs.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bucket", type=int, default=32)
    ap.add_argument("--knn", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.ops import layer_stack as ls

    cfg = default_config("zinc_300")
    cfg.dataset.ligand_buckets = [args.bucket]
    cfg.dataset.max_phore = 32
    cfg.model.denoiser.triplet_knn = args.knn
    cfg.model.denoiser.scan_layers = True
    cfg.model.denoiser.fused_stack = "xla2"
    cfg.finalize()
    pg = PhoreGen(cfg)
    samples = synthetic_dataset(0, args.batch, max_atoms=args.bucket - 2)
    batch = next(iter(PhoreDataLoader(samples, cfg, args.batch,
                                      shuffle=False)))
    params = pg.init_params(jax.random.PRNGKey(0), batch)

    dcfg = cfg.model.denoiser
    raw = params["params"]["denoiser"]["layers"]["layer"]
    fe = dcfg.num_r_gaussian * dcfg.edge_feat_dim + dcfg.edge_feat_dim + 9
    packed = ls.pack_layer_params(raw, dcfg.hidden_dim, fe)

    B = args.batch
    NP, NL = 32, args.bucket
    N = NP + NL
    H, heads, Wt = dcfg.hidden_dim, dcfg.n_heads, dcfg.triplet_width
    K = dcfg.knn
    K8 = min(args.knn if args.knn else NL - 1, NL - 1)
    key = jax.random.PRNGKey(1)
    h = jax.random.normal(key, (B, N, H), jnp.float32)
    x = jax.random.normal(key, (B, N, 3), jnp.float32)
    hb = jax.random.normal(key, (B, NL, NL, H), jnp.float32)
    node_mask = jnp.ones((B, N), bool)
    from phoregen_tpu.ops.knn import knn_neighbors
    nbr_idx, nbr_mask = knn_neighbors(x, node_mask, K)
    dims = ls.StackDims(NP=NP, NL=NL, K=K, K8=K8, H=H, heads=heads, Wt=Wt)
    tables = ls.build_block_tables(x, node_mask, nbr_idx, nbr_mask, NP, K8)
    et = jax.nn.one_hot(jax.random.randint(jax.random.PRNGKey(3),
                                           (B, N * K), 0, 4), 4)
    tables["edge_type"] = et.astype(jnp.float32)
    tables["e_w"] = jnp.ones((B, N * K, 1), jnp.float32)
    pn = jax.random.normal(jax.random.PRNGKey(4), (B, NP, 3))
    tables["phore_norm"] = pn / jnp.linalg.norm(pn, axis=-1, keepdims=True)

    orig = ls._layer_math_batched

    def make_variant(skip):
        def fn(w, h, x, hb, t, d):
            nh, xn, hbn = orig(w, h, x, hb, t, d)
            return nh, xn, hbn
        if not skip:
            return orig
        # build an ablated copy by re-executing with pieces stubbed via
        # closures over the original function's building blocks is not
        # possible without editing; instead emulate: stage ablations are
        # implemented in ops/layer_stack._layer_math_batched via the
        # _ABLATE module flag.
        return None

    def run(name, ablate):
        ls._ABLATE_BATCHED = ablate
        def step(carry, _):
            hh, xx, bb = carry
            def body(c, wl):
                return ls._layer_math_batched(wl, *c, tables, dims), None
            (h2, x2, b2), _ = jax.lax.scan(body, (hh, xx, bb), packed)
            return (h2, x2 * 0.999, b2), None
        @jax.jit
        def scan_fn(h, x, hb):
            (h2, x2, b2), _ = jax.lax.scan(step, (h, x, hb), None,
                                           length=args.iters)
            return h2, x2, b2
        r = scan_fn(h, x, hb)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = scan_fn(h, x, hb)
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t0) / args.iters * 1e3)
        print(json.dumps({"ablate": name or "none",
                          "ms_per_iter": round(best, 3)}), flush=True)
        ls._ABLATE_BATCHED = frozenset()
        return best

    full = run("", frozenset())
    for name in ("stageA", "stageB", "stageC", "prefeat", "stageB_att",
                 "stageB_enc"):
        run(name, frozenset([name]))


if __name__ == "__main__":
    main()
