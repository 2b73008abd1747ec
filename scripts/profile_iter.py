"""Decompose the sampling-iteration cost (round-4 perf ladder).

One chip client, several timed sub-programs at the bench shape, so the
ladder targets the right component (reference hot loop:
`/root/reference/models/uni_denoiser.py:260-298` x 1000 steps):

  full      — whole denoiser forward (net.apply), fused_stack as given
  stack     — layer_stack_xla alone (6 layers, packed weights)
  tables    — build_block_tables alone (per-iter kNN rebuild + grids)
  scan50    — the stack under lax.scan x50 (amortized per-iter cost)

Usage: python scripts/profile_iter.py [--batch 16] [--knn 8]
       [--dtype float32] [--stack_dtype float32]
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


def timeit(fn, *a, reps=20, label=""):
    import jax
    try:
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
    except Exception as e:  # keep later probes alive
        print(json.dumps({"part": label,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
        return float("nan")
    print(json.dumps({"part": label, "ms": round(ms, 3)}), flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bucket", type=int, default=32)
    ap.add_argument("--knn", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--stack_dtype", default="float32",
                    help="dtype for the standalone stack probes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phoregen_tpu.config import default_config
    from phoregen_tpu.constants import NUM_ATOM_CLASSES, NUM_BOND_CLASSES
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.ops import layer_stack as ls

    cfg = default_config("zinc_300")
    cfg.dataset.ligand_buckets = [args.bucket]
    cfg.dataset.max_phore = 32
    cfg.model.denoiser.triplet_knn = args.knn
    cfg.model.denoiser.scan_layers = True
    cfg.model.denoiser.fused_stack = "xla"
    cfg.model.denoiser.edge_mlp_apply = "split"
    cfg.model.compute_dtype = args.dtype
    cfg.finalize()
    pg = PhoreGen(cfg)
    samples = synthetic_dataset(0, args.batch,
                                max_atoms=min(30, args.bucket - 2))
    batch = next(iter(PhoreDataLoader(samples, cfg, args.batch,
                                      shuffle=False)))
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    B, NL = batch.lig_type.shape
    rng = np.random.default_rng(0)
    h_node = jnp.asarray(rng.normal(size=(B, NL, NUM_ATOM_CLASSES)),
                         jnp.float32)
    h_edge = jnp.asarray(rng.normal(size=(B, NL, NL, NUM_BOND_CLASSES)),
                         jnp.float32)
    t_b = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def full(pos):
        return pg.net.apply(params, h_node, pos, batch.lig_mask, h_edge,
                            t_b, batch.phore_x, batch.phore_pos,
                            batch.phore_norm, batch.phore_mask)[1]

    timeit(full, batch.lig_pos, label="full")

    # ---- standalone stack at denoiser shapes ---------------------------
    den = cfg.model.denoiser
    H, heads, Wt = den.hidden_dim, den.n_heads, den.triplet_width
    NP = 32
    N = NP + NL
    K = den.knn
    dims = ls.StackDims(NP=NP, NL=NL, K=K, K8=args.knn, H=H, heads=heads,
                        Wt=Wt)
    sdt = jnp.bfloat16 if args.stack_dtype == "bfloat16" else jnp.float32
    raw = params["params"]["denoiser"]["layers"]["layer"]
    fe = den.num_r_gaussian * den.edge_feat_dim + den.edge_feat_dim + 9
    packed = ls.pack_layer_params(raw, H, fe)
    x0 = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    nmask = jnp.ones((B, N), bool)
    h0 = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    hb0 = jnp.asarray(rng.normal(size=(B, NL, NL, H)), jnp.float32)
    nbr_idx = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, None],
                       (B, N, 1))
    nbr_mask = jnp.ones((B, N, K), bool)

    @jax.jit
    def tables_fn(x):
        t = ls.build_block_tables(x, nmask, nbr_idx, nbr_mask, NP, args.knn)
        t["edge_type"] = jnp.zeros((B, N * K, 4), jnp.float32)
        t["e_w"] = jnp.ones((B, N * K, 1), jnp.float32)
        t["phore_norm"] = jnp.zeros((B, NP, 3), jnp.float32)
        return t

    timeit(tables_fn, x0, label="tables")
    tbl = tables_fn(x0)

    @jax.jit
    def stack_fn(h, x, hb):
        return ls.layer_stack_xla(
            jax.tree.map(lambda a: a.astype(sdt), packed),
            h.astype(sdt), x.astype(sdt), hb.astype(sdt),
            jax.tree.map(
                lambda a: a.astype(sdt)
                if a.dtype == jnp.float32 else a, tbl),
            dims)

    timeit(stack_fn, h0, x0, hb0, label=f"stack[{args.stack_dtype}]")

    @jax.jit
    def scan50(h, x, hb):
        def body(c, _):
            h_, x_, hb_ = stack_fn.__wrapped__(c[0], c[1], c[2])
            return (h_.astype(jnp.float32), x_.astype(jnp.float32),
                    hb_.astype(jnp.float32)), None
        (h_, x_, hb_), _ = jax.lax.scan(body, (h, x, hb), None, length=50)
        return x_

    ms = timeit(scan50, h0, x0, hb0, label="scan50_total")
    print(json.dumps({"part": f"stack_amortized[{args.stack_dtype}]",
                      "ms": round(ms / 50, 3)}), flush=True)


if __name__ == "__main__":
    main()
