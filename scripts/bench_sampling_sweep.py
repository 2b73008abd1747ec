"""Sampling-throughput sweep on the TPU: pallas x triplet_knn x batch.

Round-2 lever hunt (VERDICT item 1): measures molecules/sec/chip for the
1000-step sampler under candidate configs so the fastest *defensible* one
can be promoted into bench.py. Run directly on the relay TPU.

Usage: python scripts/bench_sampling_sweep.py [--configs name1,name2]
"""
from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import numpy as np

CONFIGS = {
    # name: (use_pallas, triplet_knn, batch, compute_dtype, chunk)
    "exact_xla": (False, 0, 16, "float32", 0),
    "exact_pallas": (True, 0, 16, "float32", 0),
    "knn16": (False, 16, 16, "float32", 0),
    "knn8": (False, 8, 16, "float32", 0),
    "exact_pallas_bf16": (True, 0, 16, "bfloat16", 0),
    "knn16_bf16": (False, 16, 16, "bfloat16", 0),
    # round-2 finding: the relay kills single executions past ~1 min (what
    # round 1 recorded as a "B>=32 relay fault", and what the 1000-step
    # pallas run hits at ~80 s). Chunked sampling (Sampler.sample_chunked,
    # identical math/PRNG) keeps each device call under the cap, which
    # unlocks batch as the throughput lever.
    "xla_b32_c250": (False, 0, 32, "float32", 250),
    "xla_b64_c250": (False, 0, 64, "float32", 250),
    "xla_b128_c125": (False, 0, 128, "float32", 125),
    "xla_b256_c125": (False, 0, 256, "float32", 125),
    "xla_b512_c50": (False, 0, 512, "float32", 50),
    "pallas_b16_c250": (True, 0, 16, "float32", 250),
    "pallas_b64_c250": (True, 0, 64, "float32", 250),
    "bf16_b64_c250": (False, 0, 64, "bfloat16", 250),
    "bf16_b256_c125": (False, 0, 256, "bfloat16", 125),
    "bf16_b512_c50": (False, 0, 512, "bfloat16", 50),
    # measured: relay per-iteration staging scales with per-step bytes
    # (B=32 chunked is 0.334 mol/s vs 0.478 at B=16), so the lever is byte
    # REDUCTION at fixed B, not batch: bf16 halves activation bytes, the
    # Pallas kernel keeps the O(N^3) pool out of HBM, knn shrinks grids.
    "bf16_b16_c250": (False, 0, 16, "bfloat16", 250),
    "pallas_bf16_b16_c250": (True, 0, 16, "bfloat16", 250),
    "knn8_bf16_b16": (False, 8, 16, "bfloat16", 0),
    "knn16_bf16_b16": (False, 16, 16, "bfloat16", 0),
    # relay cost-model probes: measured per-iteration overhead is neither
    # pure per-byte (bf16 neutral) nor pure per-op (knn8 gives 2x), and
    # pallas custom calls are 3x slower — probe the floor with a 1-layer
    # body and the inner layer-scan unrolled
    "knn8_L1": (False, 8, 16, "float32", 0, {"num_layers": 1}),
    "knn8_noscan": (False, 8, 16, "float32", 0, {"scan_layers": False}),
    "knn16_f32": (False, 16, 16, "float32", 0),
    # triplet_pool_follow_dtype (default on) lets the kNN pool run bf16:
    # re-measure the bf16 configs with the pool actually following
    "knn8_bf16_pool": (False, 8, 16, "bfloat16", 0),
    "knn8_noscan_bf16_pool": (False, 8, 16, "bfloat16", 0,
                              {"scan_layers": False}),
    "knn16_bf16_pool": (False, 16, 16, "bfloat16", 0),
    # batch sensitivity around the best config (per-iteration cost is
    # superlinear in B, so the optimum may sit below 16)
    "knn8_noscan_b8": (False, 8, 8, "float32", 0, {"scan_layers": False}),
    "knn8_noscan_b24": (False, 8, 24, "float32", 0, {"scan_layers": False}),
    # realistic pharmacophore size (testset mean ~93 points) on the
    # promoted config
    "knn8_noscan_np96": (False, 8, 16, "float32", 0,
                         {"scan_layers": False, "max_phore": 96}),
    # strided sampling on the promoted config (exact multi-step posteriors)
    "knn8_noscan_s100": (False, 8, 16, "float32", 0,
                         {"scan_layers": False, "sample_steps": 100}),
    "knn8_noscan_s250": (False, 8, 16, "float32", 0,
                         {"scan_layers": False, "sample_steps": 250}),
}


def bench_one(name, use_pallas, knn, batch_size, dtype, chunk, extra=None,
              n_iters=2):
    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.sample.sampler import Sampler

    cfg = default_config("zinc_300")
    cfg.dataset.ligand_buckets = [32]
    cfg.dataset.max_phore = 32
    cfg.model.denoiser.use_pallas_triplet = use_pallas
    cfg.model.denoiser.triplet_knn = knn
    cfg.model.compute_dtype = dtype
    for k, v in (extra or {}).items():
        if k == "max_phore":
            cfg.dataset.max_phore = v
        else:
            setattr(cfg.model.denoiser, k, v)

    extra = dict(extra or {})
    sample_steps = extra.pop("sample_steps", 0)
    pg = PhoreGen(cfg)
    samples = synthetic_dataset(0, batch_size, max_atoms=30)
    loader = PhoreDataLoader(samples, cfg, batch_size, shuffle=False)
    batch = next(iter(loader))
    key = jax.random.PRNGKey(0)
    params = pg.init_params(key, batch)
    sampler = Sampler(pg, sample_steps=sample_steps)
    if chunk > 0:
        run = lambda p, k, b: sampler.sample_chunked(p, k, b, chunk)
    else:
        run = jax.jit(lambda p, k, b: sampler.sample(p, k, b))

    t0 = time.perf_counter()
    out = run(params, key, batch)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(n_iters):
        out = run(params, jax.random.PRNGKey(i + 1), batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    ok = bool(np.isfinite(np.asarray(out["pred_pos"])).all())
    print(json.dumps({
        "config": name, "mol_per_sec": round(batch_size / dt, 3),
        "sec_per_batch": round(dt, 2), "batch": batch_size, "chunk": chunk,
        "compile_s": round(t_compile, 1), "finite": ok,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--platform", default="",
                    help="force platform (env vars are NOT honored here — "
                         "sitecustomize registers the axon plugin first)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    print(f"backend: {jax.default_backend()}", flush=True)
    for name in args.configs.split(","):
        spec = CONFIGS[name]
        use_pallas, knn, b, dt, chunk = spec[:5]
        extra = spec[5] if len(spec) > 5 else None
        try:
            bench_one(name, use_pallas, knn, b, dt, chunk, extra, args.iters)
        except Exception as e:
            print(json.dumps({"config": name,
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
