"""Training-throughput sweep on the TPU: bucket x triplet config x dtype.

Round-2 VERDICT item 7 (NL=80 bucket, the fine-tune stage shape) and the
pallas-default question for training: sampling measurements showed pallas
custom calls are ~3x slower *through the relay* (per-iteration staging);
the training step is one jit call so the relay cost amortizes differently
— measure, don't assume.

Usage: python scripts/bench_train_sweep.py [--configs a,b,...]
Prints one JSON line per config: graphs/sec/chip.
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import numpy as np

CONFIGS = {
    # name: (bucket, batch, use_pallas, triplet_knn, dtype[, fused_stack])
    # round-5 training-throughput ladder (VERDICT r4 item 6): the xla2
    # merged-operand restatement under grad, at the flagship train shapes
    "nl48_b16_knn32_bf16": (48, 16, False, 32, "bfloat16"),
    "nl48_b16_knn32_bf16_xla2": (48, 16, False, 32, "bfloat16", "xla2"),
    "nl48_b16_knn32_bf16_xla": (48, 16, False, 32, "bfloat16", "xla"),
    "nl32_b16_knn32_bf16": (32, 16, False, 32, "bfloat16"),
    "nl32_b16_knn32_bf16_xla2": (32, 16, False, 32, "bfloat16", "xla2"),
    "nl64_b16_knn32_bf16_xla2": (64, 16, False, 32, "bfloat16", "xla2"),
    "nl80_b16_knn32_bf16_xla2": (80, 16, False, 32, "bfloat16", "xla2"),
    "nl80_b8_knn32_bf16_xla2": (80, 8, False, 32, "bfloat16", "xla2"),
    "nl32_xla_f32": (32, 8, False, 0, "float32"),
    "nl32_pallas_f32": (32, 8, True, 0, "float32"),
    "nl32_xla_bf16": (32, 8, False, 0, "bfloat16"),
    "nl32_knn16_bf16": (32, 8, False, 16, "bfloat16"),
    "nl80_xla_f32": (80, 8, False, 0, "float32"),
    "nl80_pallas_f32": (80, 8, True, 0, "float32"),
    "nl80_xla_bf16": (80, 8, False, 0, "bfloat16"),
    "nl80_knn32_f32": (80, 8, False, 32, "float32"),
    "nl80_knn32_bf16": (80, 8, False, 32, "bfloat16"),
    "nl80_knn16_bf16": (80, 8, False, 16, "bfloat16"),
    "nl48_xla_f32": (48, 8, False, 0, "float32"),
    "nl48_xla_bf16": (48, 8, False, 0, "bfloat16"),
    "nl64_xla_f32": (64, 8, False, 0, "float32"),
    "nl64_knn32_bf16": (64, 8, False, 32, "bfloat16"),
}


def bench_one(name, bucket, batch, use_pallas, knn, dtype,
              fused_stack="none", n_steps=12):
    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.train.state import create_train_state
    from phoregen_tpu.train.step import make_train_step

    cfg = default_config("zinc_300")
    cfg.dataset.ligand_buckets = [bucket]
    cfg.dataset.max_phore = 32
    cfg.model.denoiser.use_pallas_triplet = use_pallas
    cfg.model.denoiser.triplet_knn = knn
    cfg.model.denoiser.fused_stack = fused_stack
    cfg.train.dtype = dtype
    cfg.finalize()

    pg = PhoreGen(cfg)
    # reference-max molecules for the 80 bucket (fine-tune stage shape)
    from phoregen_tpu.data.synthetic import synthetic_raw
    rng = np.random.default_rng(0)
    n_at = min(78, bucket - 2)
    samples = [synthetic_raw(rng, "zinc_300", n_atoms=n_at)
               for _ in range(batch * 4)]
    loader = PhoreDataLoader(samples, cfg, batch, shuffle=False)
    batches = list(loader)
    params = pg.init_params(jax.random.PRNGKey(0), batches[0])
    state = create_train_state(cfg.train, params)
    step_fn = make_train_step(pg, cfg, mesh=None, donate=True)

    t0 = time.perf_counter()
    state, m = step_fn(state, np.uint32(0), batches[0])
    jax.block_until_ready(m["loss"])
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(1, n_steps + 1):
        state, m = step_fn(state, np.uint32(i), batches[i % len(batches)])
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    print(json.dumps({
        "config": name, "graphs_per_sec": round(batch / dt, 2),
        "sec_per_step": round(dt, 4), "bucket": bucket, "batch": batch,
        "compile_s": round(t_compile, 1),
        "loss_finite": bool(np.isfinite(float(m["loss"]))),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--platform", default="",
                    help="force platform (env vars are NOT honored here — "
                         "sitecustomize registers the axon plugin first)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    print(f"backend: {jax.default_backend()}", flush=True)
    for name in args.configs.split(","):
        try:
            bench_one(name, *CONFIGS[name], n_steps=args.steps)
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
