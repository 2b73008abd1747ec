"""FLOPs/step + MFU accounting for the flagship train step and sampler
forward (VERDICT round-3 item 7: 'nothing estimates what the chip should
do, so there is no way to say whether training is also 1%-utilized').

Uses XLA's own post-optimization cost analysis (`compiled.cost_analysis()
['flops']`) on the jitted programs, so the count reflects the fused
program actually dispatched, not a hand model. Run on any platform (CPU
gives the same algorithmic count); pass measured throughputs to get MFU
against the v5e peak.

  python scripts/mfu.py                          # FLOP counts only
  MEASURED_TRAIN_GPS=51.4 MEASURED_SAMPLE_MOLPS=1.068 \
      python scripts/mfu.py                      # + MFU columns

Output: one JSON line per program. Reference hot paths being priced:
training `run/run.py:106-156`, sampling `models/diffusion.py:432-517`.
"""
from __future__ import annotations

import json
import os
import sys

# FORCE the CPU platform: the FLOP count is platform-invariant and this
# must never race another process for the sandbox's single TPU claim
# (setdefault is not enough — the sandbox pins JAX_PLATFORMS=axon)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

# the env var alone is NOT enough: the sandbox's sitecustomize registers
# the axon plugin and pins jax_platforms via config BEFORE this module
# runs, and explicit config beats env (observed: a 25-min dead-chip claim
# from this very script). The config update is the authoritative override.
jax.config.update("jax_platforms", "cpu")

import numpy as np

# v5e peak dense matmul throughput (per chip)
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 49.2e12}


def flagship_cfg(knn: int, dtype: str, bucket: int, fused: str = "none"):
    from phoregen_tpu.config import default_config
    cfg = default_config("zinc_300")
    cfg.dataset.ligand_buckets = [bucket]
    cfg.dataset.max_phore = 32
    cfg.model.denoiser.triplet_knn = knn
    cfg.model.compute_dtype = dtype
    cfg.model.denoiser.fused_stack = fused
    return cfg


def example(cfg, batch_size: int):
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    samples = synthetic_dataset(0, batch_size, max_atoms=30)
    return next(iter(PhoreDataLoader(samples, cfg, batch_size,
                                     shuffle=False)))


def cost(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main():
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.sample.sampler import Sampler

    rows = []

    # ---- training step (loss+grad; fwd+bwd), flagship mixed-bucket shape
    B_train = 16
    cfg = flagship_cfg(knn=32, dtype="bfloat16", bucket=48)
    pg = PhoreGen(cfg)
    batch = example(cfg, B_train)
    key = jax.random.PRNGKey(0)
    params = pg.init_params(key, batch)

    def train_fwd_bwd(p, k, b):
        loss, _ = pg.compute_loss(p, k, b)
        return loss

    g = jax.value_and_grad(train_fwd_bwd)
    fl = cost(g, params, key, batch)
    rows.append({"program": "train_fwd_bwd", "batch": B_train,
                 "bucket": 48, "knn": 32, "dtype": "bfloat16",
                 "flops_per_step": fl,
                 "flops_per_graph": fl / B_train})

    # ---- sampling denoiser forward, bench shape (B=16, NL=NP=32, knn8)
    B_s = 16
    cfg_s = flagship_cfg(knn=8, dtype="float32", bucket=32)
    pg_s = PhoreGen(cfg_s)
    batch_s = example(cfg_s, B_s)
    params_s = pg_s.init_params(key, batch_s)
    from phoregen_tpu.constants import NUM_ATOM_CLASSES, NUM_BOND_CLASSES
    NL = batch_s.lig_type.shape[1]
    rng = np.random.default_rng(0)
    h_node = jax.numpy.asarray(
        rng.normal(size=(B_s, NL, NUM_ATOM_CLASSES)), jax.numpy.float32)
    h_edge = jax.numpy.asarray(
        rng.normal(size=(B_s, NL, NL, NUM_BOND_CLASSES)), jax.numpy.float32)
    t = jax.numpy.zeros((B_s,), jax.numpy.int32)

    def fwd(p):
        return pg_s.net.apply(p, h_node, batch_s.lig_pos, batch_s.lig_mask,
                              h_edge, t, batch_s.phore_x, batch_s.phore_pos,
                              batch_s.phore_norm, batch_s.phore_mask)

    fl_f = cost(fwd, params_s)
    rows.append({"program": "sample_forward", "batch": B_s, "bucket": 32,
                 "knn": 8, "dtype": "float32", "flops_per_step": fl_f,
                 "flops_per_1000step_mol": fl_f * 1000 / B_s})

    # ---- MFU from measured throughputs (optional)
    gps = float(os.environ.get("MEASURED_TRAIN_GPS", "0"))
    if gps > 0:
        achieved = rows[0]["flops_per_graph"] * gps
        rows[0]["measured_graphs_per_sec"] = gps
        rows[0]["achieved_flops"] = achieved
        rows[0]["mfu_vs_bf16_peak"] = achieved / PEAK_FLOPS["bfloat16"]
    molps = float(os.environ.get("MEASURED_SAMPLE_MOLPS", "0"))
    if molps > 0:
        achieved = rows[1]["flops_per_1000step_mol"] * molps
        rows[1]["measured_mol_per_sec"] = molps
        rows[1]["achieved_flops"] = achieved
        rows[1]["mfu_vs_f32_peak"] = achieved / PEAK_FLOPS["float32"]

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
