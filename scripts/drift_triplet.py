"""Numerics experiment: triplet-pool drift vs a float64 host reference.

Round-1 recorded 0.0371 max-abs drift between the Pallas kernel and the XLA
path on TPU and attributed it to kernel fast-math. This script measures BOTH
TPU paths against an independent float64 numpy implementation of the same
math, so the drift is attributed to the right producer before the kernel is
promoted to default (VERDICT round 1, item 1i).

Run on the TPU:   python scripts/drift_triplet.py
Run on CPU mesh:  python scripts/drift_triplet.py --platform cpu
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def np_reference(a_kj, a_ji, q, pos, mask, w_ang, ln_s, ln_b, norm=True,
                 num_ang_funcs=3):
    """float64 numpy mirror of triplet_pool_xla (relu activation)."""
    a_kj, a_ji, q, pos, w_ang, ln_s, ln_b = [
        np.asarray(x, np.float64) for x in
        (a_kj, a_ji, q, pos, w_ang, ln_s, ln_b)]
    mask = np.asarray(mask, bool)
    B, N, _, Wt = a_kj.shape
    heads = q.shape[-2]
    freq = np.asarray(
        [i + 1 for i in range(num_ang_funcs)]
        + [1.0 / (i + 1) for i in range(num_ang_funcs)], np.float64)

    rel = pos[:, :, None, :] - pos[:, None, :, :]
    dot = np.einsum("bjic,bkic->bjki", rel, rel)
    nsq = np.sum(rel * rel, axis=-1)
    cross = np.sqrt(np.clip(
        nsq[:, :, None, :] * nsq[:, None, :, :] - dot * dot, 0.0, None))
    angle = np.arctan2(cross, dot)
    a = angle[..., None]
    enc = np.concatenate([a, np.sin(a * freq), np.cos(a * freq)], axis=-1)
    a_ang = enc @ w_ang

    pre = (a_kj[:, :, :, None, :] + a_ji[:, None, :, :, :]
           + a_ang.transpose(0, 2, 1, 3, 4))
    if norm:
        mu = pre.mean(-1, keepdims=True)
        var = ((pre - mu) ** 2).mean(-1, keepdims=True)
        pre = (pre - mu) / np.sqrt(var + 1e-6) * ln_s + ln_b
    pre = np.maximum(pre, 0.0)

    scores = np.einsum("bkjiw,bjihw->bkjih", pre, q) / np.sqrt(Wt)
    m = mask
    valid = (m[:, :, None, None] & m[:, None, :, None] & m[:, None, None, :])
    idx = np.arange(N)
    neq = ((idx[:, None, None] != idx[None, :, None])
           & (idx[None, :, None] != idx[None, None, :])
           & (idx[:, None, None] != idx[None, None, :]))
    tri = valid & neq[None]
    scores = np.where(tri[..., None], scores, -1e9)
    e = np.exp(scores - scores.max(1, keepdims=True)) * tri[..., None]
    alpha = e / np.maximum(e.sum(1, keepdims=True), 1e-30)
    pooled = np.einsum("bkjih,bkjiw->bjihw", alpha, pre)
    return pooled.reshape(B, N, N, heads * Wt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--Wt", type=int, default=32)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--B", type=int, default=2)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from flax import linen as nn

    sys.path.insert(0, ".")
    from phoregen_tpu.ops.pallas_triplet import (triplet_pool_pallas,
                                                 triplet_pool_xla)

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    B, N, Wt, heads = args.B, args.N, args.Wt, args.heads
    a_kj = rng.normal(size=(B, N, N, Wt)).astype(np.float32)
    a_ji = rng.normal(size=(B, N, N, Wt)).astype(np.float32)
    q = rng.normal(size=(B, N, N, heads, Wt)).astype(np.float32)
    pos = (rng.normal(size=(B, N, 3)) * 3).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[0, -5:] = False
    w_ang = (rng.normal(size=(13, Wt)) * 0.3).astype(np.float32)
    ln_s = rng.uniform(0.5, 1.5, Wt).astype(np.float32)
    ln_b = (rng.normal(size=Wt) * 0.1).astype(np.float32)

    ref = np_reference(a_kj, a_ji, q, pos, mask, w_ang, ln_s, ln_b)
    scale = np.abs(ref).max()
    print(f"reference max |out| = {scale:.3f}")

    jargs = [jnp.asarray(x) for x in
             (a_kj, a_ji, q, pos, mask, w_ang, ln_s, ln_b)]

    def report(name, fn):
        out = np.asarray(jax.jit(fn)(*jargs))
        d = np.abs(out - ref)
        print(f"{name:28s} max-abs {d.max():.3e}   "
              f"p99.9 {np.quantile(d, 0.999):.3e}")

    report("xla path", lambda *a: triplet_pool_xla(
        *a, act=nn.relu, norm=True))
    interpret = jax.default_backend() not in ("tpu",)
    report(f"pallas (interpret={interpret})", lambda *a: triplet_pool_pallas(
        *a, act=nn.relu, norm=True, interpret=interpret))


if __name__ == "__main__":
    main()
