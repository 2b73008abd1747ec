"""Microbenchmark the sandboxed runtime's per-iteration cost drivers.

Round-2 established: a compiled `lax.scan`'s wall time through the tunneled
TPU runtime scales with the loop body's op content, not its FLOPs. This
script pins the coefficients that decide kernel-engineering strategy:

  (a) per-instruction dispatch cost  - scan bodies of n chained elementwise
      ops on a fixed-size tensor;
  (b) per-byte staging cost          - fixed op count, growing tensor;
  (c) pallas custom-call cost        - trivial kernel, few vs many operands;
  (d) dot_general cost               - matmul-only bodies.

Usage: python scripts/relay_microbench.py [--iters 200]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(body, init, iters, label):
    def run(x):
        return jax.lax.scan(lambda c, _: (body(c), None), x,
                            None, length=iters)[0]
    fn = jax.jit(run)
    out = fn(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(init)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    per_it = dt / iters * 1e3
    print(f"{label:<44} {dt:7.2f}s total  {per_it:8.3f} ms/iter", flush=True)
    return per_it


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    it = args.iters
    print(f"devices: {jax.devices()}", flush=True)

    # (a) instruction count: n dependent elementwise ops on 1 MB
    x0 = jnp.ones((256, 1024), jnp.float32)
    for n_ops in (8, 64, 256):
        def body(c, n=n_ops):
            for i in range(n):
                c = c * 1.000001 + 1e-6
            return c
        timed_scan(body, x0, it, f"(a) {2 * n_ops} eltwise ops, 1MB")

    # (b) bytes: 16 ops on growing tensors
    for mb in (1, 8, 32):
        x = jnp.ones((mb * 256, 1024), jnp.float32)
        def body(c):
            for i in range(8):
                c = c * 1.000001 + 1e-6
            return c
        timed_scan(body, x, it, f"(b) 16 eltwise ops, {mb}MB")

    # (d) matmul-only body
    w = jnp.ones((1024, 1024), jnp.float32)
    xm = jnp.ones((1024, 1024), jnp.float32)
    for n_mm in (1, 8):
        def body(c, n=n_mm):
            for i in range(n):
                c = jnp.tanh(c @ w)
            return c
        timed_scan(body, xm, it, f"(d) {n_mm} matmul(1024^2) + tanh")

    # (c) pallas custom call: trivial copy kernel, 1 vs 32 operands
    try:
        from jax.experimental import pallas as pl

        def copy_kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 1.000001

        @functools.partial(jax.jit)
        def run_one(x):
            f = pl.pallas_call(
                copy_kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))
            return jax.lax.scan(lambda c, _: (f(c), None), x, None,
                                length=it)[0]

        x = jnp.ones((256, 1024), jnp.float32)
        out = run_one(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        jax.block_until_ready(run_one(x))
        dt = time.perf_counter() - t0
        print(f"{'(c) 1 pallas call (1MB), per iter':<44} {dt:7.2f}s total "
              f"{dt / it * 1e3:8.3f} ms/iter", flush=True)

        def many_kernel(*refs):
            ins = refs[:32]
            o_ref = refs[32]
            acc = ins[0][...]
            for r in ins[1:]:
                acc = acc + r[...][:1, :1]  # touch every operand
            o_ref[...] = acc

        ws = [jnp.ones((128, 128), jnp.float32) for _ in range(31)]

        @jax.jit
        def run_many(x):
            f = pl.pallas_call(
                many_kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))
            return jax.lax.scan(lambda c, _: (f(c, *ws), None), x, None,
                                length=it)[0]

        xs = jnp.ones((128, 128), jnp.float32)
        out = run_many(xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        jax.block_until_ready(run_many(xs))
        dt = time.perf_counter() - t0
        print(f"{'(c) 1 pallas call, 32 operands':<44} {dt:7.2f}s total "
              f"{dt / it * 1e3:8.3f} ms/iter", flush=True)
    except Exception as e:
        print(f"(c) pallas microbench failed: {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
