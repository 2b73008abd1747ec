"""Mosaic grid-step overhead microbenchmark (round-5 kernel design probe).

The round-4 clean-chip ladder measured all pallas fused-stack rungs at
~44 ms/iter regardless of dispatch count (46 vs 34 custom calls), i.e.
the cost is inside the kernels. Hypothesis: a large fixed cost per GRID
STEP on this runtime (sequential Mosaic steps x per-step overhead), not
per call. This probe separates:

  (a) per-call overhead:     scan body = K trivial pallas calls, grid=(1,)
  (b) per-grid-step overhead: scan body = 1 call, grid=(G,), trivial step
  (c) in-kernel MXU throughput: 1 call, grid=(G,), one big dot per step

Each row prints ms/scan-iteration. Decides the round-5 fused-stack
architecture (monolith grid shape).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def scan_ms(body, carry, iters=200):
    def f(c):
        out, _ = jax.lax.scan(lambda c, _: (body(c), None), c,
                              None, length=iters)
        return out
    jf = jax.jit(f)
    r = jf(carry)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = jf(carry)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def trivial_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def make_trivial_call(grid, shape):
    # each grid step touches a [8, 128] tile of the output
    def body(x):
        return pl.pallas_call(
            trivial_kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            grid=(grid,),
            in_specs=[pl.BlockSpec((shape[0] // grid, shape[1]),
                                   lambda i: (i, 0))],
            out_specs=pl.BlockSpec((shape[0] // grid, shape[1]),
                                   lambda i: (i, 0)),
        )(x)
    return body


def dot_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32)


def make_dot_call(grid, m, k, n):
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)

    def body(x):
        y = pl.pallas_call(
            dot_kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            grid=(grid,),
            in_specs=[pl.BlockSpec((m // grid, k), lambda i: (i, 0)),
                      pl.BlockSpec((k, n), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((m // grid, n), lambda i: (i, 0)),
        )(x, w)
        # keep carry shape: fold back to [m, k]
        return x + y[:, :k]
    return body


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)
    rows = []

    # (a) per-call overhead: K calls per scan iteration, grid=(1,)
    for ncalls in (1, 2, 4, 8):
        shape = (128, 128)
        call = make_trivial_call(1, shape)

        def body(c, _call=call, _n=ncalls):
            for _ in range(_n):
                c = _call(c)
            return c
        x = jnp.zeros(shape, jnp.float32)
        ms = scan_ms(body, x, args.iters)
        rows.append({"probe": "per_call", "n_calls": ncalls,
                     "ms_per_iter": round(ms, 4)})
        print(json.dumps(rows[-1]), flush=True)

    # (b) per-grid-step overhead: 1 call, G steps, trivial tile work
    for g in (1, 2, 6, 16, 64, 256):
        shape = (8 * g, 128)
        call = make_trivial_call(g, shape)
        x = jnp.zeros(shape, jnp.float32)
        ms = scan_ms(call, x, args.iters)
        rows.append({"probe": "per_grid_step", "grid": g,
                     "ms_per_iter": round(ms, 4)})
        print(json.dumps(rows[-1]), flush=True)

    # (c) MXU throughput in-kernel: one [1024/G,1472]x[1472,512] dot/step
    for g, m, k, n in ((1, 1024, 128, 1536), (6, 1536, 128, 1536),
                       (16, 1024, 128, 1536)):
        call = make_dot_call(g, m, k, n)
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
        ms = scan_ms(call, x, args.iters)
        gf = 2 * m * k * n / 1e9
        rows.append({"probe": "dot", "grid": g, "m": m, "k": k, "n": n,
                     "ms_per_iter": round(ms, 4),
                     "tflops": round(gf / ms, 2)})
        print(json.dumps(rows[-1]), flush=True)

    # XLA reference rows: same dot, no pallas
    for m, k, n in ((1024, 128, 1536),):
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)

        def body(x, _w=w, _k=k):
            return x + (x @ _w)[:, :_k]
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
        ms = scan_ms(body, x, args.iters)
        rows.append({"probe": "xla_dot", "m": m, "k": k, "n": n,
                     "ms_per_iter": round(ms, 4)})
        print(json.dumps(rows[-1]), flush=True)

    with open("/tmp/mosaic_microbench.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
