"""Round-5 scan-body cost-model probe (decides the sampler perf roadmap).

The mosaic microbench (scripts/mosaic_microbench.py, run 2026-08-19 on a
clean v5e) showed trivial pallas calls and grid steps are ~1-2 us/iter —
NOT the 40-50 us/thunk the round-4 ladder arithmetic assumed — while a
single [1024,128]x[128,1536] dot in a scan body costs ~0.27 ms/iter on
BOTH the pallas and XLA paths (~30x its FLOP+HBM cost). This probe fits
the real per-iteration cost model:

  ms/iter = floor + n_dots * per_dot(size) + bytes * bw

by sweeping (a) eltwise-only bodies, (b) n sequential dots of fixed
size, (c) dot-size sweep at n=1, (d) n independent (parallel) dots,
(e) mixed eltwise+dot bodies.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp


def scan_ms(body, carry, iters=100):
    def f(c):
        out, _ = jax.lax.scan(lambda c, _: (body(c), None), c,
                              None, length=iters)
        return out
    jf = jax.jit(f)
    r = jf(carry)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = jf(carry)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def emit(row):
    print(json.dumps(row), flush=True)
    ROWS.append(row)


ROWS = []


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)

    # (a) eltwise-only floor: n chained multiply-adds on a [16,64,128] buf
    x0 = jax.random.normal(key, (16, 64, 128), jnp.float32)
    for n in (1, 16, 64):
        def body(c, _n=n):
            for i in range(_n):
                c = c * 1.0001 + 0.001
            return c
        emit({"probe": "eltwise", "n_ops": n,
              "ms": round(scan_ms(body, x0), 4)})

    # (b) n sequential (chained) dots, square [d,d]
    for d in (128, 256, 512):
        w = jax.random.normal(jax.random.PRNGKey(1), (d, d), jnp.float32)
        xc = jax.random.normal(key, (d, d), jnp.float32)
        for n in (1, 2, 4, 8, 16):
            def body(c, _n=n, _w=w):
                for i in range(_n):
                    c = c @ _w
                return c
            ms = scan_ms(body, xc)
            emit({"probe": "seq_dots", "d": d, "n": n, "ms": round(ms, 4),
                  "ms_per_dot": round(ms / n, 4)})

    # (d) n independent dots (one fused output) — can the core overlap?
    d = 256
    w = jax.random.normal(jax.random.PRNGKey(1), (d, d), jnp.float32)
    xc = jax.random.normal(key, (d, d), jnp.float32)
    for n in (1, 2, 4, 8, 16):
        def body(c, _n=n, _w=w):
            acc = 0.0
            for i in range(_n):
                acc = acc + (c + float(i)) @ _w
            return acc / _n
        ms = scan_ms(body, xc)
        emit({"probe": "indep_dots", "d": d, "n": n, "ms": round(ms, 4),
              "ms_per_dot": round(ms / n, 4)})

    # (c) single-dot size sweep [m,k]x[k,n]
    for m, k, n in ((8, 128, 128), (64, 128, 128), (512, 128, 128),
                    (512, 128, 512), (1024, 128, 1536), (2048, 256, 2048),
                    (4096, 512, 4096)):
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
        xc = jax.random.normal(key, (m, k), jnp.float32)
        def body(c, _w=w, _k=k):
            return c + (c @ _w)[:, :_k]
        ms = scan_ms(body, xc)
        gf = 2 * m * k * n / 1e9
        emit({"probe": "dot_size", "m": m, "k": k, "n": n,
              "ms": round(ms, 4), "tflops": round(gf / ms, 3)})

    # (e) big-batch eltwise: HBM bandwidth check ([16,64,128] -> [1024,64,128])
    for b in (16, 256, 1024):
        xb = jax.random.normal(key, (b, 64, 128), jnp.float32)
        def body(c):
            return c * 1.0001 + 0.001
        ms = scan_ms(body, xb)
        mb = b * 64 * 128 * 4 * 2 / 1e6  # read+write
        emit({"probe": "eltwise_bw", "batch": b, "ms": round(ms, 4),
              "gbps": round(mb / ms, 1)})

    with open("/tmp/scan_cost_probe.json", "w") as f:
        json.dump(ROWS, f, indent=1)


if __name__ == "__main__":
    main()
