#!/usr/bin/env python
"""Mosaic compile envelope for the int4 Pallas kernel (r5, HBM-minima
variant): grow (batch, rows) on zero-filled inputs and record
COMPILES+RUNS / FAIL per config, with wall time. This is the recorded
evidence VERDICT r4 item 2 demands for every fence constant in
ops/pallas_int4.py.

Each config calls the BLOCK-MINIMA stage directly (the finish stage is
plain XLA and fenced separately), so a failure is unambiguously the
Mosaic kernel compile.

Usage: python tools/probe_int4_envelope.py [--dim 768] [--configs b:n ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=768)
    p.add_argument(
        "--configs", nargs="+",
        default=["8:1000000", "64:1000000", "8:10000000", "64:4000000",
                 "64:10000000", "256:1000000", "256:4000000"],
    )
    p.add_argument("--manual", default="1")
    args = p.parse_args()

    import os

    os.environ["SVT_PALLAS_INT4_MANUAL"] = args.manual

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sqlite_vector_tpu.ops import pallas_int4
    from sqlite_vector_tpu.ops.quantize4 import packed_width
    from sqlite_vector_tpu.types import DistanceMetric

    dim = args.dim
    pw = packed_width(dim)
    for cfg in args.configs:
        b, n = (int(x) for x in cfg.split(":"))
        b_pad = -(-max(b, 8) // 8) * 8
        log(f"--- b={b} n={n} dim={dim} (b_pad*n = {b_pad*n/1e6:.0f}M) ---")
        pk = jnp.zeros((n, pw), jnp.uint8)
        al = jnp.zeros((n,), jnp.float32)
        cs = jnp.zeros((n,), jnp.int32)
        q = jnp.zeros((b, dim), jnp.float32)
        jax.block_until_ready(pk)
        t0 = time.time()
        try:
            out = pallas_int4._int4_block_minima_manual(
                q, pk, al, cs, jnp.int32(n),
                metric=DistanceMetric.L2, dim=dim, interpret=False,
            ) if args.manual == "1" else pallas_int4._int4_block_minima(
                q, pk, al, cs, jnp.int32(n),
                metric=DistanceMetric.L2, dim=dim, interpret=False,
            )
            np.asarray(out[:1, :1])
            dt = time.time() - t0
            # one timed re-run (executable cached)
            t1 = time.perf_counter()
            out = pallas_int4._int4_block_minima_manual(
                q, pk, al, cs, jnp.int32(n),
                metric=DistanceMetric.L2, dim=dim, interpret=False,
            ) if args.manual == "1" else pallas_int4._int4_block_minima(
                q, pk, al, cs, jnp.int32(n),
                metric=DistanceMetric.L2, dim=dim, interpret=False,
            )
            np.asarray(out[:1, :1])
            rt = time.perf_counter() - t1
            gbs = n * pw / rt / 1e9
            log(f"b={b} n={n}: COMPILES+RUNS (compile {dt:.0f}s, "
                f"run {rt*1e3:.1f} ms = {gbs:.0f} GB/s packed)")
        except Exception as e:
            log(f"b={b} n={n}: FAIL after {time.time()-t0:.0f}s: "
                f"{str(e)[:240]}")
        del pk, al, cs, q


if __name__ == "__main__":
    main()
