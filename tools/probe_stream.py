#!/usr/bin/env python
"""Round-5 probe: the STREAM pallas_scan variant (queries on lanes, minima
streamed to HBM — the restructure that opened pallas_int4's envelope) vs
the XLA scan, across N at fixed batch — ONE upload, device-side slices,
within-run comparisons. Two questions, both per the traceable-fence rule:

  1. --envelope: does the stream kernel COMPILE at batched b_lane*n
     products the manual kernel could not (the r3 crash table)?
  2. head-to-head: where does it WIN, so routing admits exactly that
     pocket (the r5 int4 crossover methodology)?

Usage:
  python tools/probe_stream.py --dtype int8 --dim 768 --batch 8 64 \
      --rows 1000000 4000000 10000000
  python tools/probe_stream.py --dtype f32 --dim 384 --batch 64 256 \
      --rows 1000000 4000000
  python tools/probe_stream.py --envelope --dtype f32 --dim 384
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SVT_PALLAS_VARIANT"] = "stream"

import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--dtype", choices=["f32", "int8"], default="int8")
    p.add_argument("--batch", type=int, nargs="+", default=[8, 64])
    p.add_argument("--rows", type=int, nargs="+",
                   default=[1_000_000, 4_000_000, 10_000_000])
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--chain", type=int, default=4)
    p.add_argument("--envelope", action="store_true",
                   help="compile-and-run-once sweep only (records the "
                   "Mosaic compile envelope for the fence constant)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops import pallas_scan
    from sqlite_vector_tpu.ops.scan import scan_topk
    from sqlite_vector_tpu.types import DistanceMetric

    dim, k, M = args.dim, args.k, args.chain
    metric = DistanceMetric.L2
    rng = np.random.default_rng(7)
    nmax = max(args.rows)

    if args.dtype == "int8":
        log(f"synthetic int8 codes {nmax}x{dim} ...")
        base_full = jax.device_put(
            rng.integers(-128, 128, size=(nmax, dim), dtype=np.int8)
        )
        qdtype = np.int8
    else:
        gb = nmax * dim * 4 / 1e9
        log(f"synthetic f32 rows {nmax}x{dim} ({gb:.1f} GB) ...")
        base_full = jax.device_put(
            rng.standard_normal((nmax, dim)).astype(np.float32)
        )
        qdtype = np.float32
    jax.block_until_ready(base_full)

    def make_query(b):
        if args.dtype == "int8":
            return rng.integers(-128, 128, size=(M, b, dim), dtype=np.int8)
        return rng.standard_normal((M, b, dim)).astype(np.float32)

    def chained(use_stream, n):
        @jax.jit
        def run(qs, base):
            def body(c, q):
                qq = q + c * 0 if args.dtype == "f32" else q
                if use_stream:
                    vals, idx = pallas_scan.pallas_scan_topk(
                        qq, base, metric, k, valid_count=jnp.int32(n),
                        interpret=False,
                    )
                else:
                    vals, idx = scan_topk(
                        qq, base, metric, k, valid_count=jnp.int32(n)
                    )
                carry = vals[0, 0].astype(jnp.float32)
                return carry, (vals[:, 0], idx[:, 0])

            _, outs = jax.lax.scan(body, jnp.float32(0), qs)
            return outs

        return run

    def time_run(fn, fargs):
        out = fn(*fargs)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*fargs)
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf)
            best = min(best, (time.perf_counter() - t0) / M)
        return best

    if args.envelope:
        # compile + run once per config; record COMPILES/FAILS
        for b in args.batch:
            qs = jax.device_put(make_query(b))
            for n in args.rows:
                base = base_full[:n]
                jax.block_until_ready(base)
                b_lane = -(-max(b, 8) // 128) * 128
                tag = f"b={b} n={n} b_lane*n={b_lane * n / 1e6:.0f}M"
                try:
                    t0 = time.perf_counter()
                    out = chained(True, n)(qs, base)
                    for leaf in jax.tree.leaves(out):
                        np.asarray(leaf)
                    log(f"ENVELOPE {tag}: COMPILES+RUNS "
                        f"({time.perf_counter() - t0:.0f}s)")
                except Exception as e:
                    log(f"ENVELOPE {tag}: FAIL {str(e)[:120]}")
        return

    for b in args.batch:
        qs = jax.device_put(make_query(b))
        for n in args.rows:
            base = base_full[:n]
            jax.block_until_ready(base)
            try:
                tp = time_run(chained(True, n), (qs, base))
                msp = f"{tp*1e3:8.2f}"
            except Exception as e:
                tp, msp = None, f"FAIL {str(e)[:60]}"
            try:
                tx = time_run(chained(False, n), (qs, base))
                msx = f"{tx*1e3:8.2f}"
            except Exception as e:
                tx, msx = None, f"FAIL {str(e)[:60]}"
            ratio = f"{tx/tp:5.2f}x" if (tp and tx) else "  n/a"
            log(f"B={b} N={n:>9}: stream {msp} ms | xla {msx} ms | "
                f"xla/stream {ratio}")


if __name__ == "__main__":
    main()
