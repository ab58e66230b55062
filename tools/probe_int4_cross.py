#!/usr/bin/env python
"""Round-5 routing probe: int4 Pallas vs XLA tile loop across N at fixed
batch — ONE upload, device-side slices, within-run comparisons. The r5
smoke run showed the Pallas kernel losing at B=64 x 500k while winning
1.22-1.55x at B=64 x 10M: this measures the crossover so routing can send
small-N batched scans to the XLA loop by evidence, not vibes.

Usage: python tools/probe_int4_cross.py [--dim 768] [--batch 64]
           [--rows 500000 1000000 2000000 4000000 10000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--batch", type=int, nargs="+", default=[8, 64])
    p.add_argument("--rows", type=int, nargs="+",
                   default=[500_000, 1_000_000, 2_000_000, 4_000_000,
                            10_000_000])
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--chain", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops import pallas_int4
    from sqlite_vector_tpu.ops import quantize4 as q4
    from sqlite_vector_tpu.types import DistanceMetric

    dim, k, M = args.dim, args.k, args.chain
    pw = q4.packed_width(dim)
    nmax = max(args.rows)
    rng = np.random.default_rng(7)
    metric = DistanceMetric.L2

    log(f"synthetic packed codes {nmax}x{pw} (int4) ...")
    pk_full = jax.device_put(
        rng.integers(0, 256, size=(nmax, pw), dtype=np.uint8)
    )
    al_full = jax.device_put(
        (0.02 + 0.01 * rng.random(nmax)).astype(np.float32)
    )
    cs_full = jax.device_put(
        rng.integers(1, 49 * dim, size=(nmax,), dtype=np.int32)
    )
    jax.block_until_ready(cs_full)

    def chained(force_xla, n):
        @jax.jit
        def run(qs, pk, al, cs):
            def body(c, q):
                if force_xla:
                    vals, idx = q4._int4_scan_topk_impl(
                        q + c * 0, pk, al, cs,
                        jnp.int32(n), jnp.zeros((0,), bool),
                        metric=metric, k=k, dim=dim,
                        row_tile=q4.INT4_ROW_TILE, has_mask=False,
                    )
                else:
                    vals, idx = pallas_int4.pallas_int4_scan_topk(
                        q + c * 0, pk, al, cs, metric, k, dim=dim,
                        interpret=False,
                    )
                return vals[0, 0], (vals[:, 0], idx[:, 0])

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

    for b in args.batch:
        qs_dev = jax.device_put(
            rng.standard_normal((M, b, dim)).astype(np.float32)
        )
        for n in args.rows:
            pk = pk_full[:n]
            al = al_full[:n]
            cs = cs_full[:n]
            jax.block_until_ready(pk)
            try:
                tp = time_run(chained(False, n), (qs_dev, pk, al, cs))
                msp = f"{tp*1e3:8.2f}"
            except Exception as e:
                tp, msp = None, f"FAIL {str(e)[:60]}"
            try:
                tx = time_run(chained(True, n), (qs_dev, pk, al, cs))
                msx = f"{tx*1e3:8.2f}"
            except Exception as e:
                tx, msx = None, f"FAIL {str(e)[:60]}"
            ratio = f"{tx/tp:5.2f}x" if (tp and tx) else "  n/a"
            log(f"B={b} N={n:>9}: pallas {msp} ms | xla {msx} ms | "
                f"xla/pallas {ratio}")


if __name__ == "__main__":
    main()
