#!/usr/bin/env python
"""Large-B*N routing probe (round-3 VERDICT item 2).

Measures the actual routing boundary on hardware: for B in {64, 256, 1024}
x N in {1M, 4M} (f32, dim 384, k=20), times
  (a) the Pallas manual multi-buffered kernel  (O(B*k) footprint),
  (b) the tiled-XLA lax.scan path              (bounded [B, tile] blocks),
  (c) the un-tiled XLA path                    (only where [B, N] f32 fits),
and reports ms/batch + effective matrix GB/s. Data is generated ON DEVICE
(jax.random.normal) — no host->device transfer, so the probe runs even on
slow-tunnel days.

Run: python tools/probe_bn.py [--n 1000000 4000000] [--b 64 256 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, nargs="+", default=[1_000_000, 4_000_000])
    p.add_argument("--b", type=int, nargs="+", default=[64, 256, 1024])
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--paths", nargs="+",
                   default=["pallas", "xla_tiled", "xla_untiled"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops import pallas_scan
    from sqlite_vector_tpu.ops.scan import (
        INTERMEDIATE_BUDGET,
        _auto_row_tile,
        scan_topk,
    )
    from sqlite_vector_tpu.types import DistanceMetric

    dim, k = args.dim, args.k
    metric = DistanceMetric.L2
    print(f"devices={jax.devices()} dim={dim} k={k}", flush=True)

    key = jax.random.PRNGKey(0)

    for n in args.n:
        kb, kq = jax.random.split(jax.random.fold_in(key, n))
        base = jax.random.normal(kb, (n, dim), jnp.float32)
        base.block_until_ready()
        bsq = jax.jit(lambda x: jnp.sum(x * x, axis=-1))(base)
        nbytes = n * dim * 4
        for b in args.b:
            q = jax.random.normal(kq, (b, dim), jnp.float32)
            fits = 4 * b * n <= INTERMEDIATE_BUDGET
            runs = {}
            if "pallas" in args.paths and pallas_scan.supports(
                metric, jnp.float32, dim, k, b, n
            ):
                runs["pallas"] = lambda: pallas_scan.pallas_scan_topk(
                    q, base, metric, k, valid_count=n, interpret=False
                )
            if "xla_tiled" in args.paths:
                tile = _auto_row_tile(n, b, metric)
                if tile < n:  # genuinely tiled
                    runs[f"xla_tiled({tile})"] = (
                        lambda tile=tile: scan_topk(
                            q, base, metric, k, valid_count=n,
                            base_sq_norms=bsq, row_tile=tile,
                        )
                    )
                # a coarser two-level tiling candidate
                tile2 = min(n, max(tile * 4, 262144))
                if tile2 < n and tile2 != tile:
                    runs[f"xla_tiled({tile2})"] = (
                        lambda tile2=tile2: scan_topk(
                            q, base, metric, k, valid_count=n,
                            base_sq_norms=bsq, row_tile=tile2,
                        )
                    )
            if "xla_untiled" in args.paths:
                # force one tile; only safe while [B, N] f32 fits HBM headroom
                if 4 * b * n <= 4 * INTERMEDIATE_BUDGET:
                    runs["xla_untiled"] = lambda: scan_topk(
                        q, base, metric, k, valid_count=n,
                        base_sq_norms=bsq, row_tile=n,
                    )
            for name, fn in runs.items():
                try:
                    t0 = time.time()
                    r = fn()
                    for leaf in jax.tree.leaves(r):
                        np.asarray(leaf)
                    compile_s = time.time() - t0
                    best = 1e9
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        r = fn()
                        for leaf in jax.tree.leaves(r):
                            np.asarray(leaf)
                        best = min(best, time.perf_counter() - t0)
                    print(
                        f"N={n//1000}k B={b:5d} {name:18s} "
                        f"{best*1e3:9.2f} ms  {nbytes/best/1e9:7.1f} GB/s "
                        f"(compile {compile_s:.1f}s, fits_untiled={fits})",
                        flush=True,
                    )
                except Exception as e:
                    print(
                        f"N={n//1000}k B={b:5d} {name:18s} FAILED: "
                        f"{type(e).__name__}: {str(e)[:200]}",
                        flush=True,
                    )
            del q
        del base, bsq


if __name__ == "__main__":
    main()
