"""Round-5 probe (VERDICT r4 item 6): decompose the flagship 1M x 384 f32
scan's device-side floor.

The open question: the r4 headline's device-side 5.45 ms over 1.536 GB is
282 GB/s on the same chip and run that streams 511 GB/s at 10.75 GB
resident. Is the gap (a) a fixed per-scan device cost that amortizes with
data size, or (b) a shape inefficiency at small N*d?

Decomposition (all device-side, M-chained with a loop-carried dependence so
the tunnel RTT stays out):

  dot_min  : the raw streaming floor — [N,d]x[d] matvec + global min
  dist_min : full L2 distance epilogue (norm composition, snap) + min
  full     : fused_scan_topk (distances + hierarchical top-k)

across N in {1M, 2M, 4M} (fixed d=384) and B in {1, 8, 64} at 1M. A linear
fit of `full` over N yields the fixed per-scan intercept; full-vs-dist_min
prices the top-k epilogue; dist_min-vs-dot_min the distance epilogue.

Usage: python tools/probe_f32_floor.py [--dim 384] [--chain 32]
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
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--chain", type=int, default=32)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--rows", type=int, nargs="+",
                   default=[1_048_576, 2_097_152, 4_194_304])
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8, 64])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.scan import fused_scan_topk, scan_distances
    from sqlite_vector_tpu.types import DistanceMetric

    d, k, M = args.dim, args.k, args.chain
    rng = np.random.default_rng(7)
    nmax = max(args.rows)
    log(f"generating + uploading {nmax}x{d} f32 "
        f"({nmax*d*4/1e9:.1f} GB; tunnel-rate) ...")
    base_np = rng.standard_normal((nmax, d)).astype(np.float32)
    dev = jax.device_put(base_np)
    bsq_full = jnp.sum(dev * dev, axis=-1)
    np.asarray(bsq_full[:1])  # sync the upload
    del base_np

    def chain(body):
        @jax.jit
        def run(qs, b, s):
            def step(c, q):
                out = body(q + c * 0, b, s)
                return (
                    jax.tree.leaves(out)[0]
                    .reshape(-1)[0]
                    .astype(jnp.float32),
                    out,
                )

            _, outs = jax.lax.scan(step, jnp.float32(0), qs)
            return outs

        return run

    def timeit(fn, qs, b, s):
        out = fn(qs, b, s)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)  # sync (block_until_ready lies on axon)
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(qs, b, s)
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf)
            best = min(best, (time.perf_counter() - t0) / M)
        return best

    dot_min = chain(
        lambda q, b, s: jnp.min(
            jax.lax.dot_general(
                q, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            axis=-1,
        )
    )
    dist_min = chain(
        lambda q, b, s: jnp.min(
            scan_distances(q, b, DistanceMetric.L2, base_sq_norms=s), axis=-1
        )
    )
    full = chain(
        lambda q, b, s: fused_scan_topk(
            q, b, DistanceMetric.L2, k, base_sq_norms=s
        )
    )

    log(f"\n== N sweep at B=1 (d={d}, k={k}, chain={M}) ==")
    fit_pts = []
    for n in args.rows:
        b = dev[:n]
        s = bsq_full[:n]
        qs = jax.device_put(
            rng.standard_normal((M, 1, d)).astype(np.float32)
        )
        gb = n * d * 4 / 1e9
        td = timeit(dot_min, qs, b, s)
        te = timeit(dist_min, qs, b, s)
        tf = timeit(full, qs, b, s)
        fit_pts.append((n, tf))
        log(f"N={n:>9}: dot+min {td*1e3:7.3f} ms ({gb/td:5.0f} GB/s) | "
            f"dist+min {te*1e3:7.3f} ({gb/te:5.0f}) | "
            f"full {tf*1e3:7.3f} ({gb/tf:5.0f}) | "
            f"topk-epilogue {(tf-te)*1e3:+6.3f} ms, "
            f"dist-epilogue {(te-td)*1e3:+6.3f} ms")

    if len(fit_pts) >= 2:
        ns = np.array([p[0] for p in fit_pts], np.float64)
        ts = np.array([p[1] for p in fit_pts], np.float64)
        slope, intercept = np.polyfit(ns, ts, 1)
        gbs_marginal = d * 4 / slope / 1e9
        log(f"\nlinear fit over N: full = {intercept*1e3:.3f} ms fixed "
            f"+ {slope*1e9:.3f} ns/row (marginal rate "
            f"{gbs_marginal:.0f} GB/s)")

    log(f"\n== B sweep at N={args.rows[0]} ==")
    n = args.rows[0]
    b = dev[:n]
    s = bsq_full[:n]
    gb = n * d * 4 / 1e9
    for bb in args.batches:
        qs = jax.device_put(
            rng.standard_normal((M, bb, d)).astype(np.float32)
        )
        tf = timeit(full, qs, b, s)
        log(f"B={bb:>3}: full {tf*1e3:8.3f} ms/scan "
            f"({tf/bb*1e3:7.3f} ms/q, {gb/tf:5.0f} GB/s)")


if __name__ == "__main__":
    main()
