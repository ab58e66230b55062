#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json north star): single-query QPS of the exact
FLOAT32 L2 top-20 full scan over 1M x 384 vectors — the
examples/semantic_search workload of the reference.

vs_baseline compares against the compiled C reference (sqliteai/sqlite-vector
v0.9.23, AVX2 backend) measured on this container's CPU with the same data
shape (see BASELINE.md "measured" table):
    exact full scan   1M x 384: 648.1 ms/query   (1.54 QPS)
    quantized+preload 1M x 384: 156.7 ms/query   (6.38 QPS)

Extra diagnostics (quantized scan, batched throughput, GB/s vs HBM roofline)
go to stderr.
"""

import argparse
import json
import sys
import time

import numpy as np

# C reference measured on this host (BASELINE.md), 1M x 384 f32 L2 top-20.
REFERENCE_EXACT_MS = 648.1
REFERENCE_QUANT_MS = 156.7


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def median_time(fn, iters: int) -> float:
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--quick", action="store_true", help="20k rows (CI smoke)")
    args = p.parse_args()
    if args.quick:
        args.n, args.iters = 20_000, 5

    import jax

    import sqlite_vector_tpu as svt

    log(f"backend={svt.backend()} devices={jax.devices()}")
    rng = np.random.default_rng(7)
    data = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    queries = data[rng.integers(0, args.n, 64)]

    t0 = time.time()
    store = svt.VectorStore()
    ds = store.create(
        "bench", f"dimension={args.dim},type=FLOAT32,distance=L2"
    )
    ds.add(data)
    log(f"ingest {args.n}x{args.dim}: {time.time() - t0:.1f}s "
        f"({data.nbytes / 1e9:.2f} GB)")

    # exact scan, single query (the reference's unit of work)
    qi = iter(range(10**9))

    def one_exact():
        q = queries[next(qi) % len(queries)]
        ids, dist = ds.search(q, args.k)
        assert len(ids) == args.k

    t0 = time.time()
    one_exact()  # compile
    log(f"exact first call (compile): {time.time() - t0:.1f}s")
    exact_s = median_time(one_exact, args.iters)
    exact_qps = 1.0 / exact_s
    scan_gbs = data.nbytes / exact_s / 1e9
    log(f"exact 1-query: {exact_s * 1000:.3f} ms -> {exact_qps:.1f} QPS, "
        f"{scan_gbs:.0f} GB/s scanned")

    # batched exact throughput
    def batch_exact():
        ids, dist = ds.search(queries, args.k)

    t0 = time.time()
    batch_exact()
    log(f"batch first call (compile): {time.time() - t0:.1f}s")
    batch_s = median_time(batch_exact, max(args.iters // 2, 3))
    log(f"exact B=64: {batch_s * 1000:.3f} ms -> {64 / batch_s:.0f} QPS")

    # quantized scan
    t0 = time.time()
    ds.quantize()
    log(f"quantize build: {time.time() - t0:.1f}s")

    def one_quant():
        q = queries[next(qi) % len(queries)]
        ids, dist = ds.search(q, args.k, exact=False)
        assert len(ids) == args.k

    t0 = time.time()
    one_quant()
    log(f"quant first call (compile): {time.time() - t0:.1f}s")
    quant_s = median_time(one_quant, args.iters)
    log(f"quant 1-query: {quant_s * 1000:.3f} ms -> {1 / quant_s:.1f} QPS, "
        f"{args.n * args.dim / quant_s / 1e9:.0f} GB/s scanned")

    # device-side amortized scan time (dispatch/sync overhead removed):
    # chain M scans in one executable — the serving-throughput number
    import functools

    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.scan import fused_scan_topk
    from sqlite_vector_tpu.types import DistanceMetric

    M = 32
    qs_dev = jax.device_put(queries[:M][:, None, :])
    base_dev = ds._vectors
    bsq = ds._exact_sq_norms()

    @functools.partial(jax.jit, static_argnames=())
    def chained(qs, b, sq):
        def body(c, q):
            vals, idx = fused_scan_topk(
                q, b, DistanceMetric.L2, args.k,
                valid_count=args.n, base_sq_norms=sq,
            )
            return c, (vals[0], idx[0])
        _, outs = jax.lax.scan(body, jnp.float32(0), qs)
        return outs

    def run_chained():
        # device->host fetch as the sync point: block_until_ready does not
        # reliably synchronize on tunneled backends (verify SKILL.md)
        out = chained(qs_dev, base_dev, bsq)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)

    t0 = time.time()
    run_chained()
    log(f"chained first call (compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        run_chained()
    dev_s = (time.time() - t0) / reps / M
    log(f"device-side amortized: {dev_s * 1000:.3f} ms/scan -> "
        f"{1 / dev_s:.0f} QPS, {data.nbytes / dev_s / 1e9:.0f} GB/s")

    # rerank mode: int8 prefilter + exact rescore (beyond the reference)
    def one_rerank():
        q = queries[next(qi) % len(queries)]
        ids, dist = ds.search(q, args.k, mode="rerank")
        assert len(ids) == args.k

    t0 = time.time()
    one_rerank()
    log(f"rerank first call (compile): {time.time() - t0:.1f}s")
    rerank_s = median_time(one_rerank, args.iters)
    log(f"rerank 1-query: {rerank_s * 1000:.3f} ms -> {1 / rerank_s:.1f} QPS "
        f"(exact-quality results)")

    # recall@k of the quantized path vs exact (QUANTIZATION.md methodology)
    hits = total = 0
    for q in queries[:16]:
        e_ids, _ = ds.search(q, args.k)
        a_ids, _ = ds.search(q, args.k, exact=False)
        hits += len(set(e_ids.tolist()) & set(a_ids.tolist()))
        total += args.k
    recall = hits / total
    log(f"recall@{args.k} quantized vs exact: {recall:.3f}")

    vs_baseline = exact_qps / (1000.0 / REFERENCE_EXACT_MS)
    log(f"quant speedup vs C reference: "
        f"{(1 / quant_s) / (1000.0 / REFERENCE_QUANT_MS):.1f}x")
    print(
        json.dumps(
            {
                "metric": f"exact_scan_qps_{args.n // 1000}kx{args.dim}_f32_top{args.k}",
                "value": round(exact_qps, 2),
                "unit": "qps",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
