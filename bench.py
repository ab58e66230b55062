#!/usr/bin/env python
"""Benchmark harness — one JSON line per BASELINE.md config for the driver.

Configs (BASELINE.md "Metrics this framework must measure"):
  1. FLOAT32 exact L2 full-scan top-20, 1M x 384 (semantic_search workload)
  2. all metrics (L2/SQUARED_L2/L1/COSINE/DOT) f32, device-side exact scan
  3. FLOAT16 / BFLOAT16 stored vectors, batched (B=64) exact scan
  4. INT8 quantized path: quantize + preloaded scan + recall@20 vs exact
  5. 10M x 768 f32 exact via host->HBM streaming (the north-star config;
     >HBM on one chip) + the rerank alternative (device int8 prefilter +
     host rescore) that avoids streaming entirely

The HEADLINE (config 1 exact QPS) prints LAST. vs_baseline semantics per
line are in the "baseline" key. The C-reference baselines were measured on
this container (BASELINE.md): exact 1M x 384 = 648.1 ms/q, quantized
preloaded = 156.7 ms/q.

Timing notes (see .claude/skills/verify/SKILL.md): per-dispatch RTT through
the tunnel is ~25-35 ms, so end-to-end B=1 latencies are RTT-floored;
device-side numbers chain M scans in one executable with a device->host
fetch as the sync point. Run-to-run variance on this tunneled chip is 2-3x —
compare within a run.
"""

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_EXACT_MS = 648.1
REFERENCE_QUANT_MS = 156.7

RESULTS = []


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def emit(metric: str, value: float, unit: str, vs_baseline: float, **extra):
    line = {
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 3),
    }
    line.update(extra)
    RESULTS.append(line)
    log(f"RESULT {json.dumps(line)}")


def transfer_ceiling(sample: np.ndarray) -> float:
    """Best-of-2 host->device transfer rate (bytes/s). The warm-up put
    compiles the scalar-index sync op OUTSIDE the timed region (a cold
    remote compile costs tens of seconds through the tunnel and would
    swamp the measurement)."""
    import jax

    warm = jax.device_put(sample[:8])
    _ = float(warm[0, 0])
    del warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jax.device_put(sample)
        _ = float(dev[0, 0])
        best = max(best, sample.nbytes / (time.perf_counter() - t0))
        del dev
    return best


def median_time(fn, iters: int) -> float:
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def make_chained(metric, k, n, m):
    """Device-side amortized scan timer: M chained scans in one executable,
    loop-carried so XLA can't hoist, device fetch as the sync point."""
    import functools

    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.scan import fused_scan_topk

    @jax.jit
    def chained(qs, b, sq):
        def body(c, q):
            # loop-carry in q's OWN dtype: `q + c*0` with a float carry would
            # silently promote int8 query codes to f32 and time a different
            # kernel mix than the real int8 path
            vals, idx = fused_scan_topk(
                q + (c * 0).astype(q.dtype), b, metric, k,
                valid_count=n, base_sq_norms=sq,
            )
            return vals[0, 0], (vals[0], idx[0])

        _, outs = jax.lax.scan(body, jnp.float32(0), qs)
        return outs

    def run(qs_dev, base_dev, sq):
        out = chained(qs_dev, base_dev, sq)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)

    return run


def bench_core(args):
    """Configs 1-4 (share one 1M x 384 ingest)."""
    import jax
    import jax.numpy as jnp

    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.types import DistanceMetric

    n, dim, k = args.n, args.dim, args.k
    rng = np.random.default_rng(7)
    # dtype=float32 generates natively (no f64 intermediate / astype pass)
    data = rng.standard_normal((n, dim), dtype=np.float32)
    queries = data[rng.integers(0, n, 64)]

    # raw host->device transfer ceiling (to attribute ingest time: the
    # tunnel/PCIe transport, not host-side coercion, is the ingest wall)
    ceiling = transfer_ceiling(data[: max(min(n, 65536), 8)])
    log(f"host->device transfer ceiling: {ceiling/1e9:.3f} GB/s")

    t0 = time.time()
    store = svt.VectorStore()
    ds = store.create("bench", f"dimension={dim},type=FLOAT32,distance=L2")
    ds.add(data)
    # add() dispatches the upload asynchronously (by design: ingest overlaps
    # whatever the caller does next); block here so the transfer time lands
    # in the ingest line, not in whichever timed stage syncs first
    jax.block_until_ready(ds._vectors)
    ingest_s = time.time() - t0
    log(f"ingest {n}x{dim}: {ingest_s:.1f}s ({data.nbytes / 1e9:.2f} GB, "
        f"{100*data.nbytes/ingest_s/ceiling:.0f}% of transfer ceiling)")

    # ---- config 1: exact f32 L2 ------------------------------------------
    qi = iter(range(10**9))

    def one_exact():
        q = queries[next(qi) % len(queries)]
        ids, dist = ds.search(q, k)
        assert len(ids) == k

    t0 = time.time()
    one_exact()
    log(f"exact compile: {time.time() - t0:.1f}s")
    exact_s = median_time(one_exact, args.iters)
    exact_qps = 1.0 / exact_s
    log(f"exact 1-query: {exact_s*1e3:.3f} ms -> {exact_qps:.1f} QPS, "
        f"{data.nbytes/exact_s/1e9:.0f} GB/s scanned")

    def batch_exact():
        ds.search(queries, k)

    batch_exact()
    batch_s = median_time(batch_exact, max(args.iters // 2, 3))
    log(f"exact B=64: {batch_s*1e3:.1f} ms -> {64/batch_s:.0f} QPS")

    # device-side amortized (the hardware-meaningful number)
    M = 16
    qs_dev = jax.device_put(queries[:M][:, None, :])
    run = make_chained(DistanceMetric.L2, k, n, M)
    bsq = ds._exact_sq_norms(ds._vectors)
    run(qs_dev, ds._vectors, bsq)  # compile
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        run(qs_dev, ds._vectors, bsq)
    dev_s = (time.time() - t0) / reps / M
    log(f"device-side exact: {dev_s*1e3:.3f} ms/scan, "
        f"{data.nbytes/dev_s/1e9:.0f} GB/s")

    # ---- config 2: all metrics, device-side ------------------------------
    metric_ms = {}
    for metric in (
        DistanceMetric.SQUARED_L2,
        DistanceMetric.COSINE,
        DistanceMetric.DOT,
        DistanceMetric.L1,
    ):
        runm = make_chained(metric, k, n, M)
        sq = bsq if metric is not DistanceMetric.DOT else None
        try:
            runm(qs_dev, ds._vectors, sq)
            t0 = time.time()
            runm(qs_dev, ds._vectors, sq)
            metric_ms[metric.value] = (time.time() - t0) / M * 1e3
        except Exception as e:  # pragma: no cover - report, keep going
            log(f"metric {metric.value} failed: {e}")
            metric_ms[metric.value] = float("nan")
    metric_ms["L2"] = dev_s * 1e3
    log("per-metric device-side ms/scan: "
        + ", ".join(f"{m}={v:.2f}" for m, v in metric_ms.items()))
    ok = [v for v in metric_ms.values() if np.isfinite(v)]
    geomean_qps = float(1e3 / np.exp(np.mean(np.log(ok))))
    emit(
        f"allmetrics_exact_device_qps_{n//1000}kx{dim}",
        geomean_qps,
        "qps",
        geomean_qps / (1000.0 / REFERENCE_EXACT_MS),
        per_metric_ms={m: round(v, 3) for m, v in metric_ms.items()},
        baseline="C reference exact L2 648.1 ms (geomean QPS ratio)",
    )

    # ---- config 3: f16 / bf16 batched ------------------------------------
    dtype_qps = {}
    for tname in ("FLOAT16", "FLOATB16"):
        dsn = store.create(
            f"bench_{tname}", f"dimension={dim},type={tname},distance=L2"
        )
        dsn.add(data)  # coerced to the narrow dtype
        qn = queries  # f32 queries coerced per search

        def batch_narrow():
            dsn.search(qn, k)

        batch_narrow()
        s = median_time(batch_narrow, 3)
        dtype_qps[tname] = 64.0 / s
        log(f"{tname} B=64 exact: {s*1e3:.1f} ms -> {64/s:.0f} QPS")
        dsn._vectors = None  # free HBM
        store.drop(f"bench_{tname}")
    emit(
        f"f16_bf16_batched_qps_{n//1000}kx{dim}",
        min(dtype_qps.values()),
        "qps",
        min(dtype_qps.values()) / (1000.0 / REFERENCE_EXACT_MS),
        per_dtype_qps={t: round(v, 1) for t, v in dtype_qps.items()},
        baseline="C reference exact L2 648.1 ms/q (per-query ratio)",
    )

    # ---- config 4: int8 quantized path ------------------------------------
    t0 = time.time()
    ds.quantize()
    qbuild = time.time() - t0
    log(f"quantize build: {qbuild:.1f}s")

    def one_quant():
        q = queries[next(qi) % len(queries)]
        ids, dist = ds.search(q, k, exact=False)
        assert len(ids) == k

    one_quant()
    quant_s = median_time(one_quant, args.iters)
    log(f"quant 1-query: {quant_s*1e3:.3f} ms")

    # device-side amortized int8
    import functools

    from sqlite_vector_tpu.ops.scan import fused_scan_topk

    quant = ds._quant
    qcodes_q = np.asarray(
        __import__("sqlite_vector_tpu.oracle", fromlist=["quantize"]).quantize(
            queries[:M].astype(np.float32), quant.scale, quant.offset, quant.qtype
        )
    )
    qq_dev = jax.device_put(qcodes_q[:, None, :])
    runq = make_chained(DistanceMetric.L2, k, quant.count, M)
    sqn = jax.jit(
        lambda x: jnp.sum(x.astype(jnp.int32) * x.astype(jnp.int32), axis=-1)
    )(quant.codes)
    runq(qq_dev, quant.codes, sqn)
    t0 = time.time()
    for _ in range(reps):
        runq(qq_dev, quant.codes, sqn)
    devq_s = (time.time() - t0) / reps / M
    log(f"device-side int8: {devq_s*1e3:.3f} ms/scan, "
        f"{n*dim/devq_s/1e9:.0f} GB/s of codes")

    # rerank (int8 prefilter + exact rescore)
    def one_rerank():
        q = queries[next(qi) % len(queries)]
        ds.search(q, k, mode="rerank")

    one_rerank()
    rerank_s = median_time(one_rerank, args.iters)
    log(f"rerank 1-query: {rerank_s*1e3:.3f} ms (exact-quality)")

    # recall@k (QUANTIZATION.md methodology)
    hits = total = 0
    for q in queries[:16]:
        e_ids, _ = ds.search(q, k)
        a_ids, _ = ds.search(q, k, exact=False)
        hits += len(set(e_ids.tolist()) & set(a_ids.tolist()))
        total += k
    recall = hits / total
    log(f"recall@{k} quantized vs exact: {recall:.3f}")
    emit(
        f"quantized_scan_qps_{n//1000}kx{dim}_int8",
        1.0 / quant_s,
        "qps",
        (1.0 / quant_s) / (1000.0 / REFERENCE_QUANT_MS),
        recall_at_k=round(recall, 3),
        device_side_ms=round(devq_s * 1e3, 3),
        rerank_ms=round(rerank_s * 1e3, 3),
        quantize_build_s=round(qbuild, 2),
        baseline="C reference quantized+preloaded 156.7 ms/q",
    )

    # ---- mutation costs (zero-cost-update contract on device) -------------
    # last within this config: mutates ds. The C reference pays one pager
    # pass per scan and gets cheap DELETEs from SQLite; device-resident
    # matrices earn the same contract via lazy tombstones + scatter updates.
    ids = ds.ids
    t0 = time.time()
    ds.remove(ids[n // 2 : n // 2 + 128])
    remove_s = time.time() - t0
    q0 = queries[0]
    ds.search(q0, k)  # first masked search: mask upload + kernel variant
    masked_s = median_time(lambda: ds.search(q0, k), max(args.iters // 2, 3))
    upd_rows = data[:64] + 0.5
    ds.update(ids[:64], upd_rows)  # compile
    t0 = time.time()
    ds.update(ids[64:128], upd_rows)
    update_s = time.time() - t0
    ds.quantize()  # warm the gather-compaction + rebuild executables
    ds.remove(ids[n // 2 + 128 : n // 2 + 256])
    t0 = time.time()
    ds.quantize()  # compacts tombstones device-side, rebuilds codes
    requant_s = time.time() - t0
    log(
        f"mutations: remove(128/{n//1000}k) {remove_s*1e3:.1f} ms, "
        f"masked search {masked_s*1e3:.1f} ms, update(64) {update_s*1e3:.1f} ms, "
        f"quantize-after-remove {requant_s:.2f} s"
    )
    emit(
        f"mutation_costs_{n//1000}kx{dim}",
        remove_s * 1e3,
        "ms_remove_128",
        ingest_s / max(remove_s, 1e-9),  # speedup vs a full re-upload
        masked_search_ms=round(masked_s * 1e3, 2),
        update64_ms=round(update_s * 1e3, 2),
        quantize_after_remove_s=round(requant_s, 2),
        baseline="pre-tombstone implementation paid a full matrix re-upload "
        "per remove/update (~the ingest time; vs_baseline = that speedup)",
    )

    return exact_qps, dev_s


def bench_streaming_10m(args):
    """Config 5: the north-star 10M x 768 f32 exact scan via host->HBM
    streaming, plus the rerank design that avoids streaming. Reports GB/s
    against the MEASURED host->device transfer ceiling (on this tunneled
    chip the transport, not HBM, is the wall — see BASELINE.md)."""
    import jax

    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.ops.streaming import streaming_scan_topk
    from sqlite_vector_tpu.types import DistanceMetric

    n, dim, k = args.n10m, 768, 20
    rng = np.random.default_rng(11)
    log(f"[10m] generating {n}x{dim} f32 ({n*dim*4/1e9:.1f} GB host RAM)...")
    t0 = time.time()
    data = np.empty((n, dim), np.float32)
    step = 1_000_000
    for s in range(0, n, step):
        rows = min(step, n - s)
        data[s : s + rows] = rng.standard_normal((rows, dim), dtype=np.float32)
    log(f"[10m] generated in {time.time()-t0:.0f}s")

    # transfer-ceiling probe (201 MB, best of 2, sync op pre-compiled)
    ceiling = transfer_ceiling(data[:65536])
    log(f"[10m] measured host->device ceiling: {ceiling/1e9:.3f} GB/s")

    t0 = time.time()
    # zero-copy adoption: the generated array IS the dataset's host storage
    ds = svt.Dataset.from_arrays(
        "big",
        data,
        options=f"dimension={dim},type=FLOAT32,distance=L2",
        has_nonfinite=False,  # standard_normal output by construction
        storage="host",
    )
    ids = ds.ids
    log(f"[10m] host ingest (zero-copy adopt): {time.time()-t0:.1f}s")
    del data

    probe_row = min(1234567, n - 1)
    q = np.array(ds._host_vectors[probe_row])
    t0 = time.time()
    got, dist = ds.search(q, k)
    stream_s = time.time() - t0
    assert got[0] == ids[probe_row] and dist[0] == 0.0, (got[:3], dist[:3])
    gbs = n * dim * 4 / stream_s / 1e9
    # the tunnel's rate wanders 2-3x minute to minute; the honest efficiency
    # denominator is the best transport rate OBSERVED in this run (the probe
    # or the sustained scan itself, whichever was luckier)
    best_link = max(ceiling, gbs * 1e9)
    log(f"[10m] streaming exact scan: {stream_s:.1f}s -> {gbs:.3f} GB/s "
        f"({100*gbs*1e9/best_link:.0f}% of best observed transport rate)")
    emit(
        f"streaming_exact_scan_gbs_{n//1000000}mx{dim}_f32",
        gbs,
        "GB/s",
        gbs * 1e9 / best_link,
        scan_seconds=round(stream_s, 1),
        transfer_ceiling_probe_gbs=round(ceiling / 1e9, 3),
        baseline="best observed host->device transport rate this run "
        "(vs_baseline = fraction sustained end-to-end; the scan is "
        "transport-bound on this tunneled chip)",
    )

    # the design that beats streaming: device-resident int8 codes + exact
    # host rescore of k*expand candidates (exact-quality results, no 30 GB
    # per-query transfer)
    t0 = time.time()
    ds.quantize()
    log(f"[10m] host quantize: {time.time()-t0:.0f}s")
    t0 = time.time()
    ds.preload()
    log(f"[10m] preload int8 codes ({n*dim/1e9:.1f} GB): {time.time()-t0:.0f}s")

    def one_rerank():
        ds.search(q, k, mode="rerank")

    one_rerank()
    rerank_s = median_time(one_rerank, 5)
    r_ids, r_dist = ds.search(q, k, mode="rerank")
    recall = len(set(r_ids.tolist()) & set(got.tolist())) / k
    log(f"[10m] rerank (int8-resident prefilter + exact rescore): "
        f"{rerank_s*1e3:.1f} ms/q, recall vs streamed-exact {recall:.3f}")
    emit(
        f"rerank_exact_quality_qps_{n//1000000}mx{dim}",
        1.0 / rerank_s,
        "qps",
        (1.0 / rerank_s) * stream_s,
        recall_vs_exact=round(recall, 3),
        baseline="the streamed exact scan of the same config "
        "(vs_baseline = speedup over streaming)",
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--n10m", type=int, default=10_000_000)
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--quick", action="store_true", help="20k rows (CI smoke)")
    p.add_argument("--skip10m", action="store_true",
                   help="skip the 10M x 768 streaming config")
    args = p.parse_args()
    if args.quick:
        args.n, args.iters, args.n10m = 20_000, 5, 200_000

    import jax

    import sqlite_vector_tpu as svt

    log(f"backend={svt.backend()} devices={jax.devices()}")

    exact_qps, dev_s = bench_core(args)

    if not args.skip10m:
        try:
            bench_streaming_10m(args)
        except Exception as e:  # keep the headline even if 10m fails
            log(f"[10m] FAILED: {e!r}")

    # headline LAST (config 1): the driver reads the final line
    vs = exact_qps / (1000.0 / REFERENCE_EXACT_MS)
    for line in RESULTS:
        print(json.dumps(line))
    print(
        json.dumps(
            {
                "metric": f"exact_scan_qps_{args.n//1000}kx{args.dim}_f32_top{args.k}",
                "value": round(exact_qps, 2),
                "unit": "qps",
                "vs_baseline": round(vs, 2),
                "device_side_ms": round(dev_s * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
