"""Serving soak: sustained concurrent load on real hardware.

Drives a Dataset through the BatchingSearcher from many client threads while
a mutator thread adds/removes rows and rebuilds/drops quantization — the
production serving pattern (serving.py) under the reference's "zero-cost
updates" contract (/root/reference/README.md:117: mutate freely, re-quantize
to refresh the approximate path).

Reports one JSON line: sustained QPS, latency percentiles per mode, error
counts, and a device-buffer leak signal (jax.live_arrays before/after).

Usage (TPU):   python tools/soak_serving.py --n 1000000 --dim 384 --seconds 60
Usage (CPU):   python tools/soak_serving.py --cpu --n 20000 --seconds 5
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--mutate-period", type=float, default=1.0,
                    help="seconds between mutation cycles (0 disables)")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=3.0)
    ap.add_argument("--fallback", action="store_true",
                    help="BatchingSearcher(fallback_exact=True): serve exact "
                    "results during requantization windows instead of erroring")
    ap.add_argument("--http", action="store_true",
                    help="drive the load through the real JSON/HTTP endpoint "
                    "(serve()) instead of the in-process BatchingSearcher — "
                    "includes HTTP framing/JSON costs in every latency")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.errors import VectorStateError
    from sqlite_vector_tpu.serving import BatchingSearcher

    rng = np.random.default_rng(0)
    print(f"# building {args.n}x{args.dim} f32 on {svt.backend()}", flush=True)
    ds = svt.VectorStore().create(
        "soak", f"dimension={args.dim},type=FLOAT32,distance=L2"
    )
    base = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    ds.add(base)
    jax.block_until_ready(ds._vectors)
    t0 = time.perf_counter()
    ds.quantize()
    print(f"# quantize: {time.perf_counter() - t0:.2f}s", flush=True)

    # warm every (mode, bucket) executable the soak will hit
    from sqlite_vector_tpu.serving import _BUCKETS

    modes = ("exact", "quantized", "rerank")
    warm = rng.standard_normal((args.max_batch, args.dim)).astype(np.float32)
    for m in modes:
        for b in (bb for bb in _BUCKETS if bb <= args.max_batch):
            ds.search(warm[:b], args.k, mode=m)
    print("# warmup done", flush=True)

    server = None
    if args.http:
        from sqlite_vector_tpu.serving import serve

        server = serve(
            ds, port=0, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms, fallback_exact=args.fallback,
        )
        port = server.server_address[1]
        url = f"http://127.0.0.1:{port}/search"
        searcher = None
        print(f"# serving over HTTP on :{port}", flush=True)
    else:
        searcher = BatchingSearcher(
            ds, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            fallback_exact=args.fallback,
        )
    stop = threading.Event()
    lat: dict[str, list] = {m: [] for m in modes}
    lat_lock = threading.Lock()
    counters = {"ok": 0, "state_err": 0, "errors": []}

    def do_search(q: np.ndarray, mode: str):
        if searcher is not None:
            return searcher.search(q, args.k, mode=mode)
        import json as _json
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url,
            data=_json.dumps(
                {"vector": q.tolist(), "k": args.k, "mode": mode}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                out = _json.loads(r.read())
        except urllib.error.HTTPError as e:
            body = e.read().decode(errors="replace")
            if "VectorStateError" in body:
                raise VectorStateError(body) from None
            raise RuntimeError(f"HTTP {e.code}: {body[:200]}") from None
        return np.asarray(out["ids"]), np.asarray(out["distances"])

    def client(seed: int) -> None:
        crng = np.random.default_rng(seed)
        j = 0
        while not stop.is_set():
            q = base[crng.integers(0, args.n)]
            mode = modes[j % len(modes)]
            j += 1
            t = time.perf_counter()
            try:
                ids, dist = do_search(q, mode)
                # inside the try: a correctness violation must be COUNTED,
                # not silently kill this client thread
                assert np.all(np.diff(dist) >= 0), "unsorted distances"
            except VectorStateError:
                with lat_lock:
                    counters["state_err"] += 1
                continue
            except Exception as e:  # noqa: BLE001
                with lat_lock:
                    counters["errors"].append(f"{type(e).__name__}: {e}")
                if len(counters["errors"]) > 10:
                    stop.set()
                continue
            dt = time.perf_counter() - t
            with lat_lock:
                lat[mode].append(dt)
                counters["ok"] += 1

    def mutator() -> None:
        mrng = np.random.default_rng(99)
        i = 0
        while not stop.is_set():
            time.sleep(args.mutate_period)
            if stop.is_set():
                break
            try:
                added = ds.add(
                    mrng.standard_normal((256, args.dim)).astype(np.float32)
                )
                ds.remove(added[:128])
                if i % 5 == 4:
                    ds.drop_quantization()
                    ds.quantize()
                i += 1
            except Exception as e:  # noqa: BLE001
                with lat_lock:
                    counters["errors"].append(f"mutator {type(e).__name__}: {e}")

    gc.collect()
    live0 = jax.live_arrays()
    bytes0, count0 = sum(a.nbytes for a in live0), len(live0)
    del live0
    mem0 = ds.memory_bytes()  # expected growth: the mutator net-adds rows

    threads = [
        threading.Thread(target=client, args=(s,), daemon=True)
        for s in range(args.clients)
    ]
    if args.mutate_period > 0:
        threads.append(threading.Thread(target=mutator, daemon=True))
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    elapsed = time.perf_counter() - t0

    if server is not None:
        server.close()
    else:
        searcher.close()
    gc.collect()
    live1 = jax.live_arrays()
    bytes1, count1 = sum(a.nbytes for a in live1), len(live1)
    del live1
    mem1 = ds.memory_bytes()

    def pct(xs: list, p: float) -> float:
        return float(np.percentile(np.asarray(xs) * 1e3, p)) if xs else -1.0

    out = {
        "metric": "serving_soak_http" if args.http else "serving_soak",
        "backend": svt.backend(),
        "n": args.n,
        "dim": args.dim,
        "clients": args.clients,
        "seconds": round(elapsed, 2),
        "qps": round(counters["ok"] / elapsed, 1),
        "completed": counters["ok"],
        "requant_windows_hit": counters["state_err"],
        "errors": counters["errors"][:5],
        "latency_ms": {
            m: {"p50": round(pct(lat[m], 50), 2), "p99": round(pct(lat[m], 99), 2)}
            for m in modes
        },
        # leak signal: raw live-buffer delta MINUS the dataset's own
        # legitimate growth (mutator adds rows / capacity doublings /
        # requant rebuilds) — ~0 means the serving layer leaked nothing
        "live_bytes_delta": bytes1 - bytes0,
        "dataset_growth_bytes": mem1 - mem0,
        "leak_bytes": (bytes1 - bytes0) - (mem1 - mem0),
        "live_count_delta": count1 - count0,
    }
    print(json.dumps(out), flush=True)
    if counters["errors"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
