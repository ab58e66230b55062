"""Serving layer: concurrent query coalescing and an HTTP endpoint.

The reference serves one query per virtual-table scan on the caller's thread
(src/sqlite-vector.c:1723-1817); concurrency comes from SQLite connections
each paying the full scan. On TPU the economics invert: a B=64 batched scan
costs nearly the same as B=1 (the matrix read dominates), so the right
serving design coalesces concurrent queries into one device dispatch.

`BatchingSearcher` is that coalescer: callers submit queries from any thread
and get futures; a background dispatcher drains the queue, pads the batch to
a bucket size (so XLA sees a handful of shapes, not one per batch size), runs
one fused scan, and distributes the per-query results.

`serve()` exposes a dataset over JSON/HTTP (stdlib only) for quick
deployments and load tests.
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import Future
from typing import Any

import numpy as np

from sqlite_vector_tpu.dataset import Dataset

# batch-size buckets: every dispatch pads to one of these, bounding the
# number of distinct compiled shapes
_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


class BatchingSearcher:
    """Thread-safe query coalescer over one Dataset.

    submit() may be called from any number of threads; queries queued within
    `max_wait_ms` of each other (up to `max_batch`) share one device dispatch.
    """

    def __init__(
        self,
        dataset: Dataset,
        *,
        max_batch: int = 64,
        max_wait_ms: float = 2.0,
    ):
        self.dataset = dataset
        self.max_batch = min(max_batch, _BUCKETS[-1])
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue: queue.Queue = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(
        self,
        query: Any,
        k: int,
        *,
        exact: bool = True,
        mode: str | None = None,
    ) -> Future:
        """Enqueue one query; resolves to (ids [k], distances [k]).

        mode overrides `exact` with the full Dataset.search mode set
        (exact | quantized | rerank | approx); queries coalesce only with
        same-(k, mode) peers since they share one device dispatch."""
        if self._closed:
            raise RuntimeError("BatchingSearcher is closed")
        if mode is None:
            mode = "exact" if exact else "quantized"
        q, _ = self.dataset._coerce_queries(query)
        if q.shape[0] != 1:
            raise ValueError("submit() takes a single query; use search_many")
        fut: Future = Future()
        self._queue.put((q[0], k, mode, fut))
        return fut

    def search(
        self,
        query: Any,
        k: int,
        *,
        exact: bool = True,
        mode: str | None = None,
    ):
        """Blocking convenience wrapper around submit()."""
        return self.submit(query, k, exact=exact, mode=mode).result()

    def close(self) -> None:
        self._closed = True
        self._queue.put(None)
        self._thread.join(timeout=5)

    # -- dispatcher -----------------------------------------------------------

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            batch = [item]
            # coalesce: wait up to max_wait_s for more queries
            deadline = None
            while len(batch) < self.max_batch:
                try:
                    timeout = self.max_wait_s if deadline is None else deadline
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._dispatch(batch)
                    return
                batch.append(nxt)
                deadline = 0.0  # drain whatever is already queued
            self._dispatch(batch)

    def _dispatch(self, batch: list) -> None:
        # group by (k, mode) — different k values / modes need separate scans
        groups: dict[tuple[int, str], list] = {}
        for q, k, mode, fut in batch:
            groups.setdefault((k, mode), []).append((q, fut))
        for (k, mode), items in groups.items():
            try:
                qs = np.stack([q for q, _ in items])
                bsize = _bucket(len(items))
                if bsize != len(items):
                    qs = np.concatenate(
                        [qs, np.zeros((bsize - len(items),) + qs.shape[1:], qs.dtype)]
                    )
                ids, dist = self.dataset.search(qs, k, mode=mode)
                for i, (_, fut) in enumerate(items):
                    keep = ids[i] >= 0
                    fut.set_result((ids[i][keep], dist[i][keep]))
            except Exception as e:  # propagate to every waiter
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)


def serve(
    dataset: Dataset,
    host: str = "127.0.0.1",
    port: int = 8377,
    *,
    max_batch: int = 64,
    max_wait_ms: float = 2.0,
):
    """Serve a dataset over JSON/HTTP. Returns the (started) HTTPServer.

    POST /search   {"vector": [...], "k": 10, "exact": true,
                    "mode": "exact|quantized|rerank|approx" (optional)}
                   -> {"ids": [...], "distances": [...]}
    POST /add      {"vectors": [[...], ...]} -> {"ids": [...]}
    GET  /stats    -> {"count": N, "dimension": d, ...}
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    searcher = BatchingSearcher(
        dataset, max_batch=max_batch, max_wait_ms=max_wait_ms
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/stats":
                self._reply(
                    200,
                    {
                        "count": len(dataset),
                        "dimension": dataset.dimension,
                        "dtype": dataset.dtype.value,
                        "metric": dataset.metric.value,
                        "quantized": dataset.is_quantized,
                        "memory_bytes": dataset.memory_bytes(),
                    },
                )
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/search":
                    vec = np.asarray(req["vector"], np.float32)
                    ids, dist = searcher.search(
                        vec, int(req.get("k", 10)),
                        exact=bool(req.get("exact", True)),
                        mode=req.get("mode"),
                    )
                    self._reply(
                        200,
                        {"ids": ids.tolist(),
                         "distances": [float(d) for d in dist]},
                    )
                elif self.path == "/add":
                    vecs = np.asarray(req["vectors"], np.float32)
                    ids = dataset.add(vecs)
                    self._reply(200, {"ids": ids.tolist()})
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    server.searcher = searcher  # keep a handle for close()
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
