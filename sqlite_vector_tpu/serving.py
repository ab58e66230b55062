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
from sqlite_vector_tpu.errors import VectorStateError

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
        fallback_exact: bool = False,
    ):
        """fallback_exact: when a quantized/rerank group fails because
        quantization is momentarily absent (a drop_quantization+quantize
        rebuild window — the reference errors identically while the shadow
        table is missing), transparently re-run that group as an exact scan
        instead of surfacing VectorStateError to every waiter. Off by
        default (error parity)."""
        self.dataset = dataset
        self.max_batch = min(max_batch, _BUCKETS[-1])
        self.max_wait_s = max_wait_ms / 1000.0
        self.fallback_exact = fallback_exact
        self._queue: queue.Queue = queue.Queue()
        self._closed = False
        # serializes the _closed check-then-enqueue in submit() against
        # close(): without it a racing submit could enqueue after close()'s
        # drain and block that caller on Future.result() forever
        self._lifecycle_lock = threading.Lock()
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
        if mode is None:
            mode = "exact" if exact else "quantized"
        q, _ = self.dataset._coerce_queries(query)
        if q.shape[0] != 1:
            raise ValueError(
                "submit() takes a single query; for batches call "
                "Dataset.search(queries, k) directly"
            )
        fut: Future = Future()
        # the closed-check and the enqueue must be atomic vs close() —
        # see _lifecycle_lock (the put is non-blocking: unbounded queue)
        with self._lifecycle_lock:
            if self._closed:
                raise RuntimeError("BatchingSearcher is closed")
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
        with self._lifecycle_lock:
            self._closed = True
            self._queue.put(None)
        self._thread.join(timeout=5)
        # any submit() that won the race enqueued BEFORE the sentinel (the
        # lock orders it before _closed was set); fail leftover futures
        # instead of leaving callers blocked on result() forever
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is None:
                continue
            fut = item[-1]
            # claim-then-set: a caller's fut.cancel() racing this drain
            # would otherwise make set_exception raise InvalidStateError
            if fut.set_running_or_notify_cancel():
                fut.set_exception(RuntimeError("BatchingSearcher is closed"))
        if self._thread.is_alive():
            # the dispatcher outlived the join timeout (e.g. a cold remote
            # compile mid-dispatch) and the drain above may have consumed
            # its shutdown sentinel — re-arm it so the thread exits (and
            # releases its Dataset reference) when the dispatch finishes
            self._queue.put(None)

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
            # claim every future FIRST: after set_running_or_notify_cancel
            # returns True a racing fut.cancel() is a guaranteed no-op, so
            # the set_result/set_exception below can never raise
            # InvalidStateError mid-loop (which would discard batch-mates'
            # computed results and, racing twice, kill the dispatcher
            # thread — hanging every later submit). Futures already
            # cancelled by their caller drop out here.
            live = [
                (q, fut) for q, fut in items
                if fut.set_running_or_notify_cancel()
            ]
            if not live:
                continue
            try:
                qs = np.stack([q for q, _ in live])
                bsize = _bucket(len(live))
                if bsize != len(live):
                    qs = np.concatenate(
                        [qs, np.zeros((bsize - len(live),) + qs.shape[1:], qs.dtype)]
                    )
                try:
                    ids, dist = self.dataset.search(qs, k, mode=mode)
                except VectorStateError:
                    if not (
                        self.fallback_exact and mode in ("quantized", "rerank")
                    ):
                        raise
                    # requantization window: serve exact results instead
                    ids, dist = self.dataset.search(qs, k, mode="exact")
                for i, (_, fut) in enumerate(live):
                    keep = ids[i] >= 0
                    fut.set_result((ids[i][keep], dist[i][keep]))
            except Exception as e:  # propagate to every waiter
                for _, fut in live:
                    if not fut.done():
                        fut.set_exception(e)


def _dataset_stats(ds: Dataset) -> dict:
    return {
        "count": len(ds),
        "dimension": ds.dimension,
        "dtype": ds.dtype.value,
        "metric": ds.metric.value,
        "quantized": ds.is_quantized,
        "memory_bytes": ds.memory_bytes(),
    }


def serve(
    source,
    host: str = "127.0.0.1",
    port: int = 8377,
    *,
    max_batch: int = 64,
    max_wait_ms: float = 2.0,
    fallback_exact: bool = False,
    max_request_bytes: int = 32 * 1024 * 1024,
):
    """Serve a Dataset — or a whole VectorStore — over JSON/HTTP.

    A VectorStore source routes requests by dataset name (the serving
    analogue of the reference's per-connection multi-(table, column)
    registry, src/sqlite-vector.c:116-181); each dataset gets its own
    lazily-created BatchingSearcher. Returns the (started) HTTPServer; stop
    with server.close().

    max_request_bytes bounds a single request body (default 32 MB — a few
    thousand f64 JSON vectors); oversized requests get 413 without the body
    being read into memory.

    POST /search   {"vector": [...], "k": 10, "exact": true,
                    "mode": "exact|quantized|rerank|approx" (optional),
                    "dataset": "name" (stores; optional when only one)}
                   -> {"ids": [...], "distances": [...]}
    POST /add      {"vectors": [[...], ...], "dataset": ...} -> {"ids": [...]}
    GET  /stats    -> single dataset's stats, or {"datasets": {name: stats}}
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from sqlite_vector_tpu.dataset import VectorStore

    store = source if isinstance(source, VectorStore) else None
    single = None if store is not None else source
    searchers: dict[int, BatchingSearcher] = {}
    searchers_lock = threading.Lock()

    def resolve(req: dict) -> Dataset:
        if store is None:
            return single
        name = req.get("dataset")
        if name is None:
            names = store.names()
            if len(names) == 1:
                return store.get(names[0])
            raise ValueError(
                f"'dataset' is required (store serves {sorted(names)})"
            )
        return store.get(name)

    def searcher_for(ds: Dataset) -> BatchingSearcher:
        stale = []
        with searchers_lock:
            s = searchers.get(id(ds))
            if s is None:
                if store is not None:
                    # evict coalescers for datasets dropped from the store —
                    # each holds a dispatcher thread and a strong Dataset
                    # reference (pinning its device matrix) forever otherwise
                    active = set()
                    for n in store.names():
                        try:
                            active.add(id(store.get(n)))
                        except Exception:
                            pass
                    for key in [k for k in searchers if k not in active]:
                        stale.append(searchers.pop(key))
                s = BatchingSearcher(
                    ds, max_batch=max_batch, max_wait_ms=max_wait_ms,
                    fallback_exact=fallback_exact,
                )
                searchers[id(ds)] = s
        # close() joins the dispatcher (up to 5 s each) — do it OUTSIDE the
        # lock so concurrent requests on other datasets don't stall behind
        # an eviction
        for old in stale:
            old.close()
        return s

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
            try:
                if self.path == "/stats":
                    if store is not None:
                        stats = {}
                        for n in store.names():
                            try:
                                stats[n] = _dataset_stats(store.get(n))
                            except Exception:
                                continue  # dropped between names() and get()
                        self._reply(200, {"datasets": stats})
                    else:
                        self._reply(200, _dataset_stats(single))
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as e:  # JSON error like every POST path
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def do_POST(self):
            try:
                try:
                    n = int(self.headers.get("Content-Length", 0))
                except (TypeError, ValueError):
                    n = -1
                if n < 0:
                    # malformed/negative length: rfile.read(-1) would block
                    # until client EOF, pinning this handler thread for as
                    # long as the peer holds the connection (slowloris)
                    self.close_connection = True
                    self._reply(400, {"error": "invalid Content-Length"})
                    return
                if n > max_request_bytes:
                    # refuse before reading the body into memory; close the
                    # connection (the unread body would otherwise desync
                    # keep-alive parsing)
                    self.close_connection = True
                    self._reply(
                        413,
                        {"error": f"request body {n} bytes exceeds the "
                         f"{max_request_bytes}-byte limit"},
                    )
                    return
                req = json.loads(self.rfile.read(n) or b"{}")
                ds = resolve(req)
                if self.path == "/search":
                    vec = np.asarray(req["vector"], np.float32)
                    ids, dist = searcher_for(ds).search(
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
                    ids = ds.add(vecs)
                    self._reply(200, {"ids": ids.tolist()})
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)

    def _close_searchers():
        with searchers_lock:
            for s in searchers.values():
                s.close()

    def _close():
        _close_searchers()
        server.shutdown()
        server.server_close()  # release the listening socket fd

    class _SearcherHandle:
        # back-compat: server.searcher.close() closes every coalescer
        def close(self_inner):
            _close_searchers()

    server.close = _close
    server.searcher = _SearcherHandle()
    server._searchers = searchers  # introspection (tests / ops)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
