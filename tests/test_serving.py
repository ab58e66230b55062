"""Serving layer: query coalescing and the HTTP endpoint."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import sqlite_vector_tpu as svt
from sqlite_vector_tpu.serving import BatchingSearcher, _bucket, serve


@pytest.fixture
def ds(rng):
    ds = svt.VectorStore().create("srv", "dimension=32,type=FLOAT32,distance=L2")
    ds.add(rng.standard_normal((500, 32)).astype(np.float32))
    return ds


def test_bucket_schedule():
    assert _bucket(1) == 1 and _bucket(3) == 4 and _bucket(64) == 64
    assert _bucket(65) == 128 and _bucket(9999) == 256


def test_batching_searcher_concurrent(ds, rng):
    base = ds._host_vectors[: len(ds)]
    searcher = BatchingSearcher(ds, max_batch=32, max_wait_ms=5)
    try:
        results = {}
        errors = []

        def worker(i):
            try:
                ids, dist = searcher.search(base[i], 3)
                results[i] = (ids, dist)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(40)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errors
        assert len(results) == 40
        for i, (ids, dist) in results.items():
            assert ids[0] == ds.ids[i] and dist[0] == 0.0
    finally:
        searcher.close()


def test_batching_searcher_mixed_k(ds):
    base = ds._host_vectors[: len(ds)]
    searcher = BatchingSearcher(ds, max_wait_ms=5)
    try:
        f1 = searcher.submit(base[0], 3)
        f2 = searcher.submit(base[1], 7)
        ids1, _ = f1.result(timeout=30)
        ids2, _ = f2.result(timeout=30)
        assert len(ids1) == 3 and len(ids2) == 7
    finally:
        searcher.close()


def test_http_server(ds):
    server = serve(ds, port=0)  # ephemeral port
    try:
        port = server.server_address[1]
        base = ds._host_vectors[: len(ds)]

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read())

        out = post("/search", {"vector": base[5].tolist(), "k": 4})
        assert out["ids"][0] == int(ds.ids[5]) and out["distances"][0] == 0.0

        out = post("/add", {"vectors": [base[0].tolist()]})
        assert len(out["ids"]) == 1

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=10
        ) as r:
            stats = json.loads(r.read())
        assert stats["count"] == 501 and stats["dimension"] == 32
    finally:
        server.searcher.close()
        server.shutdown()


def test_concurrent_add_and_search(ds, rng):
    """Mutation lock: concurrent adds must not lose rows or corrupt ids."""
    base = ds._host_vectors[: len(ds)].copy()
    start_count = len(ds)
    errors = []

    def adder(i):
        try:
            ds.add(rng.standard_normal((10, 32)).astype(np.float32))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher(i):
        try:
            ids, dist = ds.search(base[i % start_count], 3)
            assert len(ids) == 3
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=adder, args=(i,)) for i in range(8)]
    threads += [threading.Thread(target=searcher, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors
    assert len(ds) == start_count + 80
    assert len(np.unique(ds.ids)) == len(ds)  # no duplicated/lost ids
    # every original row still findable at distance 0
    got, dist = ds.search(base[7], 1)
    assert dist[0] == 0.0
