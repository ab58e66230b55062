"""Minimal serving example: a VectorStore over JSON/HTTP.

The reference is a loadable SQLite extension, so "serving" means "embed
sqlite3 in your app". This framework's TPU datasets live in one device
process, so it ships a first-class serving layer instead: a micro-batching
coalescer (amortizes the per-dispatch RTT across concurrent clients) behind
a stdlib HTTP endpoint with per-dataset routing.

Run (starts on the configured JAX backend — the tunneled TPU when present):
    python examples/serving_http.py            # build, serve, self-query
    python examples/serving_http.py --cpu      # force the CPU backend

Then, from anywhere:
    curl -s localhost:8377/stats
    curl -s -X POST localhost:8377/search -d \
      '{"dataset": "docs", "vector": [0.1, ...], "k": 5, "mode": "rerank"}'
"""

import argparse
import json
import urllib.request

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--port", type=int, default=8377)
    p.add_argument("--n", type=int, default=50_000)
    p.add_argument("--dim", type=int, default=384)
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import sqlite_vector_tpu as svt

    print(f"backend: {svt.backend()}")

    # two datasets in one store: requests route by name
    store = svt.VectorStore()
    docs = store.create(
        "docs", f"dimension={args.dim},type=FLOAT32,distance=L2"
    )
    rng = np.random.default_rng(0)
    base = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    ids = docs.add(base)
    docs.quantize()  # enables mode=quantized / mode=rerank
    store.create("scratch", "dimension=8,type=FLOAT32,distance=COSINE")

    server = svt.serve(
        store,
        port=args.port,
        max_batch=64,       # coalesce up to 64 concurrent queries per dispatch
        max_wait_ms=2.0,    # or whatever arrives within 2 ms
        fallback_exact=True,  # serve exact results through requantize windows
    )
    print(f"serving on http://127.0.0.1:{args.port}")

    # self-query through the real endpoint: rerank mode = int8 scan traffic,
    # exact-quality float distances
    body = json.dumps({
        "dataset": "docs",
        "vector": base[123].tolist(),
        "k": 5,
        "mode": "rerank",
    }).encode()
    with urllib.request.urlopen(
        urllib.request.Request(
            f"http://127.0.0.1:{args.port}/search", data=body
        ),
        timeout=120,
    ) as resp:
        out = json.loads(resp.read())
    assert out["ids"][0] == int(ids[123]), out
    print(f"self-query OK: ids={out['ids']} distances={out['distances']}")

    with urllib.request.urlopen(
        f"http://127.0.0.1:{args.port}/stats", timeout=30
    ) as resp:
        print("stats:", resp.read().decode())

    server.close()
    print("server closed")


if __name__ == "__main__":
    main()
