#!/usr/bin/env python
"""Semantic search over documents with sqlite_vector_tpu.

The TPU port of the reference's examples/semantic_search: documents are
embedded (384-dim), stored as FLOAT32 blobs in a plain SQLite table through
the compatibility surface, int8-quantized, and served with quantized scans —
the same workload (reference: examples/semantic_search/semantic_search.py:
vector_init with dim=384 :68-70, re-quantize after each indexing batch
:135-137, query via vector_quantize_scan :168-173).

Usage:
    python semantic_search.py index ./samples      # index a directory
    python semantic_search.py search "query text"  # top-k search
    python semantic_search.py repl                 # interactive
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

import sqlite_vector_tpu.sqlite as svs  # noqa: E402
from sqlite_vector_tpu.models import DIM, get_embedder  # noqa: E402

DB_PATH = os.path.join(os.path.dirname(__file__), "search.db")


def open_db() -> svs.VectorConnection:
    conn = svs.connect(DB_PATH)
    conn.execute(
        "CREATE TABLE IF NOT EXISTS documents ("
        " id INTEGER PRIMARY KEY, path TEXT UNIQUE, content TEXT,"
        " embedding BLOB)"
    )
    conn.commit()
    # normalized=1: embeddings are unit-norm (the embedders L2-normalize;
    # index_dir re-normalizes defensively), so the engine scans cosine as a
    # pure dot product — the fast path the reference parses but never uses
    conn.vector_init(
        "documents",
        "embedding",
        f"type=FLOAT32,dimension={DIM},distance=COSINE,normalized=1",
    )
    return conn


def index_dir(conn: svs.VectorConnection, embedder, directory: str) -> None:
    paths, texts = [], []
    for name in sorted(os.listdir(directory)):
        p = os.path.join(directory, name)
        if not os.path.isfile(p):
            continue
        with open(p, errors="replace") as f:
            texts.append(f.read())
        paths.append(p)
    if not paths:
        print("no files found")
        return
    t0 = time.time()
    vecs = embedder.encode(texts)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs / np.where(norms > 0, norms, 1.0)  # normalized=1 contract
    print(f"embedded {len(paths)} docs in {time.time() - t0:.2f}s "
          f"({embedder.name})")
    conn.executemany(
        "INSERT INTO documents(path, content, embedding) VALUES (?, ?, ?) "
        "ON CONFLICT(path) DO UPDATE SET content=excluded.content, "
        "embedding=excluded.embedding",
        [
            (p, t, vecs[i].astype(np.float32).tobytes())
            for i, (p, t) in enumerate(zip(paths, texts))
        ],
    )
    conn.commit()
    # re-quantize after each indexing batch (reference :135-137)
    n = conn.vector_quantize("documents", "embedding")
    print(f"indexed + quantized {n} documents")


def search(conn: svs.VectorConnection, embedder, query: str, k: int = 5) -> None:
    qvec = embedder.encode([query])[0].astype(np.float32)
    t0 = time.time()
    if conn.vtab_loaded:
        # the reference's own documented query shape (README.md:96-100),
        # verbatim — one SQL round trip via the real table-valued function
        rows = conn.execute(
            "SELECT d.path, d.content, v.distance FROM documents AS d "
            "JOIN vector_quantize_scan('documents', 'embedding', ?, ?) AS v "
            "ON d.id = v.rowid ORDER BY v.distance",
            (qvec.tobytes(), k),
        ).fetchall()
    else:  # json_each fallback engines
        rows = [
            conn.execute(
                "SELECT path, content, ? FROM documents WHERE id=?", (dist, rowid)
            ).fetchone()
            for rowid, dist in conn.vector_quantize_scan(
                "documents", "embedding", qvec.tobytes(), k
            )
        ]
    dt = time.time() - t0
    for rank, (path, content, dist) in enumerate(rows, 1):
        snippet = " ".join(content.split())[:100]
        print(f"{rank}. [{dist:.4f}] {os.path.basename(path)}: {snippet}")
    print(f"({dt * 1000:.1f} ms)")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("index")
    pi.add_argument("directory")
    ps = sub.add_parser("search")
    ps.add_argument("query")
    ps.add_argument("-k", type=int, default=5)
    sub.add_parser("repl")
    args = p.parse_args()

    embedder = get_embedder()
    conn = open_db()
    if args.cmd == "index":
        index_dir(conn, embedder, args.directory)
    elif args.cmd == "search":
        search(conn, embedder, args.query, args.k)
    else:
        print("commands: index <dir> | search <text> | quit")
        while True:
            try:
                line = input("semsearch> ").strip()
            except (EOFError, KeyboardInterrupt):
                break
            if not line or line in ("quit", "exit"):
                break
            if line.startswith("index "):
                index_dir(conn, embedder, line[6:].strip())
            elif line.startswith("search "):
                search(conn, embedder, line[7:].strip())
            else:
                print("commands: index <dir> | search <text> | quit")


if __name__ == "__main__":
    main()
