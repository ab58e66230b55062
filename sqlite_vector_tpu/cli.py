"""Command-line interface: the sqlite3-shell workflow, TPU-native.

The reference is driven from the sqlite3 CLI (`.load ./vector` then SQL,
/root/reference/README.md:36-107). This CLI covers the same operator
workflow without a SQL shell, over both storage forms:

- SQLite databases (the reference's storage): init/quantize/search/import
  against BLOB columns, metadata persisted to `_sqliteai_vector` exactly
  like the C extension (shared files interoperate both ways).
- Dataset directories (the TPU-native storage): sharded .npy + JSON
  manifest, built/queried/served without SQLite in the path.

    python -m sqlite_vector_tpu version
    python -m sqlite_vector_tpu init db.sqlite docs embedding \
        "dimension=384,type=FLOAT32,distance=L2"
    python -m sqlite_vector_tpu import db.sqlite docs embedding vecs.npy
    python -m sqlite_vector_tpu quantize db.sqlite docs embedding
    python -m sqlite_vector_tpu search db.sqlite docs embedding \
        "[0.1, 0.2, ...]" -k 10 --mode quantized
    python -m sqlite_vector_tpu ds-create /data/ds \
        "dimension=384,type=FLOAT32" --npy vecs.npy
    python -m sqlite_vector_tpu ds-search /data/ds query.npy -k 10
    python -m sqlite_vector_tpu serve --dir /data/ds --port 8377
    python -m sqlite_vector_tpu recall --n 100000 --dim 384 -k 20
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load_query(spec: str, dim: int | None = None) -> "np.ndarray | str":
    """A query argument is inline JSON (`[...]`) or a path to .npy/.json."""
    s = spec.strip()
    if s.startswith("["):
        return s  # JSON text — the engine's codec handles it (parity path)
    if s.endswith(".npy"):
        return np.load(s)
    with open(s) as f:
        return f.read().strip()


def _print_results(ids, dist, as_json: bool) -> None:
    """Single query: ids/dist are [k]. Batched .npy queries: [B, k] —
    JSON keeps the nesting, text output separates queries with a header."""
    ids = np.asarray(ids)
    dist = np.asarray(dist)
    if as_json:
        print(json.dumps({"ids": ids.tolist(), "distances": dist.tolist()}))
    elif ids.ndim == 2:
        for qi in range(ids.shape[0]):
            print(f"# query {qi}")
            for i, d in zip(ids[qi], dist[qi]):
                print(f"{int(i)}\t{float(d):.6f}")
    else:
        for i, d in zip(ids.ravel(), dist.ravel()):
            print(f"{int(i)}\t{float(d):.6f}")


def _cmd_version(args) -> int:
    import sqlite_vector_tpu as svt

    print(f"sqlite_vector_tpu {svt.version()} ({svt.backend()})")
    return 0


def _cmd_init(args) -> int:
    from sqlite_vector_tpu import sqlite as svs

    with svs.connect(args.db) as conn:
        conn.vector_init(args.table, args.column, args.options)
        conn.commit()
    print(f"initialized {args.table}.{args.column} ({args.options})")
    return 0


def _cmd_import(args) -> int:
    """Bulk-load an .npy matrix into a SQLite BLOB column."""
    from sqlite_vector_tpu import sqlite as svs
    from sqlite_vector_tpu.codec import array_to_blob
    from sqlite_vector_tpu.types import VectorType, parse_options

    mat = np.load(args.npy)
    if mat.ndim != 2:
        print(f"error: {args.npy} must be 2-D, got {mat.shape}", file=sys.stderr)
        return 2
    with svs.connect(args.db) as conn:
        cur = conn.connection.cursor()
        if args.create:
            cur.execute(
                f'CREATE TABLE IF NOT EXISTS "{args.table}" '
                f'(id INTEGER PRIMARY KEY, "{args.column}" BLOB)'
            )
        if args.options:
            # after CREATE: vector_init validates table/column existence
            conn.vector_init(args.table, args.column, args.options)
        vtype = VectorType.F32
        if args.options:
            vtype = parse_options(args.options).type
        rows = [
            (array_to_blob(mat[i].astype(vtype.np_dtype)),)
            for i in range(mat.shape[0])
        ]
        cur.executemany(
            f'INSERT INTO "{args.table}" ("{args.column}") VALUES (?)', rows
        )
        conn.commit()
    print(f"imported {mat.shape[0]} vectors into {args.table}.{args.column}")
    return 0


def _cmd_quantize(args) -> int:
    from sqlite_vector_tpu import sqlite as svs

    with svs.connect(args.db) as conn:
        if args.options:
            conn.vector_init(args.table, args.column, args.options)
        n = conn.vector_quantize(args.table, args.column, args.qopts)
        conn.commit()
    print(f"quantized {n} rows")
    return 0


def _cmd_search(args) -> int:
    from sqlite_vector_tpu import sqlite as svs

    q = _load_query(args.query)
    with svs.connect(args.db) as conn:
        if args.options:
            conn.vector_init(args.table, args.column, args.options)
        if args.mode == "quantized":
            rows = conn.vector_quantize_scan(args.table, args.column, q, args.k)
        else:
            rows = conn.vector_full_scan(args.table, args.column, q, args.k)
    ids = [r[0] for r in rows]
    dist = [r[1] for r in rows]
    _print_results(ids, dist, args.json)
    return 0


def _cmd_ds_create(args) -> int:
    import sqlite_vector_tpu as svt

    ds = svt.VectorStore().create(args.name, args.options)
    if args.npy:
        mat = np.load(args.npy)
        ids = np.load(args.ids) if args.ids else None
        ds.add(mat, ids=ids)
    ds.save(args.dir)
    print(f"saved {len(ds)} rows -> {args.dir}")
    return 0


def _cmd_ds_search(args) -> int:
    import sqlite_vector_tpu as svt

    storage = "host" if args.host else "hbm"
    ds = svt.Dataset.load(args.dir, storage=storage, mmap=args.host)
    q = _load_query(args.query)
    ids, dist = ds.search(q, args.k, mode=args.mode)
    _print_results(ids, dist, args.json)
    return 0


def _cmd_ds_info(args) -> int:
    import sqlite_vector_tpu as svt

    # host+mmap: inspect the manifest without touching the device
    ds = svt.Dataset.load(args.dir, storage="host", mmap=True)
    from sqlite_vector_tpu.serving import _dataset_stats

    info = {"name": ds.name, **_dataset_stats(ds), "backend": svt.backend()}
    print(json.dumps(info, indent=2))
    return 0


def _cmd_serve(args) -> int:
    import sqlite_vector_tpu as svt

    if args.dir:
        storage = "host" if args.mmap else "hbm"
        ds = svt.Dataset.load(args.dir, storage=storage, mmap=args.mmap)
    else:
        db, table, column = args.db
        from sqlite_vector_tpu import sqlite as svs

        conn = svs.connect(db)
        if args.options:
            conn.vector_init(table, column, args.options)
        ds = conn._refresh(conn._lookup(table, column, "serve"))
    if args.quantize:
        ds.quantize()
    server = svt.serve(
        ds, args.host, args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
    )
    # install the SIGTERM handler BEFORE announcing readiness: a supervisor
    # may send it the moment the startup line appears
    import signal

    try:
        signal.signal(signal.SIGTERM, _raise_interrupt)
    except ValueError:  # non-main thread (embedded use): ctrl-C only
        pass
    try:
        # everything after the handler install sits inside the try: the
        # interrupt may land the instant the startup line is visible
        host, port = server.server_address[:2]
        print(f"serving {len(ds)} x {ds.dimension} on http://{host}:{port}")
        print("POST /search {'vector': [...], 'k': 10, 'mode': 'exact'}; "
              "ctrl-C to stop")
        _serve_block(server)
    except KeyboardInterrupt:
        server.searcher.close()
        server.shutdown()
    return 0


def _raise_interrupt(signum, frame):
    """SIGTERM (what production supervisors send) takes the same clean
    shutdown path as ctrl-C: drain the coalescer, stop the server."""
    raise KeyboardInterrupt


def _serve_block(server) -> None:
    """Block until ctrl-C/SIGTERM (separate so tests can drive the server)."""
    import threading

    threading.Event().wait()


def _cmd_warm(args) -> int:
    """Pre-compile the serving executables for a deployment shape.

    XLA executables are specialized on (padded capacity, dim, dtype, metric,
    batch bucket, k, mode); the persistent compile cache
    (~/.cache/sqlite_vector_tpu/xla) makes every LATER process start hot,
    but something must pay the first compile. Run this once per deployment
    shape — e.g. in the container build or a pre-warm init job — so the
    serving process never compiles on the query path."""
    import time

    import numpy as np

    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.serving import _BUCKETS  # the coalescer's ladder

    ds = svt.VectorStore().create(
        "warm",
        f"dimension={args.dim},type={args.dtype},distance={args.metric}",
    )
    rng = np.random.default_rng(0)
    # rows land at the same pow2-padded capacity as the production N
    ids = ds.add(rng.standard_normal((args.n, args.dim)).astype(np.float32))
    modes = args.modes.split(",")
    if any(m in ("quantized", "rerank") for m in modes):
        ds.quantize()
    buckets = [b for b in _BUCKETS if b <= args.max_batch]
    q = rng.standard_normal((max(buckets), args.dim)).astype(np.float32)

    compiled = 0
    for masked in (False, True):
        if masked:
            # a live mutator makes every search carry the tombstone mask —
            # a different traced signature; warm those variants too so the
            # first production remove() doesn't trigger query-path compiles
            ds.remove(ids[:1])
        for mode in modes:
            for b in buckets:
                t0 = time.perf_counter()
                ds.search(q[:b], args.k, mode=mode)
                compiled += 1
                tag = "masked " if masked else ""
                print(f"warm {tag}{mode:10s} B={b:<4d} "
                      f"{time.perf_counter()-t0:6.2f}s")
    print(f"compiled {compiled} executables "
          f"(capacity bucket of n={args.n}, dim={args.dim}, k={args.k})")
    return 0


def _cmd_recall(args) -> int:
    from sqlite_vector_tpu.tools import recall as rtool

    sys.argv = ["recall"] + args.rest
    rtool.main()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m sqlite_vector_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("version", help="print version and backend")

    p = sub.add_parser("init", help="vector_init on a SQLite table column")
    p.add_argument("db"); p.add_argument("table"); p.add_argument("column")
    p.add_argument("options", help='e.g. "dimension=384,type=FLOAT32,distance=L2"')

    p = sub.add_parser("import", help="bulk-load an .npy matrix into a BLOB column")
    p.add_argument("db"); p.add_argument("table"); p.add_argument("column")
    p.add_argument("npy")
    p.add_argument("--options", default=None, help="also run vector_init with these options")
    p.add_argument("--create", action="store_true", help="CREATE TABLE IF NOT EXISTS first")

    p = sub.add_parser("quantize", help="build int8 quantization for a column")
    p.add_argument("db"); p.add_argument("table"); p.add_argument("column")
    p.add_argument("--options", default=None, help="vector_init options if not yet initialized")
    p.add_argument("--qopts", default=None, help='quantize options, e.g. "qtype=INT8"')

    p = sub.add_parser("search", help="top-k scan of a SQLite column")
    p.add_argument("db"); p.add_argument("table"); p.add_argument("column")
    p.add_argument("query", help='JSON "[...]", .npy path, or text file')
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--mode", choices=("exact", "quantized"), default="exact")
    p.add_argument("--options", default=None)
    p.add_argument("--json", action="store_true", help="JSON output")

    p = sub.add_parser("ds-create", help="build + save a dataset directory")
    p.add_argument("dir")
    p.add_argument("options", help='e.g. "dimension=384,type=FLOAT32,distance=L2"')
    p.add_argument("--name", default="default")
    p.add_argument("--npy", default=None, help="initial vectors [N, dim] .npy")
    p.add_argument("--ids", default=None, help="optional row ids [N] .npy")

    p = sub.add_parser("ds-search", help="top-k search of a dataset directory")
    p.add_argument("dir")
    p.add_argument("query", help='JSON "[...]", .npy path, or text file')
    p.add_argument("-k", type=int, default=10)
    p.add_argument(
        "--mode", choices=("exact", "quantized", "rerank", "approx"),
        default="exact",
    )
    p.add_argument("--host", action="store_true",
                   help="host-streaming storage (datasets larger than HBM)")
    p.add_argument("--json", action="store_true")

    p = sub.add_parser("ds-info", help="print a dataset directory's manifest")
    p.add_argument("dir")

    p = sub.add_parser("serve", help="HTTP serving with query coalescing")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--dir", default=None, help="dataset directory")
    src.add_argument("--db", nargs=3, metavar=("DB", "TABLE", "COLUMN"),
                     default=None, help="SQLite source")
    p.add_argument("--options", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8377)
    p.add_argument("--quantize", action="store_true", help="quantize before serving")
    p.add_argument("--mmap", action="store_true")
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--max-wait-ms", type=float, default=2.0)

    p = sub.add_parser("warm", help="pre-compile serving executables for a deployment shape")
    p.add_argument("--n", type=int, default=1_000_000, help="production row count (capacity bucket)")
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("-k", type=int, default=20)
    p.add_argument("--dtype", default="FLOAT32")
    p.add_argument("--metric", default="L2")
    p.add_argument("--modes", default="exact,quantized,rerank")
    p.add_argument("--max-batch", type=int, default=64)

    sub.add_parser("recall", help="recall measurement (QUANTIZATION.md "
                   "workflow); remaining args go to tools.recall")

    # `recall` forwards every remaining argument to tools.recall's own
    # parser. A REMAINDER positional cannot do this (it never captures
    # leading optionals like `recall --n 100000`), so parse leniently and
    # re-tighten for every other command.
    args, extra = ap.parse_known_args(argv)
    if args.cmd == "recall":
        args.rest = extra
    elif extra:
        ap.error(f"unrecognized arguments: {' '.join(extra)}")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    handlers = {
        "version": _cmd_version,
        "init": _cmd_init,
        "import": _cmd_import,
        "quantize": _cmd_quantize,
        "search": _cmd_search,
        "ds-create": _cmd_ds_create,
        "ds-search": _cmd_ds_search,
        "ds-info": _cmd_ds_info,
        "serve": _cmd_serve,
        "warm": _cmd_warm,
        "recall": _cmd_recall,
    }
    from sqlite_vector_tpu.errors import VectorError

    try:
        return handlers[args.cmd](args)
    except VectorError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
