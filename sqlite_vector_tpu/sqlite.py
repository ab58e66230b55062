"""SQLite compatibility surface — the reference's SQL API over the TPU engine.

The reference is a loadable SQLite extension; its whole API is 14 scalar SQL
functions + 4 table-valued virtual tables (SURVEY.md Appendix A). This module
reproduces that surface on top of Python's stdlib sqlite3, with the scans
executed by the TPU engine:

    import sqlite_vector_tpu.sqlite as svs
    conn = svs.connect("embeddings.db")
    conn.execute("SELECT vector_init('docs', 'embedding',"
                 " 'type=FLOAT32,dimension=384,distance=L2')")
    conn.execute("SELECT vector_quantize('docs', 'embedding')")
    rows = conn.vector_full_scan("docs", "embedding", query_blob, 20)

Interop guarantees (byte-compatible with databases written by the C
extension, so either implementation can open the other's files):

  - vector blobs are the same typed little-endian format (codec.py);
  - `_sqliteai_vector(tblname, colname, key, value)` metadata with keys
    qtype (int: 1=UINT8, 2=INT8), qscale, qoffset
    (src/sqlite-vector.c:110-114, 1440-1445);
  - quantization shadow tables `vector0_<tbl>_<col>(rowid1, rowid2, counter,
    data)` whose chunk blobs are repeated `[int64-LE rowid][dim x u8/i8]`
    records in pk order, batched by max_memory/(8+dim) rows
    (src/sqlite-vector.c:1000-1005, 1117-1145, 1280-1330).

Scalar functions (vector_version, vector_backend, vector_init,
vector_quantize*, vector_as_*) are registered ON the connection, so plain SQL
works. The table-valued scans can't be registered through stdlib sqlite3
(no virtual-table API), so they are exposed as Python methods AND as
`*_json` scalar functions composable with SQLite's json_each:

    SELECT e.value ->> 'id', e.value ->> 'distance'
    FROM json_each(vector_full_scan_json('docs','embedding', :q, 20)) AS e;
"""

from __future__ import annotations

import dataclasses
import json
import sqlite3
from typing import Any, Iterator

import jax.numpy as jnp
import numpy as np

from sqlite_vector_tpu.codec import blob_to_array, vector_as_blob, vector_from_json
from sqlite_vector_tpu.native import load_blobs as native_load_blobs
from sqlite_vector_tpu.dataset import Dataset
from sqlite_vector_tpu.errors import (
    VectorCodecError,
    VectorConfigError,
    VectorStateError,
)
from sqlite_vector_tpu.ops.quantize import quantize_device
from sqlite_vector_tpu.ops.scan import fused_scan_topk, scan_distances
from sqlite_vector_tpu.types import (
    DistanceMetric,
    QuantType,
    VectorOptions,
    VectorType,
    parse_options,
)
from sqlite_vector_tpu.version import backend as _backend
from sqlite_vector_tpu.version import version as _version

# reference enum values (src/distance-cpu.h:46-48)
# 0-2 mirror the reference's enum; 3 is this engine's packed-int4
# extension. The C extension does NOT validate the stored code
# (src/sqlite-vector.c:472 casts blindly) and assumes stride 8+dim, so an
# int4-quantized table must not be preloaded by the C side — documented
# interop caveat in docs/API.md (re-quantize 8-bit first for C reads).
_QTYPE_TO_INT = {
    QuantType.AUTO: 0, QuantType.U8: 1, QuantType.I8: 2, QuantType.I4: 3,
}
_INT_TO_QTYPE = {1: QuantType.U8, 2: QuantType.I8, 3: QuantType.I4}

_INTERNAL_TABLE_SQL = (
    "CREATE TABLE IF NOT EXISTS _sqliteai_vector (tblname TEXT, colname TEXT, "
    "key TEXT, value ANY, PRIMARY KEY(tblname, colname, key));"
)


def _quote(name: str) -> str:
    """SQLite identifier quoting (the %q analogue for identifiers)."""
    return '"' + name.replace('"', '""') + '"'


def _shadow_name(table: str, column: str) -> str:
    return f"vector0_{table}_{column}"


def _shadow_name_i4(table: str, column: str) -> str:
    """Packed-int4 shadow table name. DELIBERATELY different from the
    reference's vector0_* so the C extension's preload/scan fails cleanly
    ('quantization table not found', src/sqlite-vector.c:1352-1359) instead
    of misparsing: the C side never validates the stored qtype code and
    assumes stride 8+dim, so int4 records (stride 16+ceil(dim/2)) under the
    legacy name would read past the blob for dim > 16."""
    return f"vector0i4_{table}_{column}"


@dataclasses.dataclass
class _QuantCache:
    qtype: QuantType
    scale: float
    offset: float
    codes: Any  # [cap, dim] device u8/i8 (padded), [count, P] packed u8
    # for INT4, or None until preloaded
    ids: np.ndarray | None  # rowids aligned with code rows
    count: int
    sq_norms: Any = None  # INT4: per-row csq (i32); int8: lazy norm cache
    row_scale: Any = None  # INT4 only: per-row alpha (f32)


@dataclasses.dataclass
class _TableContext:
    table: str
    column: str
    pk: str
    options: VectorOptions
    dataset: Dataset | None = None
    stamp: tuple | None = None
    # largest pk loaded so far — the append fast path loads only pk > max_pk
    max_pk: int | None = None
    quant: _QuantCache | None = None
    # quant was built inside a caller's open transaction: before serving it
    # outside one, verify the shadow table survived (a ROLLBACK is invisible
    # to the change stamp)
    quant_provisional: bool = False
    # PRAGMA schema_version recorded when `quant` was built/loaded. Every
    # re-quantize (this bridge's SAVEPOINT path and the C extension alike)
    # DROP+CREATEs the shadow table, bumping the schema cookie, and a
    # ROLLBACK reverts it — so a cookie mismatch means the cached codes no
    # longer correspond to the on-disk shadow/params generation.
    quant_schema_ver: int | None = None
    # quant params restored from _sqliteai_vector (sqlite_unserialize parity)
    stored_qtype: QuantType | None = None
    stored_scale: float | None = None
    stored_offset: float | None = None


class VectorConnection:
    """A sqlite3.Connection wrapper with the vector SQL surface registered.

    Mirrors one connection's `vector_context` in the reference
    (src/sqlite-vector.c:2555-2638): per-connection registry, metadata table
    creation, scalar-function registration.
    """

    def __init__(self, conn: sqlite3.Connection, *, device: Any = None, mesh: Any = None):
        self._conn = conn
        self._device = device
        self._mesh = mesh
        self._contexts: dict[tuple[str, str], _TableContext] = {}
        self.vtab_loaded = False
        conn.execute(_INTERNAL_TABLE_SQL)
        self._register_functions()
        self._load_vtab_extension()

    # -- plumbing -------------------------------------------------------------

    def __getattr__(self, name: str) -> Any:
        return getattr(self._conn, name)

    def __enter__(self):
        self._conn.__enter__()
        return self

    def __exit__(self, *exc):
        return self._conn.__exit__(*exc)

    @property
    def connection(self) -> sqlite3.Connection:
        return self._conn

    def _register_functions(self) -> None:
        c = self._conn
        c.create_function("vector_version", 0, lambda: _version(), deterministic=True)
        c.create_function("vector_backend", 0, lambda: _backend(), deterministic=True)
        for name, vtype in (
            ("vector_as_f32", VectorType.F32),
            ("vector_as_f16", VectorType.F16),
            ("vector_as_bf16", VectorType.BF16),
            ("vector_as_i8", VectorType.I8),
            ("vector_as_u8", VectorType.U8),
        ):
            c.create_function(name, -1, _make_vector_as(vtype), deterministic=True)
        c.create_function("vector_init", 3, self.vector_init)
        c.create_function("vector_quantize", 2, self.vector_quantize)
        c.create_function("vector_quantize", 3, self.vector_quantize)
        c.create_function("vector_quantize_memory", 2, self.vector_quantize_memory)
        c.create_function("vector_quantize_preload", 2, self.vector_quantize_preload)
        c.create_function("vector_quantize_cleanup", 2, self.vector_quantize_cleanup)
        c.create_function("vector_full_scan_json", 4, self._full_scan_json)
        c.create_function("vector_quantize_scan_json", 4, self._quantize_scan_json)
        # internal bridge for the loadable vtab extension (csrc/svt_vtab.c)
        c.create_function("svt_scan_blob", 5, self._scan_blob)

    def _load_vtab_extension(self) -> None:
        """Register the REAL table-valued scan modules so SQL written for
        the C reference runs verbatim:

            SELECT id, distance FROM vector_full_scan('t', 'c', ?, 20)

        stdlib sqlite3 has no virtual-table API, so the modules live in a
        tiny loadable C extension (csrc/svt_vtab.c) whose xFilter calls back
        into this connection's svt_scan_blob function — the scans still run
        on the TPU engine. Falls back silently to the json_each shim when
        extension loading is unavailable."""
        import os as _os

        if _os.environ.get("SVT_DISABLE_VTAB") == "1":
            return
        from sqlite_vector_tpu.native import vtab_extension_path

        path = vtab_extension_path()
        if not path or not hasattr(self._conn, "enable_load_extension"):
            return
        try:
            self._conn.enable_load_extension(True)
            try:
                # full path, suffix included: stripping '.so' makes SQLite
                # re-append the PLATFORM suffix ('.dylib' on macOS), which
                # never matches the built artifact
                self._conn.load_extension(path)
                self.vtab_loaded = True
            finally:
                self._conn.enable_load_extension(False)
        except Exception:
            self.vtab_loaded = False

    def _scan_blob(
        self, fname: str, table: str, column: str, query: Any, k: int
    ) -> bytes:
        """Internal vtab bridge: run a scan, return a packed little-endian
        blob [int64 n][n x (int64 id, float64 distance)]."""
        if fname == "full":
            rows = self.vector_full_scan(table, column, query, int(k))
        elif fname == "quant":
            rows = self.vector_quantize_scan(table, column, query, int(k))
        elif fname == "full_stream":
            rows = list(self.vector_full_scan_stream(table, column, query))
        elif fname == "quant_stream":
            rows = list(self.vector_quantize_scan_stream(table, column, query))
        else:
            raise VectorConfigError(f"unknown scan module tag '{fname}'")
        arr = np.zeros(len(rows), dtype=[("id", "<i8"), ("d", "<f8")])
        if rows:
            arr["id"] = [r[0] for r in rows]
            arr["d"] = [r[1] for r in rows]
        import struct

        return struct.pack("<q", len(rows)) + arr.tobytes()

    def _lookup(self, table: str, column: str, caller: str) -> _TableContext:
        # case-insensitive lookup (vector_context_lookup :1051)
        ctx = self._contexts.get((table.lower(), column.lower()))
        if ctx is None:
            raise VectorStateError(
                f"{caller}: table '{table}' column '{column}' was not "
                "initialized — call vector_init first."
            )
        return ctx

    def _table_columns(self, table: str) -> dict[str, str]:
        rows = self._conn.execute(
            f"PRAGMA table_info({_quote(table)})"
        ).fetchall()
        return {r[1].lower(): (r[2] or "") for r in rows}

    def _resolve_pk(self, table: str) -> str:
        """rowid, or the single INTEGER pk for WITHOUT ROWID tables
        (src/sqlite-vector.c:1081-1088, 307-348).

        The reference substring-searches the whole CREATE statement for
        "without rowid" (:307-323), which misclassifies ordinary tables
        whose SQL merely contains that text in a string literal, column
        name, or comment. pragma_table_list reports the property exactly
        (its `wr` column, SQLite >= 3.37); the reference's heuristic
        remains only as the fallback for older libraries."""
        without_rowid: bool
        try:
            row = self._conn.execute(
                "SELECT wr FROM pragma_table_list WHERE schema='main' "
                "AND lower(name)=lower(?)",
                (table,),
            ).fetchone()
            without_rowid = bool(row and row[0])
        except sqlite3.OperationalError:
            row = self._conn.execute(
                "SELECT sql FROM sqlite_master WHERE type='table' "
                "AND lower(name)=lower(?)",
                (table,),
            ).fetchone()
            sql = (row[0] or "") if row else ""
            without_rowid = "without rowid" in sql.lower()
        if not without_rowid:
            return "rowid"
        pks = [
            r
            for r in self._conn.execute(
                f"PRAGMA table_info({_quote(table)})"
            ).fetchall()
            if r[5] > 0
        ]
        if len(pks) == 1 and (pks[0][2] or "").upper().startswith("INT"):
            return pks[0][1]
        raise VectorConfigError(
            f"Table '{table}' is WITHOUT ROWID and has no single INTEGER "
            "primary key usable as a row identifier."
        )

    # -- SQL surface ------------------------------------------------------------

    def vector_init(self, table: str, column: str, options: str) -> None:
        """vector_init(t, c, opts) (src/sqlite-vector.c:2491-2543)."""
        cols = self._table_columns(table)
        if not cols:
            raise VectorConfigError(f"Table '{table}' does not exist.")
        if column.lower() not in cols:
            raise VectorConfigError(
                f"Column '{column}' does not exist in table '{table}'."
            )
        decl = cols[column.lower()].upper()
        if decl and "BLOB" not in decl:
            raise VectorConfigError(
                f"Column '{column}' must have BLOB affinity (declared '{decl}')."
            )
        opts = parse_options(options)
        if opts.dimension <= 0:
            raise VectorConfigError(
                "Required 'dimension' option is missing from vector_init."
            )
        key = (table.lower(), column.lower())
        existing = self._contexts.get(key)
        if existing is not None:
            # idempotent re-init with consistency checks (:2521-2536)
            if existing.options.dimension != opts.dimension:
                raise VectorConfigError(
                    "A vector dimension mismatch was detected: column was "
                    f"initialized with dimension {existing.options.dimension}."
                )
            if existing.options.type is not opts.type:
                raise VectorConfigError(
                    "A vector type mismatch was detected: column was "
                    f"initialized with type {existing.options.type.value}."
                )
            # reference: after the consistency checks, re-init keeps the
            # EXISTING context untouched — a different/defaulted distance in
            # the new option string is discarded (:2539-2541 "no need to
            # add a new entry")
            return None
        ctx = _TableContext(
            table=table, column=column, pk=self._resolve_pk(table), options=opts
        )
        self._unserialize_quant_params(ctx)
        self._contexts[key] = ctx
        return None

    def _unserialize_quant_params(self, ctx: _TableContext) -> None:
        """Restore qtype/qscale/qoffset (sqlite_unserialize :451-491)."""
        for key, value in self._conn.execute(
            "SELECT key, value FROM _sqliteai_vector WHERE tblname=? AND colname=?",
            (ctx.table, ctx.column),
        ):
            if key == "qtype":
                ctx.stored_qtype = _INT_TO_QTYPE.get(int(value))
            elif key == "qscale":
                ctx.stored_scale = float(value)
            elif key == "qoffset":
                ctx.stored_offset = float(value)

    # -- data refresh -------------------------------------------------------------

    def _change_stamp(self) -> tuple:
        # schema_version catches DDL (DROP/CREATE/ALTER), which bumps
        # NEITHER data_version (own connection) nor total_changes — without
        # it a cached dataset would keep serving a dropped table's vectors
        dv = self._conn.execute("PRAGMA data_version").fetchone()[0]
        sv = self._conn.execute("PRAGMA schema_version").fetchone()[0]
        return (dv, self._conn.total_changes, sv)

    def _refresh(self, ctx: _TableContext) -> Dataset:
        """(Re)load the table's vectors into the TPU dataset if the database
        changed. The reference re-walks the B-tree every scan
        (src/sqlite-vector.c:2071-2117); we reload only on change — and when
        the change is provably append-only (this connection inserted rows
        with pk above everything loaded, and nothing else), we load ONLY the
        new rows (O(new) instead of a full O(N) re-ingest per mutation).

        Inside an open transaction the loaded state is NOT cached (stamp
        None): sqlite3_total_changes does not decrement on ROLLBACK, so a
        cached stamp would keep serving rows from a rolled-back transaction.
        Per-scan reload inside transactions matches the reference's
        per-scan B-tree walk."""
        stamp = self._change_stamp()
        if ctx.dataset is not None and ctx.stamp == stamp:
            return ctx.dataset

        if self._refresh_incremental(ctx, stamp):
            return ctx.dataset

        id_arr, arr = self._load_rows(ctx, min_pk=None)
        ds = Dataset(
            f"{ctx.table}.{ctx.column}",
            dataclasses.replace(ctx.options),
            device=self._device,
            mesh=self._mesh,
        )
        if len(id_arr):
            ds.add(arr, id_arr)
        ctx.dataset = ds
        ctx.max_pk = self._table_max_pk(ctx)
        # never cache state loaded inside an open transaction — a ROLLBACK
        # is invisible to the stamp (total_changes doesn't decrement)
        ctx.stamp = None if self._conn.in_transaction else stamp
        return ds

    def _table_max_pk(self, ctx: _TableContext) -> int | None:
        """Table-wide MAX(pk) — including rows whose vector column is NULL.
        The append-only proof in _refresh_incremental needs 'pk > max_pk' to
        mean 'row did not exist at load time'; stamping with the max LOADED
        pk instead would let a pre-existing NULL-vector row above it absorb
        the total_changes delta of an UPDATE to a loaded row (serving a
        stale vector with no error)."""
        row = self._conn.execute(
            f"SELECT MAX({_quote(ctx.pk)}) FROM {_quote(ctx.table)}"
        ).fetchone()
        return int(row[0]) if row and row[0] is not None else None

    def _refresh_incremental(self, ctx: _TableContext, stamp: tuple) -> bool:
        """Append and delete fast paths. Sound because: data_version unchanged means no
        OTHER connection committed anything; total_changes counts every row
        this connection inserted/updated/deleted (triggers included); and
        max_pk is the table-wide MAX(pk) at the last (re)load, so a delta
        exactly equal to the number of rows now sitting above max_pk proves
        all changes were inserts of brand-new rows — no row that existed at
        load time can have been touched. A pk UPDATE that moves an old row
        above max_pk passes the first check but is caught by the population
        count below. Any mismatch falls back to a full reload."""
        if ctx.dataset is None or ctx.stamp is None or ctx.max_pk is None:
            return False
        old_dv, old_tc, old_sv = ctx.stamp
        new_dv, new_tc, new_sv = stamp
        if new_sv != old_sv:
            return False  # DDL happened — full reload re-validates schema
        if new_dv != old_dv:
            return False  # another connection wrote — can't attribute changes
        delta = new_tc - old_tc
        if delta <= 0:
            return False
        tq, pq, cq = _quote(ctx.table), _quote(ctx.pk), _quote(ctx.column)
        n_above = self._conn.execute(
            f"SELECT COUNT(*) FROM {tq} WHERE {pq} > ?", (ctx.max_pk,)
        ).fetchone()[0]
        n_old = self._conn.execute(
            f"SELECT COUNT({cq}) FROM {tq} WHERE {pq} <= ?", (ctx.max_pk,)
        ).fetchone()[0]
        if n_above == delta and n_old == len(ctx.dataset):
            # append-only: all delta changes are inserts above max_pk and the
            # loaded (non-NULL) population below max_pk is untouched
            id_arr, arr = self._load_rows(ctx, min_pk=ctx.max_pk)
            if len(id_arr):
                ctx.dataset.add(arr, id_arr)
            # table-wide max, NOT id_arr.max(): an appended row with a NULL
            # vector sits above every loaded pk and must not be
            # double-counted by the next append-only proof
            ctx.max_pk = self._table_max_pk(ctx)
            ctx.stamp = None if self._conn.in_transaction else stamp
            return True
        if n_above == 0 and n_old == len(ctx.dataset) - delta and delta > 0:
            # delete-only: nothing appeared above max_pk and EXACTLY delta
            # loaded rows vanished (DELETEd, or vector set to NULL — which
            # the reference's scan also skips, :2093). A vector UPDATE keeps
            # the population count and falls through to a full reload; any
            # insert below max_pk changes the count off-by-delta and falls
            # through too. Diff the surviving pk set and tombstone the rest:
            # O(delta) device cost via Dataset.remove's lazy tombstones
            # instead of a full O(N) re-ingest.
            live = np.fromiter(
                (
                    r[0]
                    for r in self._conn.execute(
                        f"SELECT {pq} FROM {tq} "
                        f"WHERE {cq} IS NOT NULL AND {pq} <= ?",
                        (ctx.max_pk,),
                    )
                ),
                np.int64,
            )
            gone = np.setdiff1d(ctx.dataset.ids, live)
            if len(gone) == delta:
                ctx.dataset.remove(gone)
                # max_pk unchanged: nothing above it
                ctx.stamp = None if self._conn.in_transaction else stamp
                return True
            return False
        return False

    def _load_rows(
        self, ctx: _TableContext, *, min_pk: int | None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Bulk-load (pk, blob) rows in pk order; min_pk loads only pk >
        min_pk (the append fast path). Returns (ids [N], vectors [N, dim])."""
        dim = ctx.options.dimension
        expected = dim * ctx.options.type.itemsize
        where = f" WHERE {_quote(ctx.pk)} > {int(min_pk)}" if min_pk is not None else ""
        query = (
            f"SELECT {_quote(ctx.pk)}, {_quote(ctx.column)} FROM "
            f"{_quote(ctx.table)}{where} ORDER BY {_quote(ctx.pk)}"
        )

        # native bulk loader (csrc/svt_native.cpp): only safe against the
        # committed on-disk state, so skip it for :memory: DBs and open
        # transactions
        path = self._db_path()
        if path is not None and not self._conn.in_transaction:
            loaded = native_load_blobs(path, query, expected)
            if loaded is not None:
                id_arr, data, count = loaded
                arr = np.frombuffer(data, dtype=ctx.options.type.np_dtype)
                return id_arr, (
                    arr.reshape(count, dim) if count else arr.reshape(0, dim)
                )

        ids: list[int] = []
        blobs: list[bytes] = []
        for rowid, blob in self._conn.execute(query):
            if blob is None:
                continue  # NULL vectors silently skipped (:2093, :1214)
            if len(blob) < expected:
                raise VectorCodecError(
                    f"Invalid vector size for rowid {rowid}: expected at "
                    f"least {expected} bytes but found {len(blob)}."
                )
            ids.append(rowid)
            blobs.append(blob[:expected])
        id_arr = np.asarray(ids, np.int64)
        arr = np.frombuffer(b"".join(blobs), dtype=ctx.options.type.np_dtype)
        return id_arr, arr.reshape(len(ids), dim) if ids else arr.reshape(0, dim)

    def _db_path(self) -> str | None:
        for _, name, path in self._conn.execute("PRAGMA database_list"):
            if name == "main":
                return path or None
        return None

    # -- quantization -------------------------------------------------------------

    def vector_quantize(self, table: str, column: str, options: str | None = None) -> int:
        """vector_quantize(t, c[, opts]) (src/sqlite-vector.c:1406-1459).

        Quantizes on the TPU, then writes the reference-format shadow table
        and metadata inside a transaction. Returns the quantized row count.
        """
        ctx = self._lookup(table, column, "vector_quantize")
        opts = parse_options(options, ctx.options)
        ds = self._refresh(ctx)
        ds.quantize(qtype=opts.qtype)
        # one snapshot: Dataset.quantize builds OUTSIDE the mutation lock, so
        # a concurrent add/remove (serving mutator) can swap ds.ids between
        # the build and this read — codes, ids, and count must all come from
        # the same _QuantState generation or shadow records pair code rows
        # with the wrong rowids
        qsnap = ds._quant
        count = qsnap.count if qsnap is not None else 0

        # effective qtype decides BOTH the shadow name and the stored qtype
        # code — deriving the name from `count > 0` let a zero-row INT4
        # quantize store qtype=3 beside a legacy-named shadow, which the
        # cross-connection loader then rejected unrecoverably (r5 review)
        eff_qtype = (
            qsnap.qtype
            if count
            else (QuantType.U8 if opts.qtype is QuantType.AUTO else opts.qtype)
        )
        is_i4 = eff_qtype is QuantType.I4
        shadow = (
            _shadow_name_i4(ctx.table, ctx.column)
            if is_i4
            else _shadow_name(ctx.table, ctx.column)
        )
        cur = self._conn.cursor()
        # SAVEPOINT (not BEGIN): works standalone AND inside a caller's open
        # transaction, like the reference's quantize running under SQLite's
        # statement journal (src/sqlite-vector.c:1418-1437)
        was_in_txn = self._conn.in_transaction
        cur.execute("SAVEPOINT svt_quantize")
        try:
            # drop BOTH generations: a re-quantize that flips int4<->int8
            # must not leave the other format's records behind (a stale
            # legacy-named table would be exactly what a C-side preload
            # picks up)
            cur.execute(
                f"DROP TABLE IF EXISTS "
                f"{_quote(_shadow_name(ctx.table, ctx.column))}"
            )
            cur.execute(
                f"DROP TABLE IF EXISTS "
                f"{_quote(_shadow_name_i4(ctx.table, ctx.column))}"
            )
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS {_quote(shadow)} "
                "(rowid1 INTEGER, rowid2 INTEGER, counter INTEGER, data BLOB)"
            )
            if count:
                qtype, scale, offset = (
                    qsnap.qtype, float(qsnap.scale), float(qsnap.offset)
                )
                codes = np.asarray(qsnap.codes)[:count]
                rowids = qsnap.ids
                if qtype is QuantType.I4:
                    # packed-int4 record (this engine's extension — no
                    # reference format exists at 4 bits):
                    # [int64-LE rowid][f32-LE alpha][i32-LE csq][P packed]
                    p_width = codes.shape[1]
                    q_size = 16 + p_width
                    alpha = np.asarray(qsnap.row_scale)[:count]
                    csq = np.asarray(qsnap.sq_norms)[:count]
                else:
                    q_size = 8 + ctx.options.dimension
                max_vectors = max(int(opts.max_memory) // q_size, 1)
                for start in range(0, count, max_vectors):
                    end = min(start + max_vectors, count)
                    chunk_ids = rowids[start:end]
                    # vectorized record packing: [int64-LE rowid][payload]
                    recs = np.empty((end - start, q_size), np.uint8)
                    recs[:, :8] = (
                        np.ascontiguousarray(chunk_ids.astype("<i8"))
                        .view(np.uint8)
                        .reshape(-1, 8)
                    )
                    if qtype is QuantType.I4:
                        recs[:, 8:12] = (
                            np.ascontiguousarray(alpha[start:end], "<f4")
                            .view(np.uint8).reshape(-1, 4)
                        )
                        recs[:, 12:16] = (
                            np.ascontiguousarray(csq[start:end], "<i4")
                            .view(np.uint8).reshape(-1, 4)
                        )
                        recs[:, 16:] = codes[start:end]
                    else:
                        # slice off any 2-D-mesh dim padding: shadow records
                        # are sized to the TRUE dimension (reference stride
                        # 8+dim)
                        recs[:, 8:] = codes[
                            start:end, : ctx.options.dimension
                        ].view(np.uint8)
                    cur.execute(
                        f"INSERT INTO {_quote(shadow)} "
                        "(rowid1, rowid2, counter, data) VALUES (?, ?, ?, ?)",
                        (
                            int(chunk_ids[0]),
                            int(chunk_ids[-1]),
                            end - start,
                            recs.tobytes(),
                        ),
                    )
            else:
                qtype = eff_qtype
                scale, offset = 1.0, 0.0
            for key, val in (
                ("qtype", _QTYPE_TO_INT[qtype]),
                ("qscale", float(scale)),
                ("qoffset", float(offset)),
            ):
                cur.execute(
                    "REPLACE INTO _sqliteai_vector (tblname, colname, key, value) "
                    "VALUES (?, ?, ?, ?)",
                    (ctx.table, ctx.column, key, val),
                )
            cur.execute("RELEASE svt_quantize")
            # commit ONLY the implicit transaction the SAVEPOINT itself
            # started; a caller's open transaction stays open (the reference
            # runs under the enclosing transaction, never commits it)
            if self._conn.in_transaction and not was_in_txn:
                self._conn.commit()
        except Exception:
            cur.execute("ROLLBACK TO svt_quantize")
            cur.execute("RELEASE svt_quantize")
            raise
        ctx.stored_qtype, ctx.stored_scale, ctx.stored_offset = (
            qtype,
            float(scale),
            float(offset),
        )
        # our quantize wrote fresh codes; cache them directly (the reference
        # re-preloads only if previously preloaded, :1457-1471 — device
        # residency is the natural state here)
        if count:
            ctx.quant = _QuantCache(
                qtype=qtype,
                scale=float(scale),
                offset=float(offset),
                codes=qsnap.codes,
                ids=np.array(rowids, np.int64),
                count=count,
                sq_norms=qsnap.sq_norms if qtype is QuantType.I4 else None,
                row_scale=(
                    qsnap.row_scale if qtype is QuantType.I4 else None
                ),
            )
        else:
            ctx.quant = _QuantCache(qtype, float(scale), float(offset), None, None, 0)
        # inside a caller's open transaction the cache is provisional: a
        # later ROLLBACK drops the shadow table invisibly to the stamp
        ctx.quant_provisional = self._conn.in_transaction
        # the cookie the shadow writes produced (pending value inside an
        # open transaction): _require_quant compares it to decide both
        # promote-vs-drop at transaction end and cross-connection freshness
        ctx.quant_schema_ver = self._schema_ver()
        # refresh the stamp: the shadow-table writes changed the database
        # (never cache a stamp taken inside an open transaction)
        ctx.stamp = (
            None if self._conn.in_transaction else self._change_stamp()
        )
        return count

    def _schema_ver(self) -> int:
        """The connection's current schema cookie (pending value inside an
        open transaction; reverted by ROLLBACK; bumped by every shadow
        DROP+CREATE from either engine)."""
        return int(
            self._conn.execute("PRAGMA schema_version").fetchone()[0]
        )

    def _find_shadow(self, ctx: _TableContext) -> str | None:
        """Name of whichever shadow generation exists (legacy reference
        format or this engine's packed-int4 table), or None."""
        for name in (
            _shadow_name(ctx.table, ctx.column),
            _shadow_name_i4(ctx.table, ctx.column),
        ):
            row = self._conn.execute(
                "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
                (name,),
            ).fetchone()
            if row is not None:
                return name
        return None

    def _shadow_exists(self, ctx: _TableContext) -> bool:
        return self._find_shadow(ctx) is not None

    def _load_quant_from_shadow(self, ctx: _TableContext) -> _QuantCache:
        """Read reference-format shadow chunks into device int8 codes —
        the interop analogue of vector_quantize_preload
        (src/sqlite-vector.c:1338-1404)."""
        # record the cookie BEFORE reading: if another connection
        # re-quantizes mid-load, the next _require_quant sees a moved cookie
        # and reloads (conservative, never stale)
        schema_ver = self._schema_ver()
        if not self._shadow_exists(ctx):
            raise VectorStateError(
                "vector_quantize_scan: quantization table not found — run "
                "vector_quantize first."
            )
        # ALWAYS re-read the params: codes and qtype/scale/offset must come
        # from the same generation — another connection may have
        # re-quantized with a different qtype (AUTO flipping I8<->U8) or
        # scale since vector_init unserialized them
        self._unserialize_quant_params(ctx)
        if ctx.stored_qtype is None or ctx.stored_scale is None:
            raise VectorStateError(
                "vector_quantize_scan: quantization parameters not found in "
                "_sqliteai_vector — run vector_quantize first."
            )
        dim = ctx.options.dimension
        if ctx.stored_qtype is QuantType.I4:
            # packed-int4 extension records (see vector_quantize):
            # [int64-LE rowid][f32-LE alpha][i32-LE csq][P packed] — under
            # the i4-specific shadow name (legacy readers must not find it)
            from sqlite_vector_tpu.ops.quantize4 import packed_width

            p_width = packed_width(dim)
            q_size = 16 + p_width
            shadow = _shadow_name_i4(ctx.table, ctx.column)
        else:
            q_size = 8 + dim
            shadow = _shadow_name(ctx.table, ctx.column)
        row = self._conn.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
            (shadow,),
        ).fetchone()
        if row is None:
            # params and records disagree on the format generation (e.g. a
            # C-side re-quantize replaced the legacy shadow but an i4 qtype
            # row survived, or vice versa) — never parse records with the
            # other format's stride
            raise VectorStateError(
                "vector_quantize_scan: quantization table does not match "
                "the stored qtype — run vector_quantize again."
            )
        all_ids: list[np.ndarray] = []
        all_codes: list[np.ndarray] = []
        all_alpha: list[np.ndarray] = []
        all_csq: list[np.ndarray] = []
        for counter, data in self._conn.execute(
            f"SELECT counter, data FROM {_quote(shadow)}"
        ):
            rec = np.frombuffer(data, np.uint8).reshape(counter, q_size)
            all_ids.append(rec[:, :8].copy().view("<i8").reshape(-1))
            if ctx.stored_qtype is QuantType.I4:
                all_alpha.append(rec[:, 8:12].copy().view("<f4").reshape(-1))
                all_csq.append(rec[:, 12:16].copy().view("<i4").reshape(-1))
                all_codes.append(rec[:, 16:])
            else:
                all_codes.append(rec[:, 8:])
        if all_codes:
            ids = np.concatenate(all_ids)
            codes = np.concatenate(all_codes)
        else:
            ids = np.zeros((0,), np.int64)
            codes = np.zeros(
                (0, p_width if ctx.stored_qtype is QuantType.I4 else dim),
                np.uint8,
            )
        count = len(ids)
        ctx.quant_schema_ver = schema_ver
        if ctx.stored_qtype is QuantType.I4:
            alpha = (
                np.concatenate(all_alpha) if all_alpha
                else np.zeros((0,), np.float32)
            )
            csq = (
                np.concatenate(all_csq) if all_csq
                else np.zeros((0,), np.int32)
            )
            # capacity padding like the int8 branch: the jitted scan's
            # shapes stabilize at powers of two, so periodic re-quantizes
            # with drifting row counts reuse one executable (valid_count
            # masks the pad rows)
            cap4 = max(1 << max(count - 1, 1).bit_length(), 1024)
            pk = np.zeros((cap4, codes.shape[1]), np.uint8)
            pk[:count] = codes
            pa = np.zeros((cap4,), np.float32)
            pa[:count] = alpha
            pc = np.zeros((cap4,), np.int32)
            pc[:count] = csq
            return _QuantCache(
                qtype=QuantType.I4,
                scale=1.0,
                offset=0.0,
                codes=jnp.asarray(pk),
                ids=ids,
                count=count,
                sq_norms=jnp.asarray(pc),
                row_scale=jnp.asarray(pa),
            )
        if ctx.stored_qtype is QuantType.I8:
            codes = codes.view(np.int8)
        cap = max(1 << max(count - 1, 1).bit_length(), 1024)
        padded = np.zeros((cap, dim), codes.dtype)
        padded[:count] = codes
        return _QuantCache(
            qtype=ctx.stored_qtype,
            scale=float(ctx.stored_scale),
            offset=float(ctx.stored_offset or 0.0),
            codes=jnp.asarray(padded),
            ids=ids,
            count=count,
        )

    def _require_quant(self, ctx: _TableContext) -> _QuantCache:
        if (
            ctx.quant is not None
            and ctx.quant_provisional
            and not self._conn.in_transaction
        ):
            # the transaction that built this quant has ended. Promote only
            # if the schema cookie still matches the value recorded when the
            # shadow was written: a ROLLBACK reverts the cookie along with
            # the shadow/metadata, and mere shadow existence cannot tell
            # "our write committed" from "an older shadow survived the
            # rollback" (serving rolled-back codes/rowids otherwise).
            if (
                self._shadow_exists(ctx)
                and ctx.quant_schema_ver == self._schema_ver()
            ):
                ctx.quant_provisional = False
            else:
                # rolled back (or further schema churn): drop the cache AND
                # the init-time params so the next scan reloads whatever
                # shadow/params generation actually survived on disk — or
                # errors exactly like the reference (:1780-1787)
                ctx.quant = None
                ctx.stored_qtype = None
                ctx.stored_scale = None
                ctx.stored_offset = None
        if ctx.quant is not None and (
            ctx.quant.codes is not None or ctx.quant.count == 0
        ):
            # freshness: every re-quantize — this bridge's or the C
            # extension's, this connection's or another's — DROP+CREATEs
            # the shadow and bumps the schema cookie; a moved cookie means
            # the cached codes/params are a dead generation
            if ctx.quant_schema_ver == self._schema_ver():
                return ctx.quant
            ctx.quant = None
        ctx.quant = self._load_quant_from_shadow(ctx)
        return ctx.quant

    def vector_quantize_memory(self, table: str, column: str) -> int:
        """SUM(LENGTH(data)) over the shadow table (:1486-1499)."""
        ctx = self._lookup(table, column, "vector_quantize_memory")
        shadow = self._find_shadow(ctx)
        if shadow is None:
            raise VectorStateError(
                "vector_quantize_memory: quantization table not found — run "
                "vector_quantize first."
            )
        row = self._conn.execute(
            f"SELECT SUM(LENGTH(data)) FROM {_quote(shadow)}"
        ).fetchone()
        return int(row[0] or 0)

    def vector_quantize_preload(self, table: str, column: str) -> None:
        """Pin the quantized codes on-device (:1338-1404)."""
        ctx = self._lookup(table, column, "vector_quantize_preload")
        self._require_quant(ctx)
        return None

    def vector_quantize_cleanup(self, table: str, column: str) -> None:
        """Free the cache and DROP the shadow table (:1501-1524)."""
        key = (table.lower(), column.lower())
        ctx = self._contexts.get(key)
        if ctx is not None:
            ctx.quant = None
            # use the INIT casing for the shadow name — vector_quantize
            # created it from ctx.table/ctx.column, so a different-cased
            # cleanup call must still hit the same table
            table, column = ctx.table, ctx.column
        was_in_txn = self._conn.in_transaction
        self._conn.execute(
            f"DROP TABLE IF EXISTS {_quote(_shadow_name(table, column))}"
        )
        self._conn.execute(
            f"DROP TABLE IF EXISTS {_quote(_shadow_name_i4(table, column))}"
        )
        # commit only the transaction this DROP itself started — never the
        # caller's open transaction
        if self._conn.in_transaction and not was_in_txn:
            self._conn.commit()
        return None

    # -- scans ---------------------------------------------------------------------

    def _coerce_query(self, ctx: _TableContext, value: Any) -> np.ndarray:
        if isinstance(value, str):
            return vector_from_json(value, ctx.options.type, ctx.options.dimension)
        if isinstance(value, (bytes, bytearray, memoryview)):
            return blob_to_array(bytes(value), ctx.options.type, ctx.options.dimension)
        arr = np.asarray(value)
        if arr.shape != (ctx.options.dimension,):
            raise VectorCodecError(
                f"Invalid vector dimension: expected {ctx.options.dimension} "
                f"but found {arr.shape}."
            )
        return arr.astype(ctx.options.type.np_dtype)

    def vector_full_scan(
        self, table: str, column: str, query: Any, k: int
    ) -> list[tuple[int, float]]:
        """Exact top-k — the vector_full_scan virtual table
        (src/sqlite-vector.c:2071-2117). Returns [(rowid, distance)] asc."""
        ctx = self._lookup(table, column, "vector_full_scan")
        if k <= 0:
            return []  # k=0 -> empty (:1796)
        ds = self._refresh(ctx)
        q = self._coerce_query(ctx, query)
        ids, dist = ds.search(q, k)
        return [(int(i), float(d)) for i, d in zip(ids, dist)]

    def vector_quantize_scan(
        self, table: str, column: str, query: Any, k: int
    ) -> list[tuple[int, float]]:
        """Approximate top-k over the quantized codes
        (src/sqlite-vector.c:2159-2236). Distances are in the quantized
        domain, as in the reference."""
        ctx = self._lookup(table, column, "vector_quantize_scan")
        if k <= 0:
            return []
        quant = self._require_quant(ctx)
        if quant.count == 0:
            return []
        q = self._coerce_query(ctx, query)
        ds = ctx.dataset
        if (
            ds is not None
            and ds._quant is not None
            and quant.codes is ds._quant.codes
        ):
            # own-connection quantize: delegate to the Dataset path, which
            # carries the mesh handling (2-D dim padding, sharded placement,
            # ICI merge) this bespoke single-device path lacks
            ids_arr, vals_arr = ds.search(q, k, mode="quantized")
            return [
                (int(i), float(v)) for i, v in zip(ids_arr, vals_arr)
            ]
        if quant.qtype is QuantType.I4:
            # packed-int4 extension: original-domain approximate distances
            # (per-row scales compose in the epilogue — ops/quantize4.py)
            from sqlite_vector_tpu.ops.quantize4 import int4_scan_topk

            vals, idx = int4_scan_topk(
                jnp.asarray(q[None, :].astype(np.float32)),
                quant.codes,
                quant.row_scale,
                quant.sq_norms,
                ctx.options.distance,
                k,
                dim=ctx.options.dimension,
                valid_count=quant.count,
            )
            vals = np.asarray(vals)[0]
            idx = np.asarray(idx)[0]
            keep = idx >= 0
            return [
                (int(quant.ids[i]), float(v))
                for i, v in zip(idx[keep], vals[keep])
            ]
        qq = quantize_device(
            jnp.asarray(q[None, :].astype(np.float32)),
            quant.scale,
            quant.offset,
            quant.qtype,
        )
        if quant.sq_norms is None and ctx.options.distance in (
            DistanceMetric.L2,
            DistanceMetric.SQUARED_L2,
            DistanceMetric.COSINE,
        ):
            ci = quant.codes.astype(jnp.int32)
            quant.sq_norms = jnp.sum(ci * ci, axis=-1)
        vals, idx = fused_scan_topk(
            qq,
            quant.codes,
            ctx.options.distance,
            k,
            valid_count=quant.count,
            base_sq_norms=quant.sq_norms,
        )
        vals = np.asarray(vals)[0]
        idx = np.asarray(idx)[0]
        keep = idx >= 0
        return [
            (int(quant.ids[i]), float(v)) for i, v in zip(idx[keep], vals[keep])
        ]

    def vector_full_scan_stream(
        self, table: str, column: str, query: Any
    ) -> Iterator[tuple[int, float]]:
        """Every (rowid, distance), unordered — the *_stream virtual table
        (src/sqlite-vector.c:2243-2313)."""
        ctx = self._lookup(table, column, "vector_full_scan_stream")
        ds = self._refresh(ctx)
        q = self._coerce_query(ctx, query)
        dist = ds.distances(q)
        for rid, d in zip(ds.ids, dist):
            yield (int(rid), float(d))

    def vector_quantize_scan_stream(
        self, table: str, column: str, query: Any
    ) -> Iterator[tuple[int, float]]:
        """Quantized-domain streaming distances (src/sqlite-vector.c:2315-2365)."""
        ctx = self._lookup(table, column, "vector_quantize_scan_stream")
        quant = self._require_quant(ctx)
        if quant.count == 0:
            return
        q = self._coerce_query(ctx, query)
        ds = ctx.dataset
        if (
            ds is not None
            and ds._quant is not None
            and quant.codes is ds._quant.codes
        ):
            # own-connection quantize: the Dataset path carries the mesh
            # handling (see vector_quantize_scan)
            dist = np.asarray(ds.distances(q, exact=False))
            for rid, d in zip(quant.ids, dist):
                yield (int(rid), float(d))
            return
        if quant.qtype is QuantType.I4:
            from sqlite_vector_tpu.ops.quantize4 import int4_scan_distances

            dist = np.asarray(
                int4_scan_distances(
                    jnp.asarray(q[None, :].astype(np.float32)),
                    quant.codes,
                    quant.row_scale,
                    quant.sq_norms,
                    ctx.options.distance,
                    dim=ctx.options.dimension,
                )
            )[0, : quant.count]
            for rid, d in zip(quant.ids, dist):
                yield (int(rid), float(d))
            return
        qq = quantize_device(
            jnp.asarray(q[None, :].astype(np.float32)),
            quant.scale,
            quant.offset,
            quant.qtype,
        )
        dist = np.asarray(scan_distances(qq, quant.codes, ctx.options.distance))[
            0, : quant.count
        ]
        for rid, d in zip(quant.ids, dist):
            yield (int(rid), float(d))

    # -- JSON TVF shims ---------------------------------------------------------

    def _full_scan_json(self, table: str, column: str, query: Any, k: int) -> str:
        return json.dumps(
            [
                {"id": i, "distance": d}
                for i, d in self.vector_full_scan(table, column, query, k)
            ]
        )

    def _quantize_scan_json(self, table: str, column: str, query: Any, k: int) -> str:
        return json.dumps(
            [
                {"id": i, "distance": d}
                for i, d in self.vector_quantize_scan(table, column, query, k)
            ]
        )


def _make_vector_as(vtype: VectorType):
    def fn(*args):
        if not 1 <= len(args) <= 2:
            raise VectorConfigError(
                f"vector_as_{vtype.value.lower()} expects 1 or 2 arguments."
            )
        dim = int(args[1]) if len(args) == 2 else 0
        return vector_as_blob(args[0], vtype, dim)

    return fn


def connect(
    database: str, *, device: Any = None, mesh: Any = None, **kwargs: Any
) -> VectorConnection:
    """Open a SQLite database with the vector SQL surface registered —
    the analogue of `.load ./vector` + sqlite3_vector_init
    (src/sqlite-vector.c:2555-2638)."""
    conn = sqlite3.connect(database, **kwargs)
    return VectorConnection(conn, device=device, mesh=mesh)


def wrap(
    conn: sqlite3.Connection, *, device: Any = None, mesh: Any = None
) -> VectorConnection:
    """Register the vector SQL surface on an existing connection."""
    return VectorConnection(conn, device=device, mesh=mesh)
