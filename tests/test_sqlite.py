"""SQLite compatibility surface tests.

Covers the SQL API inventory of SURVEY.md Appendix A: scalar functions,
scans, quantize lifecycle, metadata persistence, and — when the compiled C
reference is available at /tmp/refbuild/vector.so — byte-level interop of the
shadow-table format in both directions.
"""

import json
import os
import sqlite3
import struct

import numpy as np
import pytest

import sqlite_vector_tpu.sqlite as svs
from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.errors import VectorConfigError, VectorStateError
from sqlite_vector_tpu.types import DistanceMetric, QuantType, VectorType

DIM = 32
N = 300

REF_SO = "/tmp/refbuild/vector.so"


@pytest.fixture
def data(rng):
    return rng.standard_normal((N, DIM)).astype(np.float32)


@pytest.fixture
def conn(tmp_path, data):
    c = svs.connect(str(tmp_path / "t.db"))
    c.execute("CREATE TABLE docs (id INTEGER PRIMARY KEY, v BLOB, label TEXT)")
    c.executemany(
        "INSERT INTO docs(v, label) VALUES (?, ?)",
        ((row.tobytes(), f"row{i}") for i, row in enumerate(data)),
    )
    c.commit()
    c.execute(
        "SELECT vector_init('docs', 'v', "
        f"'type=FLOAT32,dimension={DIM},distance=L2')"
    )
    return c


def test_version_backend_sql(conn):
    v = conn.execute("SELECT vector_version()").fetchone()[0]
    b = conn.execute("SELECT vector_backend()").fetchone()[0]
    assert v and b


def test_vector_as_functions(conn):
    blob = conn.execute("SELECT vector_as_f32('[1, 2.5, -3]')").fetchone()[0]
    assert np.frombuffer(blob, np.float32).tolist() == [1.0, 2.5, -3.0]
    blob = conn.execute("SELECT vector_as_u8('[0, 255]', 2)").fetchone()[0]
    assert list(blob) == [0, 255]
    with pytest.raises(sqlite3.OperationalError):
        conn.execute("SELECT vector_as_u8('[300]')").fetchone()
    # BLOB passthrough with size validation
    raw = np.arange(4, dtype=np.float32).tobytes()
    out = conn.execute("SELECT vector_as_f32(?)", (raw,)).fetchone()[0]
    assert out == raw
    with pytest.raises(sqlite3.OperationalError):
        conn.execute("SELECT vector_as_f32(?)", (raw[:-1],)).fetchone()


def test_init_validation(conn):
    with pytest.raises(VectorConfigError):
        conn.vector_init("missing", "v", f"type=FLOAT32,dimension={DIM}")
    with pytest.raises(VectorConfigError):
        conn.vector_init("docs", "nope", f"type=FLOAT32,dimension={DIM}")
    with pytest.raises(VectorConfigError):
        conn.vector_init("docs", "label", f"type=FLOAT32,dimension={DIM}")
    with pytest.raises(VectorConfigError):
        conn.vector_init("docs", "v", "type=FLOAT32")  # missing dimension
    # re-init consistency (src/sqlite-vector.c:2521-2536)
    with pytest.raises(VectorConfigError):
        conn.vector_init("docs", "v", f"type=FLOAT32,dimension={DIM + 1}")
    with pytest.raises(VectorConfigError):
        conn.vector_init("docs", "v", f"type=FLOAT16,dimension={DIM}")
    conn.vector_init("docs", "v", f"type=FLOAT32,dimension={DIM}")  # ok


def test_full_scan_matches_oracle(conn, data):
    q = data[17]
    rows = conn.vector_full_scan("docs", "v", q.tobytes(), 10)
    assert rows[0][0] == 18 and rows[0][1] == 0.0  # rowids are 1-based
    d = oracle.distance(q, data, DistanceMetric.L2, VectorType.F32)
    oidx = np.argsort(d, kind="stable")[:10]
    assert [r[0] for r in rows] == [int(i) + 1 for i in oidx]
    # JSON query text accepted directly (API.md:189)
    rows2 = conn.vector_full_scan(
        "docs", "v", json.dumps([float(x) for x in q]), 10
    )
    assert [r[0] for r in rows2] == [r[0] for r in rows]
    # k=0 -> empty (:1796); k > N -> trimmed to N
    assert conn.vector_full_scan("docs", "v", q.tobytes(), 0) == []
    assert len(conn.vector_full_scan("docs", "v", q.tobytes(), N + 50)) == N


def test_scan_sees_live_changes(conn, data, rng):
    q = rng.standard_normal(DIM).astype(np.float32)
    before = conn.vector_full_scan("docs", "v", q.tobytes(), 5)
    conn.execute("INSERT INTO docs(v) VALUES (?)", (q.tobytes(),))
    conn.commit()
    after = conn.vector_full_scan("docs", "v", q.tobytes(), 5)
    assert after[0][1] == 0.0 and after != before
    # NULL vectors silently skipped (:2093)
    conn.execute("INSERT INTO docs(v) VALUES (NULL)")
    conn.commit()
    assert len(conn.vector_full_scan("docs", "v", q.tobytes(), N + 10)) == N + 1


def test_quantize_lifecycle(conn, data):
    with pytest.raises(VectorStateError):
        conn.vector_quantize_scan("docs", "v", data[0].tobytes(), 5)
    count = conn.execute("SELECT vector_quantize('docs', 'v')").fetchone()[0]
    assert count == N
    # metadata persisted with reference keys/values
    meta = dict(
        (k, v)
        for k, v in conn.execute(
            "SELECT key, value FROM _sqliteai_vector WHERE tblname='docs'"
        )
    )
    ref_qt, ref_scale, ref_offset = oracle.compute_quant_params(
        data, QuantType.AUTO
    )
    assert meta["qtype"] == 2  # INT8 (data has negatives)
    np.testing.assert_allclose(meta["qscale"], ref_scale, rtol=1e-6)
    assert meta["qoffset"] == float(ref_offset)
    # shadow-table format: [int64 rowid][dim bytes] records
    counter, blob = conn.execute(
        "SELECT counter, data FROM vector0_docs_v"
    ).fetchone()
    assert counter == N and len(blob) == N * (8 + DIM)
    rid0 = struct.unpack("<q", blob[:8])[0]
    assert rid0 == 1
    codes0 = np.frombuffer(blob[8 : 8 + DIM], np.int8)
    np.testing.assert_array_equal(
        codes0, oracle.quantize(data[0], ref_scale, ref_offset, ref_qt)
    )
    # memory = SUM(LENGTH(data)) (:1486-1499)
    assert conn.vector_quantize_memory("docs", "v") == N * (8 + DIM)
    # quantized scan: self-match first, distances in quantized domain
    rows = conn.vector_quantize_scan("docs", "v", data[42].tobytes(), 5)
    assert rows[0][0] == 43
    assert rows[0][1] == float(int(rows[0][1]))  # integer-valued (int domain)
    # cleanup drops the shadow table
    conn.vector_quantize_cleanup("docs", "v")
    assert (
        conn.execute(
            "SELECT 1 FROM sqlite_master WHERE name='vector0_docs_v'"
        ).fetchone()
        is None
    )
    with pytest.raises(VectorStateError):
        conn.vector_quantize_scan("docs", "v", data[0].tobytes(), 5)


def test_quantized_recall(conn, data):
    conn.vector_quantize("docs", "v")
    k, hits, total = 10, 0, 0
    for i in range(0, N, 29):
        q = data[i].tobytes()
        exact = {r[0] for r in conn.vector_full_scan("docs", "v", q, k)}
        approx = {r[0] for r in conn.vector_quantize_scan("docs", "v", q, k)}
        hits += len(exact & approx)
        total += k
    assert hits / total > 0.9  # QUANTIZATION.md target: > 0.95 on real data


def test_quantize_int4_sql_surface(conn, data):
    """qtype=INT4 through SQL (round 4, beyond the reference): original
    packed record format [rowid i64][alpha f32][csq i32][P packed], qtype
    code 3 in _sqliteai_vector, scans checked against the pinned numpy
    spec (the reference has no 4-bit path to mirror)."""
    from sqlite_vector_tpu.ops.quantize4 import packed_width, quantize4_np

    from tests.parity import expected_int4_distances

    count = conn.execute(
        "SELECT vector_quantize('docs', 'v', 'qtype=INT4')"
    ).fetchone()[0]
    assert count == N
    meta = dict(
        conn.execute(
            "SELECT key, value FROM _sqliteai_vector WHERE tblname='docs'"
        )
    )
    assert meta["qtype"] == 3  # the packed-int4 extension code
    p = packed_width(DIM)
    # int4 records live under a DIFFERENT shadow name than the reference's
    # vector0_* so a legacy C-side preload fails cleanly ('quantization
    # table not found') instead of misparsing stride-16+P records as
    # stride-8+dim (r5, ADVICE item)
    assert (
        conn.execute(
            "SELECT 1 FROM sqlite_master WHERE name='vector0_docs_v'"
        ).fetchone()
        is None
    )
    counter, blob = conn.execute(
        "SELECT counter, data FROM vector0i4_docs_v"
    ).fetchone()
    assert counter == N and len(blob) == N * (16 + p)
    packed, alpha, csq = quantize4_np(data)
    rec0 = np.frombuffer(blob[: 16 + p], np.uint8)
    assert struct.unpack("<q", rec0[:8].tobytes())[0] == 1
    assert struct.unpack("<f", rec0[8:12].tobytes())[0] == alpha[0]
    assert struct.unpack("<i", rec0[12:16].tobytes())[0] == csq[0]
    np.testing.assert_array_equal(rec0[16:], packed[0])
    assert conn.vector_quantize_memory("docs", "v") == N * (16 + p)
    # scan parity vs the spec (original-domain approximate distances)
    want = expected_int4_distances(
        data[42][None], packed, alpha, csq, DistanceMetric.L2, DIM
    )[0]
    order = np.argsort(want, kind="stable")[:5]
    rows = conn.vector_quantize_scan("docs", "v", data[42].tobytes(), 5)
    assert [r[0] for r in rows] == [int(i) + 1 for i in order]
    np.testing.assert_allclose(
        [r[1] for r in rows], want[order], rtol=2e-4, atol=1e-4
    )
    # streaming TVF covers every row in the same domain
    srows = dict(
        conn.vector_quantize_scan_stream("docs", "v", data[42].tobytes())
    )
    assert len(srows) == N
    np.testing.assert_allclose(
        [srows[i + 1] for i in range(N)], want, rtol=2e-4, atol=1e-4
    )
    # cleanup drops the shadow like int8
    conn.vector_quantize_cleanup("docs", "v")
    with pytest.raises(VectorStateError):
        conn.vector_quantize_scan("docs", "v", data[0].tobytes(), 5)


def test_quantize_int4_zero_rows_round_trips(tmp_path):
    """A zero-row INT4 quantize must store qtype=3 WITH the i4-named
    shadow (r5 review: deriving the name from `count > 0` created a
    legacy-named shadow beside qtype=3 metadata, which the fresh-connection
    loader rejected unrecoverably — and re-quantizing reproduced it)."""
    path = str(tmp_path / "p0.db")
    c1 = svs.connect(path)
    c1.execute("CREATE TABLE t (v BLOB)")
    c1.commit()
    c1.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    c1.vector_quantize("t", "v", "qtype=INT4")
    names = {
        r[0]
        for r in c1.execute(
            "SELECT name FROM sqlite_master WHERE name LIKE 'vector0%'"
        )
    }
    assert names == {"vector0i4_t_v"}
    c1.close()
    c2 = svs.connect(path)
    c2.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    q = np.zeros(DIM, np.float32)
    # empty result, NOT a format-mismatch VectorStateError
    assert c2.vector_quantize_scan("t", "v", q.tobytes(), 5) == []
    c2.close()


def test_quantize_int4_cross_connection_restore(tmp_path, data):
    """A fresh connection rebuilds the int4 quant state purely from the
    shadow records (per-row alpha/csq included) — same results as the
    quantizing connection, no re-quantize."""
    path = str(tmp_path / "p4.db")
    c1 = svs.connect(path)
    c1.execute("CREATE TABLE t (v BLOB)")
    c1.executemany(
        "INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data)
    )
    c1.commit()
    c1.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    c1.vector_quantize("t", "v", "qtype=INT4")
    expected = c1.vector_quantize_scan("t", "v", data[7].tobytes(), 5)
    c1.close()
    c2 = svs.connect(path)
    c2.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    got = c2.vector_quantize_scan("t", "v", data[7].tobytes(), 5)
    assert [r[0] for r in got] == [r[0] for r in expected]
    np.testing.assert_allclose(
        [r[1] for r in got], [r[1] for r in expected], rtol=1e-6
    )
    # the restored codes are capacity-padded (power-of-two rows, like the
    # int8 branch) so re-quantizes with drifting counts reuse one compiled
    # scan executable (r4 review)
    quant = c2._contexts[("t", "v")].quant
    assert quant.codes.shape[0] == 1024 and quant.count == N
    assert quant.row_scale.shape[0] == 1024
    c2.close()


def test_int4_shadow_name_interop_safety(conn, data):
    """Re-quantize churn between int4 and int8 leaves exactly ONE shadow
    generation behind, under the name matching the stored qtype — a legacy
    (C-extension) reader can never find int4-format records under the
    vector0_* name it parses with stride 8+dim (r5, ADVICE medium)."""
    from sqlite_vector_tpu.ops.quantize4 import packed_width

    def names():
        return {
            r[0]
            for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table' "
                "AND (name = 'vector0_docs_v' OR name = 'vector0i4_docs_v')"
            )
        }

    conn.execute("SELECT vector_quantize('docs', 'v', 'qtype=INT4')")
    assert names() == {"vector0i4_docs_v"}
    # int4 -> int8 drops the i4 table (a stale one would shadow-read wrong)
    conn.execute("SELECT vector_quantize('docs', 'v', 'qtype=INT8')")
    assert names() == {"vector0_docs_v"}
    assert conn.vector_quantize_memory("docs", "v") == N * (8 + DIM)
    # int8 -> int4 drops the legacy table (C preload must fail cleanly,
    # not read stale int8 codes against int4 params)
    conn.execute("SELECT vector_quantize('docs', 'v', 'qtype=INT4')")
    assert names() == {"vector0i4_docs_v"}
    assert conn.vector_quantize_memory("docs", "v") == N * (
        16 + packed_width(DIM)
    )
    # Dataset API agrees byte-for-byte with SUM(LENGTH(data)) (r5 ADVICE:
    # the csq sidecar was previously omitted from the Dataset figure)
    ds = conn._contexts[("docs", "v")].dataset
    assert ds.quantize_memory() == conn.vector_quantize_memory("docs", "v")
    # cleanup drops whichever generation exists
    conn.vector_quantize_cleanup("docs", "v")
    assert names() == set()


def test_int4_params_with_legacy_shadow_mismatch_errors(tmp_path, data):
    """qtype=3 params paired with a legacy-named shadow (e.g. a C-side
    writer replaced the records but an i4 qtype row survived) must refuse
    to parse — never apply the 16+P stride to 8+dim records."""
    path = str(tmp_path / "mm.db")
    c1 = svs.connect(path)
    c1.execute("CREATE TABLE t (v BLOB)")
    c1.executemany(
        "INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data)
    )
    c1.commit()
    c1.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    c1.vector_quantize("t", "v", "qtype=INT4")
    # simulate the cross-engine mismatch: swap the records to the legacy
    # name while the qtype=3 metadata row stays
    c1.execute("ALTER TABLE vector0i4_t_v RENAME TO vector0_t_v")
    c1.commit()
    c1.close()
    c2 = svs.connect(path)
    c2.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    with pytest.raises(VectorStateError, match="does not match"):
        c2.vector_quantize_scan("t", "v", data[0].tobytes(), 5)
    c2.close()


def test_fresh_connection_restores_quant(tmp_path, data):
    path = str(tmp_path / "p.db")
    c1 = svs.connect(path)
    c1.execute("CREATE TABLE t (v BLOB)")
    c1.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c1.commit()
    c1.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    c1.vector_quantize("t", "v")
    expected = c1.vector_quantize_scan("t", "v", data[7].tobytes(), 5)
    c1.close()
    # a fresh connection restores scale/offset + codes from the database
    # without re-quantizing (sqlite_unserialize parity, :451-491)
    c2 = svs.connect(path)
    c2.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    got = c2.vector_quantize_scan("t", "v", data[7].tobytes(), 5)
    assert got == expected
    c2.close()


def test_stream_scans(conn, data):
    q = data[3]
    rows = list(conn.vector_full_scan_stream("docs", "v", q.tobytes()))
    assert len(rows) == N
    d = dict(rows)
    assert d[4] == 0.0
    conn.vector_quantize("docs", "v")
    qrows = list(conn.vector_quantize_scan_stream("docs", "v", q.tobytes()))
    assert len(qrows) == N


def test_json_tvf_shim(conn, data):
    rows = conn.execute(
        "SELECT e.value ->> 'id', e.value ->> 'distance' "
        "FROM json_each(vector_full_scan_json('docs', 'v', ?, 5)) AS e",
        (data[0].tobytes(),),
    ).fetchall()
    assert len(rows) == 5 and rows[0][0] == 1 and rows[0][1] == 0.0


def test_without_rowid_table(tmp_path, data):
    c = svs.connect(str(tmp_path / "wr.db"))
    c.execute(
        "CREATE TABLE wr (pk INTEGER PRIMARY KEY, v BLOB) WITHOUT ROWID"
    )
    c.executemany(
        "INSERT INTO wr(pk, v) VALUES (?, ?)",
        ((i + 100, r.tobytes()) for i, r in enumerate(data[:50])),
    )
    c.commit()
    c.vector_init("wr", "v", f"type=FLOAT32,dimension={DIM}")
    rows = c.vector_full_scan("wr", "v", data[10].tobytes(), 3)
    assert rows[0][0] == 110 and rows[0][1] == 0.0
    c.close()


# ---------------------------------------------------------------------------
# byte-level interop with the compiled C reference (optional, local only)
# ---------------------------------------------------------------------------


def _ref_available():
    if not os.path.exists(REF_SO):
        return False
    try:
        c = sqlite3.connect(":memory:")
        c.enable_load_extension(True)
        c.load_extension(REF_SO[:-3])
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _ref_available(), reason="C reference not built")
def test_interop_c_reference_reads_our_db(tmp_path, data):
    """The C extension must be able to quantized-scan a DB we quantized."""
    path = str(tmp_path / "x.db")
    c = svs.connect(path)
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    c.vector_quantize("t", "v")
    ours = c.vector_quantize_scan("t", "v", data[5].tobytes(), 10)
    exact_ours = c.vector_full_scan("t", "v", data[5].tobytes(), 10)
    c.close()

    rc = sqlite3.connect(path)
    rc.enable_load_extension(True)
    rc.load_extension(REF_SO[:-3])
    rc.execute(
        f"SELECT vector_init('t','v','type=FLOAT32,dimension={DIM},distance=L2')"
    )
    theirs = rc.execute(
        "SELECT id, distance FROM vector_quantize_scan('t','v',?,10)",
        (data[5].tobytes(),),
    ).fetchall()
    exact_theirs = rc.execute(
        "SELECT id, distance FROM vector_full_scan('t','v',?,10)",
        (data[5].tobytes(),),
    ).fetchall()
    rc.close()
    assert [r[0] for r in theirs] == [r[0] for r in ours]
    np.testing.assert_allclose(
        [r[1] for r in theirs], [r[1] for r in ours], rtol=1e-5
    )
    assert [r[0] for r in exact_theirs] == [r[0] for r in exact_ours]
    np.testing.assert_allclose(
        [r[1] for r in exact_theirs], [r[1] for r in exact_ours], rtol=1e-4, atol=1e-4
    )


@pytest.mark.skipif(not _ref_available(), reason="C reference not built")
def test_interop_we_read_c_reference_db(tmp_path, data):
    """We must be able to quantized-scan a DB the C extension quantized."""
    path = str(tmp_path / "y.db")
    rc = sqlite3.connect(path)
    rc.enable_load_extension(True)
    rc.load_extension(REF_SO[:-3])
    rc.execute("CREATE TABLE t (v BLOB)")
    rc.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    rc.commit()
    rc.execute(
        f"SELECT vector_init('t','v','type=FLOAT32,dimension={DIM},distance=L2')"
    )
    rc.execute("SELECT vector_quantize('t','v')")
    theirs = rc.execute(
        "SELECT id, distance FROM vector_quantize_scan('t','v',?,10)",
        (data[9].tobytes(),),
    ).fetchall()
    rc.commit()
    rc.close()

    c = svs.connect(path)
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM},distance=L2")
    ours = c.vector_quantize_scan("t", "v", data[9].tobytes(), 10)
    c.close()
    assert [r[0] for r in ours] == [r[0] for r in theirs]
    np.testing.assert_allclose(
        [r[1] for r in ours], [r[1] for r in theirs], rtol=1e-5
    )


@pytest.mark.skipif(not _ref_available(), reason="C reference not built")
@pytest.mark.parametrize(
    "vtype,as_fn",
    [
        (VectorType.F16, "vector_as_f16"),
        (VectorType.BF16, "vector_as_bf16"),
        (VectorType.I8, "vector_as_i8"),
        (VectorType.U8, "vector_as_u8"),
    ],
)
def test_interop_dtypes(tmp_path, rng, vtype, as_fn):
    """Exact + quantized interop across every non-f32 element type."""
    if vtype is VectorType.U8:
        data = rng.integers(0, 256, (120, DIM)).astype(np.uint8)
    elif vtype is VectorType.I8:
        data = rng.integers(-128, 128, (120, DIM)).astype(np.int8)
    else:
        data = (rng.standard_normal((120, DIM)) * 2).astype(vtype.np_dtype)
    blobs = [np.ascontiguousarray(r).tobytes() for r in data]

    path = str(tmp_path / f"dt_{vtype.value}.db")
    rc = sqlite3.connect(path)
    rc.enable_load_extension(True)
    rc.load_extension(REF_SO[:-3])
    rc.execute("CREATE TABLE t (v BLOB)")
    rc.executemany("INSERT INTO t(v) VALUES (?)", ((b,) for b in blobs))
    rc.commit()
    rc.execute(
        f"SELECT vector_init('t','v','type={vtype.value},dimension={DIM},distance=L2')"
    )
    rc.execute("SELECT vector_quantize('t','v')")
    ref_exact = rc.execute(
        "SELECT id, distance FROM vector_full_scan('t','v',?,8)", (blobs[3],)
    ).fetchall()
    ref_quant = rc.execute(
        "SELECT id, distance FROM vector_quantize_scan('t','v',?,8)", (blobs[3],)
    ).fetchall()
    rc.commit()
    rc.close()

    c = svs.connect(path)
    c.vector_init("t", "v", f"type={vtype.value},dimension={DIM},distance=L2")
    ours_exact = c.vector_full_scan("t", "v", blobs[3], 8)
    ours_quant = c.vector_quantize_scan("t", "v", blobs[3], 8)
    c.close()
    assert [r[0] for r in ours_exact] == [r[0] for r in ref_exact]
    np.testing.assert_allclose(
        [r[1] for r in ours_exact], [r[1] for r in ref_exact], rtol=2e-3, atol=2e-3
    )
    assert [r[0] for r in ours_quant] == [r[0] for r in ref_quant]
    np.testing.assert_allclose(
        [r[1] for r in ours_quant], [r[1] for r in ref_quant], rtol=1e-5
    )


def test_python_loader_fallback(tmp_path, data, monkeypatch):
    """Without the native bulk loader the Python row loop must agree."""
    import sqlite_vector_tpu.sqlite as svs_mod

    monkeypatch.setattr(svs_mod, "native_load_blobs", lambda *a: None)
    c = svs_mod.connect(str(tmp_path / "fb.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    # oversized blob: scan reads the first dim elements (reference semantics)
    c.execute(
        "INSERT INTO t(v) VALUES (?)",
        (data[0].tobytes() + b"\x00\x00\x00\x00",),
    )
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    rows = c.vector_full_scan("t", "v", data[0].tobytes(), 2)
    assert rows[0][1] == 0.0 and rows[1][1] == 0.0  # row 1 and the oversized copy
    # short blob raises with the rowid
    c.execute("INSERT INTO t(v) VALUES (?)", (b"\x00" * 7,))
    c.commit()
    import pytest as _pytest

    from sqlite_vector_tpu.errors import VectorCodecError

    with _pytest.raises(VectorCodecError, match="rowid"):
        c.vector_full_scan("t", "v", data[0].tobytes(), 2)
    c.close()


def test_memory_db_uses_python_loader(data):
    """:memory: databases can't be re-opened by path — fallback must kick in."""
    c = svs.connect(":memory:")
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    rows = c.vector_full_scan("t", "v", data[9].tobytes(), 1)
    assert rows[0][0] == 10 and rows[0][1] == 0.0
    c.close()


def test_quantize_inside_open_transaction(tmp_path, data):
    """The C reference quantizes fine under a caller's transaction; the
    compat layer must too (SAVEPOINT, not a bare BEGIN)."""
    c = svs.connect(str(tmp_path / "txn.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    # open an implicit transaction with a pending INSERT, then quantize
    c.execute("INSERT INTO t(v) VALUES (?)", (data[0].tobytes(),))
    assert c.in_transaction
    count = c.vector_quantize("t", "v")
    assert count == N + 1
    c.commit()
    rows = c.vector_quantize_scan("t", "v", data[3].tobytes(), 3)
    assert rows[0][0] == 4
    c.close()


def test_max_memory_chunking_and_bad_value(tmp_path, data):
    c = svs.connect(str(tmp_path / "mm.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    # small max_memory -> multiple reference-format chunks
    chunk_rows = 100 * (8 + DIM)
    c.vector_quantize("t", "v", f"max_memory={chunk_rows}")
    n_chunks = c.execute("SELECT COUNT(*) FROM vector0_t_v").fetchone()[0]
    assert n_chunks == -(-N // 100)
    # invalid max_memory string: the reference assigns human_to_number's
    # 0-on-failure unconditionally (:969-972) -> minimal batching, one row
    # per chunk (max_vectors clamps to 1)
    c.vector_quantize("t", "v", "max_memory=banana")
    n_chunks = c.execute("SELECT COUNT(*) FROM vector0_t_v").fetchone()[0]
    assert n_chunks == N
    # hex sizes parse like strtod: 0x10KB = 16 KiB
    from sqlite_vector_tpu.types import human_to_number

    assert human_to_number("0x10KB") == 16 * 1024
    c.close()


@pytest.mark.skipif(not _ref_available(), reason="C reference not built")
@pytest.mark.parametrize("metric", ["COSINE", "DOT", "L1", "SQUARED_L2"])
def test_interop_metrics(tmp_path, rng, metric):
    """Exact + quantized neighbor parity with the C extension per metric."""
    data = rng.standard_normal((150, DIM)).astype(np.float32)
    path = str(tmp_path / f"m_{metric}.db")
    rc = sqlite3.connect(path)
    rc.enable_load_extension(True)
    rc.load_extension(REF_SO[:-3])
    rc.execute("CREATE TABLE t (v BLOB)")
    rc.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    rc.commit()
    rc.execute(
        f"SELECT vector_init('t','v','type=FLOAT32,dimension={DIM},distance={metric}')"
    )
    rc.execute("SELECT vector_quantize('t','v')")
    ref_exact = rc.execute(
        "SELECT id, distance FROM vector_full_scan('t','v',?,8)",
        (data[11].tobytes(),),
    ).fetchall()
    ref_quant = rc.execute(
        "SELECT id, distance FROM vector_quantize_scan('t','v',?,8)",
        (data[11].tobytes(),),
    ).fetchall()
    rc.commit()
    rc.close()

    c = svs.connect(path)
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM},distance={metric}")
    ours_exact = c.vector_full_scan("t", "v", data[11].tobytes(), 8)
    ours_quant = c.vector_quantize_scan("t", "v", data[11].tobytes(), 8)
    c.close()
    # tie order is an artifact of the reference's slot algorithm (its
    # selection sort is not scan-order stable), so compare tie-insensitively:
    # identical (distance, id) multisets
    def norm(rows):
        return sorted((round(d, 3), i) for i, d in rows)

    assert norm(ours_exact) == norm(ref_exact)
    assert norm(ours_quant) == norm(ref_quant)


def test_quantize_does_not_commit_callers_transaction(tmp_path, data):
    """vector_quantize must never commit an enclosing transaction — the
    reference runs under it (src/sqlite-vector.c:1418-1437); a caller's
    unrelated pending writes stay uncommitted and roll back cleanly."""
    path = str(tmp_path / "txn2.db")
    c = svs.connect(path)
    c.execute("CREATE TABLE t (v BLOB)")
    c.execute("CREATE TABLE unrelated (x INTEGER)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")

    c.execute("INSERT INTO unrelated(x) VALUES (1)")  # caller's pending write
    assert c.in_transaction
    c.vector_quantize("t", "v")
    # the caller's transaction must still be open...
    assert c.in_transaction
    # ...and invisible to other connections
    import sqlite3

    other = sqlite3.connect(path)
    assert other.execute("SELECT COUNT(*) FROM unrelated").fetchone()[0] == 0
    other.close()
    # rollback reverts the caller's write AND the quantize (reference
    # semantics: quantize ran under the enclosing transaction)
    c.rollback()
    assert c.execute("SELECT COUNT(*) FROM unrelated").fetchone()[0] == 0
    row = c.execute(
        "SELECT 1 FROM sqlite_master WHERE name='vector0_t_v'"
    ).fetchone()
    assert row is None

    # standalone (autocommit) quantize still self-commits
    c.vector_quantize("t", "v")
    assert not c.in_transaction
    other = sqlite3.connect(path)
    assert (
        other.execute("SELECT COUNT(*) FROM vector0_t_v").fetchone()[0] >= 1
    )
    other.close()

    # cleanup inside a caller's transaction: same contract
    c.execute("INSERT INTO unrelated(x) VALUES (2)")
    c.vector_quantize_cleanup("t", "v")
    assert c.in_transaction
    c.rollback()
    assert c.execute("SELECT COUNT(*) FROM unrelated").fetchone()[0] == 0
    c.close()


def test_incremental_refresh_append_fast_path(tmp_path, data, monkeypatch):
    """Inserting rows into an already-loaded table must load ONLY the new
    rows (no full re-ingest); updates/deletes fall back to a full reload."""
    c = svs.connect(str(tmp_path / "inc.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    rows = c.vector_full_scan("t", "v", data[0].tobytes(), 1)
    assert rows[0][0] == 1

    calls = []
    orig = svs.VectorConnection._load_rows

    def spy(self, ctx, *, min_pk):
        ids, arr = orig(self, ctx, min_pk=min_pk)
        calls.append((min_pk, len(ids)))
        return ids, arr

    monkeypatch.setattr(svs.VectorConnection, "_load_rows", spy)

    # append: only the 2 new rows are loaded
    extra = np.arange(DIM, dtype=np.float32)
    c.execute("INSERT INTO t(v) VALUES (?)", (extra.tobytes(),))
    c.execute("INSERT INTO t(v) VALUES (?)", ((extra + 1).tobytes(),))
    c.commit()
    rows = c.vector_full_scan("t", "v", extra.tobytes(), 1)
    assert rows[0][0] == N + 1 and rows[0][1] == 0.0
    assert calls == [(N, 2)], calls  # incremental: min_pk=N, 2 rows

    # appended rows and old rows both searchable
    rows = c.vector_full_scan("t", "v", data[3].tobytes(), 1)
    assert rows[0][0] == 4 and len(calls) == 1  # cached, no reload

    # UPDATE of an old row: full reload (min_pk=None), new content visible
    calls.clear()
    c.execute("UPDATE t SET v=? WHERE rowid=1", ((extra + 7).tobytes(),))
    c.commit()
    rows = c.vector_full_scan("t", "v", (extra + 7).tobytes(), 1)
    assert rows[0][0] == 1 and rows[0][1] == 0.0
    assert calls and calls[0][0] is None

    # DELETE: fast path — the row is tombstoned with NO row loading at all
    calls.clear()
    c.execute("DELETE FROM t WHERE rowid=2")
    c.commit()
    rows = c.vector_full_scan("t", "v", data[1].tobytes(), 1)
    assert rows[0][0] != 2
    assert calls == [], calls  # delete-only: zero _load_rows calls

    # mixed insert+update in one batch: must NOT take the fast path
    calls.clear()
    c.execute("INSERT INTO t(v) VALUES (?)", ((extra + 9).tobytes(),))
    c.execute("UPDATE t SET v=? WHERE rowid=3", ((extra + 11).tobytes(),))
    c.commit()
    rows = c.vector_full_scan("t", "v", (extra + 11).tobytes(), 1)
    assert rows[0][0] == 3 and rows[0][1] == 0.0
    assert calls and calls[0][0] is None

    # another connection's write: data_version changes -> full reload
    calls.clear()
    import sqlite3

    other = sqlite3.connect(str(tmp_path / "inc.db"))
    other.execute("INSERT INTO t(v) VALUES (?)", ((extra + 13).tobytes(),))
    other.commit()
    other.close()
    rows = c.vector_full_scan("t", "v", (extra + 13).tobytes(), 1)
    assert rows[0][1] == 0.0
    assert calls and calls[0][0] is None
    c.close()


def test_incremental_refresh_delete_fast_path(tmp_path, data, monkeypatch):
    """DELETE-only changes tombstone the loaded dataset in place (same
    Dataset object, zero row loading); ambiguous changes still fully
    reload."""
    c = svs.connect(str(tmp_path / "del.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    c.vector_full_scan("t", "v", data[0].tobytes(), 1)
    ctx = c._lookup("t", "v", "test")
    ds_before = ctx.dataset

    calls = []
    orig = svs.VectorConnection._load_rows

    def spy(self, ctx, *, min_pk):
        ids, arr = orig(self, ctx, min_pk=min_pk)
        calls.append(min_pk)
        return ids, arr

    monkeypatch.setattr(svs.VectorConnection, "_load_rows", spy)

    # multi-row DELETE in one statement: fast path
    c.execute("DELETE FROM t WHERE rowid IN (2, 5, 7)")
    c.commit()
    rows = c.vector_full_scan("t", "v", data[1].tobytes(), 3)
    assert 2 not in [r[0] for r in rows]
    assert calls == [] and ctx.dataset is ds_before  # tombstoned in place
    assert len(ctx.dataset) == N - 3

    # UPDATE vector to NULL: row leaves the scan population — also the
    # fast path (the reference's scan skips NULL vectors, :2093)
    c.execute("UPDATE t SET v=NULL WHERE rowid=9")
    c.commit()
    rows = c.vector_full_scan("t", "v", data[8].tobytes(), 2)
    assert 9 not in [r[0] for r in rows]
    assert calls == [] and ctx.dataset is ds_before

    # DELETE of the NULL-vector row (never loaded): conservative full reload
    c.execute("DELETE FROM t WHERE rowid=9")
    c.commit()
    c.vector_full_scan("t", "v", data[0].tobytes(), 1)
    assert calls == [None]

    # DELETE + INSERT in one batch: ambiguous -> full reload
    calls.clear()
    ds_now = ctx.dataset
    extra = np.arange(DIM, dtype=np.float32) + 99
    c.execute("DELETE FROM t WHERE rowid=3")
    c.execute("INSERT INTO t(v) VALUES (?)", (extra.tobytes(),))
    c.commit()
    rows = c.vector_full_scan("t", "v", extra.tobytes(), 1)
    assert rows[0][1] == 0.0
    assert calls == [None]
    c.close()


def test_incremental_refresh_null_row_above_max(tmp_path, data):
    """A pre-existing NULL-vector row ABOVE every loaded pk must not let an
    UPDATE of a loaded row masquerade as an append (the fast-path proof
    counts rows above the stamp; stamping with the max LOADED pk instead of
    the table-wide MAX(pk) made the NULL row absorb the change delta and
    the search served the stale vector)."""
    c = svs.connect(str(tmp_path / "nullrow.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.execute("INSERT INTO t(v) VALUES (NULL)")  # pk N+1, skipped by loads
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    rows = c.vector_full_scan("t", "v", data[4].tobytes(), 1)
    assert rows[0][0] == 5 and rows[0][1] == 0.0

    # same-connection UPDATE of a loaded row: must be visible (full reload)
    newvec = np.full(DIM, 42.0, np.float32)
    c.execute("UPDATE t SET v=? WHERE rowid=5", (newvec.tobytes(),))
    c.commit()
    rows = c.vector_full_scan("t", "v", newvec.tobytes(), 1)
    assert rows[0][0] == 5 and rows[0][1] == 0.0
    # and the old content is gone
    rows = c.vector_full_scan("t", "v", data[4].tobytes(), 1)
    assert rows[0][1] != 0.0

    # appends still take the fast path with NULL rows in the mix, including
    # a NULL row appended above everything (must not poison the next proof)
    extra = np.arange(DIM, dtype=np.float32)
    c.execute("INSERT INTO t(v) VALUES (?)", (extra.tobytes(),))
    c.execute("INSERT INTO t(v) VALUES (NULL)")
    c.commit()
    rows = c.vector_full_scan("t", "v", extra.tobytes(), 1)
    assert rows[0][1] == 0.0
    c.execute("UPDATE t SET v=? WHERE rowid=1", ((extra + 3).tobytes(),))
    c.commit()
    rows = c.vector_full_scan("t", "v", (extra + 3).tobytes(), 1)
    assert rows[0][0] == 1 and rows[0][1] == 0.0
    c.close()


@pytest.mark.skipif(not _ref_available(), reason="C reference not built")
@pytest.mark.parametrize("metric", ["L2", "SQUARED_L2", "L1", "COSINE", "DOT"])
def test_interop_nonfinite_vectors(tmp_path, rng, metric):
    """Non-finite f32 rows: neighbor parity with the C extension. The C
    kernels produce NaN/Inf distances which the strict `<` slot loop never
    selects (rows excluded) — except DOT, where an Inf row yields -inf (the
    best possible hit)."""
    dim = 16
    data = rng.standard_normal((60, dim)).astype(np.float32)
    data[7, 3] = np.nan
    data[12, 0] = np.inf
    data[20, :] = 0.0
    q = data[5].tobytes()

    path = str(tmp_path / f"nf_{metric}.db")
    rc = sqlite3.connect(path)
    rc.enable_load_extension(True)
    rc.load_extension(REF_SO[:-3])
    rc.execute("CREATE TABLE t (v BLOB)")
    rc.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    rc.commit()
    rc.execute(
        f"SELECT vector_init('t','v','type=FLOAT32,dimension={dim},"
        f"distance={metric}')"
    )
    theirs = rc.execute(
        "SELECT id, distance FROM vector_full_scan('t','v',?,60)", (q,)
    ).fetchall()
    rc.close()

    c = svs.connect(path)
    c.vector_init("t", "v", f"type=FLOAT32,dimension={dim},distance={metric}")
    ours = c.vector_full_scan("t", "v", q, 60)
    c.close()

    assert [r[0] for r in ours] == [r[0] for r in theirs]
    ours_d = np.array([r[1] for r in ours])
    theirs_d = np.array([r[1] for r in theirs])
    finite = np.isfinite(theirs_d)
    np.testing.assert_allclose(
        ours_d[finite], theirs_d[finite], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(ours_d[~finite], theirs_d[~finite])
    # the NaN and unmatched-Inf rows are excluded for every metric but DOT,
    # where the Inf row is the best hit at -inf
    returned = {r[0] for r in ours}
    assert 8 not in returned  # NaN row (1-based id)
    if metric == "DOT":
        assert ours[0][0] == 13 and ours[0][1] == -np.inf
    else:
        assert 13 not in returned


# ---------------------------------------------------------------------------
# real table-valued functions (loadable vtab extension, csrc/svt_vtab.c)
# ---------------------------------------------------------------------------


def _vtab_available():
    try:
        c = svs.connect(":memory:")
        ok = c.vtab_loaded
        c.close()
        return ok
    except Exception:
        return False


@pytest.mark.skipif(not _vtab_available(), reason="vtab extension unavailable")
def test_reference_documented_queries_run_verbatim(tmp_path, data):
    """The reference's own documented SQL (API.md:229-231, 260-262,
    README.md:96-100, QUANTIZATION.md:43-77) must run unmodified."""
    c = svs.connect(str(tmp_path / "tvf.db"))
    c.execute("CREATE TABLE documents (id INTEGER PRIMARY KEY, embedding BLOB)")
    c.executemany(
        "INSERT INTO documents(embedding) VALUES (?)",
        ((r.tobytes(),) for r in data),
    )
    c.commit()
    c.execute(
        "SELECT vector_init('documents', 'embedding', "
        f"'dimension={DIM},type=FLOAT32,distance=L2')"
    )
    q = data[11].tobytes()

    # API.md:229-231 (vector_full_scan example, verbatim shape)
    rows = c.execute(
        "SELECT rowid, distance FROM "
        "vector_full_scan('documents', 'embedding', ?, 5)",
        (q,),
    ).fetchall()
    assert rows[0] == (12, 0.0) and len(rows) == 5
    # ascending order, orderByConsumed honored with an explicit ORDER BY too
    assert [r[1] for r in rows] == sorted(r[1] for r in rows)
    rows2 = c.execute(
        "SELECT rowid, distance FROM "
        "vector_full_scan('documents', 'embedding', ?, 5) ORDER BY distance",
        (q,),
    ).fetchall()
    assert rows2 == rows

    # API.md:260-262 (vector_quantize_scan example)
    c.execute("SELECT vector_quantize('documents', 'embedding')")
    qrows = c.execute(
        "SELECT rowid, distance FROM "
        "vector_quantize_scan('documents', 'embedding', ?, 10)",
        (q,),
    ).fetchall()
    assert qrows[0][0] == 12

    # README.md:96-100 (JOIN ON base rowid)
    jrows = c.execute(
        "SELECT e.id, v.distance FROM documents AS e "
        "JOIN vector_quantize_scan('documents', 'embedding', ?, 20) AS v "
        "ON e.id = v.rowid",
        (q,),
    ).fetchall()
    assert len(jrows) == 20 and jrows[0][0] == 12

    # QUANTIZATION.md:43-77 — the recall recipe, VERBATIM
    recall_sql = """
WITH
exact_knn AS (
    SELECT e.rowid
    FROM documents AS e
    JOIN vector_full_scan('documents', 'embedding', ?1, ?2) AS v
    ON e.rowid = v.rowid
),
approx_knn AS (
    SELECT e.rowid
    FROM documents AS e
    JOIN vector_quantize_scan('documents', 'embedding', ?1, ?2) AS v
    ON e.rowid = v.rowid
),
matches AS (
    SELECT COUNT(*) AS match_count
    FROM exact_knn
    WHERE rowid IN (SELECT rowid FROM approx_knn)
),
total AS (
    SELECT COUNT(*) AS total_count
    FROM exact_knn
)
SELECT
    (SELECT match_count FROM matches) AS match_count,
    (SELECT total_count FROM total) AS total_count,
    CAST((SELECT match_count FROM matches) AS FLOAT) /
    CAST((SELECT total_count FROM total) AS FLOAT) AS recall
"""
    match_count, total_count, recall = c.execute(recall_sql, (q, 20)).fetchone()
    assert total_count == 20 and recall >= 0.9

    # streaming module: unordered rows, SQLite applies ORDER BY
    srows = c.execute(
        "SELECT id, distance FROM "
        "vector_full_scan_stream('documents', 'embedding', ?) "
        "ORDER BY distance LIMIT 3",
        (q,),
    ).fetchall()
    assert srows[0][0] == 12 and len(srows) == 3
    sq = c.execute(
        "SELECT COUNT(*) FROM "
        "vector_quantize_scan_stream('documents', 'embedding', ?)",
        (q,),
    ).fetchone()[0]
    assert sq == N

    # wrong arity -> the reference's exact error text, SQL function name
    # included (:1736 passes "vector_full_scan", not an internal tag)
    with pytest.raises(
        sqlite3.OperationalError,
        match="vector_full_scan expects 4 arguments, but 3 were provided",
    ):
        c.execute(
            "SELECT id FROM vector_full_scan('documents', 'embedding', ?)",
            (q,),
        ).fetchall()
    c.close()


@pytest.mark.skipif(not _vtab_available(), reason="vtab extension unavailable")
@pytest.mark.skipif(not _ref_available(), reason="C reference not built")
def test_tvf_sql_parity_with_c_reference(tmp_path, data):
    """One identical SQL string, two engines, same neighbor sets."""
    path = str(tmp_path / "parity.db")
    c = svs.connect(path)
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    c.vector_quantize("t", "v")
    sql = "SELECT rowid, distance FROM vector_full_scan('t','v',?,10)"
    qsql = "SELECT rowid, distance FROM vector_quantize_scan('t','v',?,10)"
    q = data[3].tobytes()
    ours = c.execute(sql, (q,)).fetchall()
    ours_q = c.execute(qsql, (q,)).fetchall()
    c.close()

    rc = sqlite3.connect(path)
    rc.enable_load_extension(True)
    rc.load_extension(REF_SO[:-3])
    rc.execute(
        f"SELECT vector_init('t','v','type=FLOAT32,dimension={DIM},distance=L2')"
    )
    theirs = rc.execute(sql, (q,)).fetchall()
    theirs_q = rc.execute(qsql, (q,)).fetchall()
    rc.close()
    assert [r[0] for r in ours] == [r[0] for r in theirs]
    np.testing.assert_allclose(
        [r[1] for r in ours], [r[1] for r in theirs], rtol=1e-4, atol=1e-4
    )
    assert [r[0] for r in ours_q] == [r[0] for r in theirs_q]
    np.testing.assert_allclose(
        [r[1] for r in ours_q], [r[1] for r in theirs_q], rtol=1e-5
    )


@pytest.mark.skipif(not _vtab_available(), reason="vtab extension unavailable")
def test_tvf_edge_cases(tmp_path, rng):
    """TVF edge behavior mirrors the reference: JSON query text accepted,
    k=0 empty, quantize-scan-before-quantize errors, f16 tables work, and
    wrap() on an existing connection registers the modules too."""
    import sqlite3 as sq

    raw = sq.connect(str(tmp_path / "edge.db"))
    c = svs.wrap(raw)
    assert c.vtab_loaded
    dim = 8
    data = (rng.standard_normal((40, dim)) * 2).astype(np.float16)
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT16,dimension={dim},distance=L2")

    # JSON query text accepted directly (API.md:189)
    q_json = json.dumps([float(x) for x in data[9].astype(np.float32)])
    rows = c.execute(
        "SELECT rowid, distance FROM vector_full_scan('t','v',?,3)", (q_json,)
    ).fetchall()
    assert rows[0][0] == 10 and rows[0][1] == 0.0

    # k=0 -> empty (reference :1796)
    assert (
        c.execute(
            "SELECT * FROM vector_full_scan('t','v',?,0)", (q_json,)
        ).fetchall()
        == []
    )

    # quantize scan before vector_quantize -> error
    with pytest.raises(sq.OperationalError):
        c.execute(
            "SELECT * FROM vector_quantize_scan('t','v',?,3)", (q_json,)
        ).fetchall()
    c.vector_quantize("t", "v")
    qrows = c.execute(
        "SELECT rowid FROM vector_quantize_scan('t','v',?,3)", (q_json,)
    ).fetchall()
    assert qrows[0][0] == 10

    # wrong arg type (k as text) -> error
    with pytest.raises(sq.OperationalError):
        c.execute(
            "SELECT * FROM vector_full_scan('t','v',?, 'five')", (q_json,)
        ).fetchall()
    c.close()


@pytest.mark.skipif(not _vtab_available(), reason="vtab extension unavailable")
@pytest.mark.skipif(not _ref_available(), reason="C reference not built")
def test_stream_tvf_sql_parity_with_c_reference(tmp_path, data):
    """The streaming modules through identical SQL on both engines: SQLite
    applies the ORDER BY, every row appears once, distances match."""
    path = str(tmp_path / "sparity.db")
    c = svs.connect(path)
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    c.vector_quantize("t", "v")
    sql = (
        "SELECT id, distance FROM vector_full_scan_stream('t','v',?) "
        "ORDER BY distance, id LIMIT 7"
    )
    qsql = (
        "SELECT COUNT(*), MIN(distance) FROM "
        "vector_quantize_scan_stream('t','v',?)"
    )
    q = data[21].tobytes()
    ours = c.execute(sql, (q,)).fetchall()
    ours_q = c.execute(qsql, (q,)).fetchone()
    c.close()

    rc = sqlite3.connect(path)
    rc.enable_load_extension(True)
    rc.load_extension(REF_SO[:-3])
    rc.execute(
        f"SELECT vector_init('t','v','type=FLOAT32,dimension={DIM},distance=L2')"
    )
    theirs_all = rc.execute(
        "SELECT id, distance FROM vector_full_scan_stream('t','v',?)", (q,)
    ).fetchall()
    theirs_q = rc.execute(qsql, (q,)).fetchone()
    rc.close()
    # DELIBERATE DEVIATION: the C reference's streaming cursor emits a
    # phantom first row (id 0, distance 0.0) — uninitialized cursor state
    # exposed before the first step — and so returns N+1 rows. We emit
    # exactly the N real rows; drop the phantom before comparing.
    assert theirs_all[0] == (0, 0.0) and len(theirs_all) == N + 1
    theirs = sorted(
        (r for r in theirs_all if r[0] != 0), key=lambda r: (r[1], r[0])
    )[:7]
    assert [r[0] for r in ours] == [r[0] for r in theirs]
    np.testing.assert_allclose(
        [r[1] for r in ours], [r[1] for r in theirs], rtol=1e-4, atol=1e-4
    )
    assert ours_q[0] == N and theirs_q[0] == N + 1
    # the phantom row also pollutes MIN(distance) on the C side (0.0 at
    # best); compare our aggregate against the true minimum instead
    assert ours_q[1] >= 0.0


@pytest.mark.skipif(not _vtab_available(), reason="vtab extension unavailable")
def test_tvf_order_by_not_blindly_consumed(tmp_path, data):
    """ORDER BY clauses other than distance-ASC must actually be applied.
    The C reference sets orderByConsumed unconditionally and silently
    mis-orders ORDER BY id / ORDER BY distance DESC; we consume the order
    only when it matches the cursor's natural emission."""
    c = svs.connect(str(tmp_path / "order.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    q = data[7].tobytes()
    asc = c.execute(
        "SELECT rowid, distance FROM vector_full_scan('t','v',?,8) "
        "ORDER BY distance",
        (q,),
    ).fetchall()
    desc = c.execute(
        "SELECT rowid, distance FROM vector_full_scan('t','v',?,8) "
        "ORDER BY distance DESC",
        (q,),
    ).fetchall()
    by_id = c.execute(
        "SELECT rowid, distance FROM vector_full_scan('t','v',?,8) "
        "ORDER BY rowid",
        (q,),
    ).fetchall()
    assert desc == asc[::-1]
    assert [r[0] for r in by_id] == sorted(r[0] for r in asc)
    c.close()


@pytest.mark.skipif(not _vtab_available(), reason="vtab extension unavailable")
def test_tvf_cursor_refilter_in_nested_loop(tmp_path, data):
    """A TVF cursor re-filtered per outer row (correlated nested-loop JOIN)
    must produce the right rows every iteration — exercises the xFilter
    buffer reuse path (previously leaked; the reference frees likewise,
    src/sqlite-vector.c:1799)."""
    c = svs.connect(str(tmp_path / "refilter.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.execute("CREATE TABLE probes (pid INTEGER PRIMARY KEY, pv BLOB)")
    for i in (0, 5, 9):
        c.execute(
            "INSERT INTO probes(pv) VALUES (?)", (data[i].tobytes(),)
        )
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    # correlated: the TVF is the inner loop, re-filtered per probe row
    rows = c.execute(
        "SELECT p.pid, v.rowid, v.distance FROM probes AS p "
        "JOIN vector_full_scan('t', 'v', p.pv, 1) AS v "
        "ORDER BY p.pid"
    ).fetchall()
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (1, 1, 0.0),
        (2, 6, 0.0),
        (3, 10, 0.0),
    ]
    c.close()


@pytest.mark.skipif(not _vtab_available(), reason="vtab extension unavailable")
def test_tvf_duplicate_constraint_on_hidden_column(tmp_path, data):
    """A WHERE term duplicating a TVF argument's hidden column: the first EQ
    binds the argv slot, the duplicate is left unconsumed and evaluates as an
    ordinary post-filter against the hidden column's echoed argument value —
    a matching value keeps every row (like the reference, which binds one and
    runs), a contradictory one filters to zero rows; neither fails the plan
    (the C reference hits 'xBestIndex malfunction' here)."""
    c = svs.connect(str(tmp_path / "dup.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    # duplicated table-name argument, identical value: one EQ binds the argv
    # slot, the duplicate post-filters to true — full results
    rows = c.execute(
        "SELECT rowid, distance FROM vector_full_scan('t','v',?,5) "
        "WHERE tbl = 't'",
        (data[2].tobytes(),),
    ).fetchall()
    assert rows[0][0] == 3 and len(rows) == 5
    # duplicate on the k slot (hidden column 'memidx' per the reference's
    # positional naming quirk), identical value: still full results
    rows = c.execute(
        "SELECT rowid, distance FROM vector_full_scan('t','v',?,5) "
        "WHERE memidx = 5",
        (data[2].tobytes(),),
    ).fetchall()
    assert rows[0][0] == 3 and len(rows) == 5
    # contradictory duplicate: whichever EQ binds, the other post-filters
    # against the echoed argument and fails -> zero rows (never a plan error)
    rows = c.execute(
        "SELECT rowid, distance FROM vector_full_scan('t','v',?,5) "
        "WHERE memidx = 6",
        (data[2].tobytes(),),
    ).fetchall()
    assert rows == []
    # a WHERE term putting the WRONG TYPE on an argument slot (hidden column
    # 'k' is the vector slot): either the TVF argument binds (clean run,
    # post-filter false -> zero rows) or the WHERE term binds (clear
    # argument-type error) — never SQLite's 'xBestIndex malfunction'
    try:
        rows = c.execute(
            "SELECT rowid, distance FROM vector_full_scan('t','v',?,5) "
            "WHERE k = 5",
            (data[2].tobytes(),),
        ).fetchall()
        assert rows == []
    except sqlite3.OperationalError as e:
        assert "must be of type" in str(e)  # reference-parity wording
    # and the plain query still plans fine
    rows = c.execute(
        "SELECT rowid, distance FROM vector_full_scan('t','v',?,5)",
        (data[2].tobytes(),),
    ).fetchall()
    assert rows[0][0] == 3 and len(rows) == 5
    c.close()


def test_rollback_invalidates_cached_rows(tmp_path, data):
    """A scan inside a transaction must not poison the cache: after
    ROLLBACK the rolled-back rows must disappear (sqlite3_total_changes
    does not decrement on rollback, so the stamp alone can't tell)."""
    c = svs.connect(str(tmp_path / "rb.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    probe = np.full(DIM, 7.25, np.float32)
    c.execute("INSERT INTO t(v) VALUES (?)", (probe.tobytes(),))  # txn open
    rows = c.vector_full_scan("t", "v", probe.tobytes(), 1)
    assert rows[0][0] == N + 1 and rows[0][1] == 0.0  # visible inside txn
    c.rollback()
    rows = c.vector_full_scan("t", "v", probe.tobytes(), 1)
    assert rows[0][0] != N + 1  # the phantom row is gone
    c.close()


def test_rollback_invalidates_quantize(tmp_path, data):
    """vector_quantize inside a caller's transaction that ROLLS BACK:
    the quantized scan must error (the shadow table is gone), exactly as
    the reference does when the shadow table is missing (:1780-1787)."""
    from sqlite_vector_tpu.errors import VectorStateError

    c = svs.connect(str(tmp_path / "rbq.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    c.execute("INSERT INTO t(v) VALUES (?)", (data[0].tobytes(),))  # open txn
    assert c.in_transaction
    c.vector_quantize("t", "v")
    rows = c.vector_quantize_scan("t", "v", data[1].tobytes(), 3)
    assert rows[0][0] == 2  # works inside the txn
    c.rollback()
    with pytest.raises(VectorStateError, match="vector_quantize"):
        c.vector_quantize_scan("t", "v", data[1].tobytes(), 3)
    # re-quantize outside a txn works again
    c.vector_quantize("t", "v")
    rows = c.vector_quantize_scan("t", "v", data[1].tobytes(), 3)
    assert rows[0][0] == 2
    c.close()


def test_drop_table_detected(tmp_path, data):
    """DDL bumps neither data_version nor total_changes; schema_version in
    the stamp catches it — a dropped table must not keep serving vectors."""
    c = svs.connect(str(tmp_path / "dd.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    rows = c.vector_full_scan("t", "v", data[0].tobytes(), 1)
    assert rows[0][0] == 1
    c.execute("DROP TABLE t")
    c.commit()
    from sqlite_vector_tpu.errors import VectorError

    # schema change forces the reload, which errors on the missing table
    # (native loader -> VectorCodecError; Python loader -> OperationalError)
    with pytest.raises((sqlite3.OperationalError, VectorError)):
        c.vector_full_scan("t", "v", data[0].tobytes(), 1)
    c.close()


def test_quantize_cleanup_case_insensitive(tmp_path, data):
    """cleanup with different casing must drop the same shadow table the
    (init-cased) quantize created."""
    c = svs.connect(str(tmp_path / "cc.db"))
    c.execute("CREATE TABLE Docs (V BLOB)")
    c.executemany("INSERT INTO Docs(V) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("Docs", "V", f"type=FLOAT32,dimension={DIM}")
    c.vector_quantize("Docs", "V")
    assert c.execute(
        "SELECT COUNT(*) FROM sqlite_master WHERE name LIKE 'vector0_%'"
    ).fetchone()[0] == 1
    c.vector_quantize_cleanup("docs", "v")  # different casing
    assert c.execute(
        "SELECT COUNT(*) FROM sqlite_master WHERE name LIKE 'vector0_%'"
    ).fetchone()[0] == 0
    c.close()


def test_sql_surface_on_2d_mesh(tmp_path, rng):
    """The full SQL surface over a 2-D (rows x dim) mesh with a dim that
    needs padding: quantize writes true-width shadow records and the
    quantized scans delegate to the mesh-aware Dataset paths."""
    from sqlite_vector_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d(4, 2)
    d = 33  # pads to 34 on the 2-wide dim axis
    mdata = rng.standard_normal((60, d)).astype(np.float32)
    c = svs.connect(str(tmp_path / "m2.db"), mesh=mesh)
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in mdata))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={d}")
    rows = c.vector_full_scan("t", "v", mdata[4].tobytes(), 3)
    assert rows[0][0] == 5 and rows[0][1] == 0.0
    n = c.vector_quantize("t", "v")
    assert n == 60
    # shadow records are true-width (8 + 33 per row)
    counter, blob = c.execute(
        "SELECT counter, data FROM \"vector0_t_v\" LIMIT 1"
    ).fetchone()
    assert len(blob) == counter * (8 + d)
    rows = c.vector_quantize_scan("t", "v", mdata[4].tobytes(), 3)
    assert rows[0][0] == 5
    stream = list(c.vector_quantize_scan_stream("t", "v", mdata[4].tobytes()))
    assert len(stream) == 60 and min(stream, key=lambda t: t[1])[0] == 5
    # cross-connection: a FRESH single-device connection reads the shadow
    c2 = svs.connect(str(tmp_path / "m2.db"))
    c2.vector_init("t", "v", f"type=FLOAT32,dimension={d}")
    rows2 = c2.vector_quantize_scan("t", "v", mdata[4].tobytes(), 3)
    assert rows2[0][0] == 5
    c2.close()
    c.close()


@pytest.mark.skipif(
    not (os.path.exists(REF_SO) and _vtab_available()),
    reason="compiled C reference / vtab unavailable",
)
def test_normalized_cosine_interop_with_c_reference(tmp_path, rng):
    """normalized=1 + COSINE: the C reference parses the flag and computes
    plain cosine; our engine scans a pure dot. On unit-norm data both must
    return the same neighbor sets and matching distances."""
    dim = 24
    data = rng.standard_normal((400, dim)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    path = str(tmp_path / "norm.db")
    c = svs.connect(path)
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init(
        "t", "v", f"type=FLOAT32,dimension={dim},distance=COSINE,normalized=1"
    )
    sql = "SELECT rowid, distance FROM vector_full_scan('t','v',?,10)"
    q = data[7].tobytes()
    ours = c.execute(sql, (q,)).fetchall()
    c.close()
    assert ours[0][0] == 8 and ours[0][1] == 0.0

    rc = sqlite3.connect(path)
    rc.enable_load_extension(True)
    rc.load_extension(REF_SO[:-3])
    rc.execute(
        "SELECT vector_init('t','v',"
        f"'type=FLOAT32,dimension={dim},distance=COSINE,normalized=1')"
    )
    theirs = rc.execute(sql, (q,)).fetchall()
    rc.close()
    assert [r[0] for r in ours] == [r[0] for r in theirs]
    np.testing.assert_allclose(
        [r[1] for r in ours], [r[1] for r in theirs], rtol=1e-4, atol=1e-5
    )


@pytest.mark.skipif(
    not (os.path.exists(REF_SO) and _vtab_available()),
    reason="compiled C reference / vtab unavailable",
)
def test_normalized_cosine_bf16_interop_with_c_reference(tmp_path, rng):
    """normalized=1 + COSINE on FLOATB16 storage: the bf16 cast re-perturbs
    unit norms by up to ~2*eps (≈4e-3), so the pure-dot fast path is
    F32-only and bf16 must take plain cosine — whose divide cancels the
    cast error exactly, matching the C reference on the same stored bytes
    (self-match back at 0.0). Pins the round-3 campaign finding: the
    pre-fix fast path returned the self-match at ~2.2e-3 here."""
    import ml_dtypes

    dim = 24
    data = rng.standard_normal((400, dim)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    data16 = data.astype(ml_dtypes.bfloat16)
    path = str(tmp_path / "normb.db")
    c = svs.connect(path)
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany(
        "INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data16)
    )
    c.commit()
    c.vector_init(
        "t", "v", f"type=FLOATB16,dimension={dim},distance=COSINE,normalized=1"
    )
    sql = "SELECT rowid, distance FROM vector_full_scan('t','v',?,10)"
    q = data16[7].tobytes()
    ours = c.execute(sql, (q,)).fetchall()
    c.close()
    assert ours[0][0] == 8 and ours[0][1] == 0.0  # fails on the pure-dot path

    rc = sqlite3.connect(path)
    rc.enable_load_extension(True)
    rc.load_extension(REF_SO[:-3])
    rc.execute(
        "SELECT vector_init('t','v',"
        f"'type=FLOATB16,dimension={dim},distance=COSINE,normalized=1')"
    )
    theirs = rc.execute(sql, (q,)).fetchall()
    rc.close()
    assert {r[0] for r in ours} == {r[0] for r in theirs}
    np.testing.assert_allclose(
        sorted(r[1] for r in ours), sorted(r[1] for r in theirs),
        rtol=2e-3, atol=2e-3,
    )


@pytest.mark.skipif(not _vtab_available(), reason="vtab extension unavailable")
def test_stream_tvf_extra_argument_is_arity_error(tmp_path, data):
    """A stream TVF called with a 4th argument must raise the reference's
    arity error — not silently post-filter NULL=value to zero rows
    (round-3 review finding)."""
    c = svs.connect(str(tmp_path / "ar.db"))
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    with pytest.raises(sqlite3.OperationalError, match="expects 3 arguments"):
        c.execute(
            "SELECT rowid, distance FROM vector_full_scan_stream('t','v',?,20)",
            (data[2].tobytes(),),
        ).fetchall()
    # the correct 3-arg call still works
    rows = c.execute(
        "SELECT rowid, distance FROM vector_full_scan_stream('t','v',?)",
        (data[2].tobytes(),),
    ).fetchall()
    assert len(rows) == len(data)
    c.close()


def test_rollback_discards_provisional_quant(tmp_path, data):
    """vector_quantize inside a ROLLED-BACK transaction must not leave its
    codes serving scans: shadow existence alone cannot distinguish 'our
    write committed' from 'the pre-transaction shadow survived the
    rollback' — the schema cookie can (it reverts with the rollback)."""
    path = str(tmp_path / "rb.db")
    c = svs.connect(path)
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany(
        "INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data[:40])
    )
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    c.vector_quantize("t", "v")  # committed generation: 40 rows
    v1 = c.vector_quantize_scan("t", "v", data[0].tobytes(), 5)

    c.execute("BEGIN")
    c.executemany(
        "INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data[40:])
    )
    assert c.vector_quantize("t", "v") == len(data)  # provisional
    c.execute("ROLLBACK")

    # rolled-back rows (ids > 40) must never be served; the scan reflects
    # the committed generation exactly
    assert c.vector_quantize_scan("t", "v", data[0].tobytes(), 5) == v1
    rows = list(c.vector_quantize_scan_stream("t", "v", data[0].tobytes()))
    assert len(rows) == 40 and max(r[0] for r in rows) <= 40
    c.close()


def test_cross_connection_requantize_refreshes_cache(tmp_path, rng):
    """Connection A's cached quantization must follow a re-quantize done by
    connection B — including an AUTO qtype flip (I8 -> U8) that changes how
    the shadow bytes are interpreted and the scale the query is quantized
    with (stale init-time params must be re-read with the codes)."""
    path = str(tmp_path / "xq.db")
    neg = rng.standard_normal((30, DIM)).astype(np.float32)  # negatives: I8
    a = svs.connect(path)
    a.execute("CREATE TABLE t (v BLOB)")
    a.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in neg))
    a.commit()
    a.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    a.vector_quantize("t", "v")
    assert a.vector_quantize_scan("t", "v", neg[3].tobytes(), 3)[0][0] == 4

    b = svs.connect(path)
    pos = np.abs(neg) + 1.0  # all-positive: AUTO resolves U8
    b.execute("DELETE FROM t")
    b.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in pos))
    b.commit()
    b.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    b.vector_quantize("t", "v")
    want = b.vector_quantize_scan("t", "v", pos[5].tobytes(), 3)

    got = a.vector_quantize_scan("t", "v", pos[5].tobytes(), 3)
    assert got == want and got[0][1] == 0.0
    a.close()
    b.close()


def test_quantize_shadow_uses_quantize_time_ids(conn, data, monkeypatch):
    """Shadow records pair codes with ids captured AT quantize time: a
    mutation landing between the device build (outside the mutation lock)
    and the shadow write must not shift or shrink the pairing."""
    ctx = conn._lookup("docs", "v", "test")
    ds = conn._refresh(ctx)
    real_quantize = ds.quantize

    def quantize_then_mutate(*a, **kw):
        n = real_quantize(*a, **kw)
        # removal of half the rows forces compaction: ds.ids shrinks and
        # reorders while the quantize-time _QuantState stays intact
        ds.remove(ds.ids[: len(data) // 2])
        return n

    monkeypatch.setattr(ds, "quantize", quantize_then_mutate)
    assert conn.vector_quantize("docs", "v") == len(data)
    rows = conn.vector_quantize_scan("docs", "v", data[7].tobytes(), 1)
    assert rows[0][0] == 8  # row 7 still paired with its 1-based id
    c_rows = list(
        conn.vector_quantize_scan_stream("docs", "v", data[7].tobytes())
    )
    assert len(c_rows) == len(data)


def test_without_rowid_substring_false_positive(tmp_path, data):
    """An ordinary rowid table whose SQL merely CONTAINS the text 'without
    rowid' (string literal/comment) must not be misclassified — the
    reference's substring heuristic (:307-323) rejects it; pragma_table_list
    classifies exactly."""
    c = svs.connect(str(tmp_path / "fp.db"))
    c.execute(
        "CREATE TABLE t (v BLOB, note TEXT DEFAULT 'without rowid')"
    )
    c.executemany(
        "INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data[:20])
    )
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")  # must not raise
    rows = c.vector_full_scan("t", "v", data[2].tobytes(), 1)
    assert rows[0][0] == 3 and rows[0][1] == 0.0
    c.close()


def test_empty_blob_raises_consistently(tmp_path, data):
    """A zero-length (x'') vector blob is a short vector, not a NULL: both
    loaders (native C++ and the Python fallback) must raise the same
    'Invalid vector size' error instead of the native path silently
    skipping the row (column_blob returns NULL for empty blobs)."""
    path = str(tmp_path / "eb.db")
    c = svs.connect(path)
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany(
        "INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data[:10])
    )
    c.execute("INSERT INTO t(v) VALUES (x'')")
    c.commit()
    c.vector_init("t", "v", f"type=FLOAT32,dimension={DIM}")
    with pytest.raises(Exception, match="Invalid vector size for rowid 11"):
        c.vector_full_scan("t", "v", data[0].tobytes(), 3)
    c.close()


def test_native_prebuilt_so_without_sources(monkeypatch):
    """An installed distribution ships the package without csrc/: a
    prebuilt .so must still activate instead of being ignored."""
    from sqlite_vector_tpu import native

    if not os.path.exists(native._so):
        pytest.skip("native module not built in this environment")
    monkeypatch.setattr(native, "_src", native._src + ".missing")
    assert native._build() is True
    if os.path.exists(native._vtab_so):
        monkeypatch.setattr(
            native, "_vtab_src", native._vtab_src + ".missing"
        )
        monkeypatch.setattr(native, "_vtab_checked", False)
        monkeypatch.setattr(native, "_vtab_path", None)
        assert native.vtab_extension_path() == native._vtab_so
