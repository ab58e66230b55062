"""Differential op-sequence fuzzer vs the compiled C reference.

Random mutation sequences (insert / update / delete / re-quantize) are
applied to one SQLite database; at checkpoints the SAME scans run through
both engines — this framework's connection (with its incremental-refresh
and TPU/XLA scan paths) and the reference extension compiled from
/root/reference — and every result is validated against the numpy oracle
with the tie-aware parity contract. Exercises, end to end:

  - refresh attribution (other-connection writes bump data_version; the
    reference re-walks the B-tree every scan)
  - persisted quantization interop (the reference quantizes into the shared
    shadow table; our fresh connection restores scale/offset from
    _sqliteai_vector — reference: src/sqlite-vector.c:451-491)
  - all 5 dtypes x 5 metrics, JSON and blob queries, k edge cases
  - non-finite rows on float dtypes (lane-skip / exclusion policies)

Skips without /tmp/refbuild/vector.so (see .claude/skills/verify/SKILL.md
for the build line).
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pytest

import sqlite_vector_tpu.sqlite as svs
from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.types import DistanceMetric, QuantType, VectorType

from tests.parity import REL_TOL_BY_TYPE, assert_topk_parity

REF_SO = "/tmp/refbuild/vector.so"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SO), reason="C reference not built"
)

TYPES = ["FLOAT32", "FLOAT16", "FLOATB16", "INT8", "UINT8"]
METRICS = ["L2", "SQUARED_L2", "L1", "COSINE", "DOT"]


def _ref_connect(path: str) -> sqlite3.Connection:
    conn = sqlite3.connect(path)
    conn.enable_load_extension(True)
    conn.load_extension(REF_SO[:-3])
    return conn


def _random_vec(rng, dim: int, vtype: VectorType, nonfinite: bool) -> np.ndarray:
    if vtype is VectorType.I8:
        return rng.integers(-128, 128, dim).astype(np.int8)
    if vtype is VectorType.U8:
        return rng.integers(0, 256, dim).astype(np.uint8)
    v = (rng.standard_normal(dim) * 3).astype(np.float32)
    if nonfinite and rng.random() < 0.25:
        j = int(rng.integers(0, dim))
        v[j] = rng.choice([np.nan, np.inf, -np.inf])
    return v.astype(vtype.np_dtype)


def _oracle_distances(q, state, metric: DistanceMetric, vtype: VectorType):
    """Oracle distances over the live rows, in pk order."""
    pks = sorted(state)
    base = np.stack([state[pk] for pk in pks])
    d = oracle.distance(q[None], base, metric, vtype)[0]
    return np.array(pks, np.int64), oracle.snap_zero(d)


@pytest.mark.parametrize("seed", list(range(8)) + ["mesh"])
def test_differential_op_sequences(tmp_path, seed):
    """seed='mesh' runs our engine sharded over the 8-virtual-device mesh —
    the full SQL surface through shard_map + ICI merge vs the single-thread
    C reference on the same database."""
    mesh = None
    if seed == "mesh":
        from sqlite_vector_tpu.parallel import make_mesh

        mesh = make_mesh(8)
        seed = 5  # f32, finite — strict reference comparison throughout
    rng = np.random.default_rng(1000 + seed)
    vtype = VectorType.from_name(TYPES[seed % len(TYPES)])
    metric = DistanceMetric.from_name(METRICS[(seed * 3 + 1) % len(METRICS)])
    dim = int(rng.integers(3, 40))
    is_float = vtype in (VectorType.F32, VectorType.F16, VectorType.BF16)
    # non-finite rows on some float runs; the oracle encodes each dtype's
    # exclusion/lane-skip policy, so the same parity check still applies
    nonfinite = is_float and seed % 2 == 0
    rel_tol = REL_TOL_BY_TYPE[vtype.value]

    path = str(tmp_path / f"fuzz{seed}.db")
    writer = sqlite3.connect(path)
    writer.execute("CREATE TABLE t (v BLOB)")
    writer.commit()

    opts = f"type={vtype.value},dimension={dim},distance={metric.value}"
    ours = svs.connect(path, mesh=mesh)
    ours.vector_init("t", "v", opts)
    ref = _ref_connect(path)
    ref.execute(f"SELECT vector_init('t','v','{opts}')")

    state: dict[int, np.ndarray] = {}
    next_pk = 1

    def insert(n: int):
        nonlocal next_pk
        for _ in range(n):
            v = _random_vec(rng, dim, vtype, nonfinite)
            writer.execute(
                "INSERT INTO t(rowid, v) VALUES (?, ?)", (next_pk, v.tobytes())
            )
            state[next_pk] = v
            next_pk += 1
        writer.commit()

    def mutate():
        op = rng.choice(["insert", "insert", "update", "delete"])
        if op == "insert" or not state:
            insert(int(rng.integers(1, 12)))
        elif op == "update":
            pk = int(rng.choice(list(state)))
            v = _random_vec(rng, dim, vtype, nonfinite)
            writer.execute("UPDATE t SET v=? WHERE rowid=?", (v.tobytes(), pk))
            writer.commit()
            state[pk] = v
        else:
            pk = int(rng.choice(list(state)))
            writer.execute("DELETE FROM t WHERE rowid=?", (pk,))
            writer.commit()
            del state[pk]

    def check_exact():
        if not state:
            return
        k = int(rng.choice([1, 5]))
        use_json = bool(rng.random() < 0.3) and not nonfinite
        qpk = int(rng.choice(list(state)))
        q = state[qpk]
        if use_json:
            qarg = "[" + ", ".join(str(float(x)) for x in q.astype(np.float64)) + "]"
        else:
            qarg = q.tobytes()
        ids_all, d = _oracle_distances(q, state, metric, vtype)

        rows = ours.vector_full_scan("t", "v", qarg, k)
        got_ids = np.array([r[0] for r in rows], np.int64)
        got_vals = np.array([r[1] for r in rows], np.float64)
        kk = min(k, len(ids_all))
        pad = kk - len(got_ids)
        assert pad >= 0
        assert_topk_parity(
            ids_all, d,
            np.pad(got_ids, (0, k - len(got_ids)), constant_values=-1),
            np.pad(got_vals, (0, k - len(got_vals)), constant_values=np.inf),
            k, rel_tol=rel_tol, label=f"ours seed={seed}",
        )

        if nonfinite and vtype is not VectorType.F32:
            # the reference's own backends disagree on f16/bf16 non-finite
            # semantics (scalar/NEON plain math vs SSE2/AVX2 lane-skip, and
            # the AVX2 vector body zeroes matched-Inf diffs while its scalar
            # tail propagates NaN) — there is no single reference ground
            # truth to compare against; our engine is pinned to the oracle
            # above. See STATUS.md "reference backend inconsistencies".
            return

        rrows = ref.execute(
            "SELECT rowid, distance FROM vector_full_scan('t','v',?,?)",
            (qarg, k),
        ).fetchall()
        rids = np.array([r[0] for r in rrows], np.int64)
        # sqlite3 surfaces a NaN REAL as NULL through the Python driver
        rvals = np.array(
            [np.nan if r[1] is None else r[1] for r in rrows], np.float64
        )
        assert_topk_parity(
            ids_all, d,
            np.pad(rids, (0, k - len(rids)), constant_values=-1),
            np.pad(rvals, (0, k - len(rvals)), constant_values=np.inf),
            k, rel_tol=rel_tol, label=f"reference seed={seed}",
        )

    def check_stream():
        if not state or nonfinite:
            return
        q = state[int(rng.choice(list(state)))]
        ids_all, d = _oracle_distances(q, state, metric, vtype)
        srows = ours.execute(
            "SELECT id, distance FROM vector_full_scan_stream('t','v',?) "
            "ORDER BY id",
            (q.tobytes(),),
        ).fetchall()
        assert [r[0] for r in srows] == ids_all.tolist()
        np.testing.assert_allclose(
            [r[1] for r in srows], d, rtol=max(rel_tol, 1e-6), atol=1e-6
        )
        # reference emits a phantom (0, 0.0) first row — pinned deviation
        rrows = ref.execute(
            "SELECT id, distance FROM vector_full_scan_stream('t','v',?)",
            (q.tobytes(),),
        ).fetchall()
        rreal = sorted(r for r in rrows if r[0] != 0)
        assert [r[0] for r in rreal] == ids_all.tolist()

    def check_quantized():
        nonlocal ours, ref
        if len(state) < 3 or nonfinite:
            return
        # reference quantizes into the SHARED shadow table; our engine must
        # serve scans from the same persisted params (and vice versa)
        if rng.choice(["ours", "ref"]) == "ours":
            ours.vector_quantize("t", "v")
        else:
            ref.execute("SELECT vector_quantize('t','v')").fetchall()
        # reopen both connections: params restore from _sqliteai_vector
        ours.close()
        ref.close()
        ours = svs.connect(path, mesh=mesh)
        ours.vector_init("t", "v", opts)
        ref = _ref_connect(path)
        ref.execute(f"SELECT vector_init('t','v','{opts}')")

        qpk = int(rng.choice(list(state)))
        q = state[qpk]
        k = min(5, len(state))
        our_rows = ours.vector_quantize_scan("t", "v", q.tobytes(), k)
        ref_rows = ref.execute(
            "SELECT rowid, distance FROM vector_quantize_scan('t','v',?,?)",
            (q.tobytes(), k),
        ).fetchall()
        # both scans run in the same quantized integer domain over the same
        # codes: identical distance VALUES; ids may permute within ties
        assert len(our_rows) == len(ref_rows) == k
        np.testing.assert_allclose(
            sorted(r[1] for r in our_rows),
            sorted(r[1] for r in ref_rows),
            rtol=1e-6, atol=1e-6,
        )
        d_ours = {r[1] for r in our_rows}
        for rid, rdist in ref_rows:
            assert rdist in d_ours or any(
                abs(rdist - x) <= 1e-6 * max(1.0, abs(rdist)) for x in d_ours
            )

    insert(int(rng.integers(5, 30)))
    check_exact()
    for _ in range(7):
        mutate()
        check_exact()
        if rng.random() < 0.4:
            check_stream()
        if rng.random() < 0.4:
            check_quantized()
    check_exact()
    ours.close()
    ref.close()
    writer.close()


def _adversarial_json(rng) -> str:
    """Random JSON-ish vector text stressing the strtod grammar: whitespace,
    trailing commas, exponents, boundary values, and malformed variants."""
    n = int(rng.integers(1, 12))
    toks = []
    for _ in range(n):
        kind = rng.integers(0, 8)
        if kind == 0:
            toks.append(str(int(rng.integers(-300, 300))))
        elif kind == 1:
            toks.append(f"{float(rng.standard_normal() * 100):.9g}")
        elif kind == 2:
            toks.append(f"{float(rng.standard_normal()):.3e}")
        elif kind == 3:
            toks.append(rng.choice(["127.5", "-128.5", "255.5", "-0.5", "0.5"]))
        elif kind == 4:
            toks.append(rng.choice(["1e40", "-1e40", "1e-50", "3.5e38"]))
        elif kind == 5:
            toks.append(rng.choice(["0", "-0", "0.0", ".5", "5."]))
        elif kind == 6:
            toks.append("  " + str(int(rng.integers(0, 9))) + "\t")
        else:
            toks.append(str(float(rng.integers(-2, 3)) / 2))
    body = ",".join(toks)
    if rng.random() < 0.2:
        body += ","          # trailing comma (tolerated by the reference)
    pre = " " * int(rng.integers(0, 3))
    post = " " * int(rng.integers(0, 3))
    s = f"{pre}[{body}]{post}"
    if rng.random() < 0.15:  # malformed variants: both engines must reject
        s = rng.choice([
            s.replace("[", "", 1),
            s.replace("]", ""),
            s.replace(",", ",,", 1),
            s + "x",
            "[" + body + " 1]",
        ])
    return s


@pytest.mark.parametrize("as_fn,np_dtype", [
    ("vector_as_f32", np.float32),
    ("vector_as_f16", np.float16),
    ("vector_as_bf16", None),   # compare raw bytes only
    ("vector_as_i8", np.int8),
    ("vector_as_u8", np.uint8),
])
def test_codec_json_differential(tmp_path, as_fn, np_dtype):
    """Byte-level vector_as_* parity on adversarial JSON: both engines must
    agree on accept/reject, and accepted outputs must be bit-identical
    (strtod grammar, trailing-comma tolerance, RNE f16 / truncation bf16,
    i8/u8 range checks — reference: src/sqlite-vector.c:1528-1719)."""
    rng = np.random.default_rng(77)
    ours = svs.connect(str(tmp_path / "codec.db"))
    ref = _ref_connect(str(tmp_path / "codec_ref.db"))

    agree = reject = 0
    for _ in range(300):
        s = _adversarial_json(rng)
        sql = f"SELECT {as_fn}(?)"
        try:
            mine = ours.execute(sql, (s,)).fetchone()[0]
            mine_err = None
        except Exception as e:
            mine, mine_err = None, e
        try:
            theirs = ref.execute(sql, (s,)).fetchone()[0]
            theirs_err = None
        except Exception as e:
            theirs, theirs_err = None, e

        if theirs_err is not None or mine_err is not None:
            assert mine_err is not None and theirs_err is not None, (
                f"accept/reject disagreement on {s!r}: "
                f"ours={mine_err} ref={theirs_err}"
            )
            reject += 1
            continue
        assert mine == theirs, (
            s,
            np.frombuffer(mine, np_dtype) if np_dtype else mine.hex(),
            np.frombuffer(theirs, np_dtype) if np_dtype else theirs.hex(),
        )
        agree += 1
    # the generator must not degenerate into all-reject (i8/u8 legitimately
    # reject most random vectors via the range check — both engines agree)
    assert agree >= (25 if np_dtype in (np.int8, np.uint8) else 100)
    ours.close()
    ref.close()
