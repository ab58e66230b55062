"""Native C++ runtime parity: JSON parser and bulk SQLite loader must agree
with the pure-Python fallbacks (csrc/svt_native.cpp)."""

import sqlite3

import numpy as np
import pytest

from sqlite_vector_tpu import codec, native
from sqlite_vector_tpu.errors import VectorCodecError
from sqlite_vector_tpu.types import VectorType

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native module not built (no toolchain)"
)


@pytest.mark.parametrize("vtype", list(VectorType))
def test_json_parity_with_python(vtype, rng):
    if vtype in (VectorType.U8, VectorType.I8):
        vals = rng.integers(-128 if vtype is VectorType.I8 else 0, 127, 50)
        text = "[" + ", ".join(str(int(v)) for v in vals) + "]"
    else:
        vals = rng.standard_normal(50) * 100
        text = "[" + ", ".join(repr(float(v)) for v in vals) + "]"
    got = native.parse_json_vector(text, vtype, 0)
    want = codec._parse_python(text, vtype, 0)
    np.testing.assert_array_equal(
        np.asarray(got).view(np.uint8), np.asarray(want).view(np.uint8)
    )


def test_json_quirks():
    # trailing comma tolerated; whitespace; scientific notation; inf/nan
    a = native.parse_json_vector("  [ 1e2 , -2.5E-1, 3,]  ", VectorType.F32, 3)
    np.testing.assert_allclose(a, [100.0, -0.25, 3.0])
    assert np.isinf(native.parse_json_vector("[inf]", VectorType.F32, 0))[0]
    assert np.isnan(native.parse_json_vector("[nan]", VectorType.F32, 0))[0]
    with pytest.raises(VectorCodecError, match="expected '\\['"):
        native.parse_json_vector("1, 2", VectorType.F32, 0)
    with pytest.raises(VectorCodecError, match="expected a number"):
        native.parse_json_vector("[1, x]", VectorType.F32, 0)
    with pytest.raises(VectorCodecError, match="dimension"):
        native.parse_json_vector("[1, 2]", VectorType.F32, 3)
    with pytest.raises(VectorCodecError, match="uint8"):
        native.parse_json_vector("[256]", VectorType.U8, 0)
    with pytest.raises(VectorCodecError, match="int8"):
        native.parse_json_vector("[-129]", VectorType.I8, 0)


def test_load_blobs_matches_python_loop(tmp_path, rng):
    path = str(tmp_path / "nb.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE t (v BLOB)")
    data = rng.standard_normal((200, 16)).astype(np.float32)
    conn.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    conn.execute("INSERT INTO t(v) VALUES (NULL)")  # skipped
    conn.commit()
    conn.close()
    out = native.load_blobs(path, "SELECT rowid, v FROM t ORDER BY rowid", 64)
    assert out is not None
    ids, blob, count = out
    assert count == 200
    np.testing.assert_array_equal(ids, np.arange(1, 201))
    got = np.frombuffer(blob, np.float32).reshape(200, 16)
    np.testing.assert_array_equal(got, data)


def test_load_blobs_short_blob_error(tmp_path):
    path = str(tmp_path / "sb.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE t (v BLOB)")
    conn.execute("INSERT INTO t(v) VALUES (?)", (b"\x00" * 10,))
    conn.commit()
    conn.close()
    with pytest.raises(VectorCodecError, match="rowid 1"):
        native.load_blobs(path, "SELECT rowid, v FROM t", 64)
