"""JSON <-> blob codec behavior vs the reference
(src/sqlite-vector.c:1528-1719)."""

import numpy as np
import pytest

from sqlite_vector_tpu.codec import (
    array_to_blob,
    blob_to_array,
    vector_as_blob,
    vector_from_json,
)
from sqlite_vector_tpu.errors import VectorCodecError
from sqlite_vector_tpu.types import VectorType


def test_json_f32_basic():
    v = vector_from_json("[0.1, 0.2, 0.3]", VectorType.F32)
    np.testing.assert_allclose(v, np.float32([0.1, 0.2, 0.3]))
    assert v.dtype == np.float32


def test_json_whitespace_and_trailing_comma():
    # trailing comma tolerated (reference :1627-1635)
    v = vector_from_json("  [ 1 , 2 , 3 , ]  ", VectorType.F32)
    np.testing.assert_array_equal(v, [1, 2, 3])


def test_json_negative_exponent():
    v = vector_from_json("[-1.5e-3, 2E2]", VectorType.F32)
    np.testing.assert_allclose(v, np.float32([-0.0015, 200.0]))


def test_json_missing_bracket():
    with pytest.raises(VectorCodecError, match="expected '\\['"):
        vector_from_json("0.1, 0.2", VectorType.F32)


def test_json_bad_number():
    with pytest.raises(VectorCodecError, match="expected a number"):
        vector_from_json("[0.1, oops]", VectorType.F32)


def test_json_unexpected_char():
    with pytest.raises(VectorCodecError, match="unexpected character"):
        vector_from_json("[1 2]", VectorType.F32)


def test_json_u8_range_check():
    v = vector_from_json("[0, 255]", VectorType.U8)
    assert v.dtype == np.uint8
    with pytest.raises(VectorCodecError, match="uint8_t"):
        vector_from_json("[256]", VectorType.U8)
    with pytest.raises(VectorCodecError, match="uint8_t"):
        vector_from_json("[-1]", VectorType.U8)


def test_json_i8_range_check():
    v = vector_from_json("[-128, 127]", VectorType.I8)
    assert v.dtype == np.int8
    with pytest.raises(VectorCodecError, match="int8_t"):
        vector_from_json("[128]", VectorType.I8)


def test_json_dimension_check():
    with pytest.raises(VectorCodecError, match="expected 4 but found 3"):
        vector_from_json("[1,2,3]", VectorType.F32, dimension=4)
    v = vector_from_json("[1,2,3]", VectorType.F32, dimension=3)
    assert v.shape == (3,)


def test_json_f16_bf16():
    v16 = vector_from_json("[1.0, 2.0]", VectorType.F16)
    assert v16.dtype == np.float16
    vb16 = vector_from_json("[1.0, 2.0]", VectorType.BF16)
    assert vb16.dtype.name == "bfloat16"


def test_blob_passthrough_and_size_validation():
    blob = array_to_blob(np.float32([1, 2, 3]))
    assert vector_as_blob(blob, VectorType.F32) == blob
    # size not multiple of element size (reference :1663-1669)
    with pytest.raises(VectorCodecError, match="multiple of 4 bytes"):
        vector_as_blob(blob[:-1], VectorType.F32)
    # dimension mismatch (reference :1670-1676)
    with pytest.raises(VectorCodecError, match="expected dimension"):
        vector_as_blob(blob, VectorType.F32, dimension=4)
    assert vector_as_blob(blob, VectorType.F32, dimension=3) == blob


def test_blob_roundtrip_all_types():
    rng = np.random.default_rng(1)
    for t in VectorType:
        if t in (VectorType.U8, VectorType.I8):
            arr = rng.integers(0, 100, 17).astype(t.np_dtype)
        else:
            arr = rng.standard_normal(17).astype(t.np_dtype)
        blob = array_to_blob(arr)
        assert len(blob) == 17 * t.itemsize
        back = blob_to_array(blob, t)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(arr))


def test_blob_little_endian_layout():
    # byte-compatibility with the reference's on-disk format
    blob = array_to_blob(np.float32([1.0]))
    assert blob == b"\x00\x00\x80\x3f"
    blob16 = array_to_blob(np.float16([1.0]))
    assert blob16 == b"\x00\x3c"


def test_json_from_string_via_as_blob():
    blob = vector_as_blob("[1.0, 2.0]", VectorType.F32)
    np.testing.assert_array_equal(
        blob_to_array(blob, VectorType.F32), np.float32([1, 2])
    )


def test_unsupported_input_type():
    with pytest.raises(VectorCodecError, match="Unsupported input type"):
        vector_as_blob(12345, VectorType.F32)


def test_json_unterminated_array_states():
    """The reference's NUL-terminated scan accepts/rejects unterminated
    arrays by WHERE the input ends (src/sqlite-vector.c:1563-1641) — found
    by the differential codec fuzzer and pinned here:
      accepted: EOF right after '[' (empty), EOF right after a comma
      rejected: EOF right after a number ('?'), EOF after '['+whitespace
    """
    assert vector_from_json("[", VectorType.F32).size == 0
    got = vector_from_json("[1,", VectorType.F32)
    np.testing.assert_array_equal(got, [1.0])
    got = vector_from_json("[1,  ", VectorType.F32)
    np.testing.assert_array_equal(got, [1.0])
    with pytest.raises(VectorCodecError, match=r"unexpected character '\?'"):
        vector_from_json("[1", VectorType.F32)
    with pytest.raises(VectorCodecError, match=r"unexpected character '\?'"):
        vector_from_json("[1.5, 2 \t", VectorType.F32)
    with pytest.raises(VectorCodecError, match="expected a number"):
        vector_from_json("[  ", VectorType.F32)


def test_json_unterminated_python_fallback_matches_native():
    """Both parser implementations (C++ fast path, Python fallback) encode
    the same unterminated-array automaton."""
    from sqlite_vector_tpu.codec import _parse_python

    for s in ("[", "[1,", "[1,  ", "[2.5]", "[2.5,]"):
        np.testing.assert_array_equal(
            vector_from_json(s, VectorType.F32),
            _parse_python(s, VectorType.F32),
        )
    for s in ("[1", "[  ", "[1 2]"):
        with pytest.raises(VectorCodecError):
            _parse_python(s, VectorType.F32)
        with pytest.raises(VectorCodecError):
            vector_from_json(s, VectorType.F32)


def test_ascii_character_classes_and_hex_floats():
    """The pure-Python fallback must match strtod (the native path / the C
    reference): ASCII-only digits/whitespace, hex float literals accepted."""
    import numpy as np
    import pytest

    from sqlite_vector_tpu.codec import _parse_python, vector_as_blob
    from sqlite_vector_tpu.errors import VectorCodecError
    from sqlite_vector_tpu.types import VectorType

    for bad in ("[²]", "[٣]", "[1\xa02]"):  # unicode digit / NBSP
        with pytest.raises(VectorCodecError):
            _parse_python(bad, VectorType.F32)
    assert _parse_python("[0x10]", VectorType.F32).tolist() == [16.0]
    assert _parse_python("[-0x1.8p3]", VectorType.F32).tolist() == [-12.0]
    assert _parse_python("[0x10, 2]", VectorType.F32).tolist() == [16.0, 2.0]
    # ndarray inputs share the TEXT path's range contract
    with pytest.raises(VectorCodecError, match="uint8_t"):
        vector_as_blob(np.array([300.0]), VectorType.U8)
    with pytest.raises(VectorCodecError, match="int8_t"):
        vector_as_blob(np.array([-200]), VectorType.I8)
    with pytest.raises(VectorCodecError):
        vector_as_blob(np.array(3.0), VectorType.F32, 4)  # 0-d
