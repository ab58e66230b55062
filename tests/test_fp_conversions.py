"""Bit-exact float16/bfloat16 conversion parity.

The reference converts f32 -> f16 with fp16_ieee_from_fp32_value
(libs/fp16/fp16.h, IEEE round-to-nearest-even) and f32 -> bf16 with an
explicit ties-to-even rounding (src/distance-cpu.h:103-108):

    lsb = (bits >> 16) & 1;  rnd = 0x7FFF + lsb;  bf16 = (bits + rnd) >> 16

Our codec relies on numpy/ml_dtypes casts. These tests pin that equivalence
bit-for-bit so blobs produced by vector_as_f16/bf16 are byte-identical to the
C extension's.
"""

import numpy as np

from sqlite_vector_tpu.codec import vector_as_blob
from sqlite_vector_tpu.types import VectorType


def _ref_f32_to_bf16(f: np.ndarray) -> np.ndarray:
    """The reference's float32_to_bfloat16 (src/distance-cpu.h:103-108)."""
    x = f.astype(np.float32).view(np.uint32).astype(np.uint64)
    lsb = (x >> 16) & 1
    rnd = np.uint64(0x7FFF) + lsb
    return ((x + rnd) >> 16).astype(np.uint16)


def _sample_floats(rng) -> np.ndarray:
    specials = np.array(
        [0.0, -0.0, 1.0, -1.0, 65504.0, 65520.0, 65536.0, 1e-8, -1e-8,
         3.14159265, 2.0**-24, 2.0**-25, 1.0000001, np.inf, -np.inf],
        np.float32,
    )
    rand = rng.standard_normal(10000).astype(np.float32) * rng.choice(
        [1e-6, 1e-3, 1.0, 1e3, 1e6], 10000
    ).astype(np.float32)
    # random bit patterns (finite only, to dodge NaN payload conventions)
    bits = rng.integers(0, 2**32, 5000, dtype=np.uint32).view(np.float32)
    bits = bits[np.isfinite(bits)]
    return np.concatenate([specials, rand, bits])


def test_bf16_cast_matches_reference_formula(rng):
    vals = _sample_floats(rng)
    ours = vector_as_blob(vals, VectorType.BF16)
    got = np.frombuffer(ours, np.uint16)
    want = _ref_f32_to_bf16(vals)
    np.testing.assert_array_equal(got, want)


def test_f16_cast_is_ieee_round_nearest_even(rng):
    # numpy's float16 cast IS IEEE RNE (same as fp16_ieee_from_fp32_value);
    # pin the behavior on rounding-boundary cases so a regression in the
    # codec path would be caught
    vals = _sample_floats(rng)
    blob = vector_as_blob(vals, VectorType.F16)
    got = np.frombuffer(blob, np.uint16)
    want = vals.astype(np.float16).view(np.uint16)
    np.testing.assert_array_equal(got, want)
    # known boundary values: 2049 rounds to 2048 (tie to even), 2051 -> 2052
    edge = np.array([2049.0, 2051.0, 65519.0, 65520.0], np.float32)
    h = np.frombuffer(vector_as_blob(edge, VectorType.F16), np.uint16)
    back = h.view(np.float16).astype(np.float32)
    assert back[0] == 2048.0 and back[1] == 2052.0
    assert back[2] == 65504.0 and np.isinf(back[3])


def test_f16_bf16_blob_roundtrip(rng):
    vals = rng.standard_normal(64).astype(np.float32)
    for vt in (VectorType.F16, VectorType.BF16):
        blob = vector_as_blob(vals, vt)
        arr = np.frombuffer(blob, vt.np_dtype).astype(np.float32)
        rel = np.abs(arr - vals) / np.maximum(np.abs(vals), 1e-9)
        assert rel.max() < (1e-3 if vt is VectorType.F16 else 8e-3)
