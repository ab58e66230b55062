"""Oracle semantics vs the reference's documented edge policies
(src/distance-cpu.c, src/sqlite-vector.c:493-515, 1258-1272)."""

import numpy as np
import pytest

from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.types import DistanceMetric, QuantType, VectorType

F32 = VectorType.F32
ALL_METRICS = list(DistanceMetric)


def test_l2_vs_squared_l2():
    a = np.float32([1, 2, 3])
    b = np.float32([4, 6, 3])
    sq = oracle.distance(a, b, DistanceMetric.SQUARED_L2, F32)
    l2 = oracle.distance(a, b, DistanceMetric.L2, F32)
    assert sq == pytest.approx(25.0)
    assert l2 == pytest.approx(5.0)


def test_dot_is_negated():
    a = np.float32([1, 2])
    b = np.float32([3, 4])
    assert oracle.distance(a, b, DistanceMetric.DOT, F32) == pytest.approx(-11.0)


def test_cosine_zero_norm_returns_one():
    # reference :105-109: zero vector -> max distance 1.0
    a = np.float32([0, 0, 0])
    b = np.float32([1, 2, 3])
    assert oracle.distance(a, b, DistanceMetric.COSINE, F32) == 1.0
    assert oracle.distance(b, a, DistanceMetric.COSINE, F32) == 1.0


def test_cosine_identical_is_zeroish():
    a = np.float32([1, 2, 3])
    d = oracle.distance(a, a, DistanceMetric.COSINE, F32)
    assert abs(d) < 1e-6


def test_l1():
    a = np.float32([1, -2])
    b = np.float32([-1, 3])
    assert oracle.distance(a, b, DistanceMetric.L1, F32) == pytest.approx(7.0)


def test_f16_nan_lanes_contribute_zero():
    a = np.array([1.0, np.nan, 3.0], np.float16)
    b = np.array([1.0, 5.0, 3.0], np.float16)
    for m in (DistanceMetric.L2, DistanceMetric.SQUARED_L2, DistanceMetric.L1,
              DistanceMetric.DOT):
        d = oracle.distance(a, b, m, VectorType.F16)
        clean = oracle.distance(
            np.float16([1, 0, 3]), np.float16([1, 0, 3]), m, VectorType.F16
        )
        if m is DistanceMetric.DOT:
            assert d == pytest.approx(-(1.0 + 9.0))
        else:
            assert d == pytest.approx(float(clean))


def test_f16_inf_mismatch_is_inf():
    a = np.array([np.inf, 1.0], np.float16)
    b = np.array([2.0, 1.0], np.float16)
    d = oracle.distance(a, b, DistanceMetric.L2, VectorType.F16)
    assert np.isinf(d) and d > 0


def test_f16_matched_inf_skipped():
    # same-signed infinities: lane contributes 0 (reference :322-341)
    a = np.array([np.inf, 1.0], np.float16)
    b = np.array([np.inf, 4.0], np.float16)
    d = oracle.distance(a, b, DistanceMetric.SQUARED_L2, VectorType.F16)
    assert d == pytest.approx(9.0)


def test_f16_cosine_clamps_and_inf_returns_one():
    a = np.array([np.inf, 1.0], np.float16)
    b = np.array([1.0, 1.0], np.float16)
    assert oracle.distance(a, b, DistanceMetric.COSINE, VectorType.F16) == 1.0


def test_bf16_l2_lassq_policy():
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    a = np.array([1.0, np.nan], bf)
    b = np.array([3.0, 1.0], bf)
    d = oracle.distance(a, b, DistanceMetric.SQUARED_L2, VectorType.BF16)
    assert d == pytest.approx(4.0)


def test_u8_integer_domain():
    a = np.uint8([0, 255])
    b = np.uint8([255, 0])
    d = oracle.distance(a, b, DistanceMetric.SQUARED_L2, VectorType.U8)
    assert d == 2 * 255 * 255
    d1 = oracle.distance(a, b, DistanceMetric.L1, VectorType.U8)
    assert d1 == 510.0
    dd = oracle.distance(a, b, DistanceMetric.DOT, VectorType.U8)
    assert dd == 0.0


def test_i8_cosine_zero_norm():
    a = np.int8([0, 0])
    b = np.int8([1, 2])
    assert oracle.distance(a, b, DistanceMetric.COSINE, VectorType.I8) == 1.0


# ---- quantization ----------------------------------------------------------


def test_q_round_u8_half_away_from_zero():
    s = np.float32([0.0, 0.4, 0.5, 0.6, 254.5, 255.4, 300.0, -5.0])
    out = oracle.q_round_u8(s)
    np.testing.assert_array_equal(out, [0, 0, 1, 1, 255, 255, 255, 0])


def test_q_round_u8_nonfinite():
    s = np.float32([np.nan, np.inf, -np.inf])
    np.testing.assert_array_equal(oracle.q_round_u8(s), [0, 255, 0])


def test_q_round_s8():
    s = np.float32([-0.5, -0.4, 0.5, 126.5, 127.9, -127.5, -200.0])
    out = oracle.q_round_s8(s)
    np.testing.assert_array_equal(out, [-1, 0, 1, 127, 127, -128, -128])


def test_q_round_s8_nonfinite():
    np.testing.assert_array_equal(
        oracle.q_round_s8(np.float32([np.nan, np.inf, -np.inf])), [0, 127, -128]
    )


def test_quant_params_u8():
    # scale = 255/(max-min), offset = min (reference :1265-1268)
    v = np.float32([[0.0, 1.0], [2.0, 10.0]])
    qt, scale, offset = oracle.compute_quant_params(v, QuantType.AUTO)
    assert qt is QuantType.U8
    assert scale == np.float32(255.0 / 10.0)
    assert offset == np.float32(0.0)


def test_quant_params_s8_symmetric():
    v = np.float32([[-4.0, 1.0], [2.0, 3.0]])
    qt, scale, offset = oracle.compute_quant_params(v, QuantType.AUTO)
    assert qt is QuantType.I8
    assert scale == np.float32(127.0 / 4.0)
    assert offset == np.float32(0.0)


def test_quant_auto_resolution():
    qt, _, _ = oracle.compute_quant_params(np.float32([1, 2]), QuantType.AUTO)
    assert qt is QuantType.U8
    qt, _, _ = oracle.compute_quant_params(np.float32([-1, 2]), QuantType.AUTO)
    assert qt is QuantType.I8
    # explicit qtype wins
    qt, _, _ = oracle.compute_quant_params(np.float32([1, 2]), QuantType.I8)
    assert qt is QuantType.I8


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(3)
    v = rng.standard_normal((100, 16)).astype(np.float32)
    qt, scale, offset = oracle.compute_quant_params(v, QuantType.AUTO)
    q = oracle.quantize(v, scale, offset, qt)
    deq = q.astype(np.float32) / scale + offset
    # max error is half a quantization step
    step = 1.0 / float(scale)
    assert np.max(np.abs(deq - v)) <= step * 0.5 + 1e-6


def test_nearly_zero_snap():
    eps = float(oracle.FLT_EPSILON)
    d = np.float32([0.0, 7 * eps, 9 * eps])
    out = oracle.snap_zero(d)
    assert out[0] == 0 and out[1] == 0 and out[2] != 0


def test_topk_reference_ties_prefer_scan_order():
    d = np.float32([5, 1, 1, 3])
    idx, vals = oracle.topk_reference(d, 2)
    np.testing.assert_array_equal(idx, [1, 2])
    np.testing.assert_array_equal(vals, [1, 1])


def test_topk_reference_trims_inf():
    d = np.float32([2.0, np.inf, 1.0])
    idx, vals = oracle.topk_reference(d, 5)
    np.testing.assert_array_equal(idx, [2, 0])


def test_topk_reference_excludes_nan():
    """NaN never beats the INFINITY slot init (strict <): NaN rows are
    never admitted and never surface in trimmed output."""
    idx, vals = oracle.topk_reference(np.float32([np.nan, 1.0, np.nan]), 3)
    assert idx.tolist() == [1] and vals.tolist() == [1.0]
    with np.testing.assert_raises(ValueError):
        oracle.topk_reference(np.zeros((2, 3), np.float32), 2)


def test_quant_params_all_inf_matches_c_scan():
    """+Inf propagates into max but can never lower min below its FLT_MAX
    init (the C pass-1's strict-< scan, src/sqlite-vector.c:1202-1252):
    all-+Inf input yields scale 0 / offset FLT_MAX, not the no-rows
    params."""
    flt_max = np.float32(np.finfo(np.float32).max)
    qt, scale, offset = oracle.compute_quant_params(
        np.float32([np.inf, np.inf]), QuantType.AUTO
    )
    assert qt is QuantType.U8 and scale == 0.0 and offset == flt_max
    qt2, scale2, offset2 = oracle.compute_quant_params_chunked(
        [np.float32([np.inf]), np.float32([np.inf])], QuantType.AUTO
    )
    assert scale2 == 0.0 and offset2 == flt_max
    # all-NaN / empty still resolve to the documented no-rows params
    qt3, s3, o3 = oracle.compute_quant_params(np.float32([np.nan]), QuantType.AUTO)
    assert (s3, o3) == (1.0, 0.0)


def test_quantize_fast_rejects_unresolved_auto(rng):
    """quantize_fast must error on QuantType.AUTO like quantize() does —
    silently treating AUTO as I8 corrupts codes whose params were computed
    for the unsigned range."""
    import pytest

    from sqlite_vector_tpu.oracle import quantize_fast
    from sqlite_vector_tpu.types import QuantType

    vals = rng.standard_normal((4, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="AUTO"):
        quantize_fast(vals, np.float32(1.0), np.float32(0.0), QuantType.AUTO)
