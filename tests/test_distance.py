"""XLA distance ops vs the numpy oracle, all 25 (metric, dtype) combos."""

import numpy as np
import pytest

from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.ops.distance import pairwise_distance
from sqlite_vector_tpu.types import DistanceMetric, VectorType

METRICS = list(DistanceMetric)
TYPES = list(VectorType)


def _make_data(rng, vtype, b=4, n=64, d=24):
    if vtype in (VectorType.U8, VectorType.I8):
        lo, hi = (0, 256) if vtype is VectorType.U8 else (-128, 128)
        q = rng.integers(lo, hi, (b, d)).astype(vtype.np_dtype)
        base = rng.integers(lo, hi, (n, d)).astype(vtype.np_dtype)
    else:
        q = (rng.standard_normal((b, d)) * 2).astype(vtype.np_dtype)
        base = (rng.standard_normal((n, d)) * 2).astype(vtype.np_dtype)
    return q, base


@pytest.mark.parametrize("metric", METRICS, ids=[m.value for m in METRICS])
@pytest.mark.parametrize("vtype", TYPES, ids=[t.value for t in TYPES])
def test_pairwise_matches_oracle(rng, metric, vtype):
    q, base = _make_data(rng, vtype)
    got = np.asarray(pairwise_distance(q, base, metric, snap=False))
    want = oracle.distance(q, base, metric, vtype)
    if vtype in (VectorType.U8, VectorType.I8) and metric is not DistanceMetric.COSINE:
        # integer-domain distances are exact
        np.testing.assert_array_equal(got, want.astype(np.float32))
    else:
        tol = 2e-2 if vtype in (VectorType.F16, VectorType.BF16) else 2e-4
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


@pytest.mark.parametrize("metric", METRICS, ids=[m.value for m in METRICS])
def test_neighbor_order_matches_oracle(rng, metric):
    """Exact-scan neighbor ordering must match the oracle (parity bar from
    SURVEY.md section 7: identical neighbor sets with tie tolerance)."""
    q, base = _make_data(rng, VectorType.F32, b=2, n=200, d=32)
    got = np.asarray(pairwise_distance(q, base, metric, snap=False))
    want = oracle.distance(q, base, metric, VectorType.F32)
    for row_g, row_w in zip(got, want):
        k = 10
        top_g = set(np.argsort(row_g, kind="stable")[:k])
        top_w = set(np.argsort(row_w, kind="stable")[:k])
        assert len(top_g & top_w) >= k - 1  # allow one boundary tie swap


def test_cosine_zero_norm_device(rng):
    q = np.zeros((1, 8), np.float32)
    base = rng.standard_normal((4, 8)).astype(np.float32)
    d = np.asarray(pairwise_distance(q, base, DistanceMetric.COSINE))
    np.testing.assert_array_equal(d, np.ones_like(d))
    # zero base row
    base[2] = 0
    q2 = rng.standard_normal((1, 8)).astype(np.float32)
    d2 = np.asarray(pairwise_distance(q2, base, DistanceMetric.COSINE))
    assert d2[0, 2] == 1.0


def test_snap_zero_applied(rng):
    v = rng.standard_normal((1, 16)).astype(np.float32)
    d = np.asarray(pairwise_distance(v, v, DistanceMetric.SQUARED_L2, snap=True))
    assert d[0, 0] == 0.0


def test_dot_negation_device():
    q = np.float32([[1, 2]])
    b = np.float32([[3, 4]])
    d = np.asarray(pairwise_distance(q, b, DistanceMetric.DOT, snap=False))
    assert d[0, 0] == pytest.approx(-11.0)


def test_int_l2_exactness_large_values():
    # int32 accumulation must be exact where f32 would lose integer precision
    d = 768
    a = np.full((1, d), 255, np.uint8)
    b = np.zeros((1, d), np.uint8)
    got = np.asarray(pairwise_distance(a, b, DistanceMetric.SQUARED_L2))
    assert got[0, 0] == 255 * 255 * d


def test_precomputed_base_norms_match(rng):
    q, base = _make_data(rng, VectorType.F32)
    sq = np.sum(base.astype(np.float32) ** 2, axis=-1)
    d1 = np.asarray(pairwise_distance(q, base, DistanceMetric.L2))
    d2 = np.asarray(pairwise_distance(q, base, DistanceMetric.L2, base_sq_norms=sq))
    np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-6)


def test_int_l2_exact_through_intermediate_wrap():
    """u8 at dim 20000: qsq+csq (~2.6e9) wraps int32, but mod-2^32
    arithmetic keeps the composition exact while the FINAL value fits
    int32 (distance.INT_L2_EXACT_MAX_DIM) — regression for the claimed
    composition overflow at dim > 16512."""
    from sqlite_vector_tpu.ops.distance import _pairwise_int
    from sqlite_vector_tpu.ops.rerank import candidate_distances

    dim = 20000
    rng = np.random.default_rng(7)
    q = rng.integers(0, 256, (2, dim)).astype(np.uint8)
    b = rng.integers(0, 256, (3, dim)).astype(np.uint8)
    q[0, :] = 255                      # adversarial: max qsq
    b[0, :] = 0
    b[0, 1::2] = 255                   # disjoint support: small dot
    want = (
        (q.astype(np.int64)[:, None, :] - b.astype(np.int64)[None]) ** 2
    ).sum(-1)
    assert want.max() < 2**31          # final value must fit int32
    got = np.asarray(_pairwise_int(q, b, DistanceMetric.SQUARED_L2, None))
    np.testing.assert_array_equal(got, want.astype(np.float32))
    # the rerank/Pallas-finish rescorer composes the same way
    cand = np.broadcast_to(b, (2, 3, dim))
    got2 = np.asarray(
        candidate_distances(q, np.ascontiguousarray(cand), DistanceMetric.SQUARED_L2)
    )
    np.testing.assert_array_equal(got2, want.astype(np.float32))
