"""Pallas fused-scan kernel vs the numpy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.ops.pallas_scan import pallas_scan_topk, supports
from sqlite_vector_tpu.types import DistanceMetric, VectorType

METRICS = list(DistanceMetric)


def _oracle_topk(base, queries, metric, vtype, k):
    d = oracle.distance(queries, base, metric, vtype)
    idx = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=-1)


@pytest.mark.parametrize("metric", METRICS)
def test_f32_matches_oracle(metric, rng):
    n, dim, b, k = 700, 100, 3, 12  # deliberately unaligned shapes
    base = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((b, dim)).astype(np.float32)
    vals, idx = pallas_scan_topk(queries, base, metric, k, valid_count=n)
    oidx, ovals = _oracle_topk(base, queries, metric, VectorType.F32, k)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("metric", [DistanceMetric.L2, DistanceMetric.DOT])
def test_bf16_matches_oracle(metric, rng):
    import ml_dtypes

    n, dim, b, k = 512, 128, 2, 8
    base = rng.standard_normal((n, dim)).astype(ml_dtypes.bfloat16)
    queries = base[rng.integers(0, n, b)]
    vals, idx = pallas_scan_topk(queries, base, metric, k, valid_count=n)
    # tie-aware exact comparison: bf16 accumulation differs between the
    # MXU dot (f32 accum) and the oracle's f64 LASSQ only within the
    # justified band at the selection boundary
    from tests.parity import REL_TOL_BY_TYPE, assert_topk_parity

    d = oracle.distance(queries, base, metric, VectorType.BF16)
    for bi in range(b):
        assert_topk_parity(
            np.arange(n),
            d[bi],
            np.asarray(idx)[bi],
            np.asarray(vals)[bi],
            k,
            rel_tol=REL_TOL_BY_TYPE["FLOATB16"],
            label=f"bf16/{metric.value}[{bi}]",
        )
    # self-match must be first for L2
    if metric is DistanceMetric.L2:
        assert (np.asarray(vals)[:, 0] == 0).all()


@pytest.mark.parametrize("qdtype", [np.uint8, np.int8])
@pytest.mark.parametrize(
    "metric",
    [DistanceMetric.SQUARED_L2, DistanceMetric.DOT, DistanceMetric.COSINE],
)
def test_int_matches_oracle(qdtype, metric, rng):
    n, dim, b, k = 600, 96, 2, 10
    info = np.iinfo(qdtype)
    base = rng.integers(info.min, info.max + 1, (n, dim)).astype(qdtype)
    queries = rng.integers(info.min, info.max + 1, (b, dim)).astype(qdtype)
    vals, idx = pallas_scan_topk(queries, base, metric, k, valid_count=n)
    vt = VectorType.U8 if qdtype is np.uint8 else VectorType.I8
    oidx, ovals = _oracle_topk(base, queries, metric, vt, k)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-5, atol=1e-5)


def test_valid_count_and_k_overflow(rng):
    n, dim, real, k = 512, 64, 7, 20
    base = np.zeros((n, dim), np.float32)
    base[:real] = rng.standard_normal((real, dim)).astype(np.float32) + 3.0
    q = np.zeros((1, dim), np.float32)
    vals, idx = pallas_scan_topk(
        q, base, DistanceMetric.L2, k, valid_count=real
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert (idx[0, :real] >= 0).all() and (idx[0, :real] < real).all()
    assert (idx[0, real:] == -1).all()
    assert np.isinf(vals[0, real:]).all()


def test_tie_break_prefers_earliest_row(rng):
    n, dim = 300, 32
    row = rng.standard_normal(dim).astype(np.float32)
    base = np.tile(row, (n, 1))  # all rows identical
    vals, idx = pallas_scan_topk(
        row[None, :], base, DistanceMetric.L2, 5, valid_count=n
    )
    np.testing.assert_array_equal(np.asarray(idx)[0], np.arange(5))
    assert (np.asarray(vals)[0] == 0).all()


def test_multi_tile_grid(rng):
    # force > 1 grid step: dim 128 -> tile 4096, so use n > 4096
    n, dim, k = 9000, 128, 15
    base = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((2, dim)).astype(np.float32)
    vals, idx = pallas_scan_topk(q, base, DistanceMetric.SQUARED_L2, k)
    oidx, ovals = _oracle_topk(base, q, DistanceMetric.SQUARED_L2, VectorType.F32, k)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=2e-4, atol=1e-3)


def test_supports_predicate():
    assert supports(DistanceMetric.L2, np.float32, 384, 20, 8)
    assert supports(DistanceMetric.L2, np.float32, 384, 200, 8)  # k up to 1024
    assert not supports(DistanceMetric.L2, np.float32, 384, 2000, 8)  # k cap
    assert not supports(DistanceMetric.L1, np.float32, 384, 20, 64)  # L1 batch cap


def test_supports_rejects_vmem_overflow_dims():
    """supports() must gate on the UNCLAMPED tile budget: dims so large that
    a 256-row tile overflows the VMEM budget fall back to the XLA scan."""
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops import pallas_scan

    assert pallas_scan.supports(DistanceMetric.L2, jnp.float32, 384, 20, 1)
    # dim=65536 f32: 256 rows x 65536 x 4B x nbuf(4) = 256 MB >> 8 MB budget
    assert not pallas_scan.supports(
        DistanceMetric.L2, jnp.float32, 65536, 20, 1
    )
