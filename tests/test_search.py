"""Fused scan + top-k executor vs the oracle."""

import numpy as np
import pytest

from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.ops.scan import scan_distances, scan_topk
from sqlite_vector_tpu.types import DistanceMetric, VectorType


@pytest.mark.parametrize(
    "metric", list(DistanceMetric), ids=[m.value for m in DistanceMetric]
)
def test_scan_topk_matches_oracle(rng, metric):
    q = rng.standard_normal((3, 16)).astype(np.float32)
    base = rng.standard_normal((500, 16)).astype(np.float32)
    k = 12
    vals, idx = scan_topk(q, base, metric, k)
    vals, idx = np.asarray(vals), np.asarray(idx)
    want = oracle.distance(q, base, metric, VectorType.F32)
    for bi in range(q.shape[0]):
        w_idx, w_vals = oracle.topk_reference(oracle.snap_zero(want[bi]), k)
        # neighbor-set parity with one tie swap allowed at the boundary
        assert len(set(idx[bi]) & set(w_idx)) >= k - 1
        np.testing.assert_allclose(np.sort(vals[bi]), np.sort(w_vals), rtol=1e-4, atol=1e-5)


def test_scan_topk_chunked_matches_single(rng):
    """Tiled executor must agree with the one-shot path."""
    q = rng.standard_normal((2, 8)).astype(np.float32)
    base = rng.standard_normal((1000, 8)).astype(np.float32)
    v1, i1 = scan_topk(q, base, DistanceMetric.L2, 7)
    v2, i2 = scan_topk(q, base, DistanceMetric.L2, 7, row_tile=128)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_scan_topk_valid_count_masks_padding(rng):
    base = rng.standard_normal((64, 4)).astype(np.float32)
    base[50:] = 0.0  # padding rows would otherwise be near a zero query
    q = np.zeros((1, 4), np.float32)
    vals, idx = scan_topk(q, base, DistanceMetric.L2, 60, valid_count=50)
    idx = np.asarray(idx)[0]
    assert set(idx[idx >= 0]).issubset(set(range(50)))
    # unfilled slots are -1/+inf (trimmed by the Dataset layer)
    assert np.sum(idx == -1) == 10


def test_scan_topk_k_greater_than_n(rng):
    base = rng.standard_normal((5, 4)).astype(np.float32)
    q = rng.standard_normal((1, 4)).astype(np.float32)
    vals, idx = scan_topk(q, base, DistanceMetric.L2, 9)
    vals, idx = np.asarray(vals)[0], np.asarray(idx)[0]
    assert vals.shape == (9,)
    assert np.all(np.isinf(vals[5:]))
    assert np.all(idx[5:] == -1)
    assert sorted(idx[:5]) == [0, 1, 2, 3, 4]


def test_scan_topk_ascending_order(rng):
    base = rng.standard_normal((300, 8)).astype(np.float32)
    q = rng.standard_normal((1, 8)).astype(np.float32)
    vals, _ = scan_topk(q, base, DistanceMetric.L2, 20)
    vals = np.asarray(vals)[0]
    assert np.all(np.diff(vals) >= 0)


def test_scan_distances_full_matrix(rng):
    q = rng.standard_normal((2, 8)).astype(np.float32)
    base = rng.standard_normal((100, 8)).astype(np.float32)
    d = np.asarray(scan_distances(q, base, DistanceMetric.SQUARED_L2))
    want = oracle.distance(q, base, DistanceMetric.SQUARED_L2, VectorType.F32)
    np.testing.assert_allclose(d, oracle.snap_zero(want), rtol=1e-4, atol=1e-5)


def test_scan_topk_int_domain(rng):
    q = rng.integers(0, 256, (2, 16)).astype(np.uint8)
    base = rng.integers(0, 256, (200, 16)).astype(np.uint8)
    vals, idx = scan_topk(q, base, DistanceMetric.SQUARED_L2, 5)
    want = oracle.distance(q, base, DistanceMetric.SQUARED_L2, VectorType.U8)
    for bi in range(2):
        w_idx, w_vals = oracle.topk_reference(want[bi], 5)
        np.testing.assert_array_equal(np.sort(np.asarray(vals)[bi]), np.sort(w_vals))


def test_hierarchical_topk_exact(rng):
    """The two-level selection must be exactly equal to lax.top_k."""
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.topk import _hierarchical_smallest_k

    for trial in range(5):
        n = int(rng.integers(16384, 80000))
        b = int(rng.integers(1, 4))
        k = int(rng.integers(1, 64))
        d = rng.standard_normal((b, n)).astype(np.float32)
        if trial == 2:  # heavy duplicates stress tie handling
            d = np.round(d, 1)
        if trial == 3:  # clustered: many near-equal minima in one block
            d[:, :256] = 0.001
        vals, idx = _hierarchical_smallest_k(jnp.asarray(d), k)
        vals, idx = np.asarray(vals), np.asarray(idx)
        order = np.argsort(d, axis=-1, kind="stable")[:, :k]
        want = np.take_along_axis(d, order, axis=-1)
        np.testing.assert_array_equal(vals, want)
        # tie-parity: earliest index wins
        np.testing.assert_array_equal(idx, order)


def test_topk_ascending_large_n_matches_small_path(rng):
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.topk import topk_ascending

    d = rng.standard_normal((2, 40000)).astype(np.float32)
    vals, idx = topk_ascending(jnp.asarray(d), 15)
    order = np.argsort(d, axis=-1, kind="stable")[:, :15]
    np.testing.assert_array_equal(np.asarray(idx), order)
    np.testing.assert_array_equal(
        np.asarray(vals), np.take_along_axis(d, order, axis=-1)
    )
