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


def test_normalized_cosine_fast_path_matches_plain(rng):
    """normalized=1 + COSINE scans as a pure dot (beyond-parity fast path;
    the reference parses `normalized` and never uses it). On genuinely
    unit-norm data the results must match the plain cosine path."""
    import sqlite_vector_tpu as svt

    data = rng.standard_normal((800, 32)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    plain = svt.Dataset.from_arrays(
        "p", data.copy(), options="dimension=32,type=FLOAT32,distance=COSINE"
    )
    fast = svt.Dataset.from_arrays(
        "f", data.copy(),
        options="dimension=32,type=FLOAT32,distance=COSINE,normalized=1",
    )
    for qi in (0, 5, 99):
        q = data[qi]
        ids_p, d_p = plain.search(q, 10)
        ids_f, d_f = fast.search(q, 10)
        assert set(ids_p.tolist()) == set(ids_f.tolist())
        assert d_f[0] == 0.0  # self-distance snaps to exactly 0
        np.testing.assert_allclose(d_f, d_p, rtol=1e-4, atol=1e-5)
    # un-normalized query: the fast path normalizes it host-side, so the
    # NEIGHBOR ORDER matches plain cosine (cosine is scale-invariant)
    q = data[3] * 7.5
    np.testing.assert_array_equal(
        plain.search(q, 10)[0], fast.search(q, 10)[0]
    )
    # approx mode rides the same fast path
    ids_a, d_a = fast.search(data[7], 5, mode="approx")
    assert ids_a[0] == fast.ids[7] and d_a[0] == 0.0


def test_normalized_cosine_zero_norm_rules(rng):
    """Zero-norm queries and zero-norm base rows yield distance exactly 1.0
    (the reference's zero-norm rule, src/distance-cpu.c:105-109), even on
    the normalized fast path."""
    import sqlite_vector_tpu as svt

    data = rng.standard_normal((50, 8)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    data[17] = 0.0  # a zero-norm base row (violates the user's assertion)
    ds = svt.Dataset.from_arrays(
        "z", data, options="dimension=8,type=FLOAT32,distance=COSINE,normalized=1"
    )
    # zero query: every distance is exactly 1.0
    ids, dist = ds.search(np.zeros(8, np.float32), 50)
    np.testing.assert_array_equal(dist, np.ones(50, np.float32))
    # the zero base row scores exactly 1.0 for a normal query
    ids, dist = ds.search(data[0], 50)
    pos = list(ids).index(ds.ids[17])
    assert dist[pos] == 1.0


def test_normalized_flag_ignored_for_other_metrics(rng):
    import sqlite_vector_tpu as svt

    data = rng.standard_normal((100, 8)).astype(np.float32)
    a = svt.Dataset.from_arrays(
        "a", data.copy(), options="dimension=8,type=FLOAT32,distance=L2"
    )
    b = svt.Dataset.from_arrays(
        "b", data.copy(),
        options="dimension=8,type=FLOAT32,distance=L2,normalized=1",
    )
    q = data[42]
    np.testing.assert_array_equal(a.search(q, 5)[0], b.search(q, 5)[0])
    np.testing.assert_array_equal(a.search(q, 5)[1], b.search(q, 5)[1])


def test_normalized_cosine_fast_path_f16_and_host_and_mesh(rng):
    """Layouts ride the fast path (host storage, 1-D mesh); f16 storage
    does NOT — casting unit rows to a 16-bit float re-perturbs their norms
    by up to ~2*eps_dtype, an error the skipped division would bake into
    every distance (the extended fuzzer caught a bf16 self-match at 2.2e-3
    instead of 0), so 16-bit dtypes fall back to plain cosine, whose
    divide cancels the cast error exactly (self-match back to 0.0)."""
    import jax

    import sqlite_vector_tpu as svt

    data = rng.standard_normal((600, 32)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    q = data[11]

    f16 = svt.Dataset.from_arrays(
        "nf16", data.astype(np.float16),
        options="dimension=32,type=FLOAT16,distance=COSINE,normalized=1",
    )
    ids, dist = f16.search(q, 5)
    assert ids[0] == f16.ids[11] and dist[0] == 0.0

    host = svt.Dataset(
        "nhost",
        svt.parse_options("dimension=32,type=FLOAT32,distance=COSINE,normalized=1"),
        storage="host",
    )
    hids = host.add(data)
    ids, dist = host.search(q, 5)
    assert ids[0] == hids[11] and dist[0] == 0.0
    plain = svt.Dataset.from_arrays(
        "nplain", data.copy(), options="dimension=32,type=FLOAT32,distance=COSINE"
    )
    np.testing.assert_array_equal(ids, plain.search(q, 5)[0])

    mesh = svt.make_mesh()
    m = svt.Dataset(
        "nmesh",
        svt.parse_options("dimension=32,type=FLOAT32,distance=COSINE,normalized=1"),
        mesh=mesh,
    )
    mids = m.add(data)
    ids, dist = m.search(q, 5)
    assert ids[0] == mids[11] and dist[0] == 0.0
    np.testing.assert_allclose(
        dist, plain.search(q, 5)[1], rtol=1e-4, atol=1e-5
    )


def test_normalized_cosine_nonfinite_falls_back_to_plain(rng):
    """Round-3 review findings: an Inf base row must stay EXCLUDED (plain
    cosine yields NaN -> +inf) — not clip to a bogus 0.0 top hit on the
    dot fast path; a NaN query must return an empty result, not k rows at
    1.0. Both cases gate the fast path off."""
    import sqlite_vector_tpu as svt

    data = rng.standard_normal((60, 16)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    data[17, 3] = np.inf
    plain = svt.Dataset.from_arrays(
        "pinf", data.copy(), options="dimension=16,type=FLOAT32,distance=COSINE"
    )
    fast = svt.Dataset.from_arrays(
        "finf", data.copy(),
        options="dimension=16,type=FLOAT32,distance=COSINE,normalized=1",
    )
    ip, dp = plain.search(data[0], 10)
    iff, df = fast.search(data[0], 10)
    np.testing.assert_array_equal(ip, iff)
    np.testing.assert_allclose(dp, df, rtol=1e-5)
    assert fast.ids[17] not in iff  # the Inf row is excluded, not first
    # NaN query: both paths return empty (NaN distances are never selected)
    nanq = data[0].copy()
    nanq[5] = np.nan
    assert len(plain.search(nanq, 5)[0]) == 0
    assert len(fast.search(nanq, 5)[0]) == 0
    # a FINITE dataset with a finite query still rides the fast path
    clean = svt.Dataset.from_arrays(
        "fclean", np.delete(data, 17, axis=0),
        options="dimension=16,type=FLOAT32,distance=COSINE,normalized=1",
    )
    assert clean._cosine_dot_fast(None, data[:1]) is True
    assert fast._cosine_dot_fast(None, data[:1]) is False  # sticky flag


def test_approx_scan_topk_row_tiled(rng, monkeypatch):
    """mode='approx' must row-tile like scan_topk: the [B, N] f32
    intermediate previously materialized unbounded, OOMing on exactly the
    large-N workloads the throughput mode targets. (On the CPU backend
    approx_min_k falls back to exact selection, so the tiled result equals
    the exact scan.)"""
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops import scan

    q = rng.standard_normal((2, 8)).astype(np.float32)
    base = rng.standard_normal((9000, 8)).astype(np.float32)
    want_v, want_i = scan.scan_topk(
        jnp.asarray(q), jnp.asarray(base), DistanceMetric.L2, 5
    )
    # force by_budget == 8192 < n == 9000 -> two tiles (ragged tail)
    monkeypatch.setattr(scan, "INTERMEDIATE_BUDGET", 65536)
    tiled_calls = []
    real_num_tiles = scan._num_tiles
    monkeypatch.setattr(
        scan,
        "_num_tiles",
        lambda n, t: tiled_calls.append((n, t)) or real_num_tiles(n, t),
    )
    got_v, got_i = scan.approx_scan_topk(
        jnp.asarray(q), jnp.asarray(base), DistanceMetric.L2, 5
    )
    assert tiled_calls, "approx did not take the row-tiled branch"
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-6
    )
    # masked + short-count variants through the tiled path
    mask = np.ones(9000, bool)
    mask[int(want_i[0, 0])] = False
    got_v2, got_i2 = scan.approx_scan_topk(
        jnp.asarray(q), jnp.asarray(base), DistanceMetric.L2, 5,
        row_mask=jnp.asarray(mask),
    )
    assert int(got_i2[0, 0]) != int(want_i[0, 0])
