"""Host→HBM streaming scan tests (the >HBM-dataset path)."""

import numpy as np
import pytest

import sqlite_vector_tpu as svt
from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.ops.streaming import (
    streaming_scan_distances,
    streaming_scan_topk,
)
from sqlite_vector_tpu.types import DistanceMetric, VectorType


def _oracle_topk(base, queries, metric, k):
    d = oracle.distance(queries, base, metric, VectorType.F32)
    idx = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=-1)


@pytest.mark.parametrize("metric", [DistanceMetric.L2, DistanceMetric.DOT])
def test_streaming_topk_matches_oracle(metric, rng):
    n, dim, b, k = 3000, 48, 3, 12
    base = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    vals, idx = streaming_scan_topk(q, base, metric, k, tile_rows=700)
    oidx, ovals = _oracle_topk(base, q, metric, k)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=2e-4, atol=2e-4)


def test_streaming_k_exceeds_tile(rng):
    # k larger than a single tile's rows: per-tile candidates are capped at
    # tile_rows and the merge must still assemble the global top-k
    n, dim, k = 1000, 16, 300
    base = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((1, dim)).astype(np.float32)
    vals, idx = streaming_scan_topk(q, base, DistanceMetric.L2, k, tile_rows=128)
    oidx, ovals = _oracle_topk(base, q, DistanceMetric.L2, k)
    np.testing.assert_array_equal(np.asarray(idx)[0], oidx[0])


def test_streaming_topk_mask_shorter_than_count(rng):
    # Concurrent-add skew: the lock-free mask snapshot can be SHORTER than
    # the valid_count read later (Dataset.search builds the mask, then the
    # host-storage path re-reads self._count). Rows past the captured mask
    # must be excluded for this query — not raise a broadcast ValueError
    # (round-2 ADVICE finding).
    n, dim, k = 1000, 16, 10
    base = rng.standard_normal((n, dim)).astype(np.float32)
    q = base[:1].copy()
    stale = 700  # mask captured before 300 rows were appended
    mask = np.ones((stale,), bool)
    mask[0] = False  # also exclude the query row itself
    vals, idx = streaming_scan_topk(
        q, base, DistanceMetric.L2, k, valid_count=n, row_mask=mask,
        tile_rows=256,
    )
    oidx, _ = _oracle_topk(base[1:stale], q, DistanceMetric.L2, k)
    np.testing.assert_array_equal(np.asarray(idx)[0], oidx[0] + 1)


def test_streaming_distances(rng):
    n, dim = 2500, 32
    base = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((2, dim)).astype(np.float32)
    d = streaming_scan_distances(q, base, DistanceMetric.SQUARED_L2, tile_rows=600)
    ref = oracle.distance(q, base, DistanceMetric.SQUARED_L2, VectorType.F32)
    np.testing.assert_allclose(d, ref, rtol=2e-4, atol=2e-4)


def test_host_storage_dataset(rng):
    ds = svt.Dataset(
        "big",
        svt.parse_options("dimension=64,type=FLOAT32,distance=L2"),
        storage="host",
    )
    base = rng.standard_normal((5000, 64)).astype(np.float32)
    ids = ds.add(base)
    assert ds._vectors is None  # nothing pinned in device memory
    got, dist = ds.search(base[777], 5)
    assert got[0] == ids[777] and dist[0] == 0.0
    q = rng.standard_normal((2, 64)).astype(np.float32)
    got_ids, _ = ds.search(q, 10)
    oidx, _ = _oracle_topk(base, q, DistanceMetric.L2, 10)
    np.testing.assert_array_equal(got_ids, ids[oidx])
    # quantized path streams host-resident codes
    assert ds.quantize() == 5000
    aids, avals = ds.search(base[777], 5, exact=False)
    assert aids[0] == ids[777]


def test_host_storage_quantized_codes_stay_host(rng):
    import jax.numpy as jnp

    ds = svt.Dataset(
        "hostq", svt.parse_options("dimension=16,type=FLOAT32"), storage="host"
    )
    ds.add(rng.standard_normal((100, 16)).astype(np.float32))
    ds.quantize()
    assert not isinstance(ds._quant.codes, jnp.ndarray)


def test_host_preload_pins_codes_in_hbm(rng):
    import jax.numpy as jnp

    ds = svt.Dataset(
        "pre", svt.parse_options("dimension=16,type=FLOAT32"), storage="host"
    )
    base = rng.standard_normal((500, 16)).astype(np.float32)
    ids = ds.add(base)
    ds.quantize()
    assert not isinstance(ds._quant.codes, jnp.ndarray)
    before, _ = ds.search(base[9], 3, exact=False)
    ds.preload()  # the reference's vector_quantize_preload
    assert isinstance(ds._quant.codes, jnp.ndarray)
    after, _ = ds.search(base[9], 3, exact=False)
    np.testing.assert_array_equal(before, after)
    assert after[0] == ids[9]


def test_host_storage_ids_filter(rng):
    ds = svt.Dataset(
        "hf", svt.parse_options("dimension=16,type=FLOAT32"), storage="host"
    )
    base = rng.standard_normal((3000, 16)).astype(np.float32)
    ids = ds.add(base)
    q = base[100]
    got, dist = ds.search(q, 3, ids_filter=ids[ids != ids[100]])
    assert ids[100] not in got and dist[0] > 0


def test_mesh_host_streaming_composition(rng):
    """storage='host' + mesh: each streamed tile is row-sharded across the
    virtual 8-device mesh and merged over ICI; results match the oracle
    (BASELINE.md config 5 composition)."""
    import numpy as np
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu import oracle
    from sqlite_vector_tpu.ops.streaming import streaming_scan_topk
    from sqlite_vector_tpu.parallel import make_mesh
    from sqlite_vector_tpu.types import DistanceMetric, VectorType

    mesh = make_mesh(8)
    base = rng.standard_normal((3000, 24)).astype(np.float32)
    q = rng.standard_normal((2, 24)).astype(np.float32)

    # multi-tile streaming with sharded tiles (tile_rows rounds to 8 | 1024)
    vals, idx = streaming_scan_topk(
        q, base, DistanceMetric.L2, 7, tile_rows=1000, mesh=mesh
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    d = oracle.distance(q, base, DistanceMetric.L2, VectorType.F32)
    for bi in range(2):
        order = np.argsort(d[bi], kind="stable")[:7]
        np.testing.assert_array_equal(idx[bi], order)
        np.testing.assert_allclose(vals[bi], d[bi][order], rtol=1e-4, atol=1e-5)

    # Dataset-level: host storage + mesh (single-tile path, still sharded)
    ds = svt.Dataset(
        "mh",
        svt.parse_options("dimension=24,type=FLOAT32"),
        mesh=mesh,
        storage="host",
    )
    ids = ds.add(base)
    got, dist = ds.search(base[123], 3)
    assert got[0] == ids[123] and dist[0] == 0.0
    # quantized host streaming over the mesh
    ds.quantize()
    qgot, _ = ds.search(base[123], 3, exact=False)
    assert qgot[0] == ids[123]


def test_mesh_host_streaming_distances(rng):
    """distances() on a host+mesh dataset shards each tile across the mesh."""
    import numpy as np
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu import oracle
    from sqlite_vector_tpu.ops.streaming import streaming_scan_distances
    from sqlite_vector_tpu.parallel import make_mesh
    from sqlite_vector_tpu.types import DistanceMetric, VectorType

    mesh = make_mesh(8)
    base = rng.standard_normal((2100, 12)).astype(np.float32)  # not /8
    q = rng.standard_normal((2, 12)).astype(np.float32)
    d = streaming_scan_distances(
        q, base, DistanceMetric.COSINE, tile_rows=1000, mesh=mesh
    )
    ref = oracle.distance(q, base, DistanceMetric.COSINE, VectorType.F32)
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-5)

    ds = svt.Dataset.from_arrays(
        "md", base, options="distance=COSINE", storage="host", mesh=mesh
    )
    d2 = ds.distances(q)
    np.testing.assert_allclose(d2, ref, rtol=1e-4, atol=1e-5)
