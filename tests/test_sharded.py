"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

Exercises the distributed serving path the reference lacks entirely
(SURVEY.md §2 parallelism block): row-sharded HBM layout, per-chip partial
top-k, and the ICI all-gather candidate merge — without TPU hardware, via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (set in conftest.py).
"""

import jax
import numpy as np
import pytest

import sqlite_vector_tpu as svt
from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.parallel import (
    make_mesh,
    row_sharding,
    sharded_scan_distances,
    sharded_scan_topk,
)
from sqlite_vector_tpu.types import DistanceMetric, VectorType

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)

METRICS = list(DistanceMetric)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _oracle_topk(base, queries, metric, k):
    d = oracle.distance(queries, base, metric, VectorType.F32)
    idx = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=-1)


@pytest.mark.parametrize("metric", METRICS)
def test_sharded_topk_matches_oracle(mesh, metric, rng):
    n, dim, b, k = 512, 64, 4, 10
    base = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((b, dim)).astype(np.float32)
    based = jax.device_put(base, row_sharding(mesh))
    vals, idx = sharded_scan_topk(jax.device_put(queries), based, metric, k, mesh)
    oidx, ovals = _oracle_topk(base, queries, metric, k)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=2e-4, atol=2e-4)


def test_sharded_valid_count_masks_padding(mesh, rng):
    # valid_count cuts across shard boundaries: only the first 100 of 512
    # padded rows are real (the rest are zeros that would otherwise win L2).
    n, dim = 512, 32
    base = np.zeros((n, dim), np.float32)
    real = 100
    base[:real] = rng.standard_normal((real, dim)).astype(np.float32) + 5.0
    q = np.zeros((1, dim), np.float32)  # zeros are closest to padding rows
    based = jax.device_put(base, row_sharding(mesh))
    vals, idx = sharded_scan_topk(
        jax.device_put(q), based, DistanceMetric.L2, 10, mesh, valid_count=real
    )
    idx = np.asarray(idx)
    assert (idx[0] >= 0).all() and (idx[0] < real).all()


def test_sharded_k_larger_than_valid(mesh, rng):
    n, dim, real, k = 512, 16, 5, 20
    base = np.zeros((n, dim), np.float32)
    base[:real] = rng.standard_normal((real, dim)).astype(np.float32)
    q = rng.standard_normal((1, dim)).astype(np.float32)
    based = jax.device_put(base, row_sharding(mesh))
    vals, idx = sharded_scan_topk(
        jax.device_put(q), based, DistanceMetric.L2, k, mesh, valid_count=real
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert (idx[0, :real] >= 0).all()
    assert (idx[0, real:] == -1).all()
    assert np.isinf(vals[0, real:]).all()


def test_sharded_distances_matches_single_chip(mesh, rng):
    n, dim, b = 256, 48, 3
    base = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((b, dim)).astype(np.float32)
    based = jax.device_put(base, row_sharding(mesh))
    d = np.asarray(
        sharded_scan_distances(
            jax.device_put(queries), based, DistanceMetric.SQUARED_L2, mesh
        )
    )
    ref = oracle.distance(queries, base, DistanceMetric.SQUARED_L2, VectorType.F32)
    np.testing.assert_allclose(d, ref, rtol=2e-4, atol=2e-4)


def test_dataset_with_mesh_end_to_end(mesh, rng):
    store = svt.VectorStore(mesh=mesh)
    ds = store.create("docs", "dimension=96,type=FLOAT32,distance=L2")
    base = rng.standard_normal((3000, 96)).astype(np.float32)
    ids = ds.add(base)

    # exact search: self-match at distance 0
    got, dist = ds.search(base[1234], 5)
    assert got[0] == ids[1234]
    assert dist[0] == 0.0

    # neighbor-set parity with the numpy oracle
    q = rng.standard_normal((2, 96)).astype(np.float32)
    got_ids, got_d = ds.search(q, 10)
    oidx, _ = _oracle_topk(base, q, DistanceMetric.L2, 10)
    np.testing.assert_array_equal(got_ids, ids[oidx])

    # quantized path over the mesh
    assert ds.quantize() == 3000
    qt, scale, offset = ds.quant_params
    ref_qt, ref_scale, ref_offset = oracle.compute_quant_params(
        base, svt.QuantType.AUTO
    )
    assert qt is ref_qt
    np.testing.assert_allclose(scale, ref_scale, rtol=1e-6)
    aids, _ = ds.search(base[1234], 5, exact=False)
    assert aids[0] == ids[1234]

    # streaming distances over the mesh
    d = ds.distances(q)
    assert d.shape == (2, 3000)

    # append after quantize marks codes stale but keeps serving
    ds.add(rng.standard_normal((10, 96)).astype(np.float32))
    assert ds.quant_stale
    got2, _ = ds.search(base[1234], 5)
    assert got2[0] == ids[1234]


def test_mesh_capacity_is_shard_multiple(mesh, rng):
    ds = svt.Dataset(
        "pad", svt.parse_options("dimension=8,type=FLOAT32"), mesh=mesh
    )
    ds.add(rng.standard_normal((1, 8)).astype(np.float32))
    nshards = int(np.prod(list(mesh.shape.values())))
    assert ds._vectors.shape[0] % nshards == 0


def test_sharded_ids_filter(mesh, rng):
    store = svt.VectorStore(mesh=mesh)
    ds = store.create("filt", "dimension=32,type=FLOAT32,distance=L2")
    base = rng.standard_normal((600, 32)).astype(np.float32)
    ids = ds.add(base)
    q = base[50]
    got, _ = ds.search(q, 3)
    assert got[0] == ids[50]
    got, dist = ds.search(q, 3, ids_filter=ids[ids != ids[50]])
    assert ids[50] not in got and dist[0] > 0


def test_sqlite_surface_on_mesh(mesh, tmp_path, rng):
    """The SQLite compat layer serving from a sharded mesh dataset."""
    import sqlite_vector_tpu.sqlite as svs

    data = rng.standard_normal((400, 32)).astype(np.float32)
    c = svs.connect(str(tmp_path / "mesh.db"), mesh=mesh)
    c.execute("CREATE TABLE t (v BLOB)")
    c.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    c.commit()
    c.vector_init("t", "v", "type=FLOAT32,dimension=32,distance=L2")
    rows = c.vector_full_scan("t", "v", data[9].tobytes(), 3)
    assert rows[0][0] == 10 and rows[0][1] == 0.0
    c.vector_quantize("t", "v")
    qrows = c.vector_quantize_scan("t", "v", data[9].tobytes(), 3)
    assert qrows[0][0] == 10
    c.close()


# ---------------------------------------------------------------------------
# 2-D mesh: rows x dim
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh2d():
    from sqlite_vector_tpu.parallel import make_mesh_2d

    return make_mesh_2d(4, 2)


@pytest.mark.parametrize("metric", METRICS)
def test_sharded_2d_topk_matches_oracle(mesh2d, metric, rng):
    """(rows x dim) block sharding: distances from psum'd dim-slice partial
    components must match the oracle across all metrics."""
    from sqlite_vector_tpu.parallel import (
        block_sharding_2d,
        dim_sharding_2d,
        sharded_scan_topk_2d,
    )

    n, d, b, k = 4 * 50, 64, 3, 7
    base_h = rng.standard_normal((n, d)).astype(np.float32)
    q_h = rng.standard_normal((b, d)).astype(np.float32)
    base = jax.device_put(base_h, block_sharding_2d(mesh2d))
    q = jax.device_put(q_h, dim_sharding_2d(mesh2d))
    vals, idx = jax.device_get(
        sharded_scan_topk_2d(q, base, metric, k, mesh2d)
    )
    want_idx, want_d = _oracle_topk(base_h, q_h, metric, k)
    for bi in range(b):
        assert idx[bi].tolist() == want_idx[bi].tolist(), (metric, bi)
        np.testing.assert_allclose(
            vals[bi], oracle.snap_zero(want_d[bi]), rtol=5e-4, atol=1e-5
        )


def test_sharded_2d_int_codes_exact(mesh2d, rng):
    """Quantized codes on a 2-D mesh: int32 partial sums stay exact under
    psum (bit-equal distances to the single-chip integer path)."""
    from sqlite_vector_tpu.parallel import (
        block_sharding_2d,
        dim_sharding_2d,
        sharded_scan_topk_2d,
    )
    from sqlite_vector_tpu.types import VectorType

    n, d, k = 4 * 32, 32, 5
    codes_h = rng.integers(-128, 128, (n, d)).astype(np.int8)
    q_h = rng.integers(-128, 128, (2, d)).astype(np.int8)
    codes = jax.device_put(codes_h, block_sharding_2d(mesh2d))
    q = jax.device_put(q_h, dim_sharding_2d(mesh2d))
    vals, idx = jax.device_get(
        sharded_scan_topk_2d(q, codes, DistanceMetric.SQUARED_L2, k, mesh2d)
    )
    ref = oracle.distance(q_h, codes_h, DistanceMetric.SQUARED_L2, VectorType.I8)
    for bi in range(2):
        order = np.argsort(ref[bi], kind="stable")[:k]
        assert idx[bi].tolist() == order.tolist()
        np.testing.assert_array_equal(vals[bi], ref[bi][order])


def test_sharded_2d_valid_count_and_padding(mesh2d, rng):
    """Padding rows (beyond valid_count) and zero feature padding must not
    affect results; k > valid trims with -1/inf."""
    from sqlite_vector_tpu.parallel import (
        block_sharding_2d,
        dim_sharding_2d,
        sharded_scan_topk_2d,
    )

    n, d, valid = 4 * 16, 32, 10
    base_h = np.zeros((n, d), np.float32)
    base_h[:valid] = rng.standard_normal((valid, d))
    base_h[valid:] = 7.7  # padding rows, must be masked
    # zero-pad two feature columns (distance-neutral)
    base_h[:, d - 2 :] = 0.0
    q_h = rng.standard_normal((1, d)).astype(np.float32)
    q_h[:, d - 2 :] = 0.0
    base = jax.device_put(base_h, block_sharding_2d(mesh2d))
    q = jax.device_put(q_h, dim_sharding_2d(mesh2d))
    vals, idx = jax.device_get(
        sharded_scan_topk_2d(
            q, base, DistanceMetric.L2, 15, mesh2d, valid_count=valid
        )
    )
    assert (idx[0][:valid] >= 0).all() and (idx[0][:valid] < valid).all()
    assert (idx[0][valid:] == -1).all()
    assert np.isposinf(vals[0][valid:]).all()


def test_sharded_2d_rejects_uneven_blocks(mesh2d, rng):
    from sqlite_vector_tpu.parallel import sharded_scan_topk_2d

    base = np.zeros((101, 64), np.float32)
    q = np.zeros((1, 64), np.float32)
    with pytest.raises(ValueError, match="divide evenly"):
        sharded_scan_topk_2d(q, base, DistanceMetric.L2, 3, mesh2d)


def test_dataset_on_2d_mesh_end_to_end(mesh2d, rng):
    """A Dataset constructed with a 2-D mesh: add / exact search / quantize /
    quantized search / rerank / distances / filters, all value-checked.
    Uses a dim that does NOT divide the dim axis (exercises zero padding)."""
    from sqlite_vector_tpu.types import VectorOptions

    d = 33  # not a multiple of the dim-axis size (2)
    ds = svt.Dataset(
        "d2", VectorOptions(dimension=d, distance=DistanceMetric.L2), mesh=mesh2d
    )
    base = (rng.standard_normal((500, d)) * 2).astype(np.float32)
    ids = ds.add(base)
    assert ds._vectors.shape[1] == 34  # padded to the dim-axis multiple

    q = base[123]
    got, dist = ds.search(q, 5)
    assert got[0] == ids[123] and dist[0] == 0.0
    ref = oracle.distance(q[None], base, DistanceMetric.L2, VectorType.F32)[0]
    order = np.argsort(ref, kind="stable")[:5]
    assert got.tolist() == [int(ids[i]) for i in order]
    np.testing.assert_allclose(dist, oracle.snap_zero(ref[order]), rtol=1e-4, atol=1e-6)

    # batched
    got_b, dist_b = ds.search(base[:7], 3)
    assert got_b.shape == (7, 3) and (got_b[:, 0] == ids[:7]).all()

    # quantize: params must match the oracle bit-for-bit despite padding
    n = ds.quantize()
    assert n == 500
    qt, scale, offset = ds.quant_params
    oqt, oscale, ooffset = oracle.compute_quant_params(
        base, svt.QuantType.AUTO
    )
    assert (qt, np.float32(scale), np.float32(offset)) == (oqt, oscale, ooffset)
    # padded code columns stay zero (quantized zero-padding invariant)
    codes_h = np.asarray(ds._quant.codes)
    assert (codes_h[:, d:] == 0).all()

    a_ids, a_vals = ds.search(q, 5, exact=False)
    qcodes = oracle.quantize(base, oscale, ooffset, oqt)
    qq = oracle.quantize(q[None].astype(np.float32), oscale, ooffset, oqt)
    qref = oracle.distance(
        qq, qcodes, DistanceMetric.L2,
        VectorType.I8 if oqt is svt.QuantType.I8 else VectorType.U8,
    )[0]
    qorder = np.argsort(qref, kind="stable")[:5]
    assert a_ids.tolist() == [int(ids[i]) for i in qorder]
    np.testing.assert_allclose(a_vals, qref[qorder], rtol=1e-5)

    # rerank (staged path on meshes): exact-quality results
    r_ids, r_vals = ds.search(q, 5, mode="rerank")
    assert r_ids[0] == ids[123] and r_vals[0] == 0.0

    # streaming distances
    dmat = ds.distances(base[:3])
    np.testing.assert_allclose(
        dmat,
        oracle.snap_zero(
            oracle.distance(base[:3], base, DistanceMetric.L2, VectorType.F32)
        ),
        rtol=1e-4, atol=1e-6,
    )
    qd = ds.distances(q, exact=False)
    np.testing.assert_allclose(qd, qref, rtol=1e-5)

    # ids_filter masks through the 2-D path
    flt = ids[100:110]
    f_ids, _ = ds.search(q, 3, ids_filter=flt)
    assert set(f_ids.tolist()) <= set(int(i) for i in flt)

    # appends keep working (full re-upload path on meshes)
    extra = np.full((1, d), 0.25, np.float32)
    new_ids = ds.add(extra)
    g2, d2 = ds.search(extra[0], 1)
    assert g2[0] == new_ids[0] and d2[0] == 0.0


def test_dataset_2d_mesh_tombstone_remove(mesh2d, rng):
    """Lazy remove on a 2-D (rows x dim) mesh: the tombstone mask shards
    over the rows axis (mask_sharding) and the device matrix is untouched
    below the compaction threshold."""
    from sqlite_vector_tpu.types import VectorOptions

    d = 33
    ds = svt.Dataset(
        "d2rm", VectorOptions(dimension=d, distance=DistanceMetric.L2),
        mesh=mesh2d,
    )
    base = rng.standard_normal((200, d)).astype(np.float32)
    ids = ds.add(base)
    dev_before = ds._vectors
    assert ds.remove(ids[10:20]) == 10
    assert ds._vectors is dev_before and len(ds) == 190
    got, dist = ds.search(base[15], 1)
    assert got[0] != ids[15]
    got, dist = ds.search(base[30], 1)
    assert got[0] == ids[30] and dist[0] == 0.0
    # oracle value-check of the masked scan
    keep = np.ones(200, bool)
    keep[10:20] = False
    ref = oracle.distance(
        base[40][None], base[keep], DistanceMetric.L2, VectorType.F32
    )[0]
    got, dist = ds.search(base[40], 5)
    np.testing.assert_allclose(
        dist, oracle.snap_zero(np.sort(ref)[:5]), rtol=1e-4, atol=1e-6
    )


def test_dataset_2d_mesh_quantized_save_load_roundtrip(mesh2d, rng, tmp_path):
    """Quantized saves from a 2-D mesh must slice off the dim padding —
    otherwise qcodes.npy has the padded width and load() cannot broadcast
    it back (regression)."""
    from sqlite_vector_tpu.types import VectorOptions

    d = 33  # pads to 34 on the 2-wide dim axis
    ds = svt.Dataset(
        "d2q", VectorOptions(dimension=d, distance=DistanceMetric.L2),
        mesh=mesh2d,
    )
    base = rng.standard_normal((100, d)).astype(np.float32)
    ids = ds.add(base)
    ds.quantize()
    ds.save(str(tmp_path / "q2d"))
    back = svt.Dataset.load(str(tmp_path / "q2d"))  # single-chip reload
    assert back.is_quantized and len(back) == 100
    got, _ = back.search(base[7], 3, mode="quantized")
    assert got[0] == ids[7]
    # and reload back onto the 2-D mesh
    back2d = svt.Dataset.load(str(tmp_path / "q2d"), mesh=mesh2d)
    got, _ = back2d.search(base[7], 3, mode="quantized")
    assert got[0] == ids[7]


def test_dataset_2d_mesh_rejects_host_storage(mesh2d):
    from sqlite_vector_tpu.errors import VectorConfigError
    from sqlite_vector_tpu.types import VectorOptions

    with pytest.raises(VectorConfigError, match="2-D mesh"):
        svt.Dataset(
            "h2", VectorOptions(dimension=8), mesh=mesh2d, storage="host"
        )


@pytest.mark.nonfinite_inputs
@pytest.mark.parametrize("metric", METRICS)
def test_dataset_2d_mesh_nonfinite_policy_matches_unsharded(
    mesh2d, metric, rng
):
    """f16 lane-skip policies on the 2-D mesh: every policy is
    dim-separable (policy_pairwise_sharded), so an f16 dataset with NaN/Inf
    content must return the same neighbors as the single-chip policy path."""
    from sqlite_vector_tpu.types import VectorOptions, VectorType as VT

    d, n, k = 24, 64, 8
    base = rng.standard_normal((n, d)).astype(np.float16)
    base[3, 2] = np.nan          # lane-skipped
    base[5, 20] = np.inf         # unmatched Inf (second dim shard)
    base[9, 1] = -np.inf         # unmatched Inf (first dim shard)
    base[11, 0] = np.nan
    base[11, 15] = np.inf        # NaN + Inf in one row, across shards
    opts = VectorOptions(dimension=d, type=VT.F16, distance=metric)
    ds1 = svt.Dataset(f"nf1_{metric.name}", opts)
    ds2 = svt.Dataset(f"nf2_{metric.name}", opts, mesh=mesh2d)
    ds1.add(base)
    ds2.add(base)
    queries = [
        base[0].astype(np.float32),
        np.full(d, 0.5, np.float32),
    ]
    q_nan = base[1].astype(np.float32)
    q_nan[7] = np.nan            # non-finite QUERY triggers the policy too
    queries.append(q_nan)
    for q in queries:
        ids1, d1 = ds1.search(q, k)
        ids2, d2 = ds2.search(q, k)
        assert ids1.tolist() == ids2.tolist(), metric
        np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-6)


@pytest.mark.nonfinite_inputs
def test_sharded_2d_policy_dot_first_inf_across_shards(mesh2d, rng):
    """DOT's short-circuit takes the sign of the FIRST infinite product in
    lane order (src/distance-cpu.c:414-421). On a dim-sharded mesh 'first'
    means the smallest GLOBAL lane index — build rows whose first infinite
    product lives in different shards (and with conflicting signs across
    shards) and check the sharded kernel against the single-chip policy."""
    from sqlite_vector_tpu.ops.nonfinite import policy_pairwise
    from sqlite_vector_tpu.parallel import (
        block_sharding_2d,
        dim_sharding_2d,
        sharded_scan_distances_2d,
    )

    n, d = 8, 64  # dim axis = 2 -> lanes [0,32) and [32,64)
    base = (rng.standard_normal((n, d)) * 0.1).astype(np.float32)
    q = np.abs(rng.standard_normal((1, d))).astype(np.float32) + 0.5
    base[0, 40] = np.inf    # only shard 1: +inf product -> -inf distance
    base[1, 10] = -np.inf   # shard 0 first (-) beats shard 1 (+)
    base[1, 50] = np.inf
    base[2, 33] = np.inf    # shard 1 first (+) beats nothing in shard 0
    base[2, 5] = np.nan     # NaN lane in shard 0 is skipped, not first-inf
    want = np.asarray(
        policy_pairwise(
            jax.numpy.asarray(q), jax.numpy.asarray(base),
            DistanceMetric.DOT, VectorType.F16,
        )
    )
    got = np.asarray(
        sharded_scan_distances_2d(
            jax.device_put(q, dim_sharding_2d(mesh2d)),
            jax.device_put(base, block_sharding_2d(mesh2d)),
            DistanceMetric.DOT,
            mesh2d,
            policy_vtype=VectorType.F16,
        )
    )
    assert np.isneginf(want[0, 0]) and np.isposinf(want[0, 1])
    assert np.isneginf(want[0, 2])
    finite = np.isfinite(want)
    np.testing.assert_array_equal(np.isfinite(got), finite)
    np.testing.assert_array_equal(got[~finite], want[~finite])
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-5)


@pytest.mark.nonfinite_inputs
def test_dataset_2d_mesh_f32_inf_raw_distances(mesh2d, rng):
    """f32 L2 streamed distances on the 2-D mesh must expose the
    reference's RAW values for Inf rows (+Inf, not the matmul
    decomposition's NaN) — the needs_raw_policy path composing over dim
    shards (plain math: partial sums psum exactly)."""
    from sqlite_vector_tpu.types import VectorOptions

    d, n = 16, 32
    base = rng.standard_normal((n, d)).astype(np.float32)
    base[4, 3] = np.inf
    base[7, 12] = np.nan
    ds = svt.Dataset(
        "raw2d", VectorOptions(dimension=d, distance=DistanceMetric.L2),
        mesh=mesh2d,
    )
    ds.add(base)
    q = rng.standard_normal(d).astype(np.float32)
    got = ds.distances(q)
    want = oracle.distance(
        q[None, :], base, DistanceMetric.L2, VectorType.F32
    )[0]
    assert np.isposinf(got[4]) and np.isnan(got[7])
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], rtol=2e-4, atol=2e-4)


def test_dataset_2d_mesh_custom_axis_names(rng):
    """make_mesh_2d's axis_names parameter must thread through the Dataset
    routing (scan calls previously hard-coded 'rows'/'dim')."""
    from sqlite_vector_tpu.parallel import make_mesh_2d
    from sqlite_vector_tpu.types import VectorOptions

    mesh = make_mesh_2d(4, 2, axis_names=("r", "d"))
    ds = svt.Dataset(
        "ax", VectorOptions(dimension=16, distance=DistanceMetric.L2), mesh=mesh
    )
    base = rng.standard_normal((200, 16)).astype(np.float32)
    ids = ds.add(base)
    got, dist = ds.search(base[42], 3)
    assert got[0] == ids[42] and dist[0] == 0.0
    ds.quantize()
    a, _ = ds.search(base[42], 3, exact=False)
    assert a[0] == ids[42]
    dm = ds.distances(base[7])
    assert dm.shape == (200,) and abs(dm[7]) < 1e-5


def test_sharded_2d_l1_snaps_nearly_zero(mesh2d, rng):
    """Float L1 on the 2-D mesh applies the same nearly-zero snap as every
    other path (self-distance must be exactly 0.0, not ~1e-8)."""
    from sqlite_vector_tpu.parallel import (
        block_sharding_2d,
        dim_sharding_2d,
        sharded_scan_topk_2d,
    )

    base_h = rng.standard_normal((4 * 16, 32)).astype(np.float32)
    q_h = base_h[5][None]
    base = jax.device_put(base_h, block_sharding_2d(mesh2d))
    q = jax.device_put(q_h, dim_sharding_2d(mesh2d))
    vals, idx = jax.device_get(
        sharded_scan_topk_2d(q, base, DistanceMetric.L1, 1, mesh2d)
    )
    assert idx[0][0] == 5 and vals[0][0] == 0.0


@pytest.mark.parametrize("metric", METRICS)
def test_sharded_2d_cached_norms_match_uncached(mesh2d, metric, rng):
    """base_sq_norms on the 2-D path (rows-sharded, dim-replicated full-dim
    norms) must give identical results to the per-scan norm computation —
    float and int8 (round-2 VERDICT item 4)."""
    from sqlite_vector_tpu.parallel import (
        block_sharding_2d,
        dim_sharding_2d,
        sharded_scan_topk_2d,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, d, b, k = 4 * 40, 64, 3, 9
    rows_axis = mesh2d.axis_names[0]
    rows_shard = NamedSharding(mesh2d, P(rows_axis))
    for dtype in (np.float32, np.int8):
        if dtype is np.float32:
            base_h = rng.standard_normal((n, d)).astype(np.float32)
            q_h = rng.standard_normal((b, d)).astype(np.float32)
            sq_h = np.sum(
                base_h.astype(np.float64) ** 2, axis=-1
            ).astype(np.float32)
            # match the device computation exactly (f32 accumulation)
            sq_h = np.sum(base_h * base_h, axis=-1, dtype=np.float32)
        else:
            base_h = rng.integers(-128, 128, (n, d)).astype(np.int8)
            q_h = rng.integers(-128, 128, (b, d)).astype(np.int8)
            sq_h = np.sum(base_h.astype(np.int32) ** 2, axis=-1)
        base = jax.device_put(base_h, block_sharding_2d(mesh2d))
        q = jax.device_put(q_h, dim_sharding_2d(mesh2d))
        sq = jax.device_put(sq_h, rows_shard)
        v0, i0 = jax.device_get(sharded_scan_topk_2d(q, base, metric, k, mesh2d))
        v1, i1 = jax.device_get(
            sharded_scan_topk_2d(q, base, metric, k, mesh2d, base_sq_norms=sq)
        )
        np.testing.assert_array_equal(i0, i1)
        if dtype is np.int8 or metric in (DistanceMetric.DOT, DistanceMetric.L1):
            np.testing.assert_array_equal(v0, v1)  # exact paths stay exact
        else:
            np.testing.assert_allclose(v0, v1, rtol=2e-5, atol=1e-6)


def test_dataset_2d_mesh_norm_cache_reuse(mesh2d, rng):
    """Dataset on a 2-D mesh caches exact and quantized base norms across
    queries (was: an extra O(N*d/c) HBM pass per L2/COSINE scan)."""
    from sqlite_vector_tpu.types import VectorOptions

    d = 32
    ds = svt.Dataset(
        "dnc",
        VectorOptions(dimension=d, distance=DistanceMetric.COSINE),
        mesh=mesh2d,
    )
    base = rng.standard_normal((400, d)).astype(np.float32)
    ids = ds.add(base)
    got1, _ = ds.search(base[7], 5)
    assert ds._sq_norms is not None and ds._sq_norms[0] is ds._vectors
    cached = ds._sq_norms[1]
    got2, _ = ds.search(base[7], 5)
    assert ds._sq_norms[1] is cached  # reused, not recomputed
    assert got1[0] == ids[7] == got2[0]
    # quantized path: codes norms cached once too
    ds.quantize()
    a1, _ = ds.search(base[7], 5, exact=False)
    qsq = ds._quant.sq_norms
    assert qsq is not None
    a2, _ = ds.search(base[7], 5, exact=False)
    assert ds._quant.sq_norms is qsq
    assert a1[0] == ids[7] == a2[0]
    # mutation invalidates the exact cache (new matrix object)
    ds.add(rng.standard_normal((8, d)).astype(np.float32))
    got3, _ = ds.search(base[7], 5)
    assert got3[0] == ids[7]
    assert ds._sq_norms[0] is ds._vectors


@pytest.mark.parametrize("mesh_kind", ["1d", "2d"])
def test_mesh_append_amortized(rng, mesh_kind):
    """Appends on mesh-sharded datasets take the device-side slice-update
    path (new rows only cross the link), preserve the sharding layout, and
    stay value-correct — no full-matrix re-upload per add()."""
    if mesh_kind == "1d":
        mesh = make_mesh()
    else:
        from sqlite_vector_tpu.parallel import make_mesh_2d

        mesh = make_mesh_2d(4, 2)
    d = 16
    ds = svt.Dataset(
        "ma_" + mesh_kind,
        svt.parse_options(f"dimension={d},type=FLOAT32,distance=L2"),
        mesh=mesh,
    )
    base = rng.standard_normal((1000, d)).astype(np.float32)
    ids = ds.add(base)
    sharding_before = ds._vectors.sharding

    def boom(*a, **kw):  # capacity is unchanged: full upload must not run
        raise AssertionError("append took the full re-upload path")

    orig = ds._upload_rows_padded
    ds._upload_rows_padded = boom
    try:
        extra = rng.standard_normal((10, d)).astype(np.float32)
        extra_ids = ds.add(extra)
    finally:
        ds._upload_rows_padded = orig
    assert ds._vectors.sharding == sharding_before
    got, dist = ds.search(extra[3], 3)
    assert got[0] == extra_ids[3] and dist[0] == 0.0
    got2, _ = ds.search(base[123], 3)
    assert got2[0] == ids[123]
