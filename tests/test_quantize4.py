"""Packed int4 quantization + scan (ops/quantize4.py, beyond the reference).

The reference stops at 8-bit global-minmax quantization
(/root/reference/src/sqlite-vector.c:1258-1272); the 4-bit path is new
TPU-first capability, so the ground truth here is the module's own pinned
spec (quantize4_np) plus exact recomputation of the documented composition.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sqlite_vector_tpu.ops import quantize4 as q4
from sqlite_vector_tpu.types import DistanceMetric, QuantType

from tests.parity import expected_int4_distances as _expected_int4

METRICS = list(DistanceMetric)
MM = [m for m in METRICS if m is not DistanceMetric.L1] + [DistanceMetric.L1]


# ---------------------------------------------------------------------------
# pack / unpack / spec
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dim", [1, 2, 7, 8, 384, 385])
def test_pack_unpack_roundtrip(rng, dim):
    codes = rng.integers(-7, 8, size=(13, dim)).astype(np.int8)
    packed = q4.pack4_np(codes)
    assert packed.shape == (13, (dim + 1) // 2)
    assert packed.dtype == np.uint8
    out = q4.unpack4_np(packed, dim)
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("dim", [4, 9, 384])
def test_unpack_device_matches_numpy(rng, dim):
    codes = rng.integers(-7, 8, size=(11, dim)).astype(np.int8)
    packed = q4.pack4_np(codes)
    dev = np.asarray(q4.unpack4(jnp.asarray(packed), dim))
    np.testing.assert_array_equal(dev, codes)


def test_quantize4_spec_reconstruction_bound(rng):
    x = rng.standard_normal((64, 96)).astype(np.float32) * 3.0
    packed, alpha, csq = q4.quantize4_np(x)
    deq = q4.dequantize4_np(packed, alpha, 96)
    # per-element error <= alpha/2 (half a quantization step)
    err = np.abs(deq - x)
    assert np.all(err <= alpha[:, None] / 2 + 1e-6)
    # csq is the exact integer square-sum of the codes
    codes = q4.unpack4_np(packed, 96).astype(np.int64)
    np.testing.assert_array_equal(csq, (codes * codes).sum(1).astype(np.int32))


def test_quantize4_zero_row_and_scales(rng):
    x = np.zeros((3, 8), np.float32)
    x[1] = rng.standard_normal(8)
    packed, alpha, csq = q4.quantize4_np(x)
    assert alpha[0] == 0.0 and csq[0] == 0
    np.testing.assert_array_equal(q4.unpack4_np(packed, 8)[0], 0)
    # max |code| of a nonzero row is exactly 7 (symmetric absmax scaling)
    assert np.max(np.abs(q4.unpack4_np(packed, 8)[1])) == 7
    assert alpha[1] == np.float32(np.max(np.abs(x[1])) / np.float32(7.0))


@pytest.mark.nonfinite_inputs
def test_quantize4_nonfinite_spec():
    x = np.array(
        [
            [1.0, np.nan, -2.0, np.inf],
            [-np.inf, 0.5, np.nan, 0.25],
            [np.nan, np.inf, -np.inf, np.nan],  # no finite element
        ],
        np.float32,
    )
    packed, alpha, csq = q4.quantize4_np(x)
    codes = q4.unpack4_np(packed, 4)
    # row 0: scale from finite absmax 2.0; NaN -> 0, +Inf -> 7
    assert alpha[0] == np.float32(2.0 / 7.0)
    assert codes[0, 1] == 0 and codes[0, 3] == 7 and codes[0, 2] == -7
    # row 1: -Inf -> -7
    assert codes[1, 0] == -7
    # row 2: no finite values -> scale 0, all codes 0 (x * 0 is NaN -> 0)
    assert alpha[2] == 0.0
    np.testing.assert_array_equal(codes[2], 0)


@pytest.mark.parametrize("dim", [8, 17, 384])
def test_device_quantize_bit_parity_with_numpy(rng, dim):
    x = (rng.standard_normal((40, dim)) * rng.uniform(0.1, 9)).astype(
        np.float32
    )
    pk_np, al_np, csq_np = q4.quantize4_np(x)
    pk_d, al_d, csq_d = map(np.asarray, q4.quantize4_device(jnp.asarray(x)))
    np.testing.assert_array_equal(pk_d, pk_np)
    np.testing.assert_array_equal(al_d, al_np)
    np.testing.assert_array_equal(csq_d, csq_np)


# ---------------------------------------------------------------------------
# scan composition vs an exact numpy recomputation of the documented formula
# ---------------------------------------------------------------------------




@pytest.mark.parametrize("metric", MM)
def test_int4_scan_distances_match_formula(rng, metric):
    dim = 33
    x = rng.standard_normal((200, dim)).astype(np.float32)
    q = rng.standard_normal((5, dim)).astype(np.float32)
    packed, alpha, csq = q4.quantize4_np(x)
    got = np.asarray(
        q4.int4_scan_distances(
            jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
            jnp.asarray(csq), metric, dim=dim,
        )
    )
    want = _expected_int4(q, packed, alpha, csq, metric, dim)
    scale = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / scale) < 5e-5


@pytest.mark.parametrize("metric", MM)
@pytest.mark.parametrize("n", [50, 700])
def test_int4_scan_topk_matches_formula_ranking(rng, metric, n):
    dim = 24
    k = 10
    x = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((3, dim)).astype(np.float32)
    packed, alpha, csq = q4.quantize4_np(x)
    vals, idx = q4.int4_scan_topk(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), metric, k, dim=dim, row_tile=256,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    want = _expected_int4(q, packed, alpha, csq, metric, dim)
    for b in range(3):
        order = np.argsort(want[b], kind="stable")[:k]
        # value agreement (ranking may swap genuinely tied values)
        np.testing.assert_allclose(
            vals[b], np.sort(want[b])[:k].astype(np.float32),
            rtol=1e-4, atol=1e-5,
        )
        assert set(idx[b]) == set(order) or np.allclose(
            want[b][idx[b]], want[b][order], rtol=1e-4, atol=1e-5
        )


def test_int4_valid_count_and_mask(rng):
    dim = 16
    x = rng.standard_normal((40, dim)).astype(np.float32)
    q = x[:2]
    packed, alpha, csq = q4.quantize4_np(x)
    vals, idx = q4.int4_scan_topk(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), DistanceMetric.L2, 5, dim=dim, valid_count=10,
    )
    assert np.all(np.asarray(idx) < 10)
    mask = np.zeros(40, bool)
    mask[20:] = True
    vals, idx = q4.int4_scan_topk(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), DistanceMetric.L2, 5, dim=dim,
        row_mask=jnp.asarray(mask),
    )
    assert np.all(np.asarray(idx) >= 20)


def test_int4_k_exceeds_rows_trims(rng):
    dim = 8
    x = rng.standard_normal((3, dim)).astype(np.float32)
    packed, alpha, csq = q4.quantize4_np(x)
    vals, idx = q4.int4_scan_topk(
        jnp.asarray(x[:1]), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), DistanceMetric.L2, 7, dim=dim,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert np.all(np.isposinf(vals[0, 3:])) and np.all(idx[0, 3:] == -1)


def test_int4_recall_well_separated(rng):
    # clustered data: near-duplicates of each query planted; int4 must
    # retrieve them all (the realistic-embedding regime the 4-bit path
    # targets; iid-Gaussian bulk recall is covered by the rerank test)
    dim = 64
    n, k = 2000, 10
    base = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((4, dim)).astype(np.float32)
    truth = []
    for b in range(4):
        ids = rng.choice(n, k, replace=False)
        base[ids] = q[b] + 0.01 * rng.standard_normal((k, dim))
        truth.append(set(ids.tolist()))
    packed, alpha, csq = q4.quantize4_np(base)
    _, idx = q4.int4_scan_topk(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), DistanceMetric.L2, k, dim=dim,
    )
    idx = np.asarray(idx)
    for b in range(4):
        assert len(set(idx[b].tolist()) & truth[b]) == k


def test_int4_streaming_matches_resident(rng):
    dim = 19
    x = rng.standard_normal((1000, dim)).astype(np.float32)
    q = rng.standard_normal((2, dim)).astype(np.float32)
    packed, alpha, csq = q4.quantize4_np(x)
    rv, ri = q4.int4_scan_topk(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), DistanceMetric.SQUARED_L2, 7, dim=dim,
    )
    sv, si = q4.int4_streaming_scan_topk(
        q, packed, alpha, csq, DistanceMetric.SQUARED_L2, 7,
        dim=dim, tile_rows=128,
    )
    np.testing.assert_allclose(np.asarray(sv), np.asarray(rv), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))


# ---------------------------------------------------------------------------
# Pallas kernel (interpret mode on CPU) vs the XLA path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "metric",
    [
        DistanceMetric.L2,
        DistanceMetric.SQUARED_L2,
        DistanceMetric.COSINE,
        DistanceMetric.DOT,
    ],
)
@pytest.mark.parametrize("dim", [16, 384, 95])
def test_pallas_int4_matches_xla(rng, metric, dim, monkeypatch):
    from sqlite_vector_tpu.ops import pallas_int4

    monkeypatch.setenv("SVT_PALLAS_INT4_TILE_ROWS", "256")
    n, b, k = 700, 3, 9
    x = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    packed, alpha, csq = q4.quantize4_np(x)
    pv, pi = pallas_int4.pallas_int4_scan_topk(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), metric, k, dim=dim, interpret=True,
    )
    xv, xi = q4._int4_scan_topk_impl(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), jnp.int32(n), jnp.zeros((0,), bool),
        metric=metric, k=k, dim=dim, row_tile=q4.INT4_ROW_TILE,
        has_mask=False,
    )
    np.testing.assert_allclose(
        np.asarray(pv), np.asarray(xv), rtol=1e-4, atol=1e-5
    )
    # neighbor sets agree (genuine ties may permute)
    for r in range(b):
        assert set(np.asarray(pi)[r].tolist()) == set(
            np.asarray(xi)[r].tolist()
        )


def test_pallas_int4_valid_count(rng, monkeypatch):
    from sqlite_vector_tpu.ops import pallas_int4

    monkeypatch.setenv("SVT_PALLAS_INT4_TILE_ROWS", "256")
    dim = 32
    x = rng.standard_normal((600, dim)).astype(np.float32)
    packed, alpha, csq = q4.quantize4_np(x)
    _, idx = pallas_int4.pallas_int4_scan_topk(
        jnp.asarray(x[:2]), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), DistanceMetric.L2, 6, dim=dim, valid_count=100,
        interpret=True,
    )
    assert np.all(np.asarray(idx) < 100)


def test_pallas_int4_supports_fences():
    from sqlite_vector_tpu.ops import pallas_int4

    assert pallas_int4.supports(DistanceMetric.L2, 384, 20, 1, 1_000_000)
    assert not pallas_int4.supports(DistanceMetric.L1, 384, 20, 1, 1_000_000)
    assert not pallas_int4.supports(DistanceMetric.L2, 384, 0, 8, 1000)
    assert not pallas_int4.supports(
        DistanceMetric.L2, 384, 2000, 8, 1000
    )  # k > MAX_K
    assert not pallas_int4.supports(
        DistanceMetric.L2, 384, 20, 512, 1_000_000
    )  # batch > MAX_B
    # the r5 envelope (tools/probe_int4.py --envelope on the v5e, recorded
    # in STATUS.md): every (b, n) with b_lane*n <= 2.56e9 COMPILES+RUNS —
    # including the previously-fenced batched regime (64, 10M) and the
    # largest probed config (256, 10M). The fence sits AT the largest
    # measured product, so configs inside it pass and anything beyond the
    # evidence routes to the XLA loop.
    assert pallas_int4.supports(DistanceMetric.L2, 768, 20, 64, 10_000_000)
    assert pallas_int4.supports(DistanceMetric.L2, 768, 20, 256, 10_000_000)
    assert not pallas_int4.supports(
        DistanceMetric.L2, 768, 20, 256, 11_000_000
    )  # b_lane * n beyond the measured compile envelope
    # measured routing crossover (tools/probe_int4_cross.py, r5): the XLA
    # loop wins batched scans below ~4M rows; B=1 stays on the kernel
    assert not pallas_int4.supports(DistanceMetric.L2, 768, 20, 64, 1_000_000)
    assert not pallas_int4.supports(DistanceMetric.L2, 768, 20, 8, 2_000_000)
    assert pallas_int4.supports(DistanceMetric.L2, 768, 20, 1, 1_000_000)
    assert pallas_int4.supports(DistanceMetric.L2, 768, 20, 64, 4_000_000)
    import os

    prior = os.environ.get("SVT_PALLAS_INT4_MANUAL")
    os.environ["SVT_PALLAS_INT4_MANUAL"] = "0"
    try:
        # the GRID variant keeps minima in VMEM; its r4 bounds still apply
        assert not pallas_int4.supports(
            DistanceMetric.L2, 768, 20, 64, 10_000_000
        )
        assert pallas_int4.supports(DistanceMetric.L2, 384, 20, 1, 1_000_000)
    finally:
        # restore the caller's value (a plain pop would silently flip a
        # user-exported SVT_PALLAS_INT4_MANUAL=0 back to the default)
        if prior is None:
            os.environ.pop("SVT_PALLAS_INT4_MANUAL")
        else:
            os.environ["SVT_PALLAS_INT4_MANUAL"] = prior
    # UNCLAMPED tile budget (r4 review: the clamped helper made this check
    # vacuous — a dim whose minimum 256-row tile exceeds VMEM must route
    # to the XLA loop, not crash Mosaic with a ~300 MB scratch)
    assert not pallas_int4.supports(
        DistanceMetric.L2, 600_000, 1, 1, 100_000
    )


def test_quantize_query_int8_denormal_absmax_saturates():
    """absmax below ~3.7e-37 overflows the 127/absmax scale to +inf; the
    encoder must saturate (127 / -127 / 0) like _encode_device instead of
    casting NaN to int8 (r4 review). The numpy spec mirrors it."""
    # smallest-normal territory (denormals get flushed to 0 by the
    # backend, which degenerates to the s=0 zero-query branch): 2e-38 is
    # above FLT_MIN = 1.1755e-38, and 127/2e-38 = 6.35e39 overflows f32
    q = np.zeros((1, 8), np.float32)
    q[0, 0] = 2e-38
    q[0, 1] = -2e-38
    qc, qscale, qsq = q4.quantize_query_int8(jnp.asarray(q))
    qc = np.asarray(qc)
    assert qc[0, 0] == 127 and qc[0, 1] == -127
    assert np.all(qc[0, 2:] == 0)
    assert np.isfinite(np.asarray(qscale)).all()
    # the shared spec agrees end-to-end on the same pathological query
    packed, alpha, csq = q4.quantize4_np(
        np.ones((4, 8), np.float32)
    )
    want = _expected_int4(q, packed, alpha, csq, DistanceMetric.L2, 8)
    got = np.asarray(
        q4.int4_scan_distances(
            jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
            jnp.asarray(csq), DistanceMetric.L2, dim=8,
        )
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_int4_nan_surrogate_ranks_like_xla(rng, monkeypatch):
    """Rows whose alpha^2*csq overflows to inf yield inf-inf = NaN in the
    L2 surrogate; the kernel must rank them like the XLA path's NaN->inf
    distances, not let NaN poison the block minima (r4 review)."""
    from sqlite_vector_tpu.ops import pallas_int4

    monkeypatch.setenv("SVT_PALLAS_INT4_TILE_ROWS", "256")
    n, dim, k = 700, 16, 5
    x = rng.standard_normal((n, dim)).astype(np.float32)
    x[::3] *= 1e25  # alpha ~ 1.4e24 -> alpha^2 * csq overflows f32
    q = (rng.standard_normal((2, dim)) * 1e25).astype(np.float32)
    packed, alpha, csq = q4.quantize4_np(x)
    pv, pi = pallas_int4.pallas_int4_scan_topk(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), DistanceMetric.L2, k, dim=dim, interpret=True,
    )
    xv, xi = q4._int4_scan_topk_impl(
        jnp.asarray(q), jnp.asarray(packed), jnp.asarray(alpha),
        jnp.asarray(csq), jnp.int32(n), jnp.zeros((0,), bool),
        metric=DistanceMetric.L2, k=k, dim=dim,
        row_tile=q4.INT4_ROW_TILE, has_mask=False,
    )
    pv, xv = np.asarray(pv), np.asarray(xv)
    assert not np.isnan(pv).any()
    for r in range(2):
        fin = np.isfinite(xv[r])
        np.testing.assert_allclose(pv[r][fin], xv[r][fin], rtol=1e-4)
        assert set(np.asarray(pi)[r][fin].tolist()) == set(
            np.asarray(xi)[r][fin].tolist()
        )


# ---------------------------------------------------------------------------
# Dataset end-to-end
# ---------------------------------------------------------------------------


def _mk(store_kw=None, n=300, dim=48, rng=None, metric="L2"):
    import sqlite_vector_tpu as svt

    rng = rng or np.random.default_rng(3)
    store = svt.VectorStore(**(store_kw or {}))
    ds = store.create(
        "t4", f"dimension={dim},type=FLOAT32,distance={metric}"
    )
    data = rng.standard_normal((n, dim)).astype(np.float32)
    ds.add(data)
    return ds, data


def test_dataset_int4_quantize_and_search(rng):
    ds, data = _mk(rng=rng)
    assert ds.quantize(qtype="int4") == 300
    assert ds.quant_params[0] is QuantType.I4
    q = data[7]
    ids, dist = ds.search(q, 5, mode="quantized")
    assert ids[0] == ds.ids[7]
    # int4 distances are original-domain approximations: the self-match is
    # small relative to the space (bounded by the quantization noise,
    # ~sqrt(dim)*alpha/sqrt(6)), not a quantized-domain integer
    assert dist[0] < 0.2 * np.linalg.norm(q)
    # rerank returns exact distances through the int4 prefilter
    rids, rdist = ds.search(q, 5, mode="rerank")
    assert rids[0] == ds.ids[7] and rdist[0] == 0.0


def test_dataset_int4_quantize_memory_and_lifecycle(rng):
    ds, _ = _mk(rng=rng, dim=49)
    ds.quantize(qtype="int4")
    # record stride 16 + P: rowid(8) + alpha(4) + csq(4) + packed codes —
    # matches the persisted shadow record byte-for-byte (r5 ADVICE fix:
    # the csq sidecar was previously omitted)
    assert ds.quantize_memory() == 300 * (16 + 25)
    ds.drop_quantization()
    import sqlite_vector_tpu as svt

    with pytest.raises(svt.VectorStateError):
        ds.search(np.zeros(49, np.float32), 3, mode="quantized")


@pytest.mark.parametrize("metric", ["L2", "COSINE", "DOT", "L1"])
def test_dataset_int4_metrics_recall_on_planted(rng, metric):
    ds, data = _mk(rng=rng, metric=metric, n=400, dim=32)
    ds.quantize(qtype="int4")
    # plant 3 near-duplicates of query row 11
    q = data[11]
    e_ids, _ = ds.search(q, 5)
    a_ids, _ = ds.search(q, 5, mode="quantized")
    assert e_ids[0] == a_ids[0] == ds.ids[11]


def test_dataset_int4_ids_filter_and_staleness(rng):
    ds, data = _mk(rng=rng)
    ds.quantize(qtype="int4")
    flt = ds.ids[50:60]
    ids, _ = ds.search(data[55], 3, mode="quantized", ids_filter=flt)
    assert set(ids.tolist()) <= set(flt.tolist())
    assert ids[0] == ds.ids[55]
    assert not ds.quant_stale
    ds.add(data[:4] + 9.0)
    assert ds.quant_stale


def test_dataset_int4_distances_stream(rng):
    ds, data = _mk(rng=rng, n=120)
    ds.quantize(qtype="int4")
    d = ds.distances(data[3], exact=False)
    assert d.shape == (120,)
    assert d[3] == d.min()  # the self-row wins despite quantization noise
    quant = ds._quant
    want = _expected_int4(
        data[3:4], np.asarray(quant.codes)[:120],
        np.asarray(quant.row_scale)[:120], np.asarray(quant.sq_norms)[:120],
        DistanceMetric.L2, 48,
    )[0]
    np.testing.assert_allclose(d, want, rtol=1e-4, atol=1e-5)


def test_dataset_int4_distances_host_storage_padded_tail(
    rng, tmp_path, monkeypatch
):
    """Host-resident int4 *_stream distances tile through HBM at a FIXED
    tile shape: the partial tail tile is padded (alpha=0/csq=0 rows) so one
    compiled executable serves every tile and every drifting count (r5,
    ADVICE item — each distinct tail shape previously paid a fresh XLA
    compile). Correctness check with a tile small enough to force both a
    full tile and a padded tail."""
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu import dataset as dsmod

    monkeypatch.setattr(dsmod, "_I4_STREAM_TILE", 64)
    data = rng.standard_normal((150, 24)).astype(np.float32)
    d = str(tmp_path / "pt")
    svt.Dataset.save_stream(
        d, [data], options="dimension=24,type=FLOAT32,distance=L2"
    )
    ds = svt.Dataset.load(d, storage="host", mmap=True)
    ds.quantize(qtype="int4")
    got = ds.distances(data[5], exact=False)
    assert got.shape == (150,)
    quant = ds._quant
    want = _expected_int4(
        data[5:6], np.asarray(quant.codes)[:150],
        np.asarray(quant.row_scale)[:150], np.asarray(quant.sq_norms)[:150],
        DistanceMetric.L2, 24,
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dataset_int4_save_load_roundtrip(rng, tmp_path):
    import sqlite_vector_tpu as svt

    ds, data = _mk(rng=rng)
    ds.quantize(qtype="int4")
    a_ids, a_dist = ds.search(data[9], 5, mode="quantized")
    d = str(tmp_path / "ds")
    ds.save(d)
    ds2 = svt.Dataset.load(d)
    assert ds2.quant_params[0] is QuantType.I4
    b_ids, b_dist = ds2.search(data[9], 5, mode="quantized")
    np.testing.assert_array_equal(a_ids, b_ids)
    np.testing.assert_allclose(a_dist, b_dist, rtol=1e-6)


def test_dataset_int4_host_storage_stream_and_preload(rng, tmp_path):
    import sqlite_vector_tpu as svt

    data = rng.standard_normal((500, 24)).astype(np.float32)
    d = str(tmp_path / "hs")
    svt.Dataset.save_stream(
        d, [data[:200], data[200:]],
        options="dimension=24,type=FLOAT32,distance=L2",
    )
    ds = svt.Dataset.load(d, storage="host", mmap=True)
    ds.quantize(qtype="int4")
    ids, dist = ds.search(data[123], 4, mode="quantized")
    assert ids[0] == 124  # save_stream ids start at 1
    ds.preload()
    ids2, dist2 = ds.search(data[123], 4, mode="quantized")
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(dist, dist2, rtol=1e-5, atol=1e-6)


def test_dataset_int4_checkpoint_resume(rng, tmp_path):
    import sqlite_vector_tpu as svt

    data = rng.standard_normal((300, 16)).astype(np.float32)
    d = str(tmp_path / "ck")
    svt.Dataset.save_stream(
        d, [data], options="dimension=16,type=FLOAT32,distance=L2"
    )
    ds = svt.Dataset.load(d, storage="host", mmap=True)
    ckpt = str(tmp_path / "q4ck")
    ds.quantize(qtype="int4", checkpoint=ckpt)
    ids_a, dist_a = ds.search(data[7], 3, mode="quantized")
    # a fresh load resumes the FINISHED checkpoint instantly and serves the
    # same codes
    ds2 = svt.Dataset.load(d, storage="host", mmap=True)
    ds2.quantize(qtype="int4", checkpoint=ckpt)
    ids_b, dist_b = ds2.search(data[7], 3, mode="quantized")
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(dist_a, dist_b, rtol=1e-6)
    # mutation invalidates the checkpoint (data token)
    ds2.update(ds2.ids[:1], data[1:2] + 5.0)
    ds2.quantize(qtype="int4", checkpoint=ckpt)
    ids_c, _ = ds2.search(data[1] + 5.0, 1, mode="quantized")
    assert ids_c[0] == ds2.ids[0]


def test_dataset_int4_mesh_sharded(rng):
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.parallel import make_mesh

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    store = svt.VectorStore(mesh=mesh)
    data = rng.standard_normal((257, 20)).astype(np.float32)
    ds = store.create("m4", "dimension=20,type=FLOAT32,distance=L2")
    ds.add(data)
    ds.quantize(qtype="int4")
    ids, dist = ds.search(data[33], 5, mode="quantized")
    assert ids[0] == ds.ids[33]
    # parity with the single-chip int4 scan
    solo = svt.VectorStore().create(
        "s4", "dimension=20,type=FLOAT32,distance=L2"
    )
    solo.add(data)
    solo.quantize(qtype="int4")
    sids, sdist = solo.search(data[33], 5, mode="quantized")
    np.testing.assert_array_equal(ids, sids)
    np.testing.assert_allclose(dist, sdist, rtol=1e-5, atol=1e-6)


def test_dataset_int4_rejected_on_2d_mesh(rng):
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d(4, 2)
    store = svt.VectorStore(mesh=mesh)
    ds = store.create("d2", "dimension=16,type=FLOAT32,distance=L2")
    ds.add(np.random.default_rng(0).standard_normal((32, 16)).astype(np.float32))
    with pytest.raises(svt.VectorConfigError, match="INT4"):
        ds.quantize(qtype="int4")


def test_int4_via_option_string(rng):
    ds, data = _mk(rng=rng, n=64, dim=12)
    ds.quantize("qtype=INT4")
    assert ds.quant_params[0] is QuantType.I4
