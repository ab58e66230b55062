"""mode="refine": device-side int4 prefilter + int8-sidecar rescore.

Beyond the reference (its approx path is single-stage,
/root/reference/src/sqlite-vector.c:2159-2236). Ground truth is the pinned
recomputation of the two stages: the int4 spec oracle
(tests/parity.expected_int4_distances) picks the candidate set, then an f64
rescore of the DEQUANTIZED int8 sidecar ranks it — exactly what
ops/refine.py composes on device.
"""

import numpy as np
import pytest

import sqlite_vector_tpu as svt
from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.types import DistanceMetric, QuantType, VectorType

from tests.parity import expected_int4_distances as _expected_int4


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _mk(n=300, dim=48, rng=None, metric="L2", refine=True):
    rng = rng or np.random.default_rng(3)
    store = svt.VectorStore()
    ds = store.create("tr", f"dimension={dim},type=FLOAT32,distance={metric}")
    data = rng.standard_normal((n, dim)).astype(np.float32)
    ds.add(data)
    if refine:
        ds.quantize(qtype="int4", refine=True)
    return ds, data


def _expected_refine(q, ds, k, expand, metric):
    """Recompute the two-stage composition: int4-spec candidate set, f64
    rescore of the dequantized sidecar, top-k (ascending, ties by row)."""
    quant = ds._quant
    n = quant.count
    packed = np.asarray(quant.codes)[:n]
    alpha = np.asarray(quant.row_scale)[:n]
    csq = np.asarray(quant.sq_norms)[:n]
    d4 = _expected_int4(q[None], packed, alpha, csq, metric, ds.dimension)[0]
    ke = max(k * expand, k)
    codes8 = np.asarray(quant.codes8)[:n].astype(np.float64)
    # the kernel sorts the candidate positions ascending before rescoring
    # (tie parity: earliest row wins equal rescored distances)
    cand_sorted = np.sort(np.argsort(d4, kind="stable")[:ke])
    xhat = codes8[cand_sorted] / float(quant.scale8) + float(quant.offset8)
    d = oracle.distance(
        q.astype(np.float32), xhat.astype(np.float32), metric, VectorType.F32
    )
    d = oracle.snap_zero(np.asarray(d, np.float64))
    order = np.argsort(d, kind="stable")[:k]
    return cand_sorted[order], d[order]


@pytest.mark.parametrize("metric", ["L2", "SQUARED_L2", "COSINE", "DOT", "L1"])
def test_refine_matches_two_stage_spec(rng, metric):
    m = DistanceMetric.from_name(metric)
    ds, data = _mk(n=400, dim=32, rng=rng, metric=metric)
    q = data[17] * 0.9 + 0.1 * rng.standard_normal(32).astype(np.float32)
    ids, dist = ds.search(q, 5, mode="refine")
    want_pos, want_d = _expected_refine(q, ds, 5, 4, m)
    want_ids = ds._quant.ids[want_pos]
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_allclose(dist, want_d, rtol=3e-5, atol=1e-5)


def test_refine_recall_beats_direct_int4(rng):
    # iid gaussian is int4's documented worst case (STATUS r4): the refine
    # stage must recover most of what direct int4 ranking loses
    ds, data = _mk(n=3000, dim=64, rng=rng)
    k = 10
    hits_ref = hits_i4 = total = 0
    for i in range(0, 3000, 97):
        q = data[i] + 0.05 * rng.standard_normal(64).astype(np.float32)
        exact = set(ds.search(q, k)[0].tolist())
        refi = set(ds.search(q, k, mode="refine", expand=8)[0].tolist())
        i4 = set(ds.search(q, k, mode="quantized")[0].tolist())
        hits_ref += len(exact & refi)
        hits_i4 += len(exact & i4)
        total += k
    assert hits_ref / total >= hits_i4 / total
    assert hits_ref / total > 0.85


def test_refine_self_match_and_batched(rng):
    ds, data = _mk(n=256, dim=24, rng=rng)
    ids, dist = ds.search(data[:8], 3, mode="refine")
    assert ids.shape == (8, 3)
    # dequantized-int8 fidelity: the self row wins, distance ~0 (not exact
    # 0 — the sidecar is 8-bit)
    np.testing.assert_array_equal(ids[:, 0], ds.ids[:8])
    assert np.all(dist[:, 0] < dist[:, 1] + 1e-6)


def test_refine_ids_filter(rng):
    ds, data = _mk(n=200, dim=16, rng=rng)
    flt = ds.ids[::3]
    ids, dist = ds.search(data[30], 5, mode="refine", ids_filter=flt)
    assert set(ids.tolist()) <= set(flt.tolist())
    assert len(ids) == 5


def test_refine_requires_sidecar(rng):
    ds, data = _mk(n=100, dim=16, rng=rng, refine=False)
    ds.quantize(qtype="int4")  # no refine sidecar
    with pytest.raises(svt.VectorStateError, match="refine"):
        ds.search(data[0], 3, mode="refine")
    ds.quantize(qtype="int8")
    with pytest.raises(svt.VectorStateError, match="refine"):
        ds.search(data[0], 3, mode="refine")


def test_refine_requires_int4_qtype():
    store = svt.VectorStore()
    ds = store.create("tr8", "dimension=8,type=FLOAT32,distance=L2")
    ds.add(np.eye(8, dtype=np.float32))
    with pytest.raises(svt.VectorConfigError, match="int4"):
        ds.quantize(qtype="int8", refine=True)


def test_refine_rejected_on_mesh():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from sqlite_vector_tpu.parallel import make_mesh

    store = svt.VectorStore(mesh=make_mesh(2))
    ds = store.create("trm", "dimension=8,type=FLOAT32,distance=L2")
    ds.add(np.eye(8, dtype=np.float32))
    with pytest.raises(svt.VectorConfigError, match="single-chip"):
        ds.quantize(qtype="int4", refine=True)


def test_refine_host_storage_preload_contract(rng, tmp_path):
    data = rng.standard_normal((500, 24)).astype(np.float32)
    d = str(tmp_path / "hs")
    svt.Dataset.save_stream(
        d, [data[:250], data[250:]],
        options="dimension=24,type=FLOAT32,distance=L2",
    )
    ds = svt.Dataset.load(d, storage="host", mmap=True)
    ds.quantize(qtype="int4", refine=True)
    # codes are host-resident: refine demands an explicit preload (it is
    # device-side by contract)
    with pytest.raises(svt.VectorStateError, match="preload"):
        ds.search(data[3], 4, mode="refine")
    ds.preload()
    ids, dist = ds.search(data[123], 4, mode="refine")
    assert ids[0] == 124  # save_stream ids start at 1
    # matches the hbm-resident build on the same data
    store = svt.VectorStore()
    ds2 = store.create("trh", "dimension=24,type=FLOAT32,distance=L2")
    ds2.add(data, ids=np.arange(1, 501))
    ds2.quantize(qtype="int4", refine=True)
    ids2, dist2 = ds2.search(data[123], 4, mode="refine")
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(dist, dist2, rtol=1e-5, atol=1e-6)


def test_refine_save_load_roundtrip(rng, tmp_path):
    ds, data = _mk(n=300, dim=32, rng=rng)
    a_ids, a_d = ds.search(data[9], 5, mode="refine")
    d = str(tmp_path / "rt")
    ds.save(d)
    ds2 = svt.Dataset.load(d)
    assert ds2._quant.qtype8 is not None
    b_ids, b_d = ds2.search(data[9], 5, mode="refine")
    np.testing.assert_array_equal(a_ids, b_ids)
    np.testing.assert_allclose(a_d, b_d, rtol=1e-6)
    # host-storage load restores the sidecar lazily; preload enables refine
    ds3 = svt.Dataset.load(d, storage="host", mmap=True)
    ds3.preload()
    c_ids, c_d = ds3.search(data[9], 5, mode="refine")
    np.testing.assert_array_equal(a_ids, c_ids)
    np.testing.assert_allclose(a_d, c_d, rtol=1e-5, atol=1e-6)


def test_refine_checkpoint_resume(rng, tmp_path):
    data = rng.standard_normal((300, 16)).astype(np.float32)
    d = str(tmp_path / "ck")
    svt.Dataset.save_stream(
        d, [data], options="dimension=16,type=FLOAT32,distance=L2"
    )
    ds = svt.Dataset.load(d, storage="host", mmap=True)
    ckpt = str(tmp_path / "q4ck")
    ds.quantize(qtype="int4", refine=True, checkpoint=ckpt)
    ds.preload()
    ids_a, d_a = ds.search(data[7], 3, mode="refine")
    # fresh load resumes BOTH the int4 build and the refine8 sidecar
    import os

    mtime0 = os.path.getmtime(str(tmp_path / "q4ck" / "refine8.npy"))
    ds2 = svt.Dataset.load(d, storage="host", mmap=True)
    ds2.quantize(qtype="int4", refine=True, checkpoint=ckpt)
    ds2.preload()
    assert os.path.getmtime(str(tmp_path / "q4ck" / "refine8.npy")) == mtime0
    ids_b, d_b = ds2.search(data[7], 3, mode="refine")
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-6)
    # mutation regenerates the data token -> sidecar rebuilds too
    ds2.update(ds2.ids[:1], data[1:2] + 5.0)
    ds2.quantize(qtype="int4", refine=True, checkpoint=ckpt)
    ds2.preload()
    ids_c, _ = ds2.search(data[1] + 5.0, 1, mode="refine")
    assert ids_c[0] == ds2.ids[0]


def test_refine_quantize_memory_counts_sidecar(rng):
    from sqlite_vector_tpu.ops.quantize4 import packed_width

    ds, _ = _mk(n=200, dim=20, rng=rng)
    assert ds.quantize_memory() == 200 * (16 + packed_width(20)) + 200 * 20
    ds.quantize(qtype="int4")  # rebuild without sidecar
    assert ds.quantize_memory() == 200 * (16 + packed_width(20))


def test_refine_sidecar_params_from_stats_multichunk(rng, tmp_path, monkeypatch):
    """The int4 build loop's in-flight stats accumulation produces
    BIT-IDENTICAL sidecar params to the dedicated params pass it replaces
    (r5 review: that pass re-read the whole — possibly >RAM — snapshot),
    across many small chunks and with a NaN lane present (stats skip NaN
    exactly like compute_quant_params_chunked)."""
    import sqlite_vector_tpu.dataset as dsmod

    monkeypatch.setattr(dsmod, "HOST_CHUNK_ELEMS", 16 * 16)  # 16-row chunks
    data = rng.standard_normal((300, 16)).astype(np.float32)
    data[17, 3] = np.nan
    data[5] *= 50.0  # global extremes land in an early chunk
    d = str(tmp_path / "hs")
    svt.Dataset.save_stream(
        d, [data], options="dimension=16,type=FLOAT32,distance=L2"
    )
    ds = svt.Dataset.load(d, storage="host", mmap=True)
    ds.quantize(qtype="int4", refine=True)
    qt, s, o = oracle.compute_quant_params_chunked(iter([data]), QuantType.AUTO)
    assert ds._quant.qtype8 is qt
    assert float(ds._quant.scale8) == float(s)
    assert float(ds._quant.offset8) == float(o)


def test_refine_added_to_finished_plain_int4_checkpoint(rng, tmp_path, monkeypatch):
    """quantize(refine=True) over a checkpoint FINISHED by a refine=False
    build: every int4 chunk resume-skips, so no stats were accumulated —
    the sidecar must fall back to its own params pass (not trust absent
    stats) and still produce the exact params."""
    import os

    import sqlite_vector_tpu.dataset as dsmod

    monkeypatch.setattr(dsmod, "HOST_CHUNK_ELEMS", 16 * 16)
    data = rng.standard_normal((300, 16)).astype(np.float32)
    d = str(tmp_path / "hs")
    svt.Dataset.save_stream(
        d, [data], options="dimension=16,type=FLOAT32,distance=L2"
    )
    ckpt = str(tmp_path / "ck")
    ds = svt.Dataset.load(d, storage="host", mmap=True)
    ds.quantize(qtype="int4", checkpoint=ckpt)  # no refine, no stats
    mtime0 = os.path.getmtime(os.path.join(ckpt, "qcodes.npy"))
    ds2 = svt.Dataset.load(d, storage="host", mmap=True)
    ds2.quantize(qtype="int4", refine=True, checkpoint=ckpt)
    # the int4 build itself resumed (codes untouched)...
    assert os.path.getmtime(os.path.join(ckpt, "qcodes.npy")) == mtime0
    # ...and the sidecar params came out exact via the fallback pass
    qt, s, o = oracle.compute_quant_params_chunked(iter([data]), QuantType.AUTO)
    assert ds2._quant.qtype8 is qt
    assert float(ds2._quant.scale8) == float(s)
    assert float(ds2._quant.offset8) == float(o)


def test_refine_stats_survive_crash_resume(rng, tmp_path, monkeypatch):
    """Crash the int4 build mid-way (chunk 4 of ~19) and resume: the stats
    accumulated before the crash come back from the checkpoint meta (they
    are written atomically WITH each chunk's progress), the resumed loop
    extends them, and the sidecar params still bit-match the dedicated
    pass. The global extremes sit in chunk 0, so losing pre-crash stats
    would visibly change the scale."""
    import sqlite_vector_tpu.dataset as dsmod
    import sqlite_vector_tpu.ops.quantize4 as q4

    monkeypatch.setattr(dsmod, "HOST_CHUNK_ELEMS", 16 * 16)
    data = rng.standard_normal((300, 16)).astype(np.float32)
    data[5] *= 50.0  # extremes in chunk 0 (pre-crash)
    d = str(tmp_path / "hs")
    svt.Dataset.save_stream(
        d, [data], options="dimension=16,type=FLOAT32,distance=L2"
    )
    ckpt = str(tmp_path / "ck")
    real = q4.quantize4_np
    calls = {"n": 0}

    def boom(chunk):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("synthetic crash")
        return real(chunk)

    monkeypatch.setattr(q4, "quantize4_np", boom)
    ds = svt.Dataset.load(d, storage="host", mmap=True)
    with pytest.raises(RuntimeError, match="synthetic crash"):
        ds.quantize(qtype="int4", refine=True, checkpoint=ckpt)
    monkeypatch.setattr(q4, "quantize4_np", real)
    ds2 = svt.Dataset.load(d, storage="host", mmap=True)
    ds2.quantize(qtype="int4", refine=True, checkpoint=ckpt)
    qt, s, o = oracle.compute_quant_params_chunked(iter([data]), QuantType.AUTO)
    assert ds2._quant.qtype8 is qt
    assert float(ds2._quant.scale8) == float(s)
    assert float(ds2._quant.offset8) == float(o)
    # and the full refine search agrees with an hbm-resident rebuild
    store = svt.VectorStore()
    ds3 = store.create("crr", "dimension=16,type=FLOAT32,distance=L2")
    ds3.add(data, ids=np.arange(1, 301))
    ds3.quantize(qtype="int4", refine=True)
    ds2.preload()
    a_ids, a_d = ds2.search(data[9], 5, mode="refine")
    b_ids, b_d = ds3.search(data[9], 5, mode="refine")
    np.testing.assert_array_equal(a_ids, b_ids)
    np.testing.assert_allclose(a_d, b_d, rtol=1e-5, atol=1e-6)


def test_refine_stats_dropped_by_plain_resume(rng, tmp_path, monkeypatch):
    """Regression (r5 review): crash a refine=True build mid-way, resume it
    with refine=FALSE (which advances `done` without accumulating), then run
    refine=True over the finished checkpoint. The plain resume must STRIP
    the partial refine_stats from the meta it rewrites — otherwise the
    final run trusts stats that cover only the pre-crash chunks. The
    global extremes sit in a LATE chunk (post-crash), so stale stats would
    visibly change the sidecar scale."""
    import sqlite_vector_tpu.dataset as dsmod
    import sqlite_vector_tpu.ops.quantize4 as q4

    monkeypatch.setattr(dsmod, "HOST_CHUNK_ELEMS", 16 * 16)  # 16-row chunks
    data = rng.standard_normal((300, 16)).astype(np.float32)
    data[250] *= 50.0  # extremes in chunk 15 — AFTER the crash point
    d = str(tmp_path / "hs")
    svt.Dataset.save_stream(
        d, [data], options="dimension=16,type=FLOAT32,distance=L2"
    )
    ckpt = str(tmp_path / "ck")
    real = q4.quantize4_np
    calls = {"n": 0}

    def boom(chunk):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("synthetic crash")
        return real(chunk)

    monkeypatch.setattr(q4, "quantize4_np", boom)
    ds = svt.Dataset.load(d, storage="host", mmap=True)
    with pytest.raises(RuntimeError, match="synthetic crash"):
        ds.quantize(qtype="int4", refine=True, checkpoint=ckpt)
    monkeypatch.setattr(q4, "quantize4_np", real)
    # plain (refine=False) resume completes the int4 build
    ds2 = svt.Dataset.load(d, storage="host", mmap=True)
    ds2.quantize(qtype="int4", checkpoint=ckpt)
    # refine=True over the finished checkpoint: every chunk resume-skips;
    # it must NOT trust leftover partial stats
    ds3 = svt.Dataset.load(d, storage="host", mmap=True)
    ds3.quantize(qtype="int4", refine=True, checkpoint=ckpt)
    qt, s, o = oracle.compute_quant_params_chunked(iter([data]), QuantType.AUTO)
    assert ds3._quant.qtype8 is qt
    assert float(ds3._quant.scale8) == float(s)
    assert float(ds3._quant.offset8) == float(o)


def test_refine_sidecar_params_match_int8_quantize(rng):
    """The sidecar's AUTO-resolved params equal a standalone int8 quantize
    of the same rows (same reference formulas, same snapshot)."""
    ds, data = _mk(n=150, dim=12, rng=rng)
    q8type, s8, o8 = ds._quant.qtype8, ds._quant.scale8, ds._quant.offset8
    qt, scale, offset = oracle.compute_quant_params(data, QuantType.AUTO)
    assert q8type is qt
    np.testing.assert_allclose(s8, scale, rtol=1e-7)
    np.testing.assert_allclose(o8, offset, rtol=1e-7)
    codes8 = np.asarray(ds._quant.codes8)[:150]
    np.testing.assert_array_equal(
        codes8, np.asarray(oracle.quantize(data, scale, offset, qt))
    )
