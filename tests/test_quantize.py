"""Quantization pipeline: device kernels vs oracle, recall vs exact.

Replicates the recall methodology of QUANTIZATION.md:43-77 (match_count /
total_count over top-k id sets) with the reference's >0.95 target (API.md:255).
"""

import numpy as np
import pytest

from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.dataset import Dataset
from sqlite_vector_tpu.ops.quantize import (
    minmax_and_negative,
    quantize_device,
    resolve_quant_params,
)
from sqlite_vector_tpu.types import (
    DistanceMetric,
    QuantType,
    VectorOptions,
    VectorType,
)


def test_minmax_and_negative(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    mn, mx, neg = minmax_and_negative(x)
    assert float(mn) == x.min()
    assert float(mx) == x.max()
    assert bool(neg) == bool((x < 0).any())


def test_minmax_respects_valid_count(rng):
    x = rng.uniform(1, 2, (20, 4)).astype(np.float32)
    x[10:] = -99.0  # padding rows must be ignored
    mn, mx, neg = minmax_and_negative(x, 10)
    assert float(mn) >= 1.0
    assert not bool(neg)


def test_minmax_skips_nan(rng):
    x = rng.uniform(0, 1, (4, 4)).astype(np.float32)
    x[0, 0] = np.nan
    mn, mx, neg = minmax_and_negative(x)
    assert np.isfinite(mn) and np.isfinite(mx)


def test_resolve_params_match_oracle(rng):
    v = rng.standard_normal((100, 8)).astype(np.float32)
    for qt in (QuantType.AUTO, QuantType.U8, QuantType.I8):
        mn, mx, neg = minmax_and_negative(v)
        got = resolve_quant_params(float(mn), float(mx), bool(neg), qt)
        want = oracle.compute_quant_params(v, qt)
        assert got[0] is want[0]
        assert got[1] == want[1]
        assert got[2] == want[2]


@pytest.mark.parametrize("qtype", [QuantType.U8, QuantType.I8])
def test_quantize_device_bitexact_vs_oracle(rng, qtype):
    v = (rng.standard_normal((200, 16)) * 3).astype(np.float32)
    _, scale, offset = oracle.compute_quant_params(
        v, qtype
    )
    got = np.asarray(quantize_device(v, scale, offset, qtype))
    want = oracle.quantize(v, scale, offset, qtype)
    np.testing.assert_array_equal(got, want)


def test_quantize_device_nonfinite(rng):
    v = np.float32([[np.nan, np.inf, -np.inf, 0.5]])
    got_u8 = np.asarray(quantize_device(v, 1.0, 0.0, QuantType.U8))
    np.testing.assert_array_equal(got_u8[0], [0, 255, 0, 1])
    got_s8 = np.asarray(quantize_device(v, 1.0, 0.0, QuantType.I8))
    np.testing.assert_array_equal(got_s8[0], [0, 127, -128, 1])


@pytest.mark.parametrize("src_type", list(VectorType), ids=[t.value for t in VectorType])
def test_quantize_from_all_source_types(rng, src_type):
    """All 10 quantize_<src>_to_<dst> paths (reference :517-757)."""
    if src_type in (VectorType.U8, VectorType.I8):
        lo, hi = (0, 256) if src_type is VectorType.U8 else (-128, 128)
        v = rng.integers(lo, hi, (50, 8)).astype(src_type.np_dtype)
    else:
        v = rng.standard_normal((50, 8)).astype(src_type.np_dtype)
    v32 = np.asarray(v, dtype=np.float32)
    for qt in (QuantType.U8, QuantType.I8):
        _, scale, offset = oracle.compute_quant_params(v32, qt)
        got = np.asarray(quantize_device(np.asarray(v), scale, offset, qt))
        want = oracle.quantize(v32, scale, offset, qt)
        np.testing.assert_array_equal(got, want)


def _recall(exact_ids, approx_ids):
    matches = sum(len(set(e) & set(a)) for e, a in zip(exact_ids, approx_ids))
    total = sum(len(e) for e in exact_ids)
    return matches / total


@pytest.mark.parametrize(
    "metric",
    [DistanceMetric.L2, DistanceMetric.SQUARED_L2, DistanceMetric.COSINE,
     DistanceMetric.DOT, DistanceMetric.L1],
    ids=lambda m: m.value,
)
def test_quantized_scan_recall(rng, metric):
    """Recall@10 of the quantized scan vs exact — reference claims >0.95
    (QUANTIZATION.md:39); embeddings-like data, small scale."""
    n, d, k, nq = 2000, 64, 10, 8
    base = rng.standard_normal((n, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    queries = base[rng.integers(0, n, nq)] + 0.05 * rng.standard_normal(
        (nq, d)
    ).astype(np.float32)

    ds = Dataset(
        "t", VectorOptions(dimension=d, distance=metric, type=VectorType.F32)
    )
    ds.add(base)
    assert ds.quantize() == n
    exact_ids, _ = ds.search(queries, k, exact=True)
    approx_ids, _ = ds.search(queries, k, exact=False)
    r = _recall(exact_ids, approx_ids)
    assert r >= 0.90, f"recall@{k} for {metric.value} = {r}"


def test_quantized_distances_are_integer_domain(rng):
    """Quantized-scan distances are in quantized units, not dequantized
    (src/sqlite-vector.c:2121-2236)."""
    n, d = 100, 16
    base = rng.uniform(0, 1, (n, d)).astype(np.float32)
    ds = Dataset("t", VectorOptions(dimension=d, distance=DistanceMetric.SQUARED_L2))
    ds.add(base)
    ds.quantize()
    _, dists = ds.search(base[0], 3, exact=False)
    # squared-L2 between u8 codes is a whole number
    assert np.allclose(dists, np.round(dists))


def test_quantize_auto_picks_u8_for_nonnegative(rng):
    v = rng.uniform(0, 1, (50, 8)).astype(np.float32)
    ds = Dataset("t", VectorOptions(dimension=8))
    ds.add(v)
    ds.quantize()
    qt, scale, offset = ds.quant_params
    assert qt is QuantType.U8
    want_qt, want_scale, want_offset = oracle.compute_quant_params(v, QuantType.AUTO)
    assert scale == pytest.approx(float(want_scale), rel=1e-6)
    assert offset == pytest.approx(float(want_offset), rel=1e-6)


def test_quantize_memory_formula(rng):
    # rows * (8 + dim) bytes (src/sqlite-vector.c:1486-1499)
    ds = Dataset("t", VectorOptions(dimension=24))
    ds.add(rng.standard_normal((10, 24)).astype(np.float32))
    ds.quantize()
    assert ds.quantize_memory() == 10 * (8 + 24)


def test_quantize_empty_dataset():
    ds = Dataset("t", VectorOptions(dimension=4))
    assert ds.quantize() == 0
    qt, scale, offset = ds.quant_params
    assert qt is QuantType.U8 and scale == 1.0 and offset == 0.0


def test_quantize_stale_flag(rng):
    ds = Dataset("t", VectorOptions(dimension=4))
    ds.add(rng.standard_normal((10, 4)).astype(np.float32))
    ds.quantize()
    assert not ds.quant_stale
    ds.add(rng.standard_normal((5, 4)).astype(np.float32))
    assert ds.quant_stale
    ds.quantize()
    assert not ds.quant_stale


def test_drop_quantization(rng):
    from sqlite_vector_tpu.errors import VectorStateError

    ds = Dataset("t", VectorOptions(dimension=4))
    ds.add(rng.standard_normal((10, 4)).astype(np.float32))
    ds.quantize()
    ds.drop_quantization()
    ds.drop_quantization()  # silent no-op, like the reference (:1510)
    with pytest.raises(VectorStateError):
        ds.search(np.zeros(4, np.float32), 3, exact=False)


def test_quantize_fast_bit_parity(rng):
    """quantize_fast must be bit-identical to quantize on finite inputs,
    for both qtypes, including exact .5 boundaries and extremes."""
    import numpy as np

    from sqlite_vector_tpu import oracle
    from sqlite_vector_tpu.types import QuantType

    vals = np.concatenate(
        [
            rng.standard_normal(5000).astype(np.float32) * 100,
            np.array([0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 1e9, -1e9], np.float32),
        ]
    )
    for qtype in (QuantType.U8, QuantType.I8):
        for scale, offset in ((1.0, 0.0), (0.37, -3.2), (255.0, -1.0)):
            a = oracle.quantize(vals, np.float32(scale), np.float32(offset), qtype)
            b = oracle.quantize_fast(
                vals, np.float32(scale), np.float32(offset), qtype
            )
            np.testing.assert_array_equal(a, b)
            out = np.empty_like(a)
            oracle.quantize_fast(
                vals, np.float32(scale), np.float32(offset), qtype, out=out
            )
            np.testing.assert_array_equal(a, out)


# ---------------------------------------------------------------------------
# resumable host-storage quantize builds (checkpoint=)
# ---------------------------------------------------------------------------


def _host_ds(rng, n=500, dim=16):
    import sqlite_vector_tpu as svt

    data = (rng.standard_normal((n, dim)) * 5).astype(np.float32)
    ds = svt.Dataset(
        "ckpt", svt.parse_options(f"dimension={dim},type=FLOAT32"),
        storage="host",
    )
    ds.add(data)
    return ds, data


def test_quantize_checkpoint_bit_identical(tmp_path, rng, monkeypatch):
    import sqlite_vector_tpu.dataset as dsmod

    monkeypatch.setattr(dsmod, "HOST_CHUNK_ELEMS", 16 * 64)  # many chunks
    ds, data = _host_ds(rng)
    ds.quantize()
    plain = np.asarray(ds._quant.codes).copy()
    plain_params = (ds._quant.qtype, float(ds._quant.scale), float(ds._quant.offset))

    ds.drop_quantization()
    n = ds.quantize(checkpoint=str(tmp_path / "ck"))
    assert n == len(data)
    np.testing.assert_array_equal(np.asarray(ds._quant.codes), plain)
    assert (
        ds._quant.qtype, float(ds._quant.scale), float(ds._quant.offset)
    ) == plain_params
    # progress marker reached the end
    import json as _json

    meta = _json.load(open(tmp_path / "ck" / "quant_checkpoint.json"))
    assert meta["done"] == -(-len(data) // max(1, (16 * 64) // 16))


def test_quantize_checkpoint_resumes_after_crash(tmp_path, rng, monkeypatch):
    import sqlite_vector_tpu.dataset as dsmod
    from sqlite_vector_tpu import oracle

    monkeypatch.setattr(dsmod, "HOST_CHUNK_ELEMS", 16 * 64)  # 64-row chunks
    ds, data = _host_ds(rng)
    ck = str(tmp_path / "ck")

    calls = {"n": 0}
    real = oracle.quantize_fast

    def dying(*a, **kw):
        if calls["n"] >= 3:
            raise RuntimeError("simulated crash mid-build")
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(oracle, "quantize_fast", dying)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ds.quantize(checkpoint=ck)
    assert ds._quant is None  # the failed build published nothing

    # resume with a healthy pipeline: only the REMAINING chunks run
    calls2 = {"n": 0}

    def counting(*a, **kw):
        calls2["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(oracle, "quantize_fast", counting)
    n = ds.quantize(checkpoint=ck)
    assert n == len(data)
    total_chunks = -(-len(data) // 64)
    assert calls2["n"] == total_chunks - 3  # resumed, not restarted

    # results identical to a from-scratch build
    monkeypatch.setattr(oracle, "quantize_fast", real)
    got = np.asarray(ds._quant.codes).copy()
    ds.drop_quantization()
    ds.quantize()
    np.testing.assert_array_equal(got, np.asarray(ds._quant.codes))

    # a finished checkpoint re-loads without re-quantizing any chunk
    calls3 = {"n": 0}

    def never(*a, **kw):  # pragma: no cover - would fail the assert below
        calls3["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(oracle, "quantize_fast", never)
    ds.quantize(checkpoint=ck)
    assert calls3["n"] == 0
    np.testing.assert_array_equal(np.asarray(ds._quant.codes), got)


def test_quantize_checkpoint_mismatch_restarts(tmp_path, rng, monkeypatch):
    import sqlite_vector_tpu.dataset as dsmod

    monkeypatch.setattr(dsmod, "HOST_CHUNK_ELEMS", 16 * 64)
    ds, data = _host_ds(rng)
    ck = str(tmp_path / "ck")
    ds.quantize(checkpoint=ck)

    # a GROWN dataset invalidates the checkpoint (count mismatch) — the
    # build restarts cleanly instead of serving a half-sized memmap
    ds.add((rng.standard_normal((64, 16)) * 5).astype(np.float32))
    n = ds.quantize(checkpoint=ck)
    assert n == len(data) + 64
    got = np.asarray(ds._quant.codes).copy()
    assert got.shape[0] == n
    # identical to a from-scratch (non-checkpointed) build of the grown set
    ds.drop_quantization()
    ds.quantize()
    np.testing.assert_array_equal(got, np.asarray(ds._quant.codes))


def test_quantize_checkpoint_rebuild_preserves_old_snapshot(
    tmp_path, rng, monkeypatch
):
    """A fresh checkpointed rebuild must not truncate the qcodes.npy inode a
    previous _QuantState still maps: the lock-free search contract lets an
    in-flight query keep reading the OLD codes mid-rebuild. Pre-fix,
    open_memmap(mode='w+') truncated the mapped file in place — torn codes,
    or SIGBUS when the live row count shrank."""
    import sqlite_vector_tpu.dataset as dsmod

    monkeypatch.setattr(dsmod, "HOST_CHUNK_ELEMS", 16 * 64)
    ds, data = _host_ds(rng)
    ck = str(tmp_path / "ck")
    ds.quantize(checkpoint=ck)
    old_state = ds._quant
    old_copy = np.asarray(old_state.codes).copy()

    # shrink the live set AND shift the quant range so the rebuild writes
    # different bytes (and a smaller file) at the same path
    ds.remove(ds.ids[:8])
    ds.update(ds.ids[0], (data[8] * 10).astype(np.float32))
    ds.quantize(checkpoint=ck)
    assert ds._quant.count == len(data) - 8

    # the old snapshot's mapping still reads exactly what it read before
    np.testing.assert_array_equal(np.asarray(old_state.codes), old_copy)


def test_quantize_checkpoint_detects_same_count_mutations(
    tmp_path, rng, monkeypatch
):
    """Counts alone cannot prove the rows are unchanged: update() keeps
    every count identical, and add()+remove() can net out. Pre-fix the
    loader matched on count/live_count/dim/chunk_rows only, so a FINISHED
    checkpoint of the OLD rows was resumed verbatim and served wrong codes
    (fuzz seed 2202: returned ids at oracle distance 210.77 past a 0.0
    boundary). The mutation-regenerated data token must invalidate it."""
    import sqlite_vector_tpu as svt
    import sqlite_vector_tpu.dataset as dsmod
    from sqlite_vector_tpu import oracle

    monkeypatch.setattr(dsmod, "HOST_CHUNK_ELEMS", 16 * 64)
    ds, data = _host_ds(rng)
    ck = str(tmp_path / "ck")
    ds.quantize(checkpoint=ck)

    # (a) update(): same count, same live count — codes MUST rebuild
    new_row = (data[0] * 50).astype(np.float32)  # widens the quant range
    ds.update(ds.ids[0], new_row)
    ds.quantize(checkpoint=ck)
    want = oracle.quantize(
        new_row[None], ds._quant.scale, ds._quant.offset, ds._quant.qtype
    )[0]
    pos = int(np.flatnonzero(ds._quant.ids == int(ds.ids[0]))[0])
    np.testing.assert_array_equal(np.asarray(ds._quant.codes)[pos], want)

    # (b) add + remove netting to identical counts — also a rebuild
    kept_id = int(ds.ids[1])
    ds.remove([kept_id])
    added = (rng.standard_normal((1, 16)) * 5).astype(np.float32)
    (new_id,) = ds.add(added)
    ds.quantize(checkpoint=ck)
    assert int(new_id) in set(int(i) for i in ds._quant.ids)
    assert kept_id not in set(int(i) for i in ds._quant.ids)
    got = np.asarray(
        ds._quant.codes[
            int(np.flatnonzero(ds._quant.ids == int(new_id))[0])
        ]
    )
    np.testing.assert_array_equal(
        got,
        oracle.quantize(
            added, ds._quant.scale, ds._quant.offset, ds._quant.qtype
        )[0],
    )

    # (c) the legitimate cache is preserved: a save/load round trip of the
    # SAME rows still resumes the finished checkpoint without re-quantizing
    d = str(tmp_path / "rt")
    ds.save(d)
    ds2 = svt.Dataset.load(d, storage="host", mmap=True)
    calls = {"n": 0}
    real = oracle.quantize_fast

    def counting(*a, **kw):  # pragma: no cover - a call fails the assert
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(oracle, "quantize_fast", counting)
    ck2 = str(tmp_path / "ck2")
    monkeypatch.setattr(oracle, "quantize_fast", real)
    ds2.quantize(checkpoint=ck2)  # build once on the loaded rows
    ds3 = svt.Dataset.load(d, storage="host", mmap=True)
    monkeypatch.setattr(oracle, "quantize_fast", counting)
    ds3.quantize(checkpoint=ck2)
    assert calls["n"] == 0  # resumed: same data token across save/load
    np.testing.assert_array_equal(
        np.asarray(ds3._quant.codes), np.asarray(ds2._quant.codes)
    )


def test_resolve_params_nonfinite_match_oracle():
    """Non-finite-only inputs: the device minmax + resolve_quant_params must
    produce the oracle's (C-init-clamped) params, never a NaN scale — a NaN
    scale persisted into _QuantState poisons every later quantized query."""
    cases = [
        np.full((3, 4), np.inf, np.float32),
        np.full((3, 4), -np.inf, np.float32),
        np.full((3, 4), np.nan, np.float32),
    ]
    for v in cases:
        for qt in (QuantType.AUTO, QuantType.U8, QuantType.I8):
            mn, mx, neg = minmax_and_negative(v)
            got = resolve_quant_params(float(mn), float(mx), bool(neg), qt)
            want = oracle.compute_quant_params(v, qt)
            assert got[0] is want[0], (v[0, 0], qt)
            np.testing.assert_array_equal(got[1], want[1], err_msg=f"{v[0,0]} {qt}")
            np.testing.assert_array_equal(got[2], want[2], err_msg=f"{v[0,0]} {qt}")
            assert np.isfinite(got[1])  # scale is never NaN/Inf
