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
    # batched L1 falls back to XLA BY MEASUREMENT (round 3): the vectorized
    # kernel spilled 372 MB of VMEM registers on real hardware — see the
    # MAX_B_L1 comment in pallas_scan.py
    assert supports(DistanceMetric.L1, np.float32, 384, 20, 32)
    assert not supports(DistanceMetric.L1, np.float32, 384, 20, 64)


def test_l1_batched_unroll_matches_oracle(rng):
    # exercises the multi-row unroll path (B within the MAX_B_L1 cap)
    n, dim, b, k = 1500, 48, 16, 7
    base = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    vals, idx = pallas_scan_topk(q, base, DistanceMetric.L1, k)
    oidx, ovals = _oracle_topk(base, q, DistanceMetric.L1, VectorType.F32, k)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=2e-4, atol=1e-3)


def test_l1_batched_int_codes_exact(rng):
    n, dim, b, k = 900, 32, 12, 5
    codes = rng.integers(-128, 128, (n, dim)).astype(np.int8)
    q = rng.integers(-128, 128, (b, dim)).astype(np.int8)
    vals, idx = pallas_scan_topk(q, codes, DistanceMetric.L1, k)
    ref = oracle.distance(q, codes, DistanceMetric.L1, VectorType.I8)
    for bi in range(b):
        order = np.argsort(ref[bi], kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(idx)[bi], order)
        np.testing.assert_array_equal(np.asarray(vals)[bi], ref[bi][order])


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


def test_cosine_zero_norm_beats_nan_in_kernel(rng):
    """Precedence pin (matches distance.py / the oracle): a whole group of
    NaN rows must not hide a zero-norm query's 1.0 against them; and the
    zero-norm ROW scores 1.0 against a NaN-free query regardless of which
    block it lives in."""
    n, dim = 700, 64
    base = rng.standard_normal((n, dim)).astype(np.float32)
    base[:128] = np.nan  # first group entirely NaN
    q = np.zeros((1, dim), np.float32)  # zero-norm query
    vals, idx = pallas_scan_topk(
        q, base, DistanceMetric.COSINE, 3, valid_count=n
    )
    ovals = oracle.distance(q, base, DistanceMetric.COSINE, VectorType.F32)
    assert ovals[0, 0] == 1.0  # the oracle ranks NaN-row 0 at 1.0
    assert np.asarray(idx)[0, 0] == 0 and np.asarray(vals)[0, 0] == 1.0


def test_near_zero_snap_before_ranking(rng):
    """The XLA path snaps distances within 8*FLT_EPSILON to 0 BEFORE top-k;
    the kernel must match, or routing silently changes the neighbor among
    snap-tied rows (earliest row wins)."""
    n, dim = 600, 32
    base = np.zeros((n, dim), np.float32)
    base[2, 0] = 1e-7  # raw DOT distance -1e-7*q0... craft with DOT:
    q = np.zeros((1, dim), np.float32)
    q[0, 0] = 4.0
    # rows: row 2 has dot 4e-7 -> d=-4e-7 (within snap); row 200 exactly 0
    base[200, :] = 0.0
    vals, idx = pallas_scan_topk(q, base, DistanceMetric.DOT, 1, valid_count=n)
    # all rows snap to 0; the earliest row (0) wins the tie, same as XLA
    from sqlite_vector_tpu.ops.scan import scan_topk

    xvals, xidx = scan_topk(q, base, DistanceMetric.DOT, 1, valid_count=n)
    assert np.asarray(idx)[0, 0] == np.asarray(xidx)[0, 0]
    assert np.asarray(vals)[0, 0] == np.asarray(xvals)[0, 0] == 0.0


@pytest.mark.parametrize("metric", METRICS)
def test_stream_variant_matches_oracle(metric, rng, monkeypatch):
    """The r5 STREAM kernel (queries on lanes, minima streamed to HBM)
    must be rank-identical to the oracle across every metric; L1 silently
    rides the manual kernel (no transposed matmul form)."""
    monkeypatch.setenv("SVT_PALLAS_VARIANT", "stream")
    monkeypatch.setenv("SVT_PALLAS_TILE_ROWS", "256")  # force multi-tile
    n, dim, b, k = 700, 100, 3, 12  # unaligned shapes, 3 row tiles
    base = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((b, dim)).astype(np.float32)
    vals, idx = pallas_scan_topk(queries, base, metric, k, valid_count=n)
    oidx, ovals = _oracle_topk(base, queries, metric, VectorType.F32, k)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("qdtype", [np.int8, np.uint8])
def test_stream_variant_int_codes_exact(qdtype, rng, monkeypatch):
    """Stream kernel on quantized codes: exact int32 distance domain,
    identical to the XLA quantized scan (the reference's vQuantRunMemory
    semantics, src/sqlite-vector.c:2134-2136)."""
    from sqlite_vector_tpu.ops.scan import scan_topk

    monkeypatch.setenv("SVT_PALLAS_VARIANT", "stream")
    monkeypatch.setenv("SVT_PALLAS_TILE_ROWS", "256")
    n, dim, b, k = 600, 64, 5, 10
    lo, hi = (-128, 128) if qdtype is np.int8 else (0, 256)
    base = rng.integers(lo, hi, (n, dim)).astype(qdtype)
    queries = rng.integers(lo, hi, (b, dim)).astype(qdtype)
    for metric in (DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.DOT):
        vals, idx = pallas_scan_topk(queries, base, metric, k, valid_count=n)
        xvals, xidx = scan_topk(queries, base, metric, k, valid_count=n)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(xidx))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(xvals), rtol=1e-6, atol=1e-6
        )


def test_stream_variant_single_tile_and_wide_batch(rng, monkeypatch):
    """Edge cases of the stream kernel's DMA drain: ntiles < nbuf (one
    tile, drain loop handles fewer in-flight copies than slots) and
    b > 128 (two lane vregs of queries)."""
    monkeypatch.setenv("SVT_PALLAS_VARIANT", "stream")
    monkeypatch.setenv("SVT_PALLAS_TILE_ROWS", "256")
    n, dim, k = 200, 32, 5  # one 256-row tile < nbuf=4
    base = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((130, dim)).astype(np.float32)  # b_lane=256
    vals, idx = pallas_scan_topk(
        queries, base, DistanceMetric.L2, k, valid_count=n
    )
    oidx, ovals = _oracle_topk(base, queries, DistanceMetric.L2, VectorType.F32, k)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=2e-4, atol=2e-4)


def test_supports_memory_bounds(monkeypatch):
    """N-dependent gates: huge minima footprints and candidate gathers
    route to the XLA scan instead of overflowing VMEM/HBM. (These bounds
    document the MANUAL variant's envelope — pin it so a forced
    SVT_PALLAS_VARIANT=stream doesn't change the fences under test.)"""
    monkeypatch.setenv("SVT_PALLAS_VARIANT", "manual")
    # B=1024, n=4M: manual minima output alone is 128 MB of VMEM
    assert not supports(DistanceMetric.L2, np.float32, 384, 20, 1024, 4_000_000)
    assert supports(DistanceMetric.L2, np.float32, 384, 20, 64, 1_000_000)
    # b * k*128 * d_pad * 4 = 26 GB candidate gather
    assert not supports(DistanceMetric.L2, np.float32, 768, 256, 256, 4_000_000)


def test_supports_rejects_measured_mosaic_crashes(monkeypatch):
    """The static fence must reject EVERY config in STATUS.md's round-3
    routing table that crashed the Mosaic compiler (VMEM exhaustion,
    "132.40M of 128.00M" — register-allocator spill the analytic minima
    bound does not model), and keep admitting the one that compiled. A
    user forcing SVT_FORCE_PALLAS=1 on a mainstream shape must never get
    a 262 s compile attempt ending in a compiler crash. (The crash table
    is the MANUAL variant's — its VMEM-resident minima are the spill
    term; pin the variant under test.)"""
    monkeypatch.setenv("SVT_PALLAS_VARIANT", "manual")
    # measured envelope: dim 384, k=20, f32 (tools/probe_bn.py, real v5e)
    crash_configs = [
        (256, 1_000_000),  # "Ran out of memory in memory space vmem"
        (64, 4_000_000),
        (256, 4_000_000),
    ]
    for b, n in crash_configs:
        assert not supports(DistanceMetric.L2, np.float32, 384, 20, b, n), (
            f"supports() admits B={b}xN={n}, measured to crash Mosaic"
        )
    # the largest configuration measured to compile stays admitted
    assert supports(DistanceMetric.L2, np.float32, 384, 20, 64, 1_000_000)
    # (the fused-scan router gates SVT_FORCE_PALLAS through this same
    # supports() predicate — ops/scan.py fused_scan_topk — so rejection
    # here IS the routing guarantee)


def test_l2_snap_in_squared_domain(rng):
    """The pre-ranking nearly-zero snap must use NEARLY_ZERO^2 for L2 (the
    kernel carries squared distances until the final sqrt): snapping squared
    values at NEARLY_ZERO zeroed true distances up to ~9.8e-4, changing both
    neighbor identity and reported values vs the XLA path."""
    import jax.numpy as jnp

    d = 8
    q = np.zeros((1, d), np.float32)
    q[0, 0] = 1e-3
    base = rng.standard_normal((200, d)).astype(np.float32)
    base[3] = q[0]
    base[3, 1] = 9.5e-4  # squared distance 9.02e-7 > NEARLY_ZERO^2
    base[124] = q[0]     # exact duplicate: true distance 0
    vals, idx = pallas_scan_topk(
        jnp.asarray(q), jnp.asarray(base), DistanceMetric.L2, 2
    )
    assert int(idx[0, 0]) == 124 and float(vals[0, 0]) == 0.0
    assert int(idx[0, 1]) == 3
    np.testing.assert_allclose(float(vals[0, 1]), 9.5e-4, rtol=1e-3)


def test_int8_float_norm_cache_recomputed(rng):
    """A float32 base_sq_norms cache on an integer-code scan must be
    recomputed, not truncated via astype(int32) (exact-integer contract —
    _pairwise_int has the same guard)."""
    import jax.numpy as jnp

    codes = rng.integers(-128, 128, (300, 24)).astype(np.int8)
    q = rng.integers(-128, 128, (2, 24)).astype(np.int8)
    want_v, want_i = pallas_scan_topk(
        jnp.asarray(q), jnp.asarray(codes), DistanceMetric.L2, 5
    )
    # +1.6 survives an astype(int32) truncation (+1), so a guard-less
    # implementation produces distances off by one integer unit
    bad_norms = jnp.asarray(
        (codes.astype(np.int64) ** 2).sum(-1).astype(np.float32) + 1.6
    )
    got_v, got_i = pallas_scan_topk(
        jnp.asarray(q), jnp.asarray(codes), DistanceMetric.L2, 5,
        base_sq_norms=bad_norms,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
