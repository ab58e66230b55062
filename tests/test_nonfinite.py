"""Device-path non-finite input parity (NaN / Inf policies).

The reference's scalar kernels have per-dtype non-finite policies
(src/distance-cpu.c:164-197, 318-356, 414-468) that round 1 reproduced only
in the numpy oracle. These tests pin the DEVICE path (XLA scan + policy
kernels) to the oracle on every metric x float dtype:

  - f32: plain math — a non-finite element yields a NaN/Inf distance and
    the row is never returned (the k-slot loop's strict `<`,
    src/sqlite-vector.c:2102-2106).
  - f16 AND bf16 (all metrics): lane-skip / LASSQ / Inf-mismatch policies —
    rows with NaN lanes ARE returned, with the NaN lanes skipped. For bf16
    dot/l1/cosine the reference's own backends disagree (scalar/NEON plain
    math vs SSE2/AVX2 lane-skip); we pin to the x86 SIMD behavior — see
    STATUS.md "reference backend inconsistencies".
"""

import numpy as np
import pytest

import sqlite_vector_tpu as svt
from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.types import DistanceMetric, VectorType

METRICS = list(DistanceMetric)
FLOAT_TYPES = [VectorType.F32, VectorType.F16, VectorType.BF16]

DIM = 32


def _special_base(rng, vtype):
    """Random rows plus one of each non-finite pattern."""
    base = rng.standard_normal((40, DIM)).astype(np.float32)
    base[3, 7] = np.nan            # single NaN lane
    base[5, :] = np.nan            # all-NaN row
    base[8, 2] = np.inf            # unmatched +Inf lane
    base[11, 4] = -np.inf          # unmatched -Inf lane
    base[14, :] = 0.0              # zero row (cosine zero-norm -> 1.0)
    return base.astype(vtype.np_dtype)


def _expected(q, base_typed, metric, vtype, k):
    """Oracle semantics + the reference's top-k exclusion rules: NaN and
    +Inf distances are never selected (strict `<` against INFINITY slots)."""
    d = np.asarray(
        oracle.distance(q.astype(vtype.np_dtype), base_typed, metric, vtype),
        np.float64,
    )
    d = np.where(np.isnan(d), np.inf, d)
    order = np.argsort(d, kind="stable")[:k]
    vals = d[order]
    keep = ~np.isinf(vals) | (vals < 0)  # -inf is a real (best) distance
    return order[keep], oracle.snap_zero(vals[keep].astype(np.float32))


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("vtype", FLOAT_TYPES)
def test_nonfinite_base_matches_oracle(metric, vtype, rng):
    base = _special_base(rng, vtype)
    ds = svt.Dataset(
        "nf",
        svt.parse_options(
            f"dimension={DIM},type={vtype.value},distance={metric.value}"
        ),
    )
    ids = ds.add(base)
    assert ds._has_nonfinite
    q = rng.standard_normal(DIM).astype(np.float32)

    got_ids, got_vals = ds.search(q, 40)
    exp_idx, exp_vals = _expected(q, base, metric, vtype, 40)

    assert got_ids.tolist() == [int(ids[i]) for i in exp_idx], (
        f"{metric} {vtype}: neighbor set mismatch"
    )
    # f32 accumulation vs the oracle's f64: small tolerance
    finite = np.isfinite(exp_vals)
    np.testing.assert_allclose(
        got_vals[finite], exp_vals[finite], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_array_equal(got_vals[~finite], exp_vals[~finite])


@pytest.mark.parametrize("vtype", [VectorType.F16, VectorType.BF16])
def test_nan_lane_skipped_not_poisoned(vtype, rng):
    """A single NaN lane must NOT exclude the row for lane-skip dtypes: the
    reference computes the distance over the remaining lanes."""
    base = rng.standard_normal((20, DIM)).astype(vtype.np_dtype)
    ds = svt.Dataset(
        "skip", svt.parse_options(f"dimension={DIM},type={vtype.value}")
    )
    arr = np.asarray(base, vtype.np_dtype).copy()
    arr[7, 0] = np.nan
    ids = ds.add(arr)
    # query q = row 7 (finite part): NaN lane contributes 0 -> distance 0
    q = np.asarray(arr[7].astype(np.float32))
    q[0] = float(arr[7].astype(np.float32)[1])  # any finite value
    q = np.where(np.isnan(q), 0.0, q).astype(np.float32)
    q[0] = 0.0
    got_ids, got_vals = ds.search(arr[7].astype(np.float32) * 0 + q, 1)
    # row 7's distance skips lane 0 entirely: sum over lanes 1.. of (q-b)^2
    b = arr[7].astype(np.float32)
    expect = float(np.sqrt(np.sum((q[1:] - b[1:]) ** 2)))
    assert int(ids[7]) in ds.search(q, 20)[0].tolist()
    d7 = ds.distances(q)[7]
    np.testing.assert_allclose(d7, expect, rtol=1e-3, atol=1e-3)


def test_f32_nan_row_excluded(rng):
    """f32 plain math: NaN rows are never returned (reference strict `<`)."""
    base = rng.standard_normal((30, DIM)).astype(np.float32)
    base[4, 9] = np.nan
    ds = svt.Dataset("f32nan", svt.parse_options(f"dimension={DIM},type=FLOAT32"))
    ids = ds.add(base)
    got_ids, got_vals = ds.search(base[10], 30)
    assert int(ids[4]) not in got_ids.tolist()
    assert len(got_ids) == 29 and np.isfinite(got_vals).all()
    # raw streaming distances keep the NaN (the *_stream vtab emits raw)
    d = ds.distances(base[10])
    assert np.isnan(d[4])


def test_nonfinite_query_routes_policy(rng):
    """A non-finite QUERY against a clean f16 dataset also takes the policy
    path (lane skipped, not poisoned)."""
    base = rng.standard_normal((25, DIM)).astype(np.float16)
    ds = svt.Dataset("qnan", svt.parse_options(f"dimension={DIM},type=FLOAT16"))
    ids = ds.add(base)
    assert not ds._has_nonfinite
    q = base[12].astype(np.float32).copy()
    q[3] = np.nan
    got_ids, got_vals = ds.search(q, 1)
    assert got_ids[0] == ids[12]
    b = base[12].astype(np.float32)
    mask = np.ones(DIM, bool)
    mask[3] = False
    expect = float(np.sqrt(np.sum((q[mask] - b[mask]) ** 2)))
    np.testing.assert_allclose(got_vals[0], expect, rtol=1e-3, atol=1e-3)


def test_matched_inf_lanes_contribute_zero(rng):
    """LASSQ: matched same-sign Inf lanes are skipped; unmatched -> +Inf
    (row excluded)."""
    base = rng.standard_normal((10, DIM)).astype(np.float16)
    base[2, 5] = np.inf
    base[3, 5] = -np.inf
    ds = svt.Dataset("inf", svt.parse_options(f"dimension={DIM},type=FLOAT16"))
    ids = ds.add(base)
    q = base[2].astype(np.float32)  # q[5] = +inf: matches row 2, not row 3
    got_ids, got_vals = ds.search(q, 10)
    assert got_ids[0] == ids[2] and got_vals[0] == 0.0  # matched inf skipped
    assert int(ids[3]) not in got_ids.tolist()  # unmatched inf -> +Inf -> out


def test_f16_dot_inf_short_circuit(rng):
    """f16 DOT: an infinite product returns -Inf of its sign — a +Inf
    product row is the BEST hit (distance -inf)."""
    base = rng.standard_normal((12, DIM)).astype(np.float16)
    base[6, 0] = np.inf
    ds = svt.Dataset(
        "dotinf",
        svt.parse_options(f"dimension={DIM},type=FLOAT16,distance=DOT"),
    )
    ids = ds.add(base)
    q = np.zeros(DIM, np.float32)
    q[0] = 1.0  # product with row 6 lane 0 = +inf -> distance -inf
    got_ids, got_vals = ds.search(q, 3)
    assert got_ids[0] == ids[6] and got_vals[0] == -np.inf


def test_nonfinite_flag_persistence(tmp_path, rng):
    base = rng.standard_normal((20, DIM)).astype(np.float16)
    base[1, 1] = np.nan
    ds = svt.Dataset("p", svt.parse_options(f"dimension={DIM},type=FLOAT16"))
    ds.add(base)
    d = str(tmp_path / "nf")
    ds.save(d)
    ds2 = svt.Dataset.load(d)
    assert ds2._has_nonfinite
    ds3 = svt.Dataset.load(d, storage="host", mmap=True)
    assert ds3._has_nonfinite  # restored from the manifest (no add() scan)


def test_host_streaming_policy(rng):
    """storage='host' threads the policy through the streaming scan."""
    base = rng.standard_normal((5000, DIM)).astype(np.float16)
    base[100, 3] = np.nan
    ds = svt.Dataset(
        "hs", svt.parse_options(f"dimension={DIM},type=FLOAT16"), storage="host"
    )
    ids = ds.add(base)
    q = base[100].astype(np.float32)
    q[3] = 0.0
    got_ids, _ = ds.search(q, 5)
    assert int(ids[100]) in got_ids.tolist()  # lane skipped, row served


def test_mesh_sharded_policy(rng):
    """mesh-sharded search threads the policy through shard_map."""
    from sqlite_vector_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    base = rng.standard_normal((400, DIM)).astype(np.float16)
    base[33, 2] = np.nan
    ds = svt.Dataset(
        "ms", svt.parse_options(f"dimension={DIM},type=FLOAT16"), mesh=mesh
    )
    ids = ds.add(base)
    q = base[33].astype(np.float32)
    q[2] = 0.0
    got_ids, _ = ds.search(q, 5)
    assert int(ids[33]) in got_ids.tolist()


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("vtype", FLOAT_TYPES)
def test_policy_row_tiling_matches_untiled(metric, vtype, rng, monkeypatch):
    """The internal POLICY_ROW_TILE bound (which keeps the [B, tile, d]
    policy cube off HBM at 10M rows) must be value-identical to the untiled
    evaluation, including a ragged tail tile and non-finite special rows."""
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops import nonfinite

    base = _special_base(rng, vtype)  # 40 rows incl. every special pattern
    q = rng.standard_normal((3, DIM)).astype(np.float32)
    q[1, 7] = np.nan
    qj = jnp.asarray(q)
    bj = jnp.asarray(base.astype(np.float32))

    want = np.asarray(nonfinite._policy_impl(qj, bj, metric, vtype, None))
    monkeypatch.setattr(nonfinite, "POLICY_ROW_TILE", 16)  # 40 -> 3 tiles, ragged
    got = np.asarray(nonfinite.policy_pairwise(qj, bj, metric, vtype))
    # XLA may reassociate the d-axis reduction differently per tile shape;
    # non-finite positions (the policy outputs under test) match exactly
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_policy_row_tiling_sharded(rng, monkeypatch):
    """Row tiling inside the SHARDED policy kernel: collectives stay in
    lockstep across scan steps, results match the unsharded evaluation."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from sqlite_vector_tpu.ops import nonfinite
    from sqlite_vector_tpu.parallel import make_mesh
    from sqlite_vector_tpu.parallel.ops import _shard_map

    mesh = make_mesh(4, axis_name="dim")  # 1-D mesh used as a dim axis
    base = _special_base(rng, VectorType.F16).astype(np.float32)
    q = rng.standard_normal((2, DIM)).astype(np.float32)
    q[0, 3] = np.inf
    qj, bj = jnp.asarray(q), jnp.asarray(base)

    monkeypatch.setattr(nonfinite, "POLICY_ROW_TILE", 16)
    for metric in METRICS:
        want = np.asarray(
            nonfinite._policy_impl(qj, bj, metric, VectorType.F16, None)
        )

        def body(qq, bb, m=metric):
            return nonfinite.policy_pairwise_sharded(
                qq, bb, m, VectorType.F16, dim_axis="dim"
            )

        got = np.asarray(
            _shard_map(
                body,
                mesh=mesh,
                in_specs=(P(None, "dim"), P(None, "dim")),
                out_specs=P(None, None),
            )(qj, bj)
        )
        # local-sum + psum reassociates the f32 accumulation; non-finite
        # positions (the policy outputs under test) still match exactly
        np.testing.assert_allclose(
            got, want, rtol=1e-5, atol=1e-6, err_msg=str(metric)
        )


@pytest.mark.parametrize("metric", ["L2", "SQUARED_L2"])
def test_f32_stream_raw_values_match_reference_semantics(metric, rng):
    """The streaming vtabs expose RAW distances. For f32 L2/SQUARED_L2 the
    matmul decomposition yields NaN on Inf rows (inf - inf) where the
    reference's direct sum((a-b)^2) emits +Inf — Dataset.distances must
    route through the direct kernel and match the oracle value-for-value
    (src/distance-cpu.c:39-74)."""
    base = rng.standard_normal((64, DIM)).astype(np.float32)
    base[8, 2] = np.inf       # unmatched Inf lane -> +Inf distance
    base[11, 4] = -np.inf
    base[3, 7] = np.nan       # NaN propagates -> NaN distance
    m = DistanceMetric.from_name(metric)
    ds = svt.Dataset(
        "raw", svt.parse_options(f"dimension={DIM},type=FLOAT32,distance={metric}")
    )
    ds.add(base)
    q = rng.standard_normal(DIM).astype(np.float32)
    got = ds.distances(q)
    want = oracle.snap_zero(
        oracle.distance(q[None], base, m, VectorType.F32)[0]
    )
    assert np.isposinf(got[8]) and np.isposinf(got[11])
    assert np.isnan(got[3])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    # host-storage path takes the same policy routing
    ds2 = svt.Dataset(
        "raw2",
        svt.parse_options(f"dimension={DIM},type=FLOAT32,distance={metric}"),
        storage="host",
    )
    ds2.add(base)
    got2 = ds2.distances(q)
    assert np.isposinf(got2[8]) and np.isnan(got2[3])


def test_cosine_zero_norm_beats_nan(rng):
    """Precedence pin (reference/oracle: zero-norm -> 1.0 is applied LAST,
    src/distance-cpu.c:105-109): a zero-norm side yields 1.0 even when the
    OTHER side contains NaN; NaN vs nonzero-norm stays NaN (row excluded)."""
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.distance import pairwise_distance
    from sqlite_vector_tpu.ops.rerank import candidate_distances

    zq = np.zeros((1, 4), np.float32)
    nanrow = np.array([[1.0, np.nan, 2.0, 3.0]], np.float32)
    for fn, args in (
        (pairwise_distance, (jnp.asarray(zq), jnp.asarray(nanrow))),
        (pairwise_distance, (jnp.asarray(nanrow), jnp.asarray(zq))),
        (candidate_distances, (jnp.asarray(zq), jnp.asarray(nanrow[None]))),
    ):
        got = np.asarray(fn(*args, DistanceMetric.COSINE))
        assert got.ravel()[0] == 1.0, (fn.__name__, got)
    got = np.asarray(
        pairwise_distance(
            jnp.asarray(nanrow), jnp.asarray(nanrow + 1), DistanceMetric.COSINE
        )
    )
    assert np.isnan(got[0, 0])
    # end-to-end: a zero-norm row ranks at 1.0 for a NaN-bearing query
    ds = svt.Dataset(
        "zn", svt.parse_options("dimension=4,type=FLOAT32,distance=COSINE")
    )
    ids = ds.add(np.concatenate([np.zeros((1, 4), np.float32),
                                 rng.standard_normal((20, 4)).astype(np.float32)]))
    d = ds.distances(nanrow[0])
    assert d[0] == 1.0 and np.isnan(d[1:]).all()


def test_rerank_policy_dtype_falls_back_to_exact(rng):
    """f16 lane-skip data: rerank must return the policy-true neighbor set
    (it routes to exact), not a plain-math set that drops NaN-lane rows."""
    ds = svt.Dataset(
        "rrp", svt.parse_options("dimension=8,type=FLOAT16,distance=L2")
    )
    base = rng.standard_normal((64, 8)).astype(np.float16)
    base[5, 3] = np.nan  # lane-skipped row, still rankable
    ids = ds.add(base)
    ds.quantize()
    q = base[5].copy()
    q[3] = 1.0
    e_ids, e_vals = ds.search(q, 5)
    r_ids, r_vals = ds.search(q, 5, mode="rerank")
    assert r_ids.tolist() == e_ids.tolist()
    np.testing.assert_allclose(r_vals, e_vals, rtol=1e-3)
    assert ids[5] in r_ids  # the NaN-lane row is served, not dropped


def test_policy_outputs_are_nearly_zero_snapped(rng):
    """The C scan/stream loops snap EVERY emitted distance (:1927, :2099,
    :2217) — policy-kernel results included. A tiny DOT distance must come
    back exactly 0.0 through both policy wrappers, while NaN/Inf pass."""
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops import nonfinite
    from sqlite_vector_tpu.parallel import make_mesh
    from sqlite_vector_tpu.parallel.ops import _shard_map

    d = 8
    q = np.zeros((1, d), np.float32)
    q[0, 0] = 1.0
    rows = np.zeros((3, d), np.float32)
    rows[0, 0] = 4e-7          # dot 4e-7 -> raw -4e-7 -> snapped 0.0
    rows[1, 1] = np.nan        # NaN lane: policy skips it -> -0.0 dot
    rows[2, 0] = np.inf        # infinite product short-circuit -> -inf
    out = np.asarray(nonfinite.policy_pairwise(
        jnp.asarray(q), jnp.asarray(rows), DistanceMetric.DOT,
        VectorType.F16,
    ))
    assert out[0, 0] == 0.0
    assert out[0, 1] == 0.0
    assert np.isneginf(out[0, 2])

    mesh = make_mesh(4, axis_name="dim")
    from jax.sharding import PartitionSpec as P

    fn = _shard_map(
        lambda qq, bb: nonfinite.policy_pairwise_sharded(
            qq, bb, DistanceMetric.DOT, VectorType.F16, dim_axis="dim"
        ),
        mesh=mesh,
        in_specs=(P(None, "dim"), P(None, "dim")),
        out_specs=P(None, None),
    )
    out2 = np.asarray(fn(jnp.asarray(q), jnp.asarray(rows)))
    np.testing.assert_array_equal(out2, out)
