"""Device-side non-finite input policies (NaN-lane-skip / Inf-mismatch / LASSQ).

The reference's f16/bf16 kernels do NOT let a NaN element poison a row:
  - f16/bf16 L2 and SQUARED_L2 use the LASSQ overflow-safe accumulation
    where NaN difference lanes contribute 0 and any unmatched +-Inf lane
    makes the distance +Inf (src/distance-cpu.c:164-197, 318-356).
  - f16 DOT/L1/COSINE skip lanes where either input is NaN; an infinite
    product short-circuits DOT with flipped sign; COSINE returns 1.0 on any
    Inf lane or non-finite denominator (src/distance-cpu.c:358-468).
  - f32 (all metrics) is plain float math: a non-finite element yields a
    NaN/Inf distance, which the k-slot loop's strict `<` never selects —
    equivalent to excluding the row, which the scan paths reproduce by
    mapping NaN distances to +Inf before top-k.
  - bf16 DOT/L1/COSINE: the reference's backends DISAGREE (scalar/NEON are
    plain math; SSE2/AVX2 lane-skip like f16). We pin bf16 to the f16
    policy family — uniform semantics, matching the x86 SIMD kernels the
    compiled extension dispatches (see STATUS.md "reference backend
    inconsistencies").

This module is the device implementation of the first two groups, mirroring
`oracle.py` rule for rule with element-wise masks (accumulation in f32 rather
than the C kernels' f64 — the documented accumulation-dtype deviation). It is
a COLD path: datasets flag non-finite content at ingest and searches route
here only when the flag (or the query) is non-finite, so the clean hot path
pays nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sqlite_vector_tpu.types import DistanceMetric, VectorType

# policy-relevant (dtype, metric) pairs; everything else is plain math + the
# NaN->+inf top-k sanitize
_LASSQ_METRICS = (DistanceMetric.L2, DistanceMetric.SQUARED_L2)


def needs_policy(vtype: VectorType, metric: DistanceMetric) -> bool:
    """True when this (dtype, metric) has lane-skip semantics that the plain
    matmul path cannot reproduce (a single NaN would poison the row).

    bf16 uses the same policy family as f16 on every metric: the reference's
    scalar/NEON bf16 dot/l1/cosine kernels are plain math, but its SSE2/AVX2
    kernels lane-skip — we pin to the x86 SIMD behavior the compiled
    extension actually dispatches (see oracle.py module docstring)."""
    return vtype in (VectorType.F16, VectorType.BF16)


def needs_raw_policy(vtype: VectorType, metric: DistanceMetric) -> bool:
    """needs_policy, plus the configurations where only the RAW distance
    value (not the top-k ordering) diverges from the reference: f32
    L2/SQUARED_L2 via the matmul decomposition turns an Inf row into
    qsq + inf - 2*(+-inf) = NaN, where the reference's direct sum((a-b)^2)
    emits +Inf (src/distance-cpu.c:39-74). Top-k paths are unaffected (NaN
    and +Inf are both never selected), but the streaming vtabs expose the
    value itself, so Dataset.distances routes these through the direct
    element-wise kernel."""
    if needs_policy(vtype, metric):
        return True
    return vtype is VectorType.F32 and metric in _LASSQ_METRICS


# Row-tile bound applied INSIDE the policy kernels: the element-wise
# [B, tile, d] cube normally fuses into its reduction, but the DOT policy's
# first-infinite-lane gather can force XLA to materialize it — at 10M x 384
# that is a >14 GB intermediate. Shares ops.scan.L1_ROW_TILE (scan.py only
# imports this module lazily, so the import is cycle-free); callers that
# already tile (fused_scan_topk) hit the single-tile branch unchanged.
from sqlite_vector_tpu.ops.scan import L1_ROW_TILE as POLICY_ROW_TILE


def _row_tiled(fn, q: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Evaluate fn(q, row_tile) -> [B, tile] over row tiles via lax.scan,
    concatenating to [B, N]. The full-tile prefix is a free reshape of the
    input (no padded copy — the point of tiling is to stay memory-bound);
    the ragged tail is one extra direct call. Under shard_map every shard
    has the same row count, so both the tile count and the tail branch
    agree across shards and collectives inside fn stay in lockstep."""
    n, tile_rows = rows.shape[0], POLICY_ROW_TILE
    if n <= tile_rows:
        return fn(q, rows)
    nfull = n // tile_rows
    tiles = rows[: nfull * tile_rows].reshape(nfull, tile_rows, rows.shape[1])

    def body(carry, bt):
        return carry, fn(q, bt)

    _, out = jax.lax.scan(body, jnp.int32(0), tiles)  # [nfull, B, tile]
    full = jnp.moveaxis(out, 0, 1).reshape(q.shape[0], nfull * tile_rows)
    if n == nfull * tile_rows:
        return full
    return jnp.concatenate([full, fn(q, rows[nfull * tile_rows :])], axis=1)


def policy_pairwise(
    q: jnp.ndarray,
    tile: jnp.ndarray,
    metric: DistanceMetric,
    vtype: VectorType,
) -> jnp.ndarray:
    """[B, N_tile] distances under the reference's non-finite policies.

    Element-wise formulation, internally bounded to POLICY_ROW_TILE rows
    per step (see _row_tiled). Only called for needs_policy()
    configurations. Outputs carry the reference's nearly-zero snap: the C
    scan/stream loops apply nearly_zero_float32 to EVERY emitted distance
    (:1927, :2099, :2217), policy-kernel results included — NaN/±Inf pass
    through the snap untouched.
    """
    from sqlite_vector_tpu.ops.distance import _snap

    return _snap(_row_tiled(
        lambda qq, bt: _policy_impl(qq, bt, metric, vtype, dim_axis=None),
        q, tile,
    ))


def policy_pairwise_sharded(
    q: jnp.ndarray,
    tile: jnp.ndarray,
    metric: DistanceMetric,
    vtype: VectorType,
    *,
    dim_axis: str,
) -> jnp.ndarray:
    """policy_pairwise inside a shard_map body on a dim-sharded mesh.

    q [B, d/c] and tile [T, d/c] are the LOCAL feature slices; the result
    is the full-dim [B, T] policy distance, replicated across the dim
    groups. Every policy is dim-separable: lane sums psum over `dim_axis`,
    lane "any" flags reduce as psum(int) > 0, and DOT's first-infinite-
    product short-circuit resolves with a pmin over GLOBAL lane indices
    (zero feature padding is policy-neutral: padding lanes are finite and
    contribute 0 to every sum). Row-tiled like the unsharded variant —
    the 2-D executors pass the whole local row shard. Nearly-zero snapped
    like policy_pairwise."""
    from sqlite_vector_tpu.ops.distance import _snap

    return _snap(_row_tiled(
        lambda qq, bt: _policy_impl(qq, bt, metric, vtype, dim_axis=dim_axis),
        q, tile,
    ))


def _policy_impl(
    q: jnp.ndarray,
    tile: jnp.ndarray,
    metric: DistanceMetric,
    vtype: VectorType,
    dim_axis: str | None,
) -> jnp.ndarray:
    x = q.astype(jnp.float32)[:, None, :]
    y = tile.astype(jnp.float32)[None, :, :]

    def allsum(v):
        # lane sum, then the cross-shard sum (NaN/Inf propagate through
        # psum exactly like through a longer local sum — order-independent
        # for the non-finite cases the policies care about)
        s = jnp.sum(v, axis=-1)
        return jax.lax.psum(s, dim_axis) if dim_axis is not None else s

    def anylane(m):
        a = jnp.any(m, axis=-1)
        if dim_axis is not None:
            a = jax.lax.psum(a.astype(jnp.int32), dim_axis) > 0
        return a

    if vtype is VectorType.F32 and metric in _LASSQ_METRICS:
        # f32 is PLAIN math, not LASSQ (src/distance-cpu.c:39-74): NaN
        # propagates, an unmatched Inf lane gives +Inf, matched Infs give
        # inf-inf = NaN — the direct sum reproduces all of it
        d = x - y
        s = allsum(d * d)
        return jnp.sqrt(s) if metric is DistanceMetric.L2 else s

    if metric in _LASSQ_METRICS:
        # LASSQ (f16 :318-356, bf16 :164-197): NaN diff lanes -> 0, matched
        # same-sign Inf lanes -> 0, any unmatched Inf lane -> +Inf
        d = x - y
        nan_mask = jnp.isnan(d)
        inf_lane = jnp.isinf(x) | jnp.isinf(y)
        matched = (
            jnp.isinf(x) & jnp.isinf(y) & (jnp.sign(x) == jnp.sign(y))
        )
        any_inf = anylane(inf_lane & ~matched)
        d = jnp.where(nan_mask | matched, 0.0, d)
        s = allsum(d * d)
        s = jnp.where(any_inf, jnp.inf, s)
        return jnp.sqrt(s) if metric is DistanceMetric.L2 else s

    # f16 lane-skip family (oracle.py `_distance_float` F16 branch)
    lane_ok = ~(jnp.isnan(x) | jnp.isnan(y))

    if metric is DistanceMetric.L1:
        d = jnp.where(lane_ok, jnp.abs(x - y), 0.0)
        inf_lane = jnp.isinf(x) | jnp.isinf(y)
        matched = (
            jnp.isinf(x) & jnp.isinf(y) & (jnp.sign(x) == jnp.sign(y))
        )
        any_inf = anylane(inf_lane & ~matched & lane_ok)
        s = allsum(d)
        return jnp.where(any_inf, jnp.inf, s)

    if metric is DistanceMetric.DOT:
        p = jnp.where(lane_ok, x * y, 0.0)
        inf_p = jnp.isinf(p)
        s = allsum(jnp.where(inf_p, 0.0, p))
        # the C kernel short-circuits on the FIRST infinite product and
        # returns -Inf of its sign (:414-421); argmax finds that first lane
        # locally, and across dim shards the smallest GLOBAL lane index
        # wins (global index = shard offset + local index; unique per lane)
        any_inf_local = jnp.any(inf_p, axis=-1)
        first_local = jnp.argmax(inf_p, axis=-1)
        first_p = jnp.take_along_axis(
            p, first_local[..., None], axis=-1
        )[..., 0]
        if dim_axis is None:
            any_inf = any_inf_local
            sign = jnp.where(any_inf_local, jnp.sign(first_p), 0.0)
        else:
            big = jnp.int32(2**31 - 1)
            offset = (
                jax.lax.axis_index(dim_axis) * q.shape[-1]
            ).astype(jnp.int32)
            first_global = jnp.where(
                any_inf_local, offset + first_local.astype(jnp.int32), big
            )
            gfirst = jax.lax.pmin(first_global, dim_axis)
            sign = jax.lax.psum(
                jnp.where(
                    any_inf_local & (first_global == gfirst),
                    jnp.sign(first_p),
                    0.0,
                ),
                dim_axis,
            )
            any_inf = gfirst < big
        return jnp.where(any_inf, -sign * jnp.inf, -s)

    # COSINE (:431-468): NaN lanes skipped, any Inf lane or non-finite
    # denominator -> 1.0; cosine clamped to [-1, 1]
    any_inf = anylane((jnp.isinf(x) | jnp.isinf(y)) & lane_ok)
    xm = jnp.where(lane_ok, x, 0.0)
    ym = jnp.where(lane_ok, y, 0.0)
    dot = allsum(xm * ym)
    nx = allsum(xm * xm)
    ny = allsum(ym * ym)
    denom = jnp.sqrt(nx) * jnp.sqrt(ny)
    safe = jnp.where(denom > 0.0, denom, 1.0)
    cos = jnp.clip(dot / safe, -1.0, 1.0)
    bad = (
        ~(denom > 0.0)
        | ~jnp.isfinite(denom)
        | ~jnp.isfinite(dot)
        | any_inf
    )
    return jnp.where(bad, 1.0, 1.0 - cos)
