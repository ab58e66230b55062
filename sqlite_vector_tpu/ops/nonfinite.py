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


def policy_pairwise(
    q: jnp.ndarray,
    tile: jnp.ndarray,
    metric: DistanceMetric,
    vtype: VectorType,
) -> jnp.ndarray:
    """[B, N_tile] distances under the reference's non-finite policies.

    Element-wise formulation (the [B, T, d] cube fuses into the reduction);
    callers tile rows to bound the working set. Only called for
    needs_policy() configurations.
    """
    x = q.astype(jnp.float32)[:, None, :]
    y = tile.astype(jnp.float32)[None, :, :]

    if vtype is VectorType.F32 and metric in _LASSQ_METRICS:
        # f32 is PLAIN math, not LASSQ (src/distance-cpu.c:39-74): NaN
        # propagates, an unmatched Inf lane gives +Inf, matched Infs give
        # inf-inf = NaN — the direct sum reproduces all of it
        d = x - y
        s = jnp.sum(d * d, axis=-1)
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
        any_inf = jnp.any(inf_lane & ~matched, axis=-1)
        d = jnp.where(nan_mask | matched, 0.0, d)
        s = jnp.sum(d * d, axis=-1)
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
        any_inf = jnp.any(inf_lane & ~matched & lane_ok, axis=-1)
        s = jnp.sum(d, axis=-1)
        return jnp.where(any_inf, jnp.inf, s)

    if metric is DistanceMetric.DOT:
        p = jnp.where(lane_ok, x * y, 0.0)
        inf_p = jnp.isinf(p)
        s = jnp.sum(jnp.where(inf_p, 0.0, p), axis=-1)
        any_inf = jnp.any(inf_p, axis=-1)
        # the C kernel short-circuits on the first infinite product and
        # returns -Inf of its sign (:414-421); argmax finds that first lane
        first = jnp.take_along_axis(
            p, jnp.argmax(inf_p, axis=-1)[..., None], axis=-1
        )[..., 0]
        first_sign = jnp.where(any_inf, jnp.sign(first), 0.0)
        return jnp.where(any_inf, -first_sign * jnp.inf, -s)

    # COSINE (:431-468): NaN lanes skipped, any Inf lane or non-finite
    # denominator -> 1.0; cosine clamped to [-1, 1]
    any_inf = jnp.any((jnp.isinf(x) | jnp.isinf(y)) & lane_ok, axis=-1)
    xm = jnp.where(lane_ok, x, 0.0)
    ym = jnp.where(lane_ok, y, 0.0)
    dot = jnp.sum(xm * ym, axis=-1)
    nx = jnp.sum(xm * xm, axis=-1)
    ny = jnp.sum(ym * ym, axis=-1)
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
