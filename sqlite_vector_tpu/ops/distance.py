"""Batched distance computation (XLA path).

Replaces the reference's dispatch_distance_table of 25 scalar-loop kernels
(src/distance-cpu.c:756-792) with two MXU-friendly formulations:

  float path (f32, f16, bf16 widened to f32):
    L2/SQUARED_L2: ||q||^2 + ||b||^2 - 2 q.b  — the matmul decomposition; the
                   cross term is one [B,d]x[d,N] MXU matmul.
    COSINE:        1 - q.b / (||q|| ||b||), zero-norm rows -> 1.0
                   (reference: src/distance-cpu.c:105-109).
    DOT:           -(q.b)  (reference returns the negated inner product :136).
    L1:            elementwise |q-b| reduction on the VPU (no matmul form).

  integer path (u8/i8): exact int32 arithmetic via dot_general with
    preferred_element_type=int32 (MXU int8 pipeline). Distances are exact
    integers represented in float32 on return, matching the reference's
    integer-domain quantized scan (src/sqlite-vector.c:2121-2236).

All float distances are optionally snapped to zero within 8*FLT_EPSILON,
mirroring nearly_zero_float32 (src/sqlite-vector.c:994-996).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sqlite_vector_tpu.types import DistanceMetric

FLT_EPSILON = 1.1920929e-07
NEARLY_ZERO = 8.0 * FLT_EPSILON


def matmul_precision():
    """MXU precision for f32 distance matmuls.

    The TPU default decomposes f32 matmuls into ONE bf16 pass (~1e-4 relative
    error — breaks exact-neighbor parity and non-zero self-distances), so the
    default here is HIGHEST (6-pass, true f32 products). SVT_PRECISION=high
    selects the 3-pass decomposition: ~2x faster matmul at ~1e-7 relative
    error, still ranking-safe for virtually all datasets.
    """
    import os

    mode = os.environ.get("SVT_PRECISION", "highest").lower()
    if mode == "high":
        return jax.lax.Precision.HIGH
    if mode == "default":
        return None
    return jax.lax.Precision.HIGHEST

# Metrics that have no matmul decomposition and stay on the VPU.
METRIC_IS_FLOAT_ONLY = {DistanceMetric.L1}

# Integer-composition overflow bound: qsq + csq can reach 2*dim*255^2
# (beyond int32 for dim > 16512 with u8 codes), but XLA integer adds wrap
# mod 2^32, and modular arithmetic gives the EXACT result whenever the
# FINAL value fits int32 — i.e. the true ||q-b||^2 <= dim*255^2 < 2^31,
# dim <= 33026 (verified at dim 20000, where intermediates do wrap:
# tests/test_distance.py::test_int_l2_exact_through_intermediate_wrap).
# Past dim ~33k the distance itself no longer fits int32 — the SAME
# domain where the reference's own i32 diff^2 kernels overflow
# (src/distance-cpu.c:470-502), so parity ends there by construction.
INT_L2_EXACT_MAX_DIM = 33026


def _snap(d: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(jnp.abs(d) <= NEARLY_ZERO, jnp.zeros_like(d), d)


def _is_int(x: jnp.ndarray) -> bool:
    return jnp.issubdtype(x.dtype, jnp.integer)


def pairwise_distance(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    *,
    snap: bool = True,
    base_sq_norms: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Compute the [B, N] distance matrix between queries [B,d] and base [N,d].

    `base_sq_norms` ([N] float32 or int32) may be precomputed once per dataset
    to skip the per-scan reduction for L2/COSINE.
    """
    if _is_int(queries) or _is_int(base):
        return _pairwise_int(queries, base, metric, base_sq_norms)
    return _pairwise_float(queries, base, metric, snap, base_sq_norms)


def _pairwise_float(
    q: jnp.ndarray,
    b: jnp.ndarray,
    metric: DistanceMetric,
    snap: bool,
    b_sq: jnp.ndarray | None,
) -> jnp.ndarray:
    # f16/bf16 storage is widened to f32 for accumulation; matmuls keep the
    # narrow input dtype so the MXU can use its native bf16 path, with f32
    # accumulation via preferred_element_type.
    acc = jnp.float32

    if metric is DistanceMetric.L1:
        qf = q.astype(acc)
        bf = b.astype(acc)
        # [B,1,d] - [1,N,d] -> reduce; XLA fuses this without materializing
        # the cube (verified on v5e at the UN-tiled extreme: scan_distances
        # over 1M x 384 at B=8 — a 12 GB cube if materialized — runs fine on
        # a 16 GB chip). Scan callers still chunk N for the top-k pipeline.
        d = jnp.sum(jnp.abs(qf[:, None, :] - bf[None, :, :]), axis=-1)
        return _snap(d) if snap else d

    precision = None if q.dtype == jnp.bfloat16 else matmul_precision()
    dot = jax.lax.dot_general(
        q,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc,
        precision=precision,
    )  # [B, N]

    if metric is DistanceMetric.DOT:
        d = -dot
        return _snap(d) if snap else d

    if b_sq is None:
        bf = b.astype(acc)
        b_sq = jnp.sum(bf * bf, axis=-1)  # [N]
    else:
        b_sq = b_sq.astype(acc)
    qf = q.astype(acc)
    q_sq = jnp.sum(qf * qf, axis=-1)  # [B]
    return compose_float(metric, dot, q_sq, b_sq, snap=snap)


def compose_float(
    metric: DistanceMetric,
    dot: jnp.ndarray,
    q_sq: jnp.ndarray,
    b_sq: jnp.ndarray,
    *,
    snap: bool = True,
) -> jnp.ndarray:
    """Float distances from the dim-separable components (dot [B,N],
    q_sq [B], b_sq [N]) — shared by the single-chip matmul decomposition and
    the 2-D-mesh path, where each component is a psum over dim slices."""
    if metric is DistanceMetric.DOT:
        d = -dot
        return _snap(d) if snap else d
    if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
        d = q_sq[:, None] + b_sq[None, :] - 2.0 * dot
        # The matmul decomposition carries a residual of O(eps * (|q|^2+|b|^2))
        # that the direct sum((a-b)^2) form doesn't have; clamp it so
        # self-distances are exactly 0 like the reference's direct kernels
        # (and its nearly-zero snap, src/sqlite-vector.c:994-996). Only when
        # the residual is finite: an Inf element makes resid=+inf, and the
        # clamp would otherwise zero a distance the reference reports as +Inf.
        resid = FLT_EPSILON * 16.0 * (q_sq[:, None] + b_sq[None, :])
        d = jnp.where((d <= resid) & jnp.isfinite(resid), 0.0, d)
        if metric is DistanceMetric.L2:
            d = jnp.sqrt(d)
        return _snap(d) if snap else d

    # COSINE
    denom = jnp.sqrt(q_sq)[:, None] * jnp.sqrt(b_sq)[None, :]
    cos = jnp.where(denom > 0.0, dot / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    d = 1.0 - cos
    # NaN inputs (NaN norms/dot) must yield NaN like the plain C kernels,
    # not slip through the `denom > 0` comparison as cos=0 -> d=1
    d = jnp.where(jnp.isnan(dot) | jnp.isnan(denom), jnp.nan, d)
    # zero-norm -> 1.0 is applied LAST, matching the reference/oracle
    # precedence (oracle.py, src/distance-cpu.c:105-109): a zero-norm side
    # beats a NaN on the other side (NaN norms fail the ==0 compare and
    # keep the NaN from above)
    d = jnp.where((q_sq[:, None] == 0.0) | (b_sq[None, :] == 0.0), 1.0, d)
    return _snap(d) if snap else d


def partial_components(
    q: jnp.ndarray,
    b: jnp.ndarray,
    metric: DistanceMetric,
    *,
    with_b_sq: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray | None, jnp.ndarray | None]:
    """Per-feature-slice partial sums for the 2-D (rows x dim) mesh scan.

    Every metric is dim-separable: psum'ing these over the dim axis yields
    the exact full-dim components, which compose_float / compose_int turn
    into distances. Returns (main [B,N], q_sq [B]|None, b_sq [N]|None):
      L1:          main = partial sum |q-b|          (no norms)
      DOT:         main = partial dot                (no norms)
      L2/COSINE:   main = partial dot, plus partial squared norms
    Integer inputs produce exact int32 partials.

    with_b_sq=False skips the base-norm pass (an O(N*d/c) HBM read) when
    the caller holds a cached full-dim b_sq — the 2-D-mesh analogue of the
    1-D path's _exact_sq_norms/quant.sq_norms caches.
    """
    if _is_int(q) or _is_int(b):
        if metric is DistanceMetric.L1:
            part = jnp.sum(
                jnp.abs(
                    q.astype(jnp.int32)[:, None, :]
                    - b.astype(jnp.int32)[None, :, :]
                ),
                axis=-1,
            )
            return part, None, None
        dot = jax.lax.dot_general(
            q, b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if metric is DistanceMetric.DOT:
            return dot, None, None
        q_sq = jnp.sum(q.astype(jnp.int32) * q.astype(jnp.int32), axis=-1)
        b_sq = (
            jnp.sum(b.astype(jnp.int32) * b.astype(jnp.int32), axis=-1)
            if with_b_sq
            else None
        )
        return dot, q_sq, b_sq

    acc = jnp.float32
    if metric is DistanceMetric.L1:
        part = jnp.sum(
            jnp.abs(q.astype(acc)[:, None, :] - b.astype(acc)[None, :, :]),
            axis=-1,
        )
        return part, None, None
    precision = None if q.dtype == jnp.bfloat16 else matmul_precision()
    dot = jax.lax.dot_general(
        q, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc,
        precision=precision,
    )
    if metric is DistanceMetric.DOT:
        return dot, None, None
    qf = q.astype(acc)
    q_sq = jnp.sum(qf * qf, axis=-1)
    if not with_b_sq:
        return dot, q_sq, None
    bf = b.astype(acc)
    return dot, q_sq, jnp.sum(bf * bf, axis=-1)


def _pairwise_int(
    q: jnp.ndarray,
    b: jnp.ndarray,
    metric: DistanceMetric,
    b_sq: jnp.ndarray | None,
) -> jnp.ndarray:
    """Exact integer-domain distances for u8/i8 (quantized scan path).

    The reference computes quantized distances directly on the 8-bit codes
    (src/sqlite-vector.c:2134-2136 dispatches to the u8/i8 kernels); values
    are in quantized units. int32 accumulation is exact up to
    INT_L2_EXACT_MAX_DIM (intermediate wrap is harmless — see its note).
    """
    # Use int32-accumulating MXU matmul on the 8-bit codes.
    def idot(x, y):
        return jax.lax.dot_general(
            x,
            y,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    if metric is DistanceMetric.L1:
        d = jnp.sum(
            jnp.abs(q.astype(jnp.int32)[:, None, :] - b.astype(jnp.int32)[None, :, :]),
            axis=-1,
        )
        return d.astype(jnp.float32)

    dot = idot(q, b)  # [B, N] int32

    if metric is DistanceMetric.DOT:
        return (-dot).astype(jnp.float32)

    if b_sq is None or b_sq.dtype != jnp.int32:
        # exact-integer contract: a float32 norm cache is already rounded
        # above 2^24 (u8 norms exceed that near dim ~260) — recompute in
        # int32 rather than silently casting a lossy value
        b_sq = jnp.sum(b.astype(jnp.int32) * b.astype(jnp.int32), axis=-1)
    q_sq = jnp.sum(q.astype(jnp.int32) * q.astype(jnp.int32), axis=-1)
    return compose_int(metric, dot, q_sq, b_sq)


def compose_int(
    metric: DistanceMetric,
    dot: jnp.ndarray,
    q_sq: jnp.ndarray,
    b_sq: jnp.ndarray,
) -> jnp.ndarray:
    """Integer-domain distances from the dim-separable int32 components —
    shared by the single-chip path and the 2-D-mesh psum path."""
    if metric is DistanceMetric.DOT:
        return (-dot).astype(jnp.float32)
    if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
        # intermediates may wrap mod 2^32 for u8 past dim 16512, but the
        # composition is exact while the final value fits int32 — see
        # INT_L2_EXACT_MAX_DIM
        d = q_sq[:, None] + b_sq[None, :] - 2 * dot
        df = d.astype(jnp.float32)
        return jnp.sqrt(df) if metric is DistanceMetric.L2 else df

    # COSINE in integer domain (reference: uint8/int8_distance_cosine_cpu)
    denom = jnp.sqrt(q_sq.astype(jnp.float32))[:, None] * jnp.sqrt(
        b_sq.astype(jnp.float32)
    )[None, :]
    cos = jnp.where(denom > 0.0, dot.astype(jnp.float32) / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    d = 1.0 - cos
    return jnp.where((q_sq[:, None] == 0) | (b_sq[None, :] == 0), 1.0, d)
