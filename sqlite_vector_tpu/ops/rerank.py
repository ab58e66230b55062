"""Two-stage mixed-precision search: int8 prefilter + exact rescoring.

A capability beyond the reference (which offers only full-precision scans or
integer-domain quantized scans): stage 1 scans the int8 codes — 4x less HBM
traffic than f32 — for the top-(k·expand) candidates; stage 2 gathers just
those candidates' full-precision vectors and rescores them exactly. Results
carry TRUE float distances (unlike the quantized scan's integer-domain
values) at close to int8 scan cost; with expand≈4 the candidate set virtually
always contains the true top-k (the adaptive mixed-precision idea from the
ANNS literature, e.g. ANNS-AMP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sqlite_vector_tpu.ops.distance import (
    FLT_EPSILON,
    NEARLY_ZERO,
    matmul_precision,
)
from sqlite_vector_tpu.ops.scan import fused_scan_topk
from sqlite_vector_tpu.types import DistanceMetric


def candidate_distances(
    q: jnp.ndarray, cand: jnp.ndarray, metric: DistanceMetric
) -> jnp.ndarray:
    """Exact distances between q [B, d] and per-query candidates [B, C, d].

    Shared rescorer for the rerank mode and the Pallas finish
    (ops/pallas_scan._finish_from_minima). Integer inputs use exact int32
    accumulation (the quantized-domain semantics); float L2 applies the same
    residual clamp as the scan paths. L2 is returned SQUARED — callers sqrt
    after their final top-k (monotonic).
    """
    is_int = jnp.issubdtype(cand.dtype, jnp.integer)
    if metric is DistanceMetric.L1:
        acc = jnp.int32 if is_int else jnp.float32
        return jnp.sum(
            jnp.abs(q.astype(acc)[:, None, :] - cand.astype(acc)), axis=-1
        ).astype(jnp.float32)
    if is_int:
        qi = q.astype(jnp.int32)
        ci = cand.astype(jnp.int32)
        dot = jnp.einsum("bd,bcd->bc", qi, ci)  # exact int32
        if metric is DistanceMetric.DOT:
            return (-dot).astype(jnp.float32)
        qsq = jnp.sum(qi * qi, axis=-1, keepdims=True)
        csq = jnp.sum(ci * ci, axis=-1)
        if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
            # intermediate wrap is fine: exact while the final value fits
            # int32 (distance.INT_L2_EXACT_MAX_DIM)
            return (qsq + csq - 2 * dot).astype(jnp.float32)
        qsqf, csqf = qsq.astype(jnp.float32), csq.astype(jnp.float32)
        denom = jnp.sqrt(qsqf) * jnp.sqrt(csqf)
        safe = jnp.where(denom > 0.0, denom, 1.0)
        cos = jnp.where(denom > 0.0, dot.astype(jnp.float32) / safe, 0.0)
        return jnp.where((qsqf == 0.0) | (csqf == 0.0), 1.0, 1.0 - cos)
    qf = q.astype(jnp.float32)
    cf = cand.astype(jnp.float32)
    dot = jnp.einsum("bd,bcd->bc", qf, cf, precision=matmul_precision())
    if metric is DistanceMetric.DOT:
        return -dot
    qsq = jnp.sum(qf * qf, axis=-1, keepdims=True)  # [B, 1]
    csq = jnp.sum(cf * cf, axis=-1)  # [B, C]
    if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
        d = qsq + csq - 2.0 * dot
        # finite-only clamp: Inf rows stay +Inf (excluded), not zeroed
        resid = FLT_EPSILON * 16.0 * (qsq + csq)
        return jnp.where((d <= resid) & jnp.isfinite(resid), 0.0, d)
    denom = jnp.sqrt(qsq) * jnp.sqrt(csq)
    safe = jnp.where(denom > 0.0, denom, 1.0)
    cos = jnp.where(denom > 0.0, dot / safe, 0.0)
    d = jnp.where(jnp.isnan(dot) | jnp.isnan(denom), jnp.nan, 1.0 - cos)
    # zero-norm -> 1.0 LAST (reference/oracle precedence; see distance.py)
    return jnp.where((qsq == 0.0) | (csq == 0.0), 1.0, d)


@functools.partial(jax.jit, static_argnames=("metric", "k", "expand"))
def rerank_topk(
    queries_f: jnp.ndarray,
    base_f: jnp.ndarray,
    queries_q: jnp.ndarray,
    codes: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    *,
    expand: int = 4,
    valid_count: jnp.ndarray | int | None = None,
    codes_sq_norms: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stage-1 int8 scan (top k·expand) + stage-2 exact rescoring (top k).

    Returns (distances [B, k] float32 — exact-metric values, positions
    [B, k]) ascending; unfilled slots +inf / -1."""
    ke = max(k * expand, k)
    _, cand_idx = fused_scan_topk(
        queries_q,
        codes,
        metric,
        ke,
        valid_count=valid_count,
        base_sq_norms=codes_sq_norms,
    )  # [B, ke]
    # ascending ROW order for tie parity with the scan paths (the earliest
    # row wins equal distances, like the reference's strict `<` slot
    # replacement); -1 padding sorts first and is masked to +inf below
    cand_idx = jnp.sort(cand_idx, axis=-1)
    safe_idx = jnp.clip(cand_idx, 0, base_f.shape[0] - 1)
    cand = jnp.take(base_f, safe_idx, axis=0)  # [B, ke, d]
    d = candidate_distances(queries_f, cand, metric)
    # near-zero snap BEFORE ranking (the scan paths snap pre-top-k): a raw
    # 4e-7 must tie with a true 0.0, earliest row winning — without it the
    # rerank backend silently reorders near-duplicate neighbors
    d = jnp.where(jnp.abs(d) <= NEARLY_ZERO, 0.0, d)
    d = jnp.where(jnp.isnan(d), jnp.inf, d)  # NaN rows are never selected
    d = jnp.where(cand_idx >= 0, d, jnp.inf)
    neg, pos = jax.lax.top_k(-d, k)  # ke >= k by construction
    out_vals = -neg
    out_idx = jnp.take_along_axis(cand_idx, pos, axis=-1)
    if metric is DistanceMetric.L2:
        out_vals = jnp.sqrt(out_vals)
    out_vals = jnp.where(
        jnp.abs(out_vals) <= NEARLY_ZERO, jnp.zeros_like(out_vals), out_vals
    )
    out_idx = jnp.where(jnp.isposinf(out_vals), -1, out_idx)
    return out_vals, out_idx.astype(jnp.int32)
