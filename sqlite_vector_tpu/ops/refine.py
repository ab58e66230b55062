"""Device-side two-stage search: int4 prefilter + int8-sidecar refine.

VERDICT r4 item 4 / beyond the reference (its approx path is single-stage,
src/sqlite-vector.c:2159-2236): the packed int4 codes and the int8 codes of
the SAME row snapshot both fit one chip where the f32 matrix does not
(10M x 768: 3.84 + 7.68 GB vs 30.7 GB), so an int4 scan can hand its
top-(k*expand) candidates to an on-device int8 rescore with NO host round
trip. Recall lands at ~the int8 scan's level (the refine re-ranks the
candidate set with 8-bit fidelity) while the full-database read stays at
int4's halved bytes; distances come back in the original domain
(dequantized-int8 fidelity), so they compose with user thresholds the same
way mode="quantized"'s int4 values do.

Contrast with ops/rerank.py (mode="rerank"): rerank rescores candidates
against the FULL-PRECISION matrix — exact distances, but the matrix must be
reachable (HBM-resident, or a host gather). Refine needs only the two code
sets, which is exactly the >HBM capacity story.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sqlite_vector_tpu.ops.distance import NEARLY_ZERO
from sqlite_vector_tpu.ops.rerank import candidate_distances
from sqlite_vector_tpu.types import DistanceMetric


@functools.partial(
    jax.jit,
    static_argnames=("metric", "k", "expand", "dim", "has_mask"),
)
def _int4_refine_topk_impl(
    queries_f: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: jnp.ndarray,
    csq: jnp.ndarray,
    codes8: jnp.ndarray,
    scale8: jnp.ndarray,
    offset8: jnp.ndarray,
    valid: jnp.ndarray,
    row_mask: jnp.ndarray,
    *,
    metric: DistanceMetric,
    k: int,
    dim: int,
    expand: int,
    has_mask: bool,
):
    from sqlite_vector_tpu.ops.quantize4 import int4_scan_topk

    ke = max(k * expand, k)
    _, cand_idx = int4_scan_topk(
        queries_f,
        packed,
        alpha,
        csq,
        metric,
        ke,
        dim=dim,
        valid_count=valid,
        row_mask=row_mask if has_mask else None,
    )  # [B, ke] positions into the quantize-time snapshot
    # ascending row order for tie parity with the scan paths (earliest row
    # wins equal distances); -1 padding sorts first, masked to +inf below
    cand_idx = jnp.sort(cand_idx, axis=-1)
    safe_idx = jnp.clip(cand_idx, 0, codes8.shape[0] - 1)
    cand = jnp.take(codes8, safe_idx, axis=0)  # [B, ke, dim] i8/u8
    # dequantize at 8-bit fidelity: x_hat = c / scale + offset (the exact
    # inverse of quantize_device's (x - offset) * scale up to q_round) —
    # [B, ke, dim] f32 is tiny (k*expand rows per query), so the rescore is
    # plain exact f32 math against the original query
    xhat = cand.astype(jnp.float32) / scale8 + offset8
    qf = queries_f.astype(jnp.float32)
    if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
        # direct (q - xhat)^2 sum, not the qsq+csq-2*dot decomposition the
        # scan paths use: at k*expand candidate rows the diff cube is tiny
        # (VPU work, no MXU needed) and the direct form carries NO
        # cancellation error — the decomposition loses ~16*eps*(|q|^2+|x|^2)
        # absolute at near-zero distances (measured 0.5% relative on u8
        # data, r5 fuzz seed 35), which would break refine's
        # "exact at int8 fidelity" contract
        diff = qf[:, None, :] - xhat
        d = jnp.sum(diff * diff, axis=-1)
    else:
        d = candidate_distances(qf, xhat, metric)
    d = jnp.where(jnp.abs(d) <= NEARLY_ZERO, 0.0, d)
    d = jnp.where(jnp.isnan(d), jnp.inf, d)
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


def int4_refine_topk(
    queries_f: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: jnp.ndarray,
    csq: jnp.ndarray,
    codes8: jnp.ndarray,
    scale8,
    offset8,
    metric: DistanceMetric,
    k: int,
    *,
    dim: int,
    expand: int = 4,
    valid_count: jnp.ndarray | int | None = None,
    row_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused int4-prefilter + int8-refine top-k, single device dispatch.

    codes8 rows must be POSITIONALLY ALIGNED with the packed int4 rows
    (both built from one row snapshot — Dataset.quantize(refine=True)
    guarantees this). Returns (distances [B, k] f32 original-domain at
    int8 fidelity, positions [B, k] int32 into the snapshot), ascending,
    +inf/-1 padding. scale8/offset8 are the int8 sidecar's quant params
    (traced, so re-quantizes never recompile)."""
    n = packed.shape[0]
    valid = jnp.asarray(n if valid_count is None else valid_count, jnp.int32)
    return _int4_refine_topk_impl(
        queries_f,
        packed,
        alpha,
        csq,
        codes8,
        jnp.float32(scale8),
        jnp.float32(offset8),
        valid,
        row_mask if row_mask is not None else jnp.zeros((0,), bool),
        metric=metric,
        k=k,
        dim=dim,
        expand=expand,
        has_mask=row_mask is not None,
    )
