"""Tie-aware top-k parity assertion (shared test helper).

Replaces blanket overlap slacks (>= K-1 etc.) with the precise contract:
a device top-k result is correct iff it equals the oracle's top-k set up to
substitutions WITHIN the numeric tolerance band around the selection
boundary. With tol=0 this is exact-set-equality modulo true ties (the
reference's strict-< loop makes ties scan-order dependent; sets, not order,
are the invariant).

The tolerance is a justified numeric bound, not slack: the device
accumulates in f32 via the matmul decomposition, the oracle in f32/f64
direct sums — the difference is O(eps * magnitude) at the boundary.
"""

from __future__ import annotations

import numpy as np


def assert_topk_parity(
    ids_all: np.ndarray,
    d_oracle: np.ndarray,
    got_ids: np.ndarray,
    got_vals: np.ndarray,
    k: int,
    *,
    rel_tol: float = 0.0,
    label: str = "",
) -> None:
    """got_ids/got_vals: one query's device result ([k], -1/+inf padded).
    ids_all: dataset row ids aligned with d_oracle ([N] oracle distances).

    Checks:
      1. result count == min(k, #selectable rows)  (NaN/+inf rows excluded)
      2. nothing returned worse than kth_best + tol
      3. everything strictly better than kth_best - tol is returned
      4. each returned distance equals the oracle distance OF THAT ID (tol)
    """
    d = np.asarray(d_oracle, np.float64)
    d = np.where(np.isnan(d), np.inf, d)  # NaN rows are never selected
    order = np.argsort(d, kind="stable")
    selectable = int(np.sum(~np.isposinf(d)))
    kk = min(k, selectable)

    got_ids = np.asarray(got_ids).reshape(-1)
    got_vals = np.asarray(got_vals).reshape(-1)
    valid = got_ids >= 0
    assert valid.sum() == kk, (
        f"{label}: expected {kk} results, got {int(valid.sum())}"
    )
    if kk == 0:
        return
    kth = d[order[kk - 1]]
    # a non-finite boundary (e.g. DOT with an Inf row -> -inf best) admits
    # no numeric slack; rel_tol * inf would be NaN and poison the checks
    tol = rel_tol * max(1.0, abs(kth)) if np.isfinite(kth) else 0.0

    id_to_pos = {int(v): i for i, v in enumerate(np.asarray(ids_all))}
    pos = np.array([id_to_pos[int(i)] for i in got_ids[valid]], np.int64)
    got_d = d[pos]
    # 2: no returned id is worse than the boundary + tol
    worst = got_d.max()
    assert worst <= kth + tol, (
        f"{label}: returned id at oracle distance {worst} > boundary {kth} "
        f"+ tol {tol}"
    )
    # 3: every strictly-better-than-boundary id is present
    must = {
        int(ids_all[i]) for i in order[:kk] if d[i] < kth - tol
    }
    missing = must - set(int(i) for i in got_ids[valid])
    assert not missing, f"{label}: missing clear winners {sorted(missing)}"
    # 4: per-id value parity (snap-zero applied like the engine does)
    gv = got_vals[valid].astype(np.float64)
    ref = np.where(np.abs(got_d) <= 8.0 * 1.1920929e-07, 0.0, got_d)
    finite = np.isfinite(ref)
    np.testing.assert_allclose(
        gv[finite],
        ref[finite],
        rtol=max(rel_tol, 1e-6),
        atol=tol + 1e-7,
        err_msg=f"{label}: distance values diverge from oracle",
    )
    np.testing.assert_array_equal(gv[~finite], ref[~finite])


def expected_int4_distances(q, packed, alpha, csq, metric, dim):
    """Recompute the documented int4 distance composition in numpy (f64
    accumulation — the device path is f32, tolerance covers the gap).

    Shared by test_quantize4 (kernel-level) and test_fuzz_api (through the
    Dataset API): the int4 path has no C-reference ground truth
    (/root/reference stops at 8-bit), so this pinned recomputation of
    ops/quantize4.py's spec IS the oracle."""
    from sqlite_vector_tpu.ops import quantize4 as q4
    from sqlite_vector_tpu.types import DistanceMetric

    qf = np.where(np.isfinite(q), q, 0.0).astype(np.float32)
    codes = q4.unpack4_np(packed, dim).astype(np.float64)
    if metric is DistanceMetric.L1:
        rows = codes * np.asarray(alpha, np.float64)[:, None]
        return np.abs(qf[:, None, :] - rows[None, :, :]).sum(-1)
    # per-query symmetric int8 codes
    am = np.max(np.abs(qf), axis=1)
    with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
        s = np.where(am > 0, np.float32(127.0) / am.astype(np.float32), 0.0)
        v = qf * s[:, None]
        r = v + np.float32(0.5) * (1.0 - 2.0 * (v < 0))
        qc = np.clip(np.trunc(r), -127, 127)
    # denormal-absmax saturation, mirroring quantize_query_int8's nf branch
    qc = np.where(np.isfinite(v), qc, np.where(v > 0, 127.0, np.where(v < 0, -127.0, 0.0)))
    qscale = am.astype(np.float32) / np.float32(127.0)
    dot = qc @ codes.T
    if metric is DistanceMetric.COSINE:
        qcsq = (qc * qc).sum(1)
        denom = (
            np.sqrt(qcsq)[:, None]
            * np.sqrt(np.asarray(csq, np.float64))[None, :]
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom > 0, dot / np.where(denom > 0, denom, 1), 0.0)
        d = 1.0 - cos
        return np.where(
            (qcsq[:, None] == 0) | (np.asarray(csq)[None, :] == 0), 1.0, d
        )
    cross = (qscale[:, None] * np.asarray(alpha, np.float64)[None, :]) * dot
    if metric is DistanceMetric.DOT:
        return -cross
    qsq = (qf.astype(np.float64) ** 2).sum(1)
    bsq = (np.asarray(alpha, np.float64) ** 2) * np.asarray(csq, np.float64)
    d = np.maximum(qsq[:, None] + bsq[None, :] - 2 * cross, 0.0)
    return np.sqrt(d) if metric is DistanceMetric.L2 else d


# justified per-dtype bounds (see module docstring):
#   int codes: exact integer arithmetic on both sides -> 0 (cosine: one f32
#     divide/sqrt each, 1-ulp headroom)
#   f32: HIGHEST-precision products are exact; decomposition residual is
#     O(16 eps (|q|^2+|b|^2)) at the boundary
#   f16/bf16: device accumulates the widened values in f32, the oracle (like
#     the C kernels) in f64: O(dim eps_f32 magnitude)
REL_TOL_BY_TYPE = {
    "FLOAT32": 3e-5,
    "FLOAT16": 2e-3,
    "FLOATB16": 2e-3,
    "UINT8": 1e-6,
    "INT8": 1e-6,
}
