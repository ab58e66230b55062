"""Numpy reference oracle for distance kernels and quantization.

This module is the *semantic* ground truth the TPU kernels are tested against.
It mirrors the scalar CPU kernels of the reference (src/distance-cpu.c) and
the quantization pipeline (src/sqlite-vector.c:493-757, 1147-1330):

Per-dtype policies reproduced exactly:
  - f32: plain f32 math; cosine has zero-norm -> 1.0 and NO clamp (:105-109);
    dot returns -dot (:136).
  - f16: L2/squared-L2 use overflow-safe accumulation in f64 with NaN lanes
    contributing 0 and any unmatched +-Inf lane returning +Inf (:318-356);
    dot/l1/cosine skip NaN lanes, computed in f64; cosine clamps to [-1, 1]
    and returns 1.0 on Inf lanes or non-finite denominator (:463-465).
  - bf16: L2 as f16 (LASSQ policy, :164-197). For dot/l1/cosine the
    reference's own backends DISAGREE on non-finite inputs: the scalar and
    NEON kernels are plain math with no NaN skipping (distance-cpu.c:207-310,
    distance-neon.c:297-383), while the SSE2 and AVX2 kernels apply the full
    f16-style lane-skip/Inf policies (distance-avx2.c:434-585,
    distance-sse2.c bf16 L1/DOT). We pin to the SSE2/AVX2 behavior — the
    compiled extension this framework is parity-tested against dispatches
    those on every x86 host — so bf16 uses the same policy family as f16
    (with f64 accumulation, matching the SIMD kernels).
  - u8/i8: integer diff^2 / dot accumulation (:470-693); cosine zero-norm -> 1.0.

Quantization reproduced exactly (integer outputs match bit-for-bit):
  - AUTO -> INT8 iff any value < 0 else UINT8        (:1258-1261)
  - u8: scale = 255/(max-min), offset = min           (:1265-1268)
  - s8: scale = 127/max(|min|,|max|), offset = 0      (:1265-1268)
  - rounding half-away-from-zero with saturation; NaN -> 0, +Inf -> hi,
    -Inf -> lo (q_round_u8/q_round_s8 :495-515)

The oracle is vectorized numpy; accumulation dtypes match the C kernels, but
accumulation *order* may differ (numpy pairwise vs 4x-unrolled sequential).
Parity with the C extension is therefore defined at the neighbor-set level
with float tolerance, per SURVEY.md section 7.
"""

from __future__ import annotations

import numpy as np

from sqlite_vector_tpu.types import DistanceMetric, QuantType, VectorType

FLT_EPSILON = np.float32(1.1920929e-07)


def nearly_zero(d: np.ndarray) -> np.ndarray:
    """The reference's nearly-zero snap (src/sqlite-vector.c:994-996)."""
    return np.abs(d) <= 8.0 * FLT_EPSILON


def snap_zero(d: np.ndarray) -> np.ndarray:
    return np.where(nearly_zero(d), np.zeros_like(d), d)


# ---------------------------------------------------------------------------
# distance kernels
# ---------------------------------------------------------------------------


def distance(
    a: np.ndarray, b: np.ndarray, metric: DistanceMetric, vtype: VectorType
) -> np.ndarray:
    """Compute reference distances.

    a: [dim] or [B, dim] queries; b: [dim] or [N, dim] database vectors.
    Returns float32 distances broadcast over leading axes ([B, N], [N], [B]
    or scalar).
    """
    a = np.asarray(a)
    b = np.asarray(b)
    a2 = np.atleast_2d(a)
    b2 = np.atleast_2d(b)
    if vtype in (VectorType.F32, VectorType.F16, VectorType.BF16):
        out = _distance_float(a2, b2, metric, vtype)
    elif vtype is VectorType.U8:
        out = _distance_u8(a2, b2, metric)
    else:
        out = _distance_i8(a2, b2, metric)
    if a.ndim == 1 and b.ndim == 1:
        return out[0, 0]
    if a.ndim == 1:
        return out[0]
    if b.ndim == 1:
        return out[:, 0]
    return out


def _distance_float(
    a: np.ndarray, b: np.ndarray, metric: DistanceMetric, vtype: VectorType
) -> np.ndarray:
    if vtype is VectorType.F32:
        x = a.astype(np.float32)
        y = b.astype(np.float32)
        xb = x[:, None, :]
        yb = y[None, :, :]
        if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
            d = xb - yb
            s = np.sum(d * d, axis=-1, dtype=np.float32)
            return np.sqrt(s) if metric is DistanceMetric.L2 else s
        if metric is DistanceMetric.L1:
            return np.sum(np.abs(xb - yb), axis=-1, dtype=np.float32)
        dot = np.sum(xb * yb, axis=-1, dtype=np.float32)
        if metric is DistanceMetric.DOT:
            return -dot
        nx = np.sum(x * x, axis=-1, dtype=np.float32)[:, None]
        ny = np.sum(y * y, axis=-1, dtype=np.float32)[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dot / (np.sqrt(nx) * np.sqrt(ny))
        out = np.float32(1.0) - cos
        # zero-norm -> 1.0 (:105-109); no clamp for f32
        return np.where((nx == 0) | (ny == 0), np.float32(1.0), out).astype(np.float32)

    # f16 / bf16: widen first
    xf = a.astype(np.float32)
    yf = b.astype(np.float32)
    xb = xf[:, None, :].astype(np.float64)
    yb = yf[None, :, :].astype(np.float64)

    if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
        # LASSQ policy (f16 :318-356, bf16 :164-197): diff NaN lanes -> 0,
        # any Inf involvement -> +Inf; f64 accumulation.
        with np.errstate(invalid="ignore"):  # inf-inf -> NaN is the policy
            d = xb - yb
        nan_mask = np.isnan(d)
        # f16 path checks Inf on the *inputs*; bf16 checks the diff. Matched
        # same-signed infinities produce d = NaN (skipped) under the f16 rule,
        # and Inf - Inf = NaN under the bf16 rule — identical observable
        # behavior, so we use one rule: unmatched infinities -> +Inf.
        inf_lane = np.isinf(xb) | np.isinf(yb)
        matched = np.isinf(xb) & np.isinf(yb) & (np.sign(xb) == np.sign(yb))
        any_inf = np.any(inf_lane & ~matched, axis=-1)
        d = np.where(nan_mask | matched, 0.0, d)
        s = np.sum(d * d, axis=-1, dtype=np.float64)
        s = np.where(any_inf, np.inf, s)
        out = np.sqrt(s) if metric is DistanceMetric.L2 else s
        return out.astype(np.float32)

    # f16 (:358-468) and bf16 (SSE2/AVX2 kernels — see module docstring):
    # NaN lanes skipped; f64 accumulation
    lane_ok = ~(np.isnan(xb) | np.isnan(yb))
    if metric is DistanceMetric.L1:
        with np.errstate(invalid="ignore"):  # matched infs: inf-inf -> NaN
            d = np.where(lane_ok, np.abs(xb - yb), 0.0)
        inf_lane = np.isinf(xb) | np.isinf(yb)
        matched = np.isinf(xb) & np.isinf(yb) & (np.sign(xb) == np.sign(yb))
        any_inf = np.any(inf_lane & ~matched & lane_ok, axis=-1)
        s = np.sum(d, axis=-1, dtype=np.float64)
        return np.where(any_inf, np.inf, s).astype(np.float32)
    if metric is DistanceMetric.DOT:
        with np.errstate(invalid="ignore"):  # 0*inf in masked lanes
            p = np.where(lane_ok, xb * yb, 0.0)
        # an infinite product short-circuits with flipped sign (:414-421)
        inf_p = np.isinf(p)
        s = np.sum(np.where(inf_p, 0.0, p), axis=-1, dtype=np.float64)
        any_inf = np.any(inf_p, axis=-1)
        # sign of the first infinite product decides; for the oracle any
        # row with an infinite product returns -+Inf of that product
        first_sign = np.where(
            any_inf,
            np.sign(
                np.take_along_axis(
                    p, np.argmax(inf_p, axis=-1)[..., None], axis=-1
                )[..., 0]
            ),
            0.0,
        )
        with np.errstate(invalid="ignore"):  # 0*inf in the dead branch
            out = np.where(any_inf, -first_sign * np.inf, -s)
        return out.astype(np.float32)
    # cosine (:431-468)
    any_inf = np.any((np.isinf(xb) | np.isinf(yb)) & lane_ok, axis=-1)
    xm = np.where(lane_ok, xb, 0.0)
    ym = np.where(lane_ok, yb, 0.0)
    dot = np.sum(xm * ym, axis=-1, dtype=np.float64)
    nx = np.sum(xm * xm, axis=-1, dtype=np.float64)
    ny = np.sum(ym * ym, axis=-1, dtype=np.float64)
    denom = np.sqrt(nx) * np.sqrt(ny)
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.clip(dot / denom, -1.0, 1.0)
    bad = ~(denom > 0) | ~np.isfinite(denom) | ~np.isfinite(dot) | any_inf
    return np.where(bad, 1.0, 1.0 - cos).astype(np.float32)


def _distance_u8(a: np.ndarray, b: np.ndarray, metric: DistanceMetric) -> np.ndarray:
    x = a.astype(np.int64)[:, None, :]
    y = b.astype(np.int64)[None, :, :]
    if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
        d = x - y
        s = np.sum(d * d, axis=-1).astype(np.float32)
        return np.sqrt(s) if metric is DistanceMetric.L2 else s
    if metric is DistanceMetric.L1:
        return np.sum(np.abs(x - y), axis=-1).astype(np.float32)
    dot = np.sum(x * y, axis=-1)
    if metric is DistanceMetric.DOT:
        return (-dot).astype(np.float32)
    nx = np.sum(x * x, axis=-1)
    ny = np.sum(y * y, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = dot.astype(np.float32) / (
            np.sqrt(nx.astype(np.float32)) * np.sqrt(ny.astype(np.float32))
        )
    return np.where((nx == 0) | (ny == 0), np.float32(1.0), np.float32(1.0) - cos).astype(
        np.float32
    )


def _distance_i8(a: np.ndarray, b: np.ndarray, metric: DistanceMetric) -> np.ndarray:
    return _distance_u8(a, b, metric)  # same formulas, signed widening


# ---------------------------------------------------------------------------
# quantization reference
# ---------------------------------------------------------------------------


def q_round_u8(s: np.ndarray) -> np.ndarray:
    """q_round_u8 (src/sqlite-vector.c:495-504): half-away-from-zero, saturate;
    NaN -> 0, +Inf -> 255, -Inf -> 0."""
    s = np.asarray(s, dtype=np.float32)
    nonfinite = ~np.isfinite(s)
    r = s + np.float32(0.5) * (np.float32(1.0) - np.float32(2.0) * (s < 0))
    r = np.where(np.isnan(r), np.float32(0.0), r)
    out = np.clip(np.trunc(r), 0, 255)
    nf_val = np.where(s > 0, np.uint8(255), np.uint8(0))
    return np.where(nonfinite, nf_val, out.astype(np.uint8)).astype(np.uint8)


def q_round_s8(s: np.ndarray) -> np.ndarray:
    """q_round_s8 (src/sqlite-vector.c:506-515)."""
    s = np.asarray(s, dtype=np.float32)
    nonfinite = ~np.isfinite(s)
    r = s + np.float32(0.5) * (np.float32(1.0) - np.float32(2.0) * (s < 0))
    r = np.where(np.isnan(r), np.float32(0.0), r)
    out = np.clip(np.trunc(r), -128, 127)
    nf_val = np.where(s > 0, np.int8(127), np.where(s < 0, np.int8(-128), np.int8(0)))
    return np.where(nonfinite, nf_val, out.astype(np.int8)).astype(np.int8)


def compute_quant_params(
    values: np.ndarray, qtype: QuantType
) -> tuple[QuantType, np.float32, np.float32]:
    """Resolve AUTO and compute (qtype, scale, offset).

    Mirrors src/sqlite-vector.c:1258-1268 exactly:
      AUTO -> S8 iff any value < 0 else U8
      u8: scale = 255/(max-min), offset = min
      s8: scale = 127/max(|min|,|max|), offset = 0
    """
    v = np.asarray(values).astype(np.float32)
    # The C scan (min=FLT_MAX / max=-FLT_MAX init, strict < / >,
    # :1202-1252) skips NaN (compares false) but lets +-Inf propagate INTO
    # max/min — while +Inf can never LOWER min below FLT_MAX. An all-+Inf
    # column therefore yields min=FLT_MAX, max=+inf -> u8 scale 0, offset
    # FLT_MAX, exactly like the C. Only empty / all-NaN inputs resolve to
    # the documented no-rows params (:1173-1178).
    vv = v[~np.isnan(v)] if v.size else v
    if vv.size == 0:
        resolved = QuantType.U8 if qtype is QuantType.AUTO else qtype
        return resolved, np.float32(1.0), np.float32(0.0)
    flt_max = np.float32(np.finfo(np.float32).max)
    min_val = np.float32(min(float(flt_max), float(vv.min())))
    max_val = np.float32(max(float(-flt_max), float(vv.max())))
    contains_negative = bool(np.any(vv < 0))
    if qtype is QuantType.AUTO:
        qtype = QuantType.I8 if contains_negative else QuantType.U8
    abs_max = np.float32(max(abs(float(min_val)), abs(float(max_val))))
    with np.errstate(divide="ignore", invalid="ignore"):
        if qtype is QuantType.U8:
            scale = np.float32(255.0) / (max_val - min_val)
            offset = min_val
        else:
            scale = np.float32(127.0) / abs_max
            offset = np.float32(0.0)
    return qtype, np.float32(scale), np.float32(offset)


def accumulate_quant_stats(
    stats: dict | None, chunk: np.ndarray
) -> dict:
    """Fold one row chunk into the streaming min/max statistics that
    compute_quant_params_chunked maintains. `stats` is a JSON-serializable
    dict {n_notnan, min_val, max_val, neg} (None starts a fresh
    accumulation), so a chunked builder can persist it per chunk in its
    crash-resume checkpoint and derive the final params without a second
    pass over the data (quant_params_from_stats)."""
    if stats is None:
        stats = {
            "n_notnan": 0,
            "min_val": float(np.finfo(np.float32).max),
            "max_val": float(-np.finfo(np.float32).max),
            "neg": False,
        }
    v = np.asarray(chunk).astype(np.float32, copy=False)
    if v.size == 0:
        return stats
    vv = v[~np.isnan(v)]
    stats["n_notnan"] += int(vv.size)
    if vv.size:
        # identical operation order to the in-line accumulation this
        # replaces (np.float32 coercion each step) for bit parity
        stats["min_val"] = float(
            np.float32(min(float(np.float32(stats["min_val"])), float(vv.min())))
        )
        stats["max_val"] = float(
            np.float32(max(float(np.float32(stats["max_val"])), float(vv.max())))
        )
        stats["neg"] = stats["neg"] or bool(np.any(vv < 0))
    return stats


def quant_params_from_stats(
    qtype: QuantType, stats: dict
) -> tuple[QuantType, np.float32, np.float32]:
    """Resolve AUTO and compute (qtype, scale, offset) from accumulated
    streaming statistics — the pass-2 tail of compute_quant_params_chunked
    split out so builders that already stream the data once (the int4 +
    refine-sidecar build) can skip a dedicated params pass."""
    if stats["n_notnan"] == 0:
        # empty / all-NaN: the no-rows params (see compute_quant_params)
        resolved = QuantType.U8 if qtype is QuantType.AUTO else qtype
        return resolved, np.float32(1.0), np.float32(0.0)
    min_val = np.float32(stats["min_val"])
    max_val = np.float32(stats["max_val"])
    if qtype is QuantType.AUTO:
        qtype = QuantType.I8 if stats["neg"] else QuantType.U8
    abs_max = np.float32(max(abs(float(min_val)), abs(float(max_val))))
    with np.errstate(divide="ignore", invalid="ignore"):
        if qtype is QuantType.U8:
            scale = np.float32(255.0) / (max_val - min_val)
            offset = min_val
        else:
            scale = np.float32(127.0) / abs_max
            offset = np.float32(0.0)
    return qtype, np.float32(scale), np.float32(offset)


def compute_quant_params_chunked(
    chunks, qtype: QuantType
) -> tuple[QuantType, np.float32, np.float32]:
    """compute_quant_params over an iterable of row chunks — identical
    results without materializing the full matrix (the streaming pass-1 of
    src/sqlite-vector.c:1210-1255 for >RAM host datasets)."""
    stats = None
    for chunk in chunks:
        stats = accumulate_quant_stats(stats, chunk)
    if stats is None:
        stats = accumulate_quant_stats(None, np.empty((0,), np.float32))
    return quant_params_from_stats(qtype, stats)


def quantize(
    values: np.ndarray,
    scale: np.float32,
    offset: np.float32,
    qtype: QuantType,
) -> np.ndarray:
    """Quantize values with given params (src/sqlite-vector.c:517-757).

    Note: the reference's f32 source path inlines the rounding without the
    finiteness guard (UB for NaN in C); we use the guarded q_round semantics
    for every source dtype. For finite inputs the results are identical.
    """
    with np.errstate(invalid="ignore"):  # non-finite inputs; q_round guards
        s = (
            np.asarray(values, dtype=np.float32) - np.float32(offset)
        ) * np.float32(scale)
    if qtype is QuantType.U8:
        return q_round_u8(s)
    if qtype is QuantType.I8:
        return q_round_s8(s)
    raise ValueError("quantize() requires a resolved qtype (U8 or I8)")


def quantize_fast(
    values: np.ndarray,
    scale: np.float32,
    offset: np.float32,
    qtype: QuantType,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """quantize() specialized for FINITE inputs (bit-identical results; the
    non-finite branches of q_round are unreachable when isfinite(values) —
    callers gate on the dataset's has_nonfinite flag). In-place temporaries:
    ~5 memory passes instead of ~10, which matters for the >RAM host
    quantize (30 GB x passes on one core)."""
    if qtype is QuantType.AUTO:
        # same contract as quantize(): AUTO must be resolved by
        # compute_quant_params first — silently treating it as I8 would
        # produce signed codes for params computed on the unsigned range
        raise ValueError("quantize_fast: resolve QuantType.AUTO first")
    lo, hi = (0.0, 255.0) if qtype is QuantType.U8 else (-128.0, 127.0)
    s = np.asarray(values, dtype=np.float32)
    s = (s - np.float32(offset)) * np.float32(scale)  # one new temp
    # half-away-from-zero: trunc(s + copysign(0.5, s))
    half = np.copysign(np.float32(0.5), s)
    np.add(s, half, out=s)
    np.trunc(s, out=s)
    np.clip(s, lo, hi, out=s)
    if out is None:
        return s.astype(
            np.uint8 if qtype is QuantType.U8 else np.int8
        )
    np.copyto(out, s, casting="unsafe")
    return out


def topk_reference(
    distances: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Reference top-k: ascending distance; ties broken by scan order.

    Mirrors the k-slot max-replace loop (src/sqlite-vector.c:2022-2069): a row
    replaces the current worst slot only on a *strict* improvement, so among
    equal distances the earliest row wins. Slots never filled (k > N) are
    trimmed. Returns (indices, distances) sorted ascending.
    """
    d = np.asarray(distances, dtype=np.float64)
    if d.ndim != 1:
        # trimming makes rows ragged; batched callers loop per row
        raise ValueError("topk_reference takes a 1-D distance vector")
    # NaN never beats the INFINITY slot init (strict <), so NaN rows are
    # never admitted — fold them into the +inf trim below
    d = np.where(np.isnan(d), np.inf, d)
    n = d.shape[-1]
    kk = min(k, n)
    # stable argsort == scan-order tie-break
    order = np.argsort(d, axis=-1, kind="stable")[..., :kk]
    vals = np.take_along_axis(d, order, axis=-1)
    # trim +inf slots (rows whose distance never beat the INFINITY init);
    # -inf (DOT) is a legitimately filled slot
    keep = ~np.isinf(vals) | (vals < 0)
    order, vals = order[keep], vals[keep]
    return order, vals.astype(np.float32)
