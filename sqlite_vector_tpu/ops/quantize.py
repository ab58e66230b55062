"""Quantization pipeline (device side).

TPU re-design of vector_quantize / vector_rebuild_quantization
(src/sqlite-vector.c:1147-1330). The reference makes two full streaming passes
over the table through the SQLite pager; here both passes are single fused
XLA reductions/elementwise kernels over the HBM-resident matrix:

  pass 1  min/max + any-negative        -> one jnp.min/jnp.max reduction
  resolve AUTO -> S8 iff any negative    (reference :1258-1261)
  scale/offset formulas                  (reference :1265-1268, replicated
                                          bit-for-bit in float32)
  pass 2  elementwise quantize kernel    (q_round_u8/q_round_s8 semantics,
                                          reference :495-515)

The quantized codes live in HBM as an int8/uint8 [N, dim] array — the
analogue of the RAM-preloaded shadow-table buffer (vector_quantize_preload,
src/sqlite-vector.c:1338-1404) — so "preloaded" is the natural state here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sqlite_vector_tpu.types import QuantType


@functools.partial(jax.jit, static_argnames=("valid_is_full",))
def minmax_and_negative(
    base: jnp.ndarray,
    valid_count: jnp.ndarray | int | None = None,
    valid_is_full: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Global (min, max, any_negative) over valid rows.

    NaN elements are skipped (C comparisons are false for NaN —
    src/sqlite-vector.c:1254-1256); +-Inf propagates into min/max.
    Padded rows (>= valid_count) are excluded.
    """
    x = base.astype(jnp.float32)
    n = x.shape[0]
    if valid_is_full or valid_count is None:
        row_ok = None
    else:
        valid = jnp.asarray(valid_count, jnp.int32)
        row_ok = (jnp.arange(n, dtype=jnp.int32) < valid)[:, None]
    nan = jnp.isnan(x)
    big = jnp.float32(np.finfo(np.float32).max)
    lo_fill = jnp.where(nan, big, x)
    hi_fill = jnp.where(nan, -big, x)
    if row_ok is not None:
        lo_fill = jnp.where(row_ok, lo_fill, big)
        hi_fill = jnp.where(row_ok, hi_fill, -big)
    mn = jnp.min(lo_fill)
    mx = jnp.max(hi_fill)
    neg_src = x < 0
    if row_ok is not None:
        neg_src = neg_src & row_ok
    neg = jnp.any(neg_src & ~nan)
    return mn, mx, neg


def resolve_quant_params(
    mn: float, mx: float, any_negative: bool, qtype: QuantType
) -> tuple[QuantType, np.float32, np.float32]:
    """AUTO resolution + scale/offset (host-side, float32 math).

    Mirrors src/sqlite-vector.c:1258-1268:
      u8: scale = 255/(max-min), offset = min
      s8: scale = 127/max(|min|,|max|), offset = 0 (symmetric)
    """
    if qtype is QuantType.AUTO:
        qtype = QuantType.I8 if any_negative else QuantType.U8
    # C-init clamps (oracle.compute_quant_params parity; the reference
    # initializes min=FLT_MAX / max=-FLT_MAX, so +Inf can never raise min
    # above FLT_MAX nor -Inf lower max below -FLT_MAX, :1202-1252) — the
    # raw device reduce propagates +-Inf and would otherwise install a NaN
    # scale for non-finite-only columns, poisoning every later query
    flt_max = float(np.finfo(np.float32).max)
    mn32 = np.float32(min(float(mn), flt_max))
    mx32 = np.float32(max(float(mx), -flt_max))
    if float(mn32) > float(mx32):
        # no valid (non-NaN) values were scanned: the reference's
        # no-rows params (:1173-1178), matching the oracle's all-NaN case
        return qtype, np.float32(1.0), np.float32(0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        if qtype is QuantType.U8:
            scale = np.float32(255.0) / (mx32 - mn32)
            offset = mn32
        else:
            abs_max = np.float32(max(abs(float(mn32)), abs(float(mx32))))
            scale = np.float32(127.0) / abs_max
            offset = np.float32(0.0)
    return qtype, np.float32(scale), np.float32(offset)


def _q_round(s: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """Device q_round_u8/q_round_s8 (src/sqlite-vector.c:495-515):
    half-away-from-zero, truncating cast, saturate; NaN -> 0 within [lo, hi],
    +Inf -> hi, -Inf -> lo."""
    s = s.astype(jnp.float32)
    r = s + jnp.float32(0.5) * (jnp.float32(1.0) - jnp.float32(2.0) * (s < 0))
    out = jnp.clip(jnp.trunc(r), lo, hi)
    # non-finite: +Inf -> hi, -Inf -> lo, NaN -> 0 (all already in [lo, hi]
    # — q_round_u8's lo is 0, q_round_s8 spans 0 — so no further clip)
    nf = jnp.where(s > 0, jnp.float32(hi), jnp.where(s < 0, jnp.float32(lo), 0.0))
    return jnp.where(jnp.isfinite(s), out, nf)


@functools.partial(jax.jit, static_argnames=("qtype",))
def quantize_device(
    base: jnp.ndarray,
    scale: jnp.ndarray | float,
    offset: jnp.ndarray | float,
    qtype: QuantType,
) -> jnp.ndarray:
    """Elementwise quantize kernel: (x - offset) * scale, q_round, cast.

    Matches quantize_<src>_to_<dst> (src/sqlite-vector.c:517-732). The
    reference's f32 source path skips the finiteness guard (UB in C for NaN);
    we apply the guarded semantics uniformly — identical for finite inputs.
    """
    s = (base.astype(jnp.float32) - jnp.float32(offset)) * jnp.float32(scale)
    if qtype is QuantType.U8:
        return _q_round(s, 0.0, 255.0).astype(jnp.uint8)
    if qtype is QuantType.I8:
        return _q_round(s, -128.0, 127.0).astype(jnp.int8)
    raise ValueError("quantize_device() requires a resolved qtype (U8 or I8)")
