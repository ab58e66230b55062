"""Packed int4 quantization + scan (beyond the reference).

The reference stops at global-minmax 8-bit quantization
(src/sqlite-vector.c:1258-1272). On TPU the scan is HBM-bandwidth-bound, so
halving the resident bytes per element doubles the effective scan rate —
this module adds a 4-bit path the C library has no analogue of:

  storage   two 4-bit codes per byte, [N, ceil(dim/2)] uint8 in HBM
            (0.5 bytes/element; 8x smaller than f32, 2x smaller than int8)
  scales    PER-ROW symmetric (alpha_i = finite_absmax_i / 7, f32 [N]) —
            global-minmax at 4 bits collapses recall, per-row scales hold it
  scan      the query is quantized to per-query symmetric int8; the cross
            term (q . c_i) is one MXU int8->int32 matmul over the unpacked
            codes; per-row alpha_i composes the final f32 distance in the
            epilogue. Unpacking happens tile-wise so the HBM read stays at
            the packed width.

Quantization spec (pinned; the numpy and device implementations must agree
bit-for-bit on codes and scales):

  finite_absmax_i = max over FINITE elements of |x_i| (0 if none)
  alpha_i         = finite_absmax_i / 7                  (f32)
  s_i             = 7 / finite_absmax_i  if > 0 else 0   (f32)
  c_ij            = q_round_s4(x_ij * s_i):  half-away-from-zero, truncate,
                    clamp to [-7, 7]; NaN -> 0, +Inf -> 7, -Inf -> -7
  reconstruction  x_ij ~= alpha_i * c_ij

Packing layout (column-split, not interleaved, so the unpack is one
concatenate instead of an interleaving relayout):

  h = ceil(dim / 2); nibble(c) = c + 8  in [1, 15]
  packed[i, j] = nibble(c[i, j]) | (nibble(c[i, h + j]) << 4)
  (odd dim: the last byte's high nibble is the pad nibble 8 == code 0)

Distances are APPROXIMATE values in the ORIGINAL domain (dequantized) —
deliberately different from the int8 path, which returns quantized-domain
integers for reference parity (src/sqlite-vector.c:2121-2236). Rationale:
there is no C semantics to mirror at 4 bits, and original-domain values
compose directly with exact rescoring (mode="rerank") and user thresholds.
Non-finite query elements are zeroed before quantization (documented;
the int8 parity path keeps the reference's NaN->0 / Inf->saturate rules).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sqlite_vector_tpu.ops.topk import merge_topk, topk_ascending
from sqlite_vector_tpu.types import DistanceMetric

INT4_LEVELS = 7  # symmetric code range [-7, 7]


def packed_width(dim: int) -> int:
    """Bytes per row of packed codes."""
    return (dim + 1) // 2


# ---------------------------------------------------------------------------
# numpy reference / host build (the oracle for the device path)
# ---------------------------------------------------------------------------


def q_round_s4_np(s: np.ndarray) -> np.ndarray:
    """q_round for the 4-bit symmetric range: half-away-from-zero, truncate,
    clamp [-7, 7]; NaN -> 0, +Inf -> 7, -Inf -> -7 (the int8 q_round family's
    semantics, src/sqlite-vector.c:495-515, at the narrower range)."""
    s = np.asarray(s, dtype=np.float32)
    nonfinite = ~np.isfinite(s)
    r = s + np.float32(0.5) * (np.float32(1.0) - np.float32(2.0) * (s < 0))
    r = np.where(np.isnan(r), np.float32(0.0), r)
    out = np.clip(np.trunc(r), -INT4_LEVELS, INT4_LEVELS)
    nf = np.where(
        s > 0, np.int8(INT4_LEVELS), np.where(s < 0, np.int8(-INT4_LEVELS), 0)
    )
    return np.where(nonfinite, nf, out.astype(np.int8)).astype(np.int8)


def _row_scales_np(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(alpha [N], s [N]) per-row scales from finite absmax (f32 math)."""
    xf = np.asarray(x, dtype=np.float32)
    mag = np.where(np.isfinite(xf), np.abs(xf), np.float32(0.0))
    absmax = mag.max(axis=1) if xf.shape[1] else np.zeros(len(xf), np.float32)
    absmax = absmax.astype(np.float32)
    with np.errstate(divide="ignore"):
        s = np.where(
            absmax > 0, np.float32(INT4_LEVELS) / absmax, np.float32(0.0)
        ).astype(np.float32)
    alpha = (absmax / np.float32(INT4_LEVELS)).astype(np.float32)
    return alpha, s


def pack4_np(codes: np.ndarray) -> np.ndarray:
    """[N, dim] int8 codes in [-7, 7] -> [N, ceil(dim/2)] packed uint8."""
    n, dim = codes.shape
    h = packed_width(dim)
    nib = (codes.astype(np.int16) + 8).astype(np.uint8)
    lo = np.full((n, h), 8, np.uint8)
    hi = np.full((n, h), 8, np.uint8)
    lo[:, :] = nib[:, :h] if h else lo
    hi[:, : dim - h] = nib[:, h:]
    return (lo | (hi << 4)).astype(np.uint8)


def unpack4_np(packed: np.ndarray, dim: int) -> np.ndarray:
    """Inverse of pack4_np: [N, P] uint8 -> [N, dim] int8 codes."""
    h = packed_width(dim)
    lo = (packed & np.uint8(0x0F)).astype(np.int8) - np.int8(8)
    hi = (packed >> 4).astype(np.int8) - np.int8(8)
    return np.concatenate([lo[:, :h], hi[:, : dim - h]], axis=1)


def quantize4_np(
    x: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize rows to packed int4: (packed [N, P] u8, alpha [N] f32,
    csq [N] int32 = sum of squared codes)."""
    xf = np.asarray(x, dtype=np.float32)
    alpha, s = _row_scales_np(xf)
    with np.errstate(invalid="ignore", over="ignore"):
        codes = q_round_s4_np(xf * s[:, None])
    csq = np.einsum(
        "nd,nd->n", codes.astype(np.int32), codes.astype(np.int32)
    ).astype(np.int32)
    return pack4_np(codes), alpha, csq


def dequantize4_np(
    packed: np.ndarray, alpha: np.ndarray, dim: int
) -> np.ndarray:
    codes = unpack4_np(packed, dim)
    return codes.astype(np.float32) * np.asarray(alpha, np.float32)[:, None]


# ---------------------------------------------------------------------------
# device build
# ---------------------------------------------------------------------------


def unpack4(packed: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Traceable unpack: [*, P] uint8 -> [*, dim] int8 codes (column-split
    layout; a concatenate over the last axis, no interleave relayout)."""
    h = packed_width(dim)
    lo = (packed & jnp.uint8(0x0F)).astype(jnp.int8) - jnp.int8(8)
    hi = (packed >> 4).astype(jnp.int8) - jnp.int8(8)
    return jnp.concatenate([lo[..., :h], hi[..., : dim - h]], axis=-1)


@jax.jit
def _absmax_device(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mag = jnp.where(jnp.isfinite(xf), jnp.abs(xf), jnp.float32(0.0))
    return jnp.max(mag, axis=1)


@jax.jit
def _encode_device(
    x: jnp.ndarray, s: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(packed, csq) from rows and their per-row quantize scales. The
    encode is multiplication-only (no division on device): XLA is free to
    lower f32 divides as reciprocal multiplies (1-ULP off numpy), so the
    scales are computed host-side in numpy by BOTH the host and device
    builds, keeping codes bit-identical across them."""
    xf = x.astype(jnp.float32)
    dim = xf.shape[1]
    h = packed_width(dim)
    v = xf * s[:, None]
    r = v + jnp.float32(0.5) * (jnp.float32(1.0) - jnp.float32(2.0) * (v < 0))
    codes = jnp.clip(jnp.trunc(r), -INT4_LEVELS, INT4_LEVELS)
    nf = jnp.where(
        v > 0, jnp.float32(INT4_LEVELS), jnp.where(v < 0, -INT4_LEVELS, 0.0)
    )
    codes = jnp.where(jnp.isfinite(v), codes, nf).astype(jnp.int8)
    csq = jnp.sum(
        codes.astype(jnp.int32) * codes.astype(jnp.int32), axis=-1
    ).astype(jnp.int32)
    nib = (codes.astype(jnp.int16) + 8).astype(jnp.uint8)
    pad_cols = 2 * h - dim  # 0 or 1
    if pad_cols:
        nib = jnp.pad(nib, ((0, 0), (0, pad_cols)), constant_values=8)
    packed = nib[:, :h] | (nib[:, h:] << 4)
    return packed, csq


def quantize4_device(
    x: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device quantize: (packed [N, P] u8, alpha [N] f32, csq [N] i32).

    The per-row absmax reduces on device; the tiny [N] scale division runs
    host-side (see _encode_device) and the encode is one more device pass —
    codes and scales are bit-identical to quantize4_np for equal inputs."""
    absmax = np.asarray(_absmax_device(x))
    with np.errstate(divide="ignore"):
        s = np.where(
            absmax > 0, np.float32(INT4_LEVELS) / absmax, np.float32(0.0)
        ).astype(np.float32)
    alpha = (absmax / np.float32(INT4_LEVELS)).astype(np.float32)
    packed, csq = _encode_device(x, jnp.asarray(s))
    return packed, jnp.asarray(alpha), csq


def quantize_query_int8(
    q: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-query symmetric int8 codes for the cross-term matmul.

    Returns (qc [B, d] int8, qscale [B] f32, qsq [B] f32 = ||q||^2 of the
    sanitized query). Non-finite query elements are zeroed first (module
    docstring): the int4 path is approximate by contract, and a NaN/Inf
    element would otherwise poison the whole row's distances."""
    qf = q.astype(jnp.float32)
    qf = jnp.where(jnp.isfinite(qf), qf, 0.0)
    absmax = jnp.max(jnp.abs(qf), axis=1)
    s = jnp.where(absmax > 0, jnp.float32(127.0) / absmax, 0.0)
    v = qf * s[:, None]
    r = v + jnp.float32(0.5) * (jnp.float32(1.0) - jnp.float32(2.0) * (v < 0))
    qc = jnp.clip(jnp.trunc(r), -127, 127)
    # denormal absmax (< ~3.7e-37) overflows s to +inf: v becomes inf at
    # the absmax element and 0*inf = NaN elsewhere — saturate exactly like
    # _encode_device's nf branch instead of casting NaN to int8 (UB)
    nf = jnp.where(
        v > 0, jnp.float32(127.0), jnp.where(v < 0, -127.0, 0.0)
    )
    qc = jnp.where(jnp.isfinite(v), qc, nf).astype(jnp.int8)
    qscale = absmax / jnp.float32(127.0)
    qsq = jnp.sum(qf * qf, axis=-1)
    return qc, qscale, qsq


# ---------------------------------------------------------------------------
# scan kernels (XLA path; tile-wise unpack keeps the HBM read packed-width)
# ---------------------------------------------------------------------------

# rows per tile: the unpacked int8 tile ([tile, dim]) is the scratch XLA
# materializes; keep it modest so the working set stays cache/VMEM-friendly
INT4_ROW_TILE = 131072


def _int4_tile_distance(
    qc: jnp.ndarray,  # [B, d] int8 query codes
    qscale: jnp.ndarray,  # [B] f32
    qsq: jnp.ndarray,  # [B] f32 (exact ||q||^2 of the sanitized query)
    q_f32: jnp.ndarray,  # [B, d] sanitized f32 queries (L1 path only)
    packed: jnp.ndarray,  # [T, P] uint8
    alpha: jnp.ndarray,  # [T] f32
    csq: jnp.ndarray,  # [T] int32
    metric: DistanceMetric,
    dim: int,
) -> jnp.ndarray:
    codes = unpack4(packed, dim)  # [T, dim] int8

    if metric is DistanceMetric.L1:
        # no matmul decomposition: dequantize the tile and reduce on the VPU
        # (same shape as the exact L1 path; XLA fuses the cube)
        rows = codes.astype(jnp.float32) * alpha[:, None]
        return jnp.sum(
            jnp.abs(q_f32[:, None, :] - rows[None, :, :]), axis=-1
        )

    dot = jax.lax.dot_general(
        qc,
        codes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, T] exact int32

    if metric is DistanceMetric.COSINE:
        # both scales cancel inside cos(); integer norms are exact
        qcsq = jnp.sum(
            qc.astype(jnp.int32) * qc.astype(jnp.int32), axis=-1
        ).astype(jnp.float32)
        csqf = csq.astype(jnp.float32)
        denom = jnp.sqrt(qcsq)[:, None] * jnp.sqrt(csqf)[None, :]
        safe = jnp.where(denom > 0.0, denom, 1.0)
        cos = jnp.where(denom > 0.0, dot.astype(jnp.float32) / safe, 0.0)
        d = 1.0 - cos
        return jnp.where(
            (qcsq[:, None] == 0.0) | (csqf[None, :] == 0.0), 1.0, d
        )

    cross = (qscale[:, None] * alpha[None, :]) * dot.astype(jnp.float32)
    if metric is DistanceMetric.DOT:
        return -cross
    # L2 / SQUARED_L2: ||q||^2 - 2 a.b + ||b~||^2 with b~ = alpha * codes
    bsq = (alpha * alpha) * csq.astype(jnp.float32)
    d = qsq[:, None] + bsq[None, :] - 2.0 * cross
    d = jnp.maximum(d, 0.0)  # quantization noise can push slightly negative
    if metric is DistanceMetric.L2:
        d = jnp.sqrt(d)
    return d


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "dim", "row_tile", "has_mask")
)
def _int4_scan_topk_impl(
    q: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: jnp.ndarray,
    csq: jnp.ndarray,
    valid: jnp.ndarray,
    row_mask: jnp.ndarray,
    *,
    metric: DistanceMetric,
    k: int,
    dim: int,
    row_tile: int,
    has_mask: bool,
):
    qc, qscale, qsq = quantize_query_int8(q)
    qf = jnp.where(jnp.isfinite(q.astype(jnp.float32)), q.astype(jnp.float32), 0.0)
    b = q.shape[0]
    n = packed.shape[0]
    mask = row_mask if has_mask else None

    def tile_dist(pk, al, cs):
        d = _int4_tile_distance(qc, qscale, qsq, qf, pk, al, cs, metric, dim)
        return jnp.where(jnp.isnan(d), jnp.inf, d)

    if n <= row_tile:
        dist = tile_dist(packed, alpha, csq)
        row_idx = jnp.arange(n, dtype=jnp.int32)
        dist = jnp.where(row_idx[None, :] < valid, dist, jnp.inf)
        if mask is not None:
            dist = jnp.where(mask[None, :], dist, jnp.inf)
        vals, idx = topk_ascending(dist, k)
        return vals, jnp.where(jnp.isposinf(vals), -1, idx).astype(jnp.int32)

    ntiles = -(-n // row_tile)
    npad = ntiles * row_tile
    if npad != n:
        packed = jnp.pad(packed, ((0, npad - n), (0, 0)))
        alpha = jnp.pad(alpha, (0, npad - n))
        csq = jnp.pad(csq, (0, npad - n))
        if mask is not None:
            mask = jnp.pad(mask, (0, npad - n))

    kk = min(k, row_tile)
    init_vals = jnp.full((b, k), jnp.inf, jnp.float32)
    init_ids = jnp.full((b, k), -1, jnp.int32)

    def body(carry, tile_idx):
        run_vals, run_ids = carry
        start = tile_idx * row_tile
        pk = jax.lax.dynamic_slice_in_dim(packed, start, row_tile, axis=0)
        al = jax.lax.dynamic_slice_in_dim(alpha, start, row_tile)
        cs = jax.lax.dynamic_slice_in_dim(csq, start, row_tile)
        dist = tile_dist(pk, al, cs)
        row_idx = start + jnp.arange(row_tile, dtype=jnp.int32)
        dist = jnp.where(row_idx[None, :] < valid, dist, jnp.inf)
        if mask is not None:
            tm = jax.lax.dynamic_slice_in_dim(mask, start, row_tile)
            dist = jnp.where(tm[None, :], dist, jnp.inf)
        vals, idx = topk_ascending(dist, kk)
        run_vals, run_ids = merge_topk(
            run_vals, run_ids, vals, (start + idx).astype(jnp.int32), k
        )
        return (run_vals, run_ids), None

    (vals, idx), _ = jax.lax.scan(
        body, (init_vals, init_ids), jnp.arange(ntiles, dtype=jnp.int32)
    )
    return vals, jnp.where(jnp.isposinf(vals), -1, idx).astype(jnp.int32)


def int4_scan_topk(
    queries: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: jnp.ndarray,
    csq: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    *,
    dim: int,
    valid_count: jnp.ndarray | int | None = None,
    row_mask: jnp.ndarray | None = None,
    row_tile: int = INT4_ROW_TILE,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused int4 top-k scan: (distances [B, k] f32 approximate
    original-domain, positions [B, k] int32), ascending, +inf/-1 padding.

    Routing mirrors fused_scan_topk: the Pallas packed-scan kernel runs
    when measured-supported on a real TPU (it keeps the unpacked tile in
    VMEM — the XLA path materializes it per tile, tripling HBM traffic);
    the XLA tile loop is the universal fallback.
    """
    n = packed.shape[0]
    valid = jnp.asarray(n if valid_count is None else valid_count, jnp.int32)
    from sqlite_vector_tpu.ops import pallas_int4

    if row_mask is None and pallas_int4.enabled() and pallas_int4.supports(
        metric, dim, k, queries.shape[0], n
    ):
        return pallas_int4.pallas_int4_scan_topk(
            queries, packed, alpha, csq, metric, k, dim=dim, valid_count=valid
        )
    return _int4_scan_topk_impl(
        queries,
        packed,
        alpha,
        csq,
        valid,
        row_mask if row_mask is not None else jnp.zeros((0,), bool),
        metric=metric,
        k=k,
        dim=dim,
        row_tile=row_tile,
        has_mask=row_mask is not None,
    )


@functools.partial(jax.jit, static_argnames=("metric", "dim"))
def int4_scan_distances(
    queries: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: jnp.ndarray,
    csq: jnp.ndarray,
    metric: DistanceMetric,
    *,
    dim: int,
) -> jnp.ndarray:
    """Full [B, N] approximate distance matrix (the *_stream virtual tables'
    int4 analogue). Values are original-domain approximations."""
    qc, qscale, qsq = quantize_query_int8(queries)
    qf = jnp.where(
        jnp.isfinite(queries.astype(jnp.float32)),
        queries.astype(jnp.float32),
        0.0,
    )
    return _int4_tile_distance(
        qc, qscale, qsq, qf, packed, alpha, csq, metric, dim
    )


def int4_streaming_scan_topk(
    queries: np.ndarray,
    packed_host: np.ndarray,
    alpha_host: np.ndarray,
    csq_host: np.ndarray,
    metric: DistanceMetric,
    k: int,
    *,
    dim: int,
    valid_count: int | None = None,
    row_mask: np.ndarray | None = None,
    tile_rows: int = 262144,
    device=None,
    mesh=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Host->HBM streamed int4 scan (host-storage datasets without
    preload()): packed tiles + their scale/csq slices stream through HBM
    with a running top-k carry, double-buffered like
    ops.streaming.streaming_scan_topk. With `mesh`, each tile row-shards
    across the chips (sharded_int4_scan_topk)."""
    from sqlite_vector_tpu.ops.streaming import (
        _check_stream_bounds,
        _merge,
        _placement,
    )

    n = packed_host.shape[0] if valid_count is None else int(valid_count)
    b = queries.shape[0]
    if n == 0:
        return (
            jnp.full((b, k), jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32),
        )
    _check_stream_bounds(n)
    n_dev, put, put_q = _placement(mesh, device)
    if mesh is not None:
        from sqlite_vector_tpu.parallel.ops import sharded_int4_scan_topk

        tile_rows = -(-tile_rows // n_dev) * n_dev
        scan = lambda qd, pk, al, cs, kk, rows, m: (  # noqa: E731
            sharded_int4_scan_topk(
                qd, pk, al, cs, metric, kk, mesh, dim=dim,
                valid_count=rows, row_mask=m,
            )
        )
    else:
        scan = lambda qd, pk, al, cs, kk, rows, m: int4_scan_topk(  # noqa: E731
            qd, pk, al, cs, metric, kk, dim=dim, valid_count=rows, row_mask=m,
        )
    qd = put_q(np.ascontiguousarray(np.asarray(queries, np.float32)))

    ntiles = -(-n // tile_rows)
    if ntiles == 1:
        tile_rows = -(-n // n_dev) * n_dev

    def tile(i: int):
        start = i * tile_rows
        rows = min(tile_rows, n - start)
        pk = np.ascontiguousarray(packed_host[start : start + rows])
        al = np.ascontiguousarray(alpha_host[start : start + rows])
        cs = np.ascontiguousarray(csq_host[start : start + rows])
        m = None
        if row_mask is not None:
            m = np.zeros((tile_rows,), bool)
            e = min(start + rows, len(row_mask))
            if e > start:
                m[: e - start] = row_mask[start:e]
        if rows < tile_rows:
            pad = tile_rows - rows
            pk = np.concatenate([pk, np.zeros((pad, pk.shape[1]), pk.dtype)])
            al = np.concatenate([al, np.zeros((pad,), al.dtype)])
            cs = np.concatenate([cs, np.zeros((pad,), cs.dtype)])
        return (
            put(pk), put(al), put(cs), rows,
            (None if m is None else put(m)),
        )

    if ntiles == 1:
        pk, al, cs, rows, m = tile(0)
        return scan(qd, pk, al, cs, k, rows, m)

    run_vals = jnp.full((b, k), jnp.inf, jnp.float32)
    run_ids = jnp.full((b, k), -1, jnp.int32)
    nxt = tile(0)
    for i in range(ntiles):
        pk, al, cs, rows, m = nxt
        if i + 1 < ntiles:
            nxt = tile(i + 1)  # async put overlaps this tile's scan
        vals, idx = scan(qd, pk, al, cs, min(k, tile_rows), rows, m)
        gidx = jnp.where(idx >= 0, idx + i * tile_rows, -1)
        run_vals, run_ids = _merge(run_vals, run_ids, vals, gidx, k)
    run_ids = jnp.where(jnp.isposinf(run_vals), -1, run_ids)
    return run_vals, run_ids.astype(jnp.int32)
