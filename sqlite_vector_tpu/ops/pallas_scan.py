"""Pallas fused scan kernel: distance + on-chip top-k in one HBM pass.

This is the TPU replacement for the reference's hot loop
(vFullScanRun / vQuantRunMemory, src/sqlite-vector.c:2071-2157): one indirect
SIMD-kernel call + k-slot max-replace per row becomes a tiled kernel where

  - each grid step DMAs one [TILE_N, d] row tile HBM -> VMEM (auto-pipelined
    double buffering, so the scan is DMA-bound),
  - the [B, TILE_N] distance block is one MXU matmul fragment
    (||q-b||^2 = ||q||^2 + ||b||^2 - 2 q.b) or a VPU pass for L1,
  - a k-iteration (min, masked-iota argmin, mask-out) selection loop keeps
    the per-tile top-k entirely in registers/VMEM — the [B, N] distance
    matrix is never materialized in HBM,
  - per-tile candidates ([ntiles, B, k] — ~k/TILE_N of the input bytes) are
    merged with one small lax.top_k afterwards.

Selection ties resolve to the lowest row index (masked-iota argmin), matching
the reference's strict `<` replacement order (src/sqlite-vector.c:2102-2106).

dtype support: f32 natively; bf16 tiles feed the MXU natively with f32
accumulation; f16 tiles are widened in VMEM. u8/i8 quantized codes use the
MXU int8 path with exact int32 accumulation (the quantized-domain distances
of src/sqlite-vector.c:2134-2136).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sqlite_vector_tpu.ops.distance import FLT_EPSILON, NEARLY_ZERO
from sqlite_vector_tpu.types import DistanceMetric

# Per-tile candidate column count (output lane dimension). k <= K_PAD.
K_PAD = 128
# VPU lane count (block width of the two-level selection)
_LANES = 128

# VMEM budget for the double-buffered row tile (bytes).
_TILE_VMEM_BUDGET = 8 * 1024 * 1024

# Max query rows the kernel accepts before falling back to the XLA scan
# (keeps the unrolled L1 path and the [B, TILE_N] block in check).
MAX_B = 1024
MAX_B_L1 = 32


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def enabled() -> bool:
    """Pallas path is on for real TPU backends; SVT_FORCE_PALLAS=1 forces the
    (slow) interpreter path on CPU for debugging, SVT_DISABLE_PALLAS=1 forces
    the XLA scan everywhere."""
    import os

    if os.environ.get("SVT_DISABLE_PALLAS") == "1":
        return False
    if os.environ.get("SVT_FORCE_PALLAS") == "1":
        return True
    return jax.default_backend() == "tpu"


def _row_tile(d_pad: int, itemsize: int) -> int:
    import os

    override = os.environ.get("SVT_PALLAS_TILE_ROWS")
    if override:
        return int(override)
    budget = int(
        os.environ.get("SVT_PALLAS_VMEM_BUDGET", _TILE_VMEM_BUDGET)
    )
    tile = budget // (2 * d_pad * itemsize)
    tile = 1 << int(np.log2(max(tile, 256)))
    return int(min(tile, 8192))


def supports(
    metric: DistanceMetric,
    dtype,
    dim: int,
    k: int,
    batch: int,
) -> bool:
    """Static predicate: can the Pallas kernel run this configuration?"""
    if k <= 0 or k > K_PAD:
        return False
    if metric is DistanceMetric.L1 and batch > MAX_B_L1:
        return False
    if batch > MAX_B:
        return False
    d_pad = _round_up(dim, 128)
    itemsize = jnp.dtype(dtype).itemsize
    # need a sane tile at this dim
    return _row_tile(d_pad, max(itemsize, 1)) >= 256


def _select_topk(dist, kk: int, tile_n: int, b_pad: int):
    """In-VMEM exact top-k via two-level selection.

    A naive kk-round (min, argmin, mask) over the full [B, TILE_N] block costs
    kk full cross-lane reductions. This version reduces once to per-128-block
    minima [B, G], then each round touches only the winning 128-lane block:
    argmin over G, extract that block (per-row aligned dynamic slice), pick
    the element, mask it, and update just that block's minimum. Ties resolve
    to the lowest block then lowest lane = lowest row index, matching the
    reference's strict `<` replacement (src/sqlite-vector.c:2102-2106).
    """
    g_cnt = tile_n // _LANES
    blocks = dist.reshape(b_pad, g_cnt, _LANES)
    m0 = jnp.min(blocks, axis=-1)  # [B, G]
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (b_pad, g_cnt), 1)
    iota_g3 = jax.lax.broadcasted_iota(jnp.int32, (b_pad, g_cnt, _LANES), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (b_pad, K_PAD), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (b_pad, _LANES), 1)
    iota_l3 = jax.lax.broadcasted_iota(jnp.int32, (b_pad, g_cnt, _LANES), 2)
    init_vals = jnp.full((b_pad, K_PAD), jnp.inf, jnp.float32)
    init_idx = jnp.full((b_pad, K_PAD), -1, jnp.int32)

    def body(j, carry):
        blocks, m, sel_vals, sel_idx = carry
        v = jnp.min(m, axis=-1, keepdims=True)  # [B, 1]
        g = jnp.min(
            jnp.where(m == v, iota_g, g_cnt), axis=-1, keepdims=True
        )  # first winning block, [B, 1]
        # extract the winning block by masked sublane reduction (Mosaic has
        # no dynamic_slice on values; reducing over G is a cheap sublane op)
        in_g = iota_g3 == g[:, :, None]  # [B, G, L]
        row = jnp.min(jnp.where(in_g, blocks, jnp.inf), axis=1)  # [B, L]
        e = jnp.min(
            jnp.where(row == v, iota_l, _LANES), axis=-1, keepdims=True
        )  # first winning lane, [B, 1]
        hot = iota_k == j
        sel_vals = jnp.where(hot, v, sel_vals)
        sel_idx = jnp.where(hot, g * _LANES + e, sel_idx)
        # mask the chosen element, refresh that block's cached min
        blocks = jnp.where(in_g & (iota_l3 == e[:, :, None]), jnp.inf, blocks)
        row2 = jnp.where(iota_l == e, jnp.inf, row)
        newmin = jnp.min(row2, axis=-1, keepdims=True)
        m = jnp.where(iota_g == g, newmin, m)
        return blocks, m, sel_vals, sel_idx

    _, _, sel_vals, sel_idx = jax.lax.fori_loop(
        0, kk, body, (blocks, m0, init_vals, init_idx)
    )
    return sel_vals, sel_idx


def _distance_block(q, tile, bsq, metric: DistanceMetric, is_int: bool):
    """[B, TILE_N] distance fragment. L2 stays squared (sqrt post-merge)."""
    b_pad, tile_n = q.shape[0], tile.shape[0]

    if metric is DistanceMetric.L1:
        acc = jnp.int32 if is_int else jnp.float32
        qf = q.astype(acc)
        tf = tile.astype(acc)
        rows = []
        for i in range(b_pad):  # static unroll, B capped by MAX_B_L1
            rows.append(
                jnp.sum(jnp.abs(tf - qf[i][None, :]), axis=-1, dtype=acc)
            )
        return jnp.stack(rows).astype(jnp.float32)

    if is_int:
        dot = jax.lax.dot_general(
            q,
            tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        qsq = jnp.sum(
            q.astype(jnp.int32) * q.astype(jnp.int32), axis=-1, keepdims=True
        )
        if metric is DistanceMetric.DOT:
            return (-dot).astype(jnp.float32)
        if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
            d = qsq + bsq.astype(jnp.int32) - 2 * dot  # exact int32
            return d.astype(jnp.float32)
        # COSINE (quantized domain)
        dotf = dot.astype(jnp.float32)
        qsqf = qsq.astype(jnp.float32)
        bsqf = bsq.astype(jnp.float32)
        denom = jnp.sqrt(qsqf) * jnp.sqrt(bsqf)
        safe = jnp.where(denom > 0.0, denom, 1.0)
        cos = jnp.where(denom > 0.0, dotf / safe, 0.0)
        return jnp.where((qsqf == 0.0) | (bsqf == 0.0), 1.0, 1.0 - cos)

    # float path: f32 direct; bf16 native MXU; f16 widened to f32
    mm_in = q
    mm_tile = tile
    if q.dtype == jnp.float16:
        mm_in = q.astype(jnp.float32)
        mm_tile = tile.astype(jnp.float32)
    # f32 products must be exact (not the default 1-pass bf16 decomposition);
    # see ops.distance.matmul_precision for the SVT_PRECISION escape hatch
    from sqlite_vector_tpu.ops.distance import matmul_precision

    precision = None if mm_in.dtype == jnp.bfloat16 else matmul_precision()
    dot = jax.lax.dot_general(
        mm_in,
        mm_tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    qf = q.astype(jnp.float32)
    qsq = jnp.sum(qf * qf, axis=-1, keepdims=True)  # [B, 1]
    if metric is DistanceMetric.DOT:
        return -dot
    bsqf = bsq.astype(jnp.float32)
    if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
        d = qsq + bsqf - 2.0 * dot
        # same residual clamp as the XLA path (ops/distance.py) so
        # self-distances are exactly 0 like the reference's direct kernels
        resid = FLT_EPSILON * 16.0 * (qsq + bsqf)
        return jnp.where(d <= resid, 0.0, d)
    # COSINE
    denom = jnp.sqrt(qsq) * jnp.sqrt(bsqf)
    safe = jnp.where(denom > 0.0, denom, 1.0)
    cos = jnp.where(denom > 0.0, dot / safe, 0.0)
    return jnp.where((qsq == 0.0) | (bsqf == 0.0), 1.0, 1.0 - cos)


def _make_kernel(metric: DistanceMetric, kk: int, tile_n: int, is_int: bool):
    def kernel(valid_ref, q_ref, bsq_ref, tile_ref, vals_ref, idx_ref):
        i = pl.program_id(0)
        q = q_ref[:]
        tile = tile_ref[:]
        bsq = bsq_ref[:]  # [1, TILE_N]
        b_pad = q.shape[0]
        dist = _distance_block(q, tile, bsq, metric, is_int)
        # mask padding rows (>= valid_count) to +inf — the analogue of
        # skipping NULL rows in the reference scan (src/sqlite-vector.c:2093)
        start = i * tile_n
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (b_pad, tile_n), 1)
        dist = jnp.where(start + iota_n < valid_ref[0, 0], dist, jnp.inf)
        sel_vals, sel_idx = _select_topk(dist, kk, tile_n, b_pad)
        vals_ref[0] = sel_vals
        idx_ref[0] = jnp.where(sel_idx >= 0, start + sel_idx, -1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "interpret")
)
def _pallas_topk_candidates(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    base_sq_norms: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    metric: DistanceMetric,
    k: int,
    interpret: bool = False,
):
    """Run the tiled kernel; returns per-tile candidates
    (vals [ntiles, B_pad, K_PAD], idx [ntiles, B_pad, K_PAD])."""
    b, d = queries.shape
    n = base.shape[0]
    is_int = jnp.issubdtype(base.dtype, jnp.integer)

    d_pad = _round_up(d, 128)
    b_pad = _round_up(max(b, 8), 8)
    tile_n = _row_tile(d_pad, base.dtype.itemsize)
    n_pad = _round_up(max(n, tile_n), tile_n)
    ntiles = n_pad // tile_n
    kk = min(k, K_PAD)

    if d_pad != d or b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, d_pad - d)))
    if d_pad != d or n_pad != n:
        base = jnp.pad(base, ((0, n_pad - n), (0, d_pad - d)))
    bsq = base_sq_norms
    if n_pad != n:
        bsq = jnp.pad(bsq, (0, n_pad - n))
    bsq2 = bsq.reshape(1, n_pad)
    valid_arr = jnp.asarray(valid, jnp.int32).reshape(1, 1)

    kernel = _make_kernel(metric, kk, tile_n, bool(is_int))
    flops = 2 * b_pad * n_pad * d_pad
    bytes_accessed = (
        n_pad * d_pad * base.dtype.itemsize
        + b_pad * d_pad * queries.dtype.itemsize
        + 2 * ntiles * b_pad * K_PAD * 4
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, b_pad, K_PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, b_pad, K_PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ntiles, b_pad, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, b_pad, K_PAD), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(valid_arr, queries, bsq2, base)
    return vals, idx


def pallas_scan_topk(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    *,
    valid_count: jnp.ndarray | int | None = None,
    base_sq_norms: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused top-k scan via the Pallas kernel. Same contract as
    ops.scan.scan_topk: returns (distances [B, k], positions [B, k]),
    ascending, +inf / -1 in unfilled slots."""
    b, d = queries.shape
    n = base.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    valid = jnp.asarray(n if valid_count is None else valid_count, jnp.int32)

    needs_sq = metric in (
        DistanceMetric.L2,
        DistanceMetric.SQUARED_L2,
        DistanceMetric.COSINE,
    )
    if base_sq_norms is None:
        if needs_sq:
            if jnp.issubdtype(base.dtype, jnp.integer):
                bi = base.astype(jnp.int32)
                base_sq_norms = jnp.sum(bi * bi, axis=-1)
            else:
                bf = base.astype(jnp.float32)
                base_sq_norms = jnp.sum(bf * bf, axis=-1)
        else:
            base_sq_norms = jnp.zeros((n,), jnp.float32)

    vals, idx = _pallas_topk_candidates(
        queries,
        base,
        base_sq_norms,
        valid,
        metric=metric,
        k=k,
        interpret=interpret,
    )
    return _merge_candidates(
        vals, idx, metric=metric, k=k, kk=min(k, K_PAD), b=b
    )


@functools.partial(jax.jit, static_argnames=("metric", "k", "kk", "b"))
def _merge_candidates(vals, idx, *, metric: DistanceMetric, k: int, kk: int, b: int):
    ntiles = vals.shape[0]
    # candidates in tile order => global row order => lax.top_k's
    # lowest-position tie preference == earliest-row preference
    cand_vals = jnp.moveaxis(vals[:, :b, :kk], 0, 1).reshape(b, ntiles * kk)
    cand_idx = jnp.moveaxis(idx[:, :b, :kk], 0, 1).reshape(b, ntiles * kk)
    neg, pos = jax.lax.top_k(-cand_vals, min(k, cand_vals.shape[-1]))
    out_vals = -neg
    out_idx = jnp.take_along_axis(cand_idx, pos, axis=-1)
    if out_vals.shape[-1] < k:
        pad = ((0, 0), (0, k - out_vals.shape[-1]))
        out_vals = jnp.pad(out_vals, pad, constant_values=jnp.inf)
        out_idx = jnp.pad(out_idx, pad, constant_values=-1)
    if metric is DistanceMetric.L2:
        out_vals = jnp.sqrt(out_vals)
    # nearly-zero snap (src/sqlite-vector.c:994-996)
    out_vals = jnp.where(
        jnp.abs(out_vals) <= NEARLY_ZERO, jnp.zeros_like(out_vals), out_vals
    )
    out_idx = jnp.where(jnp.isinf(out_vals), -1, out_idx)
    return out_vals, out_idx.astype(jnp.int32)
