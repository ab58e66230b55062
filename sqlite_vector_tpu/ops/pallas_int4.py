"""Pallas packed-int4 scan kernel: unpack in VMEM, HBM reads stay 4-bit.

Why Pallas here when the f32/int8 scans route to XLA (measured, STATUS.md
round-3 routing table): XLA must MATERIALIZE a dot operand, so the XLA int4
path writes each unpacked int8 tile back to HBM and re-reads it — per
element that is 0.5 B (packed read) + 1 B (write) + 1 B (read) = 2.5 B,
strictly worse than the 1 B/elem int8 scan. Only a kernel that unpacks
HBM->VMEM and feeds the MXU from VMEM realizes the 4-bit bandwidth win.

Structure mirrors ops/pallas_scan.py's two-stage split:

  stage 1 (Pallas): stream packed [TILE_N, P] tiles; unpack to int8 in
    VMEM; one int8->int32 MXU matmul against the (pre-permuted, padded)
    int8 query codes; compose a per-query-row MONOTONE surrogate of the
    int4 distance; emit per-128-row block minima. Per-query-row monotone
    transforms preserve each row's group ranking, so dropping the per-row
    constants (||q||^2, 1/sqrt(||qc||^2)) from the surrogate is exact.

  stage 2 (XLA): top-k groups by minima, gather the k winning 128-row
    blocks of PACKED codes (+ alpha, csq), exact int4 rescore
    (ops.quantize4._int4_tile_distance), final top-k.

Column layout: the packed array is padded to P_pad = roundup(P, 64) with
0x88 bytes (both nibbles == code 0) so the unpacked width 2*P_pad is a
lane multiple; the query is permuted to match the padded column-split
order (original col h+j lands at P_pad+j). Dots and square-sums are
permutation-invariant, so the composition is unchanged.

L1 has no matmul form and stays on the XLA int4 path (supports() rejects).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sqlite_vector_tpu.ops.quantize4 import (
    _int4_tile_distance,
    packed_width,
    quantize_query_int8,
)
from sqlite_vector_tpu.types import DistanceMetric

BLOCK = 128  # rows per minima group (VPU lane count)

# VMEM budget for the staged packed tiles.
_TILE_VMEM_BUDGET = 8 * 1024 * 1024

MAX_B = 256
MAX_K = 1024
# Mosaic compile fences, measured on the real v5e (round 5,
# `tools/probe_int4.py --dim 768 --envelope`, recorded in STATUS.md):
# the MANUAL kernel streams its minima out to HBM through nbuf VMEM
# slots, so its VMEM residency no longer scales with b_pad*n — every
# probed config COMPILES+RUNS: (b, n) in (8,4M) (8,10M) (64,1M) (64,4M)
# (64,10M) (128,10M) (256,1M) (256,10M), i.e. b_lane*n up to 2.56e9.
# The fence is set to that largest MEASURED pair product (not an
# extrapolation — the r3/r4 rule: every fence constant traceable to a
# recorded run). The GRID variant (SVT_PALLAS_INT4_MANUAL=0) still keeps
# the full [ntiles, B, g] minima in VMEM and retains the r4 128M bound.
_COMPILE_PAIR_BOUND = 2_560_000_000
_COMPILE_PAIR_BOUND_GRID = 128 * 1_000_000
_MINIMA_VMEM_BOUND = 64 * 1024 * 1024  # grid variant only (VMEM minima)
_FINISH_HBM_BOUND = 2 * 1024 * 1024 * 1024
# Measured routing crossover (r5, tools/probe_int4_cross.py, within one
# hardware run at dim 768): at batch >= 8 the XLA tile loop beats this
# kernel below ~4M rows (B=64: 0.78-0.92x at 0.5-2M) and loses above
# (1.06-1.19x at 4-10M; B=8 is a tie above, 1.01-1.02x). At B=1 the
# kernel wins at every probed N (1M: 8.6 vs 10.3 ms; 10M: 39.7 vs 54.7).
_BATCHED_XLA_CROSSOVER_ROWS = 4_000_000


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def enabled() -> bool:
    """On for real TPU backends; SVT_FORCE_PALLAS_INT4=1 forces the (slow)
    interpreter path elsewhere, SVT_DISABLE_PALLAS_INT4=1 forces the XLA
    int4 tile loop everywhere."""
    import os

    if os.environ.get("SVT_DISABLE_PALLAS_INT4") == "1":
        return False
    if os.environ.get("SVT_FORCE_PALLAS_INT4") == "1":
        return True
    return jax.default_backend() == "tpu"


def _tile_rows(p_pad: int, nbuf: int) -> int:
    import os

    override = os.environ.get("SVT_PALLAS_INT4_TILE_ROWS")
    if override:
        t = int(override)
        return max(256, min(8192, (t // BLOCK) * BLOCK))
    budget = int(
        os.environ.get("SVT_PALLAS_INT4_VMEM_BUDGET", _TILE_VMEM_BUDGET)
    )
    # staged packed tile (1 B/byte) + its unpacked int8 image (2 bytes per
    # packed byte) share VMEM per slot
    tile = budget // (nbuf * p_pad * 3)
    tile = 1 << int(np.log2(max(tile, 256)))
    return int(min(tile, 8192))


def supports(
    metric: DistanceMetric,
    dim: int,
    k: int,
    batch: int,
    n: int | None = None,
) -> bool:
    """Static predicate mirroring pallas_scan.supports: False routes to the
    XLA int4 tile loop."""
    import os

    if metric is DistanceMetric.L1:
        return False
    if k <= 0 or k > MAX_K:
        return False
    if batch > MAX_B:
        return False
    # UNCLAMPED tile budget (the _tile_rows helper clamps to >=256, which
    # would make this check vacuous — found in the r4 review): dims whose
    # minimum 256-row tile overflows the VMEM budget route to the XLA tile
    # loop. Evaluated with the DEFAULT manual-kernel parameters (nbuf,
    # 128-aligned lane width) — the stricter of the two variants.
    p_pad = _round_up(packed_width(dim), 128)
    budget = int(
        os.environ.get("SVT_PALLAS_INT4_VMEM_BUDGET", _TILE_VMEM_BUDGET)
    )
    manual = os.environ.get("SVT_PALLAS_INT4_MANUAL", "1") == "1"
    nbuf = int(os.environ.get("SVT_PALLAS_INT4_NBUF", "4")) if manual else 2
    if budget // (nbuf * p_pad * 3) < 256:
        return False
    if n is not None:
        groups = -(-n // BLOCK)
        if batch >= 8 and n < _BATCHED_XLA_CROSSOVER_ROWS:
            return False  # measured: XLA wins the small-N batched pocket
        if manual:
            # the manual kernel pads queries to the 128-lane vreg width
            # (queries live on the LANE axis — see _make_manual_kernel)
            b_pad = _round_up(max(batch, 8), 128)
            if b_pad * n > _COMPILE_PAIR_BOUND:
                return False
        else:
            b_pad = _round_up(max(batch, 8), 8)
            if b_pad * n > _COMPILE_PAIR_BOUND_GRID:
                return False
            if b_pad * groups * 4 > _MINIMA_VMEM_BOUND:
                return False
        kg = min(k, groups)
        # finish gathers packed candidates: [b, kg*BLOCK, P] u8 + the
        # unpacked int8 image
        if batch * kg * BLOCK * p_pad * 3 > _FINISH_HBM_BOUND:
            return False
    return True


def _unpack_block(packed: jnp.ndarray, p_pad: int) -> jnp.ndarray:
    """[T, P_pad] uint8 -> [T, 2*P_pad] bf16 codes in padded column-split
    order. Unpacks through int32 and emits bf16 — measured Mosaic
    legalization envelope on v5e: int8 vector subtraction
    ('arith.subi' on vector<...xi8>) and uint8->bf16 casts both FAIL to
    legalize; the i32 bitwise route + i32->bf16 cast compiles. bf16 is
    exact for codes in [-8, 7], and the bf16 MXU dot with f32 accumulation
    reproduces the int32 dot bit-exactly for our ranges (products <= 127*8,
    sums < 2^24 — verified on hardware, round 4)."""
    p = packed.astype(jnp.int32)
    lo = (p & 15) - 8
    hi = (p >> 4) - 8
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.bfloat16)


def _unpack_planes(packed: jnp.ndarray):
    """[T, P_pad] uint8 -> (lo, hi) bf16 NIBBLE planes in [0, 15] — the
    minimum-VPU-work unpack (r4 perf pass). Two algebraic cuts vs
    _unpack_block, which the 10M x 768 measurement showed to be VPU-bound
    (~9 elementwise ops/byte at ~65% VPU utilization -> 55 ms/scan while
    the MXU dot itself is ~1 ms):

      1. no -8 bias here: dot(qc, nib - 8) = dot(qc, nib) - 8 * sum(qc),
         and sum(qc) is a per-query scalar the caller computes once — the
         two per-element subtracts become one epilogue FMA row;
      2. no concat: the caller issues one MXU dot per plane against the
         matching half of the query codes, so the [T, 2*P_pad] bf16
         intermediate (an extra write+read of every code in VMEM) never
         exists.

    nib in [0, 15] is exact in bf16; both plane dots stay integer-exact
    in f32 (products <= 127*15, sums < 2^24)."""
    p = packed.astype(jnp.int32)
    return (p & 15).astype(jnp.bfloat16), (p >> 4).astype(jnp.bfloat16)


def _surrogate_block(
    qc, qscale_col, dot, alpha_row, csq_row, metric: DistanceMetric
):
    """Per-query-row monotone surrogate of the int4 distance for a
    [B, TILE_N] block (see module docstring). qscale_col: [B, 1] f32;
    alpha_row/csq_row: [1, TILE_N]."""
    dotf = dot.astype(jnp.float32)
    if metric is DistanceMetric.DOT:
        return -(qscale_col * alpha_row) * dotf
    if metric is DistanceMetric.COSINE:
        csqf = csq_row.astype(jnp.float32)
        inv = jnp.where(csqf > 0.0, jax.lax.rsqrt(jnp.maximum(csqf, 1.0)), 0.0)
        # csq >= 1 when nonzero (integer codes), so the max() guard only
        # shields the rsqrt from the masked-out zero lanes
        return jnp.where(csqf > 0.0, -dotf * inv, 0.0)
    # L2 / SQUARED_L2 (identical ranking): alpha^2 csq - 2 qscale alpha dot
    af = alpha_row.astype(jnp.float32)
    return af * af * csq_row.astype(jnp.float32) - 2.0 * (
        qscale_col * af
    ) * dotf


def _plane_dot(qc, qsum8, lo, hi, p_pad: int):
    """Corrected integer dot from the nibble planes: one MXU dot per
    plane against the matching half of the (permuted) query codes, minus
    the precomputed 8*sum(qc) bias row (see _unpack_planes)."""
    dn = (((1,), (1,)), ((), ()))
    dot = jax.lax.dot_general(
        qc[:, :p_pad], lo, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    dot = dot + jax.lax.dot_general(
        qc[:, p_pad:], hi, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return dot - qsum8


def _make_kernel(metric: DistanceMetric, tile_n: int, p_pad: int):
    def kernel(valid_ref, qc_ref, qs_ref, qsum_ref, alpha_ref, csq_ref,
               tile_ref, mins_ref):
        i = pl.program_id(0)
        qc = qc_ref[:].astype(jnp.bfloat16)  # int8 codes, exact in bf16
        b_pad = qc.shape[0]
        lo, hi = _unpack_planes(tile_ref[:])  # [TILE_N, P_pad] bf16 x2
        dot = _plane_dot(qc, qsum_ref[:], lo, hi, p_pad)
        s = _surrogate_block(
            qc, qs_ref[:], dot, alpha_ref[:], csq_ref[:], metric
        )
        # padding rows (>= valid_count) out of the running; NaN surrogates
        # (inf - inf from overflowed alpha^2*csq vs cross terms) rank like
        # the XLA path's NaN->inf distances instead of poisoning the min
        start = i * tile_n
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (b_pad, tile_n), 1)
        keep = (start + iota_n < valid_ref[0, 0]) & ~jnp.isnan(s)
        s = jnp.where(keep, s, jnp.inf)
        mins_ref[0] = jnp.min(
            s.reshape(b_pad, tile_n // BLOCK, BLOCK), axis=-1
        )

    return kernel


def _make_manual_kernel(
    metric: DistanceMetric, tile_n: int, ntiles: int, p_pad: int, nbuf: int,
    b_pad_static: int, i8dot: bool,
):
    """Manual multi-buffered DMA variant (pallas guide double-buffering
    pattern; same rationale as pallas_scan's: Mosaic's automatic grid
    pipeline leaves ~half the streaming bandwidth on the table — measured
    again for THIS kernel in round 4, tools/probe_int4.py: grid 7.6 ms vs
    int8's 6.6 ms at 1M x 384/B=1 in the same run). One invocation loops
    over all row tiles; packed tiles and their [2, TILE_N] aux slices
    (row 0 = alpha, row 1 = csq as f32 — exact below 2^24) stream through
    nbuf VMEM slots; per-tile minima stream OUT to HBM through nbuf
    [B, g] slots (r5: the VMEM-resident [ntiles, B, g] output bounded the
    compile envelope at large b_pad*n)."""

    def kernel(valid_ref, qc_ref, qs_ref, qsum_ref, base_hbm, aux_hbm,
               mins_hbm):
        # TRANSPOSED orientation (r5): queries on the LANE axis (b_lane,
        # a 128 multiple), rows on sublanes. Mosaic requires VMEM slice
        # lane widths 128-aligned, so the streamed-out minima slot must be
        # [g_tile, b_lane] — the [B, g_tile] orientation (g_tile = 16 at
        # tile 2048) cannot be sliced. The dot becomes [T, P] x [b_lane, P]
        # -> [T, b_lane]: identical MXU passes (the array is 128 lanes wide
        # either way), and the BLOCK-min is a sublane reduction.
        # i8dot: feed the MXU int8 x int8 -> int32 (2x the bf16 MXU rate on
        # v5e, and the unpack stays in narrow vregs); bf16 is the fallback
        # for toolchains where the i32->i8 cast fails to legalize
        qc = (
            qc_ref[:] if i8dot else qc_ref[:].astype(jnp.bfloat16)
        )  # [b_lane, 2*p_pad] int8 codes
        b_lane = qc.shape[0]
        qs_row = qs_ref[:]  # [1, b_lane]
        qsum8 = qsum_ref[:]  # [1, b_lane] (i32 when i8dot, f32 otherwise)
        g_tile = tile_n // BLOCK

        def body(scratch, aux_scratch, mins_scratch, sems, aux_sems,
                 out_sems):
            def tile_dma(slot, idx):
                return pltpu.make_async_copy(
                    base_hbm.at[pl.ds(idx * tile_n, tile_n), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            def aux_dma(slot, idx):
                return pltpu.make_async_copy(
                    aux_hbm.at[:, pl.ds(idx * tile_n, tile_n)],
                    aux_scratch.at[slot],
                    aux_sems.at[slot],
                )

            def out_dma(slot, idx):
                # minima stream OUT to HBM through the same nbuf slots —
                # keeping the full [ntiles, ...] output in VMEM was the
                # compile-envelope binder at large b_pad*n (r4 VERDICT
                # item 1: "block the minima output to HBM")
                return pltpu.make_async_copy(
                    mins_scratch.at[slot],
                    mins_hbm.at[idx],
                    out_sems.at[slot],
                )

            for i in range(min(nbuf - 1, ntiles)):
                tile_dma(i, i).start()
                aux_dma(i, i).start()

            def loop(i, carry):
                slot = jax.lax.rem(i, nbuf)

                @pl.when(i + nbuf - 1 < ntiles)
                def _():
                    nxt = jax.lax.rem(i + nbuf - 1, nbuf)
                    tile_dma(nxt, i + nbuf - 1).start()
                    aux_dma(nxt, i + nbuf - 1).start()

                tile_dma(slot, i).wait()
                aux_dma(slot, i).wait()
                aux = aux_scratch[slot]  # [2, TILE_N] f32
                # [T, b_lane] dot: one MXU pass per nibble plane
                dn = (((1,), (1,)), ((), ()))
                if i8dot:
                    p32 = scratch[slot].astype(jnp.int32)
                    lo = (p32 & 15).astype(jnp.int8)
                    hi = (p32 >> 4).astype(jnp.int8)
                    acc = jnp.int32
                else:
                    lo, hi = _unpack_planes(scratch[slot])
                    acc = jnp.float32
                dot = jax.lax.dot_general(
                    lo, qc[:, :p_pad], dimension_numbers=dn,
                    preferred_element_type=acc,
                )
                dot = dot + jax.lax.dot_general(
                    hi, qc[:, p_pad:], dimension_numbers=dn,
                    preferred_element_type=acc,
                )
                # exact below 2^24 either way (|dot| <= 15*127*2*P_pad)
                dot = (dot - qsum8).astype(jnp.float32)
                s = _surrogate_block(
                    qc, qs_row, dot, aux[0, :].reshape(tile_n, 1),
                    aux[1, :].reshape(tile_n, 1), metric
                )  # [T, b_lane]
                start = i * tile_n
                iota_n = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_n, b_lane), 0
                )
                keep = (start + iota_n < valid_ref[0, 0]) & ~jnp.isnan(s)
                s = jnp.where(keep, s, jnp.inf)

                # the copy issued nbuf iterations ago must land before the
                # slot is overwritten
                @pl.when(i >= nbuf)
                def _():
                    out_dma(slot, i - nbuf).wait()

                mins_scratch[slot] = jnp.min(
                    s.reshape(g_tile, BLOCK, b_lane), axis=1
                )
                out_dma(slot, i).start()
                return carry

            jax.lax.fori_loop(0, ntiles, loop, 0)
            # drain the last <= nbuf in-flight output copies
            for j in range(max(0, ntiles - nbuf), ntiles):
                out_dma(j % nbuf, j).wait()

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((nbuf, tile_n, p_pad), jnp.uint8),
            aux_scratch=pltpu.VMEM((nbuf, 2, tile_n), jnp.float32),
            mins_scratch=pltpu.VMEM((nbuf, g_tile, b_pad_static),
                                    jnp.float32),
            sems=pltpu.SemaphoreType.DMA((nbuf,)),
            aux_sems=pltpu.SemaphoreType.DMA((nbuf,)),
            out_sems=pltpu.SemaphoreType.DMA((nbuf,)),
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("metric", "dim", "interpret")
)
def _int4_block_minima_manual(
    queries: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: jnp.ndarray,
    csq: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    metric: DistanceMetric,
    dim: int,
    interpret: bool = False,
):
    import os

    b = queries.shape[0]
    n, p = packed.shape
    # the manual kernel slices its [nbuf, T, P_pad] VMEM scratch per slot;
    # Mosaic requires the sliced lane width 128-aligned (measured on v5e:
    # "Slice shape along dimension 1 must be aligned to tiling (128), but
    # is 192"). Rounding to 128 costs pad traffic for P % 128 != 0 (dim
    # 384: 256/192 = 1.33x the minimum — still 0.67x the int8 bytes); a
    # row-pair packing layout would remove it at the cost of a second
    # device-side code layout (STATUS.md round-4 notes).
    p_pad = _round_up(p, 128)
    # queries live on the LANE axis in the transposed kernel (see
    # _make_manual_kernel), so pad to the full 128-lane vreg width: the MXU
    # and VPU process 128 lanes per pass regardless, so b < 128 costs the
    # same as 128 — the padding buys the aligned minima slice for free
    b_lane = _round_up(max(b, 8), 128)
    nbuf = int(os.environ.get("SVT_PALLAS_INT4_NBUF", "4"))
    tile_n = _tile_rows(p_pad, nbuf)
    n_pad = _round_up(max(n, tile_n), tile_n)
    ntiles = n_pad // tile_n
    g_tile = tile_n // BLOCK

    qf = jnp.where(
        jnp.isfinite(queries.astype(jnp.float32)),
        queries.astype(jnp.float32),
        0.0,
    )
    qperm = _permute_query(qf, dim, p_pad)
    qc, qscale, _ = quantize_query_int8(qperm)
    if b_lane != b:
        qc = jnp.pad(qc, ((0, b_lane - b), (0, 0)))
        qscale = jnp.pad(qscale, (0, b_lane - b))
    if p_pad != p or n_pad != n:
        packed = jnp.pad(
            packed, ((0, n_pad - n), (0, p_pad - p)), constant_values=0x88
        )
    if n_pad != n:
        alpha = jnp.pad(alpha, (0, n_pad - n))
        csq = jnp.pad(csq, (0, n_pad - n))
    # aux rows: [2, N_pad] f32 — one strided DMA per tile instead of two
    # 1-D ones; csq is exact in f32 below 2^24 (dim <= ~342k at code^2<=49)
    aux = jnp.stack([alpha, csq.astype(jnp.float32)], axis=0)
    valid_arr = jnp.asarray(valid, jnp.int32).reshape(1, 1)
    qs_col = qscale.reshape(1, b_lane)
    # epilogue bias for the no-subtract unpack (see _unpack_planes):
    # 8 * sum(qc) per query, exact in f32/i32 (<= 8*127*2*P_pad < 2^24)
    i8dot = os.environ.get("SVT_PALLAS_INT4_I8DOT", "1") == "1"
    qsum8 = (8 * jnp.sum(qc.astype(jnp.int32), axis=1)).reshape(1, b_lane)
    if not i8dot:
        qsum8 = qsum8.astype(jnp.float32)

    kernel = _make_manual_kernel(
        metric, tile_n, ntiles, p_pad, nbuf, b_lane, i8dot
    )
    minima = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # packed stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # aux stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # minima stay in HBM
        out_shape=jax.ShapeDtypeStruct(
            (ntiles, g_tile, b_lane), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(valid_arr, qc, qs_col, qsum8, packed, aux)
    return jnp.transpose(minima, (2, 0, 1)).reshape(
        b_lane, ntiles * g_tile
    )


def _permute_query(qf: jnp.ndarray, dim: int, p_pad: int) -> jnp.ndarray:
    """[B, dim] -> [B, 2*P_pad] in the padded column-split order: original
    col j < h stays at j; col h+j moves to P_pad+j; the rest are zeros."""
    h = packed_width(dim)
    b = qf.shape[0]
    out_lo = jnp.zeros((b, p_pad), qf.dtype).at[:, :h].set(qf[:, :h])
    out_hi = (
        jnp.zeros((b, p_pad), qf.dtype).at[:, : dim - h].set(qf[:, h:])
    )
    return jnp.concatenate([out_lo, out_hi], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("metric", "dim", "interpret")
)
def _int4_block_minima(
    queries: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: jnp.ndarray,
    csq: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    metric: DistanceMetric,
    dim: int,
    interpret: bool = False,
):
    """One streaming pass over the packed codes: per-128-row surrogate
    minima [B_pad, N_pad/128], plus the (permuted) query codes/scales the
    finish stage reuses."""
    b = queries.shape[0]
    n, p = packed.shape
    # 128-aligned (not 64): the plane dots operate on [T, P_pad] halves,
    # whose lane width must hit Mosaic's 128 tiling on its own
    p_pad = _round_up(p, 128)
    b_pad = _round_up(max(b, 8), 8)
    tile_n = _tile_rows(p_pad, 2)
    n_pad = _round_up(max(n, tile_n), tile_n)
    ntiles = n_pad // tile_n
    g_tile = tile_n // BLOCK

    qf = jnp.where(
        jnp.isfinite(queries.astype(jnp.float32)),
        queries.astype(jnp.float32),
        0.0,
    )
    qperm = _permute_query(qf, dim, p_pad)  # [B, 2*P_pad]
    qc, qscale, _ = quantize_query_int8(qperm)
    if b_pad != b:
        qc = jnp.pad(qc, ((0, b_pad - b), (0, 0)))
        qscale = jnp.pad(qscale, (0, b_pad - b))
    if p_pad != p or n_pad != n:
        packed = jnp.pad(
            packed, ((0, n_pad - n), (0, p_pad - p)), constant_values=0x88
        )
    if n_pad != n:
        alpha = jnp.pad(alpha, (0, n_pad - n))
        csq = jnp.pad(csq, (0, n_pad - n))
    valid_arr = jnp.asarray(valid, jnp.int32).reshape(1, 1)
    qs_col = qscale.reshape(b_pad, 1)
    qsum8 = (
        8.0 * jnp.sum(qc.astype(jnp.int32), axis=1).astype(jnp.float32)
    ).reshape(b_pad, 1)
    alpha2 = alpha.reshape(1, n_pad)
    csq2 = csq.reshape(1, n_pad)

    kernel = _make_kernel(metric, tile_n, p_pad)
    flops = 2 * b_pad * n_pad * (2 * p_pad)
    bytes_accessed = (
        n_pad * p_pad + n_pad * 8 + b_pad * 2 * p_pad
        + ntiles * b_pad * g_tile * 4
    )
    minima = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (b_pad, 2 * p_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, p_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, b_pad, g_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ntiles, b_pad, g_tile), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(valid_arr, qc, qs_col, qsum8, alpha2, csq2, packed)
    return jnp.moveaxis(minima, 0, 1).reshape(b_pad, ntiles * g_tile)


@functools.partial(jax.jit, static_argnames=("metric", "k", "b", "dim"))
def _finish_from_minima(
    minima, queries, packed, alpha, csq, valid,
    *, metric: DistanceMetric, k: int, b: int, dim: int,
):
    """Exact int4 top-k from surrogate block minima: select k groups per
    query, gather the k*128 packed candidate rows, rescore with the exact
    int4 composition, final top-k (same contract as int4_scan_topk)."""
    n = packed.shape[0]
    g_total = minima.shape[1]
    m = minima[:b]
    kg = min(k, g_total)
    _, gidx = jax.lax.top_k(-m, kg)
    gidx = jnp.sort(gidx, axis=-1)  # ascending row order for tie parity

    pos = (
        gidx[:, :, None] * BLOCK + jnp.arange(BLOCK, dtype=jnp.int32)
    ).reshape(b, kg * BLOCK)
    safe_pos = jnp.clip(pos, 0, n - 1)
    flat = safe_pos.reshape(-1)
    cand_packed = jnp.take(packed, flat, axis=0).reshape(
        b, kg * BLOCK, packed.shape[1]
    )
    cand_alpha = jnp.take(alpha, flat, axis=0).reshape(b, kg * BLOCK)
    cand_csq = jnp.take(csq, flat, axis=0).reshape(b, kg * BLOCK)

    qc, qscale, qsq = quantize_query_int8(queries)
    qf = jnp.where(
        jnp.isfinite(queries.astype(jnp.float32)),
        queries.astype(jnp.float32),
        0.0,
    )

    def per_query(qc1, qs1, qq1, qf1, pk, al, cs):
        d = _int4_tile_distance(
            qc1[None], qs1[None], qq1[None], qf1[None],
            pk, al, cs, metric, dim,
        )
        return d[0]

    d = jax.vmap(per_query)(
        qc, qscale, qsq, qf, cand_packed, cand_alpha, cand_csq
    )  # [b, kg*BLOCK]
    d = jnp.where(jnp.isnan(d), jnp.inf, d)
    d = jnp.where((pos < valid) & (pos < n), d, jnp.inf)

    kk = min(k, d.shape[-1])
    neg_vals, cpos = jax.lax.top_k(-d, kk)
    out_vals = -neg_vals
    out_idx = jnp.take_along_axis(pos, cpos, axis=-1)
    if kk < k:
        padw = ((0, 0), (0, k - kk))
        out_vals = jnp.pad(out_vals, padw, constant_values=jnp.inf)
        out_idx = jnp.pad(out_idx, padw, constant_values=-1)
    out_idx = jnp.where(jnp.isposinf(out_vals), -1, out_idx)
    return out_vals, out_idx.astype(jnp.int32)


def pallas_int4_scan_topk(
    queries: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: jnp.ndarray,
    csq: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    *,
    dim: int,
    valid_count: jnp.ndarray | int | None = None,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused int4 top-k via the packed block-minima kernel + exact finish.
    Same contract as ops.quantize4.int4_scan_topk (no row_mask — callers
    with masks route to the XLA path)."""
    import os

    b = queries.shape[0]
    n = packed.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    valid = jnp.asarray(n if valid_count is None else valid_count, jnp.int32)
    if os.environ.get("SVT_PALLAS_INT4_MANUAL", "1") == "1":
        minima = _int4_block_minima_manual(
            queries, packed, alpha, csq, valid,
            metric=metric, dim=dim, interpret=interpret,
        )
    else:
        minima = _int4_block_minima(
            queries, packed, alpha, csq, valid,
            metric=metric, dim=dim, interpret=interpret,
        )
    return _finish_from_minima(
        minima, queries, packed, alpha, csq, valid,
        metric=metric, k=k, b=b, dim=dim,
    )
