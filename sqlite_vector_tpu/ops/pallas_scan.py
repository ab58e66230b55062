"""Pallas fused scan kernel: distance + block-minima in one HBM pass.

This is the TPU replacement for the reference's hot loop
(vFullScanRun / vQuantRunMemory, src/sqlite-vector.c:2071-2157). The design
keeps the kernel PURELY bandwidth/matmul-bound and moves selection onto a
128x-smaller summary:

  stage 1 (Pallas, one pass over the matrix):
    - each grid step DMAs one [TILE_N, d] row tile HBM -> VMEM
      (auto-pipelined double buffering),
    - the [B, TILE_N] distance block is one MXU matmul fragment
      (||q-b||^2 = ||q||^2 + ||b||^2 - 2 q.b) or a VPU pass for L1,
    - the block reduces to per-128-row minima [B, TILE_N/128] — the ONLY
      kernel output. The [B, N] distance matrix never exists; the summary is
      128x smaller than the input's row count.

  stage 2 (XLA, on [B, N/128] minima — tiny):
    - top-k GROUPS by minimum (exact: if a true top-k element's group were
      not selected, k groups would each hold an element smaller than it),
    - gather the k winning 128-row blocks from the original matrix
      (k*128 rows — microscopic) and recompute their exact distances,
    - final top-k, ties resolving to the earliest row like the reference's
      strict `<` replacement (src/sqlite-vector.c:2102-2106).

An earlier revision selected top-k inside the kernel with iterative
argmin/masking; measured 3-4x slower than this split on v5e — in-kernel
selection serializes the VPU against the DMA pipeline, while the block-min
reduce fuses into the matmul epilogue.

dtype support: f32 natively (Precision.HIGHEST products); bf16 feeds the MXU
natively with f32 accumulation; f16 widened in VMEM; u8/i8 use the MXU int8
path with exact int32 accumulation (the quantized-domain distances of
src/sqlite-vector.c:2134-2136).
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

# rows per minima group == VPU lane count
BLOCK = 128

# VMEM budget for the double-buffered row tile (bytes).
_TILE_VMEM_BUDGET = 8 * 1024 * 1024

# Caps before falling back to the XLA scan.
MAX_B = 1024
# Batched L1 stays on the XLA path BY MEASUREMENT (round 3, real v5e): a
# feature-chunked vectorization ([B, TILE_N, C] broadcast accumulating into
# a [B, TILE_N] running sum) spilled 372.64 MB of register-allocator slots
# against the 128 MB VMEM (XLA:TPU "Ran out of memory in memory space vmem")
# after a 19-minute Mosaic compile at B=16 — Mosaic keeps every chunk cube
# live across the accumulation, where XLA's fusion emitter streams the same
# cube through the reduction without materializing it. The per-query-row
# unroll below is VMEM-safe but its code size is O(B); the cap keeps it in
# the small-batch regime where it measured fastest.
MAX_B_L1 = 32
MAX_K = 1024


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


def _variant(metric: DistanceMetric | None = None) -> str:
    """Which kernel variant runs: 'stream' (r5 — queries on the LANE axis,
    per-tile minima streamed OUT to HBM through the DMA slots, the
    restructure that opened pallas_int4's compile envelope), 'manual'
    (r2 — VMEM-resident [ntiles, B, g] minima), or 'grid' (Mosaic auto
    pipeline). SVT_PALLAS_VARIANT overrides; SVT_PALLAS_MANUAL=0 is the
    legacy grid knob. L1 has no matmul form in the transposed orientation,
    so it always rides the manual/grid kernels."""
    import os

    v = os.environ.get("SVT_PALLAS_VARIANT")
    if v not in ("stream", "manual", "grid"):
        v = "manual" if os.environ.get("SVT_PALLAS_MANUAL", "1") == "1" else "grid"
    if v == "stream" and metric is DistanceMetric.L1:
        return "manual"
    return v


def _tile_rows(d_pad: int, itemsize: int, nbuf: int) -> int:
    """ONE tile-sizing rule for every kernel path (grid nbuf=2, manual
    nbuf=env): env override (validated to a multiple of BLOCK in
    [256, 8192] — raw values crashed the in-kernel reshape) or the
    VMEM-budget-derived pow2."""
    import os

    override = os.environ.get("SVT_PALLAS_TILE_ROWS")
    if override:
        t = int(override)
        return max(256, min(8192, (t // BLOCK) * BLOCK))
    budget = int(os.environ.get("SVT_PALLAS_VMEM_BUDGET", _TILE_VMEM_BUDGET))
    tile = budget // (nbuf * d_pad * itemsize)
    tile = 1 << int(np.log2(max(tile, 256)))
    return int(min(tile, 8192))


def _row_tile(d_pad: int, itemsize: int) -> int:
    return _tile_rows(d_pad, itemsize, 2)


# Bound on the manual kernel's un-blocked minima output resident in VMEM
# ([ntiles, b_pad, g_tile] f32 = b_pad * ceil(n/BLOCK) * 4 bytes; v5e VMEM
# is ~128 MB shared with nbuf staged tiles + the query block).
_MINIMA_VMEM_BOUND = 64 * 1024 * 1024
# EMPIRICAL Mosaic-compile fence (STATUS.md round-3 routing table, real
# v5e): the analytic minima bound above models the minima array but NOT
# the register-allocator spill that actually kills the compile ("Ran out
# of memory in memory space vmem. Used 132.40M of 128.00M"). Measured
# envelope at dim 384 / k=20 / f32: b_pad*n = 64*1M COMPILES (262 s);
# 256*1M, 64*4M and 256*4M all CRASH the Mosaic compiler. The spill
# tracks the batch*rows product, so fence on it directly: admit nothing
# beyond the largest configuration measured to compile.
_COMPILE_PAIR_BOUND = 64 * 1_000_000  # b_pad * n, largest measured-good
# STREAM variant fence (r5): streaming the minima to HBM removes the
# b_pad*n-scaling VMEM term (residency = nbuf*(tile + minima slot)
# regardless of N), exactly as it did for pallas_int4 — whose envelope
# probe opened completely once restructured this way. PROVISIONAL until
# this kernel's own envelope is recorded (tools/probe_stream.py
# --envelope on hardware; the traceable-fence rule): start at the manual
# kernel's evidenced bound, raise only to a measured-good product.
_COMPILE_PAIR_BOUND_STREAM = 64 * 1_000_000  # b_lane * n (provisional)
# Bound on the finish step's candidate gather ([b, kg*BLOCK, d_pad] f32 in
# HBM) — without it, allowed (b, k, d) combinations materialize tens of GB.
_FINISH_HBM_BOUND = 2 * 1024 * 1024 * 1024


def supports(
    metric: DistanceMetric,
    dtype,
    dim: int,
    k: int,
    batch: int,
    n: int | None = None,
    variant: str | None = None,
) -> bool:
    """Static predicate: can the Pallas kernel run this configuration?
    Pass `n` (database rows) to also apply the N-dependent memory bounds;
    a False here routes to the XLA scan, which tiles instead. `variant`
    pins which kernel's envelope is checked (default: the env-selected
    one, matching what pallas_scan_topk would run)."""
    import os

    if k <= 0 or k > MAX_K:
        return False
    if metric is DistanceMetric.L1 and batch > MAX_B_L1:
        return False
    if batch > MAX_B:
        return False
    d_pad = _round_up(dim, 128)
    itemsize = max(jnp.dtype(dtype).itemsize, 1)
    # UNCLAMPED tile budget (the _tile_rows helper clamps to >=256, which
    # would make this check vacuous): dims so large that a 256-row tile
    # overflows the VMEM budget fall back to the XLA scan
    budget = int(os.environ.get("SVT_PALLAS_VMEM_BUDGET", _TILE_VMEM_BUDGET))
    nbuf = (
        int(os.environ.get("SVT_PALLAS_NBUF", "4"))
        if os.environ.get("SVT_PALLAS_MANUAL", "1") == "1"
        else 2
    )
    if budget // (nbuf * d_pad * itemsize) < 256:
        return False
    if variant is None or (
        variant == "stream" and metric is DistanceMetric.L1
    ):
        variant = _variant(metric)
    if n is not None:
        groups = -(-n // BLOCK)
        if variant == "stream":
            # the stream kernel's VMEM residency is N-independent (minima
            # go to HBM through the DMA slots) — only the compile fence
            # and the finish gather bound apply
            b_lane = _round_up(max(batch, 8), 128)
            if b_lane * n > _COMPILE_PAIR_BOUND_STREAM:
                return False
        else:
            b_pad = _round_up(max(batch, 8), 8)
            # measured Mosaic failure envelope first (register-allocator
            # spill — see _COMPILE_PAIR_BOUND): every config in STATUS.md's
            # routing table that failed to compile is rejected here, so
            # SVT_FORCE_PALLAS=1 can never route into a known compiler crash
            if b_pad * n > _COMPILE_PAIR_BOUND:
                return False
            if b_pad * groups * 4 > _MINIMA_VMEM_BOUND:
                return False
        kg = min(k, groups)
        if batch * kg * BLOCK * d_pad * 4 > _FINISH_HBM_BOUND:
            return False
    return True


def _distance_block(q, tile, bsq, metric: DistanceMetric, is_int: bool):
    """[B, TILE_N] distance fragment. L2 stays squared (sqrt post-merge)."""
    b_pad = q.shape[0]

    if metric is DistanceMetric.L1:
        acc = jnp.int32 if is_int else jnp.float32
        qf = q.astype(acc)
        tf = tile.astype(acc)
        # one [TILE_N, d] VPU pass per query row (static unroll, B capped by
        # MAX_B_L1 — see the cap's comment for the measured reason a
        # vectorized batched form cannot live in VMEM)
        rows = []
        for i in range(b_pad):
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
        # self-distances are exactly 0 like the reference's direct kernels;
        # finite-only so Inf rows stay +Inf (excluded), not clamped to 0
        resid = FLT_EPSILON * 16.0 * (qsq + bsqf)
        return jnp.where((d <= resid) & jnp.isfinite(resid), 0.0, d)
    # COSINE
    denom = jnp.sqrt(qsq) * jnp.sqrt(bsqf)
    safe = jnp.where(denom > 0.0, denom, 1.0)
    cos = jnp.where(denom > 0.0, dot / safe, 0.0)
    d = jnp.where(jnp.isnan(dot) | jnp.isnan(denom), jnp.nan, 1.0 - cos)
    # zero-norm -> 1.0 LAST (reference/oracle precedence; see distance.py)
    return jnp.where((qsq == 0.0) | (bsqf == 0.0), 1.0, d)


def _make_kernel(metric: DistanceMetric, tile_n: int, is_int: bool):
    def kernel(valid_ref, q_ref, bsq_ref, tile_ref, mins_ref):
        i = pl.program_id(0)
        q = q_ref[:]
        tile = tile_ref[:]
        bsq = bsq_ref[:]  # [1, TILE_N]
        b_pad = q.shape[0]
        dist = _distance_block(q, tile, bsq, metric, is_int)
        # near-zero snap BEFORE ranking, exactly like the XLA path
        # (pairwise_distance snap=True): otherwise a raw 4e-7 outranks a
        # true 0.0 and backend routing silently changes the neighbor set.
        # L2 rides in the SQUARED domain here (sqrt deferred to the
        # finish), so its threshold is NEARLY_ZERO^2 — snapping squared
        # values at NEARLY_ZERO would zero true distances up to ~9.8e-4
        from sqlite_vector_tpu.ops.distance import NEARLY_ZERO

        thresh = (
            NEARLY_ZERO * NEARLY_ZERO
            if metric is DistanceMetric.L2
            else NEARLY_ZERO
        )
        dist = jnp.where(jnp.abs(dist) <= thresh, 0.0, dist)
        # NaN -> +inf: rows with NaN distances are never selected, like the
        # reference's strict `<` slot replacement (src/sqlite-vector.c:2102)
        dist = jnp.where(jnp.isnan(dist), jnp.inf, dist)
        # mask padding rows (>= valid_count) to +inf — the analogue of
        # skipping NULL rows in the reference scan (src/sqlite-vector.c:2093)
        start = i * tile_n
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (b_pad, tile_n), 1)
        dist = jnp.where(start + iota_n < valid_ref[0, 0], dist, jnp.inf)
        mins_ref[0] = jnp.min(
            dist.reshape(b_pad, tile_n // BLOCK, BLOCK), axis=-1
        )

    return kernel


def _make_manual_kernel(
    metric: DistanceMetric,
    tile_n: int,
    ntiles: int,
    is_int: bool,
    nbuf: int,
):
    """Manual multi-buffered DMA variant (pallas guide double-buffering
    pattern, generalized to `nbuf` slots): one kernel invocation loops over
    all row tiles, overlapping HBM->VMEM copies with compute explicitly.
    Mosaic's automatic grid pipeline measured only ~45% of the chip's
    streaming bandwidth on this workload; deeper manual buffering hides the
    per-DMA latency. Tile squared-norms are computed in-kernel (the tile is
    already in VMEM), removing the bsq input stream entirely."""

    def kernel(valid_ref, q_ref, base_hbm, mins_ref):
        q = q_ref[:]
        b_pad = q.shape[0]

        def body(scratch, sems):
            def get_dma(slot, idx):
                return pltpu.make_async_copy(
                    base_hbm.at[pl.ds(idx * tile_n, tile_n), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            for i in range(min(nbuf - 1, ntiles)):
                get_dma(i, i).start()

            def loop(i, carry):
                slot = jax.lax.rem(i, nbuf)
                # start the DMA nbuf-1 tiles ahead
                @pl.when(i + nbuf - 1 < ntiles)
                def _():
                    get_dma(jax.lax.rem(i + nbuf - 1, nbuf), i + nbuf - 1).start()

                pltpu.make_async_copy(
                    base_hbm.at[pl.ds(i * tile_n, tile_n), :],
                    scratch.at[slot],
                    sems.at[slot],
                ).wait()
                tile = scratch[slot]
                if is_int:
                    ti = tile.astype(jnp.int32)
                    bsq = jnp.sum(ti * ti, axis=-1)[None, :]
                else:
                    tf = tile.astype(jnp.float32)
                    bsq = jnp.sum(tf * tf, axis=-1)[None, :]
                dist = _distance_block(q, tile, bsq, metric, is_int)
                # near-zero snap before ranking (match the XLA path; see
                # _make_kernel — L2 is in the squared domain here)
                from sqlite_vector_tpu.ops.distance import NEARLY_ZERO

                thresh = (
                    NEARLY_ZERO * NEARLY_ZERO
                    if metric is DistanceMetric.L2
                    else NEARLY_ZERO
                )
                dist = jnp.where(jnp.abs(dist) <= thresh, 0.0, dist)
                dist = jnp.where(jnp.isnan(dist), jnp.inf, dist)
                start = i * tile_n
                iota_n = jax.lax.broadcasted_iota(
                    jnp.int32, (b_pad, tile_n), 1
                )
                dist = jnp.where(
                    start + iota_n < valid_ref[0, 0], dist, jnp.inf
                )
                mins_ref[i] = jnp.min(
                    dist.reshape(b_pad, tile_n // BLOCK, BLOCK), axis=-1
                )
                return carry

            jax.lax.fori_loop(0, ntiles, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM(
                (nbuf, tile_n, base_hbm.shape[1]), base_hbm.dtype
            ),
            sems=pltpu.SemaphoreType.DMA((nbuf,)),
        )

    return kernel


def _distance_block_t(q, tile, bsq_col, metric: DistanceMetric, is_int: bool):
    """Transposed [TILE_N, b_lane] distance fragment for the STREAM kernel
    (queries on the LANE axis — see _make_manual_stream_kernel). Same
    compositions as _distance_block with the per-query terms as
    [1, b_lane] rows and the per-tile-row terms as [T, 1] columns; the
    MXU work is identical (the array is 128 lanes wide either way). L1
    has no matmul form here and routes to the manual/grid kernels."""
    dn = (((1,), (1,)), ((), ()))
    if is_int:
        dot = jax.lax.dot_general(
            tile, q, dimension_numbers=dn, preferred_element_type=jnp.int32
        )
        qi = q.astype(jnp.int32)
        qsq = jnp.sum(qi * qi, axis=-1)[None, :]  # [1, b_lane]
        if metric is DistanceMetric.DOT:
            return (-dot).astype(jnp.float32)
        if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
            d = qsq + bsq_col - 2 * dot  # exact int32
            return d.astype(jnp.float32)
        # COSINE (quantized domain)
        dotf = dot.astype(jnp.float32)
        qsqf = qsq.astype(jnp.float32)
        bsqf = bsq_col.astype(jnp.float32)
        denom = jnp.sqrt(qsqf) * jnp.sqrt(bsqf)
        safe = jnp.where(denom > 0.0, denom, 1.0)
        cos = jnp.where(denom > 0.0, dotf / safe, 0.0)
        return jnp.where((qsqf == 0.0) | (bsqf == 0.0), 1.0, 1.0 - cos)

    mm_q = q
    mm_tile = tile
    if q.dtype == jnp.float16:
        mm_q = q.astype(jnp.float32)
        mm_tile = tile.astype(jnp.float32)
    from sqlite_vector_tpu.ops.distance import matmul_precision

    precision = None if mm_q.dtype == jnp.bfloat16 else matmul_precision()
    dot = jax.lax.dot_general(
        mm_tile,
        mm_q,
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    qf = q.astype(jnp.float32)
    qsq = jnp.sum(qf * qf, axis=-1)[None, :]  # [1, b_lane]
    if metric is DistanceMetric.DOT:
        return -dot
    bsqf = bsq_col.astype(jnp.float32)
    if metric in (DistanceMetric.L2, DistanceMetric.SQUARED_L2):
        d = qsq + bsqf - 2.0 * dot
        resid = FLT_EPSILON * 16.0 * (qsq + bsqf)
        return jnp.where((d <= resid) & jnp.isfinite(resid), 0.0, d)
    # COSINE
    denom = jnp.sqrt(qsq) * jnp.sqrt(bsqf)
    safe = jnp.where(denom > 0.0, denom, 1.0)
    cos = jnp.where(denom > 0.0, dot / safe, 0.0)
    d = jnp.where(jnp.isnan(dot) | jnp.isnan(denom), jnp.nan, 1.0 - cos)
    return jnp.where((qsq == 0.0) | (bsqf == 0.0), 1.0, d)


def _make_manual_stream_kernel(
    metric: DistanceMetric,
    tile_n: int,
    ntiles: int,
    is_int: bool,
    nbuf: int,
    b_lane: int,
):
    """STREAM variant (r5, ported from pallas_int4's restructure): queries
    on the LANE axis (b_lane, a 128 multiple), rows on sublanes; per-tile
    minima stream OUT to HBM through the same nbuf DMA slots. The manual
    kernel's VMEM-resident [ntiles, B, g] minima output was THE compile
    binder (register spill tracking b_pad*n — _COMPILE_PAIR_BOUND = 64M);
    here VMEM residency is nbuf*(tile + [g_tile, b_lane] minima slot)
    regardless of N, which opened pallas_int4's envelope to every probed
    b_lane*n up to 2.56e9. Mosaic requires VMEM slice lane widths
    128-aligned, hence the transposed [g_tile, b_lane] minima slot (the
    [B, g_tile] orientation cannot be sliced at g_tile = 16)."""
    g_tile = tile_n // BLOCK

    def kernel(valid_ref, q_ref, base_hbm, mins_hbm):
        q = q_ref[:]  # [b_lane, d_pad]

        def body(scratch, mins_scratch, sems, out_sems):
            def tile_dma(slot, idx):
                return pltpu.make_async_copy(
                    base_hbm.at[pl.ds(idx * tile_n, tile_n), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            def out_dma(slot, idx):
                return pltpu.make_async_copy(
                    mins_scratch.at[slot],
                    mins_hbm.at[idx],
                    out_sems.at[slot],
                )

            for i in range(min(nbuf - 1, ntiles)):
                tile_dma(i, i).start()

            def loop(i, carry):
                slot = jax.lax.rem(i, nbuf)

                @pl.when(i + nbuf - 1 < ntiles)
                def _():
                    nxt = jax.lax.rem(i + nbuf - 1, nbuf)
                    tile_dma(nxt, i + nbuf - 1).start()

                tile_dma(slot, i).wait()
                tile = scratch[slot]
                if is_int:
                    ti = tile.astype(jnp.int32)
                    bsq = jnp.sum(ti * ti, axis=-1, keepdims=True)  # [T, 1]
                else:
                    tf = tile.astype(jnp.float32)
                    bsq = jnp.sum(tf * tf, axis=-1, keepdims=True)
                dist = _distance_block_t(q, tile, bsq, metric, is_int)
                # identical ranking semantics to _make_kernel: near-zero
                # snap (L2 in the squared domain), NaN -> +inf, padding
                # rows (>= valid_count) -> +inf
                thresh = (
                    NEARLY_ZERO * NEARLY_ZERO
                    if metric is DistanceMetric.L2
                    else NEARLY_ZERO
                )
                dist = jnp.where(jnp.abs(dist) <= thresh, 0.0, dist)
                dist = jnp.where(jnp.isnan(dist), jnp.inf, dist)
                start = i * tile_n
                iota_n = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_n, b_lane), 0
                )
                dist = jnp.where(
                    start + iota_n < valid_ref[0, 0], dist, jnp.inf
                )

                # the copy issued nbuf iterations ago must land before the
                # slot is overwritten
                @pl.when(i >= nbuf)
                def _():
                    out_dma(slot, i - nbuf).wait()

                mins_scratch[slot] = jnp.min(
                    dist.reshape(g_tile, BLOCK, b_lane), axis=1
                )
                out_dma(slot, i).start()
                return carry

            jax.lax.fori_loop(0, ntiles, loop, 0)
            # drain the last <= nbuf in-flight output copies
            for j in range(max(0, ntiles - nbuf), ntiles):
                out_dma(j % nbuf, j).wait()

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM(
                (nbuf, tile_n, base_hbm.shape[1]), base_hbm.dtype
            ),
            mins_scratch=pltpu.VMEM((nbuf, g_tile, b_lane), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((nbuf,)),
            out_sems=pltpu.SemaphoreType.DMA((nbuf,)),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def _pallas_block_minima_stream(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    metric: DistanceMetric,
    interpret: bool = False,
):
    import os

    b, d = queries.shape
    n = base.shape[0]
    is_int = jnp.issubdtype(base.dtype, jnp.integer)
    d_pad = _round_up(d, 128)
    # queries live on the LANE axis: pad to the full 128-lane vreg width —
    # the MXU/VPU process 128 lanes per pass regardless, so b < 128 costs
    # the same as 128, and the padding buys the aligned minima slice
    b_lane = _round_up(max(b, 8), 128)
    nbuf = int(os.environ.get("SVT_PALLAS_NBUF", "4"))
    tile_n = _tile_rows(d_pad, base.dtype.itemsize, nbuf)
    n_pad = _round_up(max(n, tile_n), tile_n)
    ntiles = n_pad // tile_n
    g_tile = tile_n // BLOCK

    if d_pad != d or b_lane != b:
        queries = jnp.pad(queries, ((0, b_lane - b), (0, d_pad - d)))
    if d_pad != d or n_pad != n:
        base = jnp.pad(base, ((0, n_pad - n), (0, d_pad - d)))
    valid_arr = jnp.asarray(valid, jnp.int32).reshape(1, 1)

    kernel = _make_manual_stream_kernel(
        metric, tile_n, ntiles, bool(is_int), nbuf, b_lane
    )
    minima = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, manual DMA
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # minima stay in HBM
        out_shape=jax.ShapeDtypeStruct((ntiles, g_tile, b_lane), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(valid_arr, queries, base)
    return jnp.transpose(minima, (2, 0, 1)).reshape(b_lane, ntiles * g_tile)


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def _pallas_block_minima_manual(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    metric: DistanceMetric,
    interpret: bool = False,
):
    import os

    b, d = queries.shape
    n = base.shape[0]
    is_int = jnp.issubdtype(base.dtype, jnp.integer)
    d_pad = _round_up(d, 128)
    b_pad = _round_up(max(b, 8), 8)
    nbuf = int(os.environ.get("SVT_PALLAS_NBUF", "4"))
    # manual buffering holds nbuf tiles: shrink the per-tile budget share
    tile_n = _tile_rows(d_pad, base.dtype.itemsize, nbuf)
    n_pad = _round_up(max(n, tile_n), tile_n)
    ntiles = n_pad // tile_n
    g_tile = tile_n // BLOCK

    if d_pad != d or b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, d_pad - d)))
    if d_pad != d or n_pad != n:
        base = jnp.pad(base, ((0, n_pad - n), (0, d_pad - d)))
    valid_arr = jnp.asarray(valid, jnp.int32).reshape(1, 1)

    kernel = _make_manual_kernel(metric, tile_n, ntiles, bool(is_int), nbuf)
    minima = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, manual DMA
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles, b_pad, g_tile), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(valid_arr, queries, base)
    return jnp.moveaxis(minima, 0, 1).reshape(b_pad, ntiles * g_tile)


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def _pallas_block_minima(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    base_sq_norms: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    metric: DistanceMetric,
    interpret: bool = False,
):
    """One streaming pass: per-128-row distance minima [B_pad, N_pad/128]."""
    b, d = queries.shape
    n = base.shape[0]
    is_int = jnp.issubdtype(base.dtype, jnp.integer)

    import os

    d_pad = _round_up(d, 128)
    min_b = int(os.environ.get("SVT_PALLAS_BPAD", "8"))
    b_pad = _round_up(max(b, min_b), min_b)
    tile_n = _row_tile(d_pad, base.dtype.itemsize)
    n_pad = _round_up(max(n, tile_n), tile_n)
    ntiles = n_pad // tile_n
    g_tile = tile_n // BLOCK

    if d_pad != d or b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, d_pad - d)))
    if d_pad != d or n_pad != n:
        base = jnp.pad(base, ((0, n_pad - n), (0, d_pad - d)))
    bsq = base_sq_norms
    if n_pad != n:
        bsq = jnp.pad(bsq, (0, n_pad - n))
    bsq2 = bsq.reshape(1, n_pad)
    valid_arr = jnp.asarray(valid, jnp.int32).reshape(1, 1)

    kernel = _make_kernel(metric, tile_n, bool(is_int))
    flops = 2 * b_pad * n_pad * d_pad
    bytes_accessed = (
        n_pad * d_pad * base.dtype.itemsize
        + b_pad * d_pad * queries.dtype.itemsize
        + ntiles * b_pad * g_tile * 4
    )
    minima = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
    )(valid_arr, queries, bsq2, base)
    # [ntiles, B_pad, G_tile] -> [B_pad, N_pad/128] in global block order
    return jnp.moveaxis(minima, 0, 1).reshape(b_pad, ntiles * g_tile)


@functools.partial(jax.jit, static_argnames=("metric", "k", "b"))
def _finish_from_minima(
    minima, queries, base, valid, *, metric: DistanceMetric, k: int, b: int
):
    """Exact top-k from block minima: select k groups, rescore k*128 rows."""
    n = base.shape[0]
    g_total = minima.shape[1]
    m = minima[:b]  # [B, G]
    kg = min(k, g_total)
    neg, gidx = jax.lax.top_k(-m, kg)
    gidx = jnp.sort(gidx, axis=-1)  # ascending row order for tie parity

    # gather the winning blocks' rows: positions [B, kg*BLOCK]
    pos = (gidx[:, :, None] * BLOCK + jnp.arange(BLOCK, dtype=jnp.int32)).reshape(
        b, kg * BLOCK
    )
    safe_pos = jnp.clip(pos, 0, n - 1)
    cand = jnp.take(base, safe_pos.reshape(-1), axis=0).reshape(
        b, kg * BLOCK, base.shape[1]
    )

    # exact rescore of the candidates (shared with mode="rerank")
    from sqlite_vector_tpu.ops.rerank import candidate_distances

    d = candidate_distances(queries, cand, metric)
    # near-zero snap BEFORE ranking (the XLA path snaps pre-top-k): raw
    # 4e-7 vs true 0.0 must tie, with the earliest row winning. L2 is in
    # the squared domain until the sqrt below, so snap at NEARLY_ZERO^2
    _t = (
        NEARLY_ZERO * NEARLY_ZERO
        if metric is DistanceMetric.L2
        else NEARLY_ZERO
    )
    d = jnp.where(jnp.abs(d) <= _t, 0.0, d)
    d = jnp.where(jnp.isnan(d), jnp.inf, d)  # NaN rows are never selected

    # padding rows / out-of-range positions -> +inf
    d = jnp.where((pos < valid) & (pos < n), d, jnp.inf)

    kk = min(k, d.shape[-1])
    neg_vals, cpos = jax.lax.top_k(-d, kk)
    out_vals = -neg_vals
    out_idx = jnp.take_along_axis(pos, cpos, axis=-1)
    if kk < k:
        padw = ((0, 0), (0, k - kk))
        out_vals = jnp.pad(out_vals, padw, constant_values=jnp.inf)
        out_idx = jnp.pad(out_idx, padw, constant_values=-1)
    if metric is DistanceMetric.L2:
        out_vals = jnp.sqrt(out_vals)
    out_vals = jnp.where(
        jnp.abs(out_vals) <= NEARLY_ZERO, jnp.zeros_like(out_vals), out_vals
    )
    out_idx = jnp.where(jnp.isposinf(out_vals), -1, out_idx)
    return out_vals, out_idx.astype(jnp.int32)


# Measured routing pocket for the STREAM variant in production
# (fused_scan_topk): None disables the route. Set ONLY from a recorded
# hardware head-to-head (tools/probe_stream.py, STATUS.md round 5) — the
# same evidence rule as quantize4._BATCHED_XLA_CROSSOVER_ROWS.
_STREAM_ROUTE_MIN_ROWS: int | None = None
_STREAM_ROUTE_MIN_BATCH = 8


def stream_route(metric, dtype, dim: int, k: int, batch: int, n: int) -> bool:
    """Should production routing send this config to the STREAM kernel?
    True only inside the measured win pocket (batched, large-N) AND the
    compile envelope. The XLA scan stays the default everywhere else —
    the r3 routing decision, unchanged."""
    if _STREAM_ROUTE_MIN_ROWS is None:
        return False
    if metric is DistanceMetric.L1:
        return False
    if batch < _STREAM_ROUTE_MIN_BATCH or n < _STREAM_ROUTE_MIN_ROWS:
        return False
    if not enabled():
        return False
    import os

    if os.environ.get("SVT_PALLAS_VARIANT") in ("manual", "grid"):
        return False  # explicit override wins
    return supports(metric, dtype, dim, k, batch, n, variant="stream")


def pallas_scan_topk(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    *,
    valid_count: jnp.ndarray | int | None = None,
    base_sq_norms: jnp.ndarray | None = None,
    interpret: bool | None = None,
    variant: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused top-k scan via the Pallas block-minima kernel + exact finish.
    Same contract as ops.scan.scan_topk. `variant` overrides the env
    selection ('stream' | 'manual' | 'grid') — the production router
    passes it explicitly so routing never depends on ambient env state."""
    b, d = queries.shape
    n = base.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    valid = jnp.asarray(n if valid_count is None else valid_count, jnp.int32)

    if variant is None or (variant == "stream" and metric is DistanceMetric.L1):
        variant = _variant(metric)
    if variant == "stream":
        # stream kernel: tile norms in-kernel, minima to HBM (r5)
        minima = _pallas_block_minima_stream(
            queries, base, valid, metric=metric, interpret=interpret
        )
    elif variant == "manual":
        # the manual kernel computes tile norms in-kernel (the tile is
        # already in VMEM) — materializing base_sq_norms here would cost a
        # full extra HBM pass for nothing
        minima = _pallas_block_minima_manual(
            queries, base, valid, metric=metric, interpret=interpret
        )
    else:
        needs_sq = metric in (
            DistanceMetric.L2,
            DistanceMetric.SQUARED_L2,
            DistanceMetric.COSINE,
        )
        if (
            base_sq_norms is not None
            and jnp.issubdtype(base.dtype, jnp.integer)
            and base_sq_norms.dtype != jnp.int32
        ):
            # exact-integer contract: a float32 norm cache is already
            # rounded above 2^24 and the kernel's astype(int32) would
            # truncate it — recompute, like _pairwise_int's guard
            # (ops/distance.py)
            base_sq_norms = None
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
        minima = _pallas_block_minima(
            queries, base, base_sq_norms, valid, metric=metric,
            interpret=interpret,
        )
    return _finish_from_minima(
        minima, queries, base, valid, metric=metric, k=k, b=b
    )
