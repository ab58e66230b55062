"""Exact/quantized scan executors (XLA path).

The TPU analogue of vFullScanRun / vQuantRunMemory
(src/sqlite-vector.c:2071-2117, 2121-2157): instead of a single-threaded
row loop with an indirect SIMD-kernel call per row, the database is an
HBM-resident [N, dim] matrix scanned in row tiles; each tile's distances are
one MXU matmul fragment and the running top-k is merged per tile.

Two entry points:
  - scan_topk:      fused scan + top-k (the vector_full_scan / _quantize_scan
                    executors; batched queries are first-class).
  - scan_distances: full distance vector (the *_stream virtual tables,
                    src/sqlite-vector.c:2243-2373).

Device code works in positional int32 row indices; the Dataset layer maps
positions to 64-bit row ids on the host (mirroring the reference's int64
rowids without forcing jax_enable_x64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sqlite_vector_tpu.ops.distance import pairwise_distance
from sqlite_vector_tpu.ops.topk import merge_topk, topk_ascending
from sqlite_vector_tpu.types import DistanceMetric, VectorType

# NOTE on tiling (measured on v5e): the un-tiled formulation (one matmul +
# hierarchical top-k over the full [B, N] block) is ~2.2x faster than a
# lax.scan over row tiles, so _auto_row_tile sizes the tile to put the whole
# scan in ONE tile whenever the [B, N] f32 intermediate fits the budget;
# tiling only kicks in to bound that intermediate for large B*N.
# L1 (and the non-finite policy path) evaluate an element-wise [B, tile, d]
# cube that XLA fuses into the reduction — it is never materialized, so the
# tile can be much larger than a materialized-intermediate budget would
# allow. Measured on v5e (1M x 384, B in {1, 8}): 32768 is ~9% faster than
# 8192 and within noise of 131072.
L1_ROW_TILE = 32768
# cap on the [B, N] f32 distance intermediate (bytes)
INTERMEDIATE_BUDGET = 256 * 1024 * 1024


def _auto_row_tile(n: int, b: int, metric: DistanceMetric) -> int:
    if metric is DistanceMetric.L1:
        return L1_ROW_TILE
    by_budget = INTERMEDIATE_BUDGET // (4 * max(b, 1))
    # budget is the hard cap (large B shrinks the tile); 8192 keeps tiles
    # efficient when B is huge
    return int(min(max(n, 1), max(8192, by_budget)))


def _sanitize_nan(dist: jnp.ndarray) -> jnp.ndarray:
    """NaN distances -> +inf before top-k: the reference's k-slot loop uses
    a strict `<` that a NaN never wins (src/sqlite-vector.c:2102-2106), so
    rows with NaN distances are never returned — +inf reproduces that (rows
    at +inf are reported as unfilled slots and trimmed)."""
    return jnp.where(jnp.isnan(dist), jnp.inf, dist)


def _tile_distance(
    q: jnp.ndarray,
    tile: jnp.ndarray,
    metric: DistanceMetric,
    tile_sq: jnp.ndarray | None,
    policy_vtype: VectorType | None,
) -> jnp.ndarray:
    if policy_vtype is not None:
        from sqlite_vector_tpu.ops.nonfinite import policy_pairwise

        return policy_pairwise(q, tile, metric, policy_vtype)
    return pairwise_distance(q, tile, metric, base_sq_norms=tile_sq)


def _num_tiles(n: int, tile: int) -> int:
    return -(-n // tile)


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "row_tile", "policy_vtype")
)
def scan_topk(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    *,
    valid_count: jnp.ndarray | int | None = None,
    base_sq_norms: jnp.ndarray | None = None,
    row_mask: jnp.ndarray | None = None,
    row_tile: int | None = None,
    policy_vtype: VectorType | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused top-k scan.

    queries: [B, d]; base: [Npad, d] (rows >= valid_count are padding and are
    masked to +inf — the analogue of skipping NULL rows in the reference scan,
    src/sqlite-vector.c:2093). row_mask ([N] bool, optional) excludes rows
    where False — filtered search, the TPU-native form of composing the
    streaming vtabs with a SQL WHERE clause. Returns (distances [B, k],
    positions [B, k]) sorted ascending; unfilled slots hold +inf / -1
    (trim behavior: src/sqlite-vector.c:1816-1817).
    """
    b, d = queries.shape
    n = base.shape[0]
    if row_tile is None:
        # the policy path evaluates an element-wise [B, tile, d] cube (like
        # L1), so it uses the small L1 tile
        row_tile = _auto_row_tile(
            n, b, DistanceMetric.L1 if policy_vtype is not None else metric
        )
    valid = jnp.asarray(n if valid_count is None else valid_count, jnp.int32)

    if n <= row_tile:
        dist = _tile_distance(queries, base, metric, base_sq_norms, policy_vtype)
        dist = _sanitize_nan(dist)
        row_idx = jnp.arange(n, dtype=jnp.int32)
        dist = jnp.where(row_idx[None, :] < valid, dist, jnp.inf)
        if row_mask is not None:
            dist = jnp.where(row_mask[None, :], dist, jnp.inf)
        vals, idx = topk_ascending(dist, k)
        return vals, jnp.where(jnp.isposinf(vals), -1, idx).astype(jnp.int32)

    # pad base rows to a tile multiple so the scan body has a static shape
    ntiles = _num_tiles(n, row_tile)
    npad = ntiles * row_tile
    if npad != n:
        base = jnp.pad(base, ((0, npad - n), (0, 0)))
        if base_sq_norms is not None:
            base_sq_norms = jnp.pad(base_sq_norms, (0, npad - n))
        if row_mask is not None:
            row_mask = jnp.pad(row_mask, (0, npad - n))

    kk = min(k, row_tile)
    init_vals = jnp.full((b, k), jnp.inf, jnp.float32)
    init_ids = jnp.full((b, k), -1, jnp.int32)

    def body(carry, tile_idx):
        run_vals, run_ids = carry
        start = tile_idx * row_tile
        tile = jax.lax.dynamic_slice_in_dim(base, start, row_tile, axis=0)
        tile_sq = (
            jax.lax.dynamic_slice_in_dim(base_sq_norms, start, row_tile)
            if base_sq_norms is not None
            else None
        )
        dist = _tile_distance(queries, tile, metric, tile_sq, policy_vtype)
        dist = _sanitize_nan(dist)
        row_idx = start + jnp.arange(row_tile, dtype=jnp.int32)
        dist = jnp.where(row_idx[None, :] < valid, dist, jnp.inf)
        if row_mask is not None:
            tile_mask = jax.lax.dynamic_slice_in_dim(row_mask, start, row_tile)
            dist = jnp.where(tile_mask[None, :], dist, jnp.inf)
        vals, idx = topk_ascending(dist, kk)
        run_vals, run_ids = merge_topk(
            run_vals, run_ids, vals, (start + idx).astype(jnp.int32), k
        )
        return (run_vals, run_ids), None

    (vals, idx), _ = jax.lax.scan(
        body, (init_vals, init_ids), jnp.arange(ntiles, dtype=jnp.int32)
    )
    return vals, jnp.where(jnp.isposinf(vals), -1, idx).astype(jnp.int32)


def fused_scan_topk(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    *,
    valid_count: jnp.ndarray | int | None = None,
    base_sq_norms: jnp.ndarray | None = None,
    row_mask: jnp.ndarray | None = None,
    policy_vtype: VectorType | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Backend-dispatching top-k scan (the single code path replacing the
    reference's 25-kernel dispatch table, src/distance-cpu.c:756-792).

    Routing, by measurement on v5e (round 3, tools/probe_bn.py): the XLA
    formulation wins EVERYWHERE — un-tiled (one matmul + hierarchical
    top-k) while its [B, N] f32 intermediate fits the budget, lax.scan row
    tiles beyond it. The large-B*N regime the Pallas manual-DMA kernel was
    reserved for (r2) was re-measured head-to-head: at B=64 x N=1M the two
    are equal (62.9 vs 63.5 ms) with Pallas paying a 262 s Mosaic compile,
    and at B>=256 (or B=64 x N=4M) the Pallas kernel FAILS to compile on
    this toolchain (remote tpu_compile_helper 500, VMEM register spills) —
    while the tiled XLA path is within noise of the un-tiled formulation
    at those batch sizes (B=256 x N=1M: 71.6 vs 70.0 ms). The Pallas
    kernel remains available behind SVT_FORCE_PALLAS=1 for future
    hardware/toolchains where Mosaic DMA may win; re-probe with
    tools/probe_bn.py + tools/probe_pallas_sweep.py before promoting it."""
    from sqlite_vector_tpu.ops import pallas_scan

    import os

    b = queries.shape[0]
    n = base.shape[0]
    force = os.environ.get("SVT_FORCE_PALLAS") == "1"
    if (
        force
        and row_mask is None
        and policy_vtype is None
        and pallas_scan.enabled()
        and pallas_scan.supports(metric, base.dtype, base.shape[1], k, b, n)
    ):
        return pallas_scan.pallas_scan_topk(
            queries,
            base,
            metric,
            k,
            valid_count=valid_count,
            base_sq_norms=base_sq_norms,
        )
    # r5 measured carve-out: the STREAM kernel (minima to HBM, queries on
    # lanes) wins the batched large-N regime where the XLA path is
    # epilogue-bound on its [B, N] intermediate — the same pocket the int4
    # kernel was measured to win (STATUS.md r5 crossover tables). Routing
    # admits exactly that pocket; stream_route() is False until its
    # constants are backed by a recorded probe (tools/probe_stream.py).
    if (
        not force
        and row_mask is None
        and policy_vtype is None
        and pallas_scan.stream_route(
            metric, base.dtype, base.shape[1], k, b, n
        )
    ):
        return pallas_scan.pallas_scan_topk(
            queries,
            base,
            metric,
            k,
            valid_count=valid_count,
            base_sq_norms=base_sq_norms,
            variant="stream",
        )
    return scan_topk(
        queries,
        base,
        metric,
        k,
        valid_count=valid_count,
        base_sq_norms=base_sq_norms,
        row_mask=row_mask,
        policy_vtype=policy_vtype,
    )


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "recall_target")
)
def approx_scan_topk(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    *,
    valid_count: jnp.ndarray | int | None = None,
    base_sq_norms: jnp.ndarray | None = None,
    recall_target: float = 0.95,
    row_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k via the TPU PartialReduce op (lax.approx_min_k).

    Beyond the reference: tunable per-query recall at maximum selection
    throughput — the hardware-accelerated selection from
    https://arxiv.org/abs/2206.14286. Same output contract as scan_topk;
    row_mask ([N] bool) excludes rows (filtered search / tombstones).

    Row-tiled exactly like scan_topk (per-tile approx_min_k + exact
    candidate merge) so the [B, tile] f32 intermediate stays inside
    INTERMEDIATE_BUDGET — the throughput mode must not OOM on precisely
    the large-B*N workloads it targets.
    """
    b = queries.shape[0]
    n = base.shape[0]
    valid = jnp.asarray(n if valid_count is None else valid_count, jnp.int32)
    row_tile = _auto_row_tile(n, b, metric)

    if n <= row_tile:
        dist = pairwise_distance(
            queries, base, metric, base_sq_norms=base_sq_norms
        )
        dist = _sanitize_nan(dist)
        row_idx = jnp.arange(n, dtype=jnp.int32)
        dist = jnp.where(row_idx[None, :] < valid, dist, jnp.inf)
        if row_mask is not None:
            dist = jnp.where(row_mask[None, :], dist, jnp.inf)
        kk = min(k, n)
        vals, idx = jax.lax.approx_min_k(dist, kk, recall_target=recall_target)
        if kk < k:
            pad = ((0, 0), (0, k - kk))
            vals = jnp.pad(vals, pad, constant_values=jnp.inf)
            idx = jnp.pad(idx, pad, constant_values=-1)
        idx = jnp.where(jnp.isposinf(vals), -1, idx)
        return vals, idx.astype(jnp.int32)

    ntiles = _num_tiles(n, row_tile)
    npad = ntiles * row_tile
    if npad != n:
        base = jnp.pad(base, ((0, npad - n), (0, 0)))
        if base_sq_norms is not None:
            base_sq_norms = jnp.pad(base_sq_norms, (0, npad - n))
        if row_mask is not None:
            row_mask = jnp.pad(row_mask, (0, npad - n))

    kk = min(k, row_tile)
    init_vals = jnp.full((b, k), jnp.inf, jnp.float32)
    init_ids = jnp.full((b, k), -1, jnp.int32)

    def body(carry, tile_idx):
        run_vals, run_ids = carry
        start = tile_idx * row_tile
        tile = jax.lax.dynamic_slice_in_dim(base, start, row_tile, axis=0)
        tile_sq = (
            jax.lax.dynamic_slice_in_dim(base_sq_norms, start, row_tile)
            if base_sq_norms is not None
            else None
        )
        dist = pairwise_distance(queries, tile, metric, base_sq_norms=tile_sq)
        dist = _sanitize_nan(dist)
        row_idx = start + jnp.arange(row_tile, dtype=jnp.int32)
        dist = jnp.where(row_idx[None, :] < valid, dist, jnp.inf)
        if row_mask is not None:
            tile_mask = jax.lax.dynamic_slice_in_dim(row_mask, start, row_tile)
            dist = jnp.where(tile_mask[None, :], dist, jnp.inf)
        vals, idx = jax.lax.approx_min_k(
            dist, kk, recall_target=recall_target
        )
        run_vals, run_ids = merge_topk(
            run_vals, run_ids, vals, (start + idx).astype(jnp.int32), k
        )
        return (run_vals, run_ids), None

    (vals, idx), _ = jax.lax.scan(
        body, (init_vals, init_ids), jnp.arange(ntiles, dtype=jnp.int32)
    )
    return vals, jnp.where(jnp.isposinf(vals), -1, idx).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("metric", "policy_vtype"))
def scan_distances(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    *,
    base_sq_norms: jnp.ndarray | None = None,
    policy_vtype: VectorType | None = None,
) -> jnp.ndarray:
    """Full distance matrix [B, N] (the streaming virtual tables).

    The reference emits every (rowid, distance) pair and lets SQLite sort or
    filter (src/sqlite-vector.c:2243-2373); here the caller gets the dense
    matrix and applies arbitrary post-processing. Raw values — NaN stays NaN.
    For reference-parity values on non-finite inputs the caller must pass
    policy_vtype (Dataset.distances resolves it via needs_raw_policy): the
    bare matmul decomposition turns f32 L2 rows containing Inf into NaN
    where the reference's direct kernel emits +Inf.
    """
    return _tile_distance(queries, base, metric, base_sq_norms, policy_vtype)
