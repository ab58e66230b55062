"""Host→HBM streaming scan for datasets larger than device memory.

The TPU analogue of the reference's disk-chunk streaming path (quantized
scans without preload walk `SELECT counter, data FROM vector0_*` chunk blobs,
src/sqlite-vector.c:1967-1997, 2186-2227): the database lives in host RAM
(or a memory-mapped .npy), and each query streams fixed-size row tiles
through HBM with a running top-k carry.

Double buffering: `jax.device_put` is asynchronous, so tile i+1's host→HBM
transfer is issued before tile i's scan is consumed — the transfer rides
under the compute the same way the reference's SQLite pager read-ahead rides
under the SIMD loop. All tiles share one shape (the last is zero-padded), so
the scan body compiles exactly once.

Overlap verified on hardware (BENCH r2): the 10M×768 streamed scan sustained
41 MB/s end-to-end over 751 s — at or above every single-transfer probe of
the host→device link in the same window (13–34 MB/s) — i.e. the pipeline is
transport-saturated; host tile staging and device compute hide under the
transfers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sqlite_vector_tpu.ops.scan import fused_scan_topk
from sqlite_vector_tpu.ops.topk import merge_topk
from sqlite_vector_tpu.types import DistanceMetric

# Default rows per streamed tile: big enough to amortize transfer latency,
# small enough that two tiles + results fit easily in HBM headroom.
DEFAULT_STREAM_ROWS = 262144

# Streamed global positions are int32 (matching the scan kernels); fail fast
# rather than overflowing mid-scan after hours of streaming.
_MAX_STREAM_ROWS = 2**31 - 1


_merge = jax.jit(merge_topk, static_argnames=("k",))


def _placement(mesh, device):
    """(n_dev, put, put_q) shared by both streaming entry points: with a
    mesh, tiles row-shard and queries replicate; single-device otherwise."""
    if mesh is not None:
        from sqlite_vector_tpu.parallel import (
            replicated_sharding,
            row_sharding,
        )

        row_shard = row_sharding(mesh)
        repl = replicated_sharding(mesh)
        return (
            mesh.size,
            lambda a: jax.device_put(a, row_shard),
            lambda a: jax.device_put(a, repl),
        )
    put = (
        (lambda a: jax.device_put(a, device))
        if device is not None
        else jax.device_put
    )
    return 1, put, put


def _check_stream_bounds(n: int) -> None:
    if n > _MAX_STREAM_ROWS:
        raise ValueError(
            f"streaming scan: {n} rows exceeds the int32 position space "
            f"({_MAX_STREAM_ROWS}); shard the dataset (multiple Datasets / "
            "a mesh) instead"
        )


def streaming_scan_topk(
    queries: np.ndarray,
    host_vectors: np.ndarray,
    metric: DistanceMetric,
    k: int,
    *,
    valid_count: int | None = None,
    row_mask=None,
    tile_rows: int = DEFAULT_STREAM_ROWS,
    device=None,
    mesh=None,
    policy_vtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused top-k over a host-resident [N, dim] array, streamed by tiles.

    Same contract as scan_topk: (distances [B, k], positions [B, k]),
    ascending, +inf / -1 padding. row_mask ([N] bool host array, optional)
    excludes rows where False. `host_vectors` may be any array-like with
    numpy slicing (including np.memmap).

    With `mesh`, each streamed tile is row-sharded across the mesh and
    scanned with the per-chip-partial-top-k + ICI-merge executor — the
    composition for datasets larger than the AGGREGATE HBM of a pod slice
    (BASELINE.md config 5): host RAM holds the matrix, every chip scans
    tile_rows/n_devices rows per step."""
    n = host_vectors.shape[0] if valid_count is None else int(valid_count)
    b = queries.shape[0]
    if n == 0:
        return (
            jnp.full((b, k), jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32),
        )
    _check_stream_bounds(n)
    n_dev, put, put_q = _placement(mesh, device)
    if mesh is not None:
        from sqlite_vector_tpu.parallel import sharded_scan_topk

        tile_rows = -(-tile_rows // n_dev) * n_dev  # shardable tiles
        scan = lambda qd, t, kk, rows, m: sharded_scan_topk(  # noqa: E731
            qd, t, metric, kk, mesh, valid_count=rows, row_mask=m,
            policy_vtype=policy_vtype,
        )
    else:
        scan = lambda qd, t, kk, rows, m: fused_scan_topk(  # noqa: E731
            qd, t, metric, kk, valid_count=rows, row_mask=m,
            policy_vtype=policy_vtype,
        )
    qd = put_q(np.ascontiguousarray(queries))

    ntiles = -(-n // tile_rows)
    if ntiles == 1:
        # single tile: shrink to the data (rounded to a shardable multiple)
        tile_rows = -(-n // n_dev) * n_dev

    def tile(i: int):
        start = i * tile_rows
        rows = min(tile_rows, n - start)
        t = np.ascontiguousarray(host_vectors[start : start + rows])
        m = None
        if row_mask is not None:
            # Clamp to the mask actually captured: a concurrent add() can
            # grow valid_count past len(row_mask) between the lock-free mask
            # build and this scan (same transient skew Dataset._pad_mask
            # absorbs). Rows past the captured mask stay excluded for this
            # query instead of raising a broadcast error.
            m = np.zeros((tile_rows,), bool)
            e = min(start + rows, len(row_mask))
            if e > start:
                m[: e - start] = row_mask[start:e]
        if rows < tile_rows:  # zero-pad: single compiled shape for all tiles
            t = np.concatenate(
                [t, np.zeros((tile_rows - rows, t.shape[1]), t.dtype)]
            )
        return put(t), rows, (None if m is None else put(m))

    if ntiles == 1:
        dev, rows, m = tile(0)
        return scan(qd, dev, k, rows, m)

    run_vals = jnp.full((b, k), jnp.inf, jnp.float32)
    run_ids = jnp.full((b, k), -1, jnp.int32)
    next_dev = tile(0)
    for i in range(ntiles):
        cur_dev, cur_rows, cur_mask = next_dev
        if i + 1 < ntiles:
            next_dev = tile(i + 1)  # async: overlaps with this tile's scan
        vals, idx = scan(qd, cur_dev, min(k, tile_rows), cur_rows, cur_mask)
        gidx = jnp.where(idx >= 0, idx + i * tile_rows, -1)
        run_vals, run_ids = _merge(run_vals, run_ids, vals, gidx, k)
    run_ids = jnp.where(jnp.isposinf(run_vals), -1, run_ids)
    return run_vals, run_ids.astype(jnp.int32)


def streaming_scan_distances(
    queries: np.ndarray,
    host_vectors: np.ndarray,
    metric: DistanceMetric,
    *,
    valid_count: int | None = None,
    tile_rows: int = DEFAULT_STREAM_ROWS,
    device=None,
    mesh=None,
    policy_vtype=None,
) -> np.ndarray:
    """Full [B, N] distances over a host-resident array, computed per tile
    (the *_stream virtual tables for out-of-HBM datasets). With `mesh`,
    each tile is row-sharded across the chips."""
    from sqlite_vector_tpu.ops.scan import scan_distances

    n = host_vectors.shape[0] if valid_count is None else int(valid_count)
    b = queries.shape[0]
    if n == 0:
        return np.zeros((b, 0), np.float32)
    _check_stream_bounds(n)
    n_dev, put, put_q = _placement(mesh, device)
    if mesh is not None:
        from sqlite_vector_tpu.parallel import sharded_scan_distances

        # round tiles to a shardable multiple ONCE so only the short last
        # tile pays the pad-copy (padding every tile doubled host traffic)
        tile_rows = -(-tile_rows // n_dev) * n_dev

        def dists(qd, t):
            return sharded_scan_distances(
                qd, t, metric, mesh, policy_vtype=policy_vtype
            )

    else:

        def dists(qd, t):
            return scan_distances(qd, t, metric, policy_vtype=policy_vtype)

    qd = put_q(np.ascontiguousarray(queries))

    ntiles = -(-n // tile_rows)
    if ntiles == 1:
        tile_rows = -(-n // n_dev) * n_dev

    def stage(start):
        rows = min(tile_rows, n - start)
        t = np.ascontiguousarray(host_vectors[start : start + rows])
        if rows < tile_rows:  # zero-pad: single compiled shape for all tiles
            t = np.concatenate(
                [t, np.zeros((tile_rows - rows, t.shape[1]), t.dtype)]
            )
        return put(t), rows

    out = np.empty((b, n), np.float32)
    next_dev = stage(0)
    for i in range(ntiles):
        start = i * tile_rows
        cur, rows = next_dev
        if i + 1 < ntiles:
            next_dev = stage((i + 1) * tile_rows)
        out[:, start : start + rows] = np.asarray(dists(qd, cur))[:, :rows]
    return out
