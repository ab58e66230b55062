"""Sharded scan executors (shard_map over a 1-D rows mesh).

Why shard_map and not plain jit-with-sharding: under plain jit, `lax.top_k`
over a row-sharded [B, N] distance matrix forces XLA to all-gather the full
distance matrix before selecting (O(B*N) bytes over ICI). The explicit
formulation below communicates only B*k candidates per chip:

    per chip:  fused scan_topk over the local shard   (compute, no comms)
    merge:     all_gather of [B, k] (vals, global ids) -> [D, B, k]
               final lax.top_k over the D*k candidates (replicated)

Tie behavior matches the single-chip path: candidates are ordered
device-major = global row order, and lax.top_k prefers earlier positions on
equal values, so the earliest-scanned row wins ties exactly like the
reference's strict `<` replacement loop (src/sqlite-vector.c:2102-2106).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 stable alias
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, mesh, in_specs, out_specs):
    # check_vma/check_rep can't infer that an all_gather-then-top_k result is
    # replicated; the merge in _local_topk_merge is deterministic from
    # replicated inputs, so disabling the check is sound.
    try:
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except TypeError:  # pragma: no cover - older jax spelling
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )

from sqlite_vector_tpu.ops.distance import (
    _snap,
    compose_float,
    compose_int,
    partial_components,
)
from sqlite_vector_tpu.ops.scan import _sanitize_nan, fused_scan_topk, scan_distances
from sqlite_vector_tpu.ops.topk import topk_ascending
from sqlite_vector_tpu.parallel.mesh import DIM_AXIS, ROWS_AXIS
from sqlite_vector_tpu.types import DistanceMetric


def _merge_candidates_over_axis(
    vals: jnp.ndarray, gidx: jnp.ndarray, k: int, axis: str
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ICI top-k merge: all_gather B*k candidates per chip (device-major ==
    global row order, preserving reference tie behavior) + final selection."""
    all_vals = jax.lax.all_gather(vals, axis)  # [D, B, k]
    all_idx = jax.lax.all_gather(gidx, axis)
    bsz = vals.shape[0]
    cand_vals = jnp.moveaxis(all_vals, 0, 1).reshape(bsz, -1)
    cand_idx = jnp.moveaxis(all_idx, 0, 1).reshape(bsz, -1)
    mvals, pos = topk_ascending(cand_vals, k)
    mids = jnp.take_along_axis(cand_idx, pos, axis=-1)
    mids = jnp.where(jnp.isposinf(mvals), jnp.int32(-1), mids)
    return mvals, mids


def _local_topk_merge(
    q: jnp.ndarray,
    b: jnp.ndarray,
    b_sq: jnp.ndarray | None,
    valid: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    metric: DistanceMetric,
    k: int,
    axis: str,
    policy_vtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    ax = jax.lax.axis_index(axis)
    shard_rows = b.shape[0]
    start = (ax * shard_rows).astype(jnp.int32)
    local_valid = jnp.clip(valid - start, 0, shard_rows)
    vals, idx = fused_scan_topk(
        q, b, metric, k, valid_count=local_valid, base_sq_norms=b_sq,
        row_mask=mask, policy_vtype=policy_vtype,
    )
    gidx = jnp.where(idx >= 0, idx + start, jnp.int32(-1))
    return _merge_candidates_over_axis(vals, gidx, k, axis)


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "mesh", "axis", "has_sq", "has_mask", "policy_vtype"
    ),
)
def _sharded_scan_topk_impl(
    queries,
    base,
    base_sq_norms,
    valid,
    row_mask,
    *,
    metric,
    k,
    mesh,
    axis,
    has_sq,
    has_mask,
    policy_vtype=None,
):
    body = functools.partial(
        _local_topk_merge, metric=metric, k=k, axis=axis,
        policy_vtype=policy_vtype,
    )
    specs = [P(), P(axis)]
    args = [queries, base]
    if has_sq:
        specs.append(P(axis))
        args.append(base_sq_norms)
    specs.append(P())
    args.append(valid)
    if has_mask:
        specs.append(P(axis))
        args.append(row_mask)

    def wrapper(*a):
        i = 2
        sq = a[i] if has_sq else None
        i += 1 if has_sq else 0
        v = a[i]
        m = a[i + 1] if has_mask else None
        return body(a[0], a[1], sq, v, m)

    fn = shard_map(wrapper, mesh, in_specs=tuple(specs), out_specs=(P(), P()))
    return fn(*args)


def sharded_scan_topk(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    mesh: Mesh,
    *,
    valid_count: jnp.ndarray | int | None = None,
    base_sq_norms: jnp.ndarray | None = None,
    row_mask: jnp.ndarray | None = None,
    axis: str = ROWS_AXIS,
    policy_vtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-chip fused top-k scan.

    queries: [B, d] replicated; base: [Npad, d] row-sharded over `axis`
    (Npad must divide evenly by the mesh size — the Dataset layer pads).
    Returns replicated (distances [B, k], global positions [B, k]) ascending,
    unfilled slots +inf / -1.
    """
    n = base.shape[0]
    d = mesh.shape[axis]
    if n % d != 0:
        raise ValueError(
            f"sharded_scan_topk: base rows ({n}) must be a multiple of the "
            f"mesh size ({d}); pad before sharding"
        )
    valid = jnp.asarray(n if valid_count is None else valid_count, jnp.int32)
    return _sharded_scan_topk_impl(
        queries,
        base,
        base_sq_norms,
        valid,
        row_mask,
        metric=metric,
        k=k,
        mesh=mesh,
        axis=axis,
        has_sq=base_sq_norms is not None,
        has_mask=row_mask is not None,
        policy_vtype=policy_vtype,
    )


def sharded_scan_distances(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    mesh: Mesh,
    *,
    base_sq_norms: jnp.ndarray | None = None,
    axis: str = ROWS_AXIS,
    policy_vtype=None,
) -> jnp.ndarray:
    """Full [B, N] distance matrix, column-sharded over the rows mesh.

    The streaming virtual tables' analogue (src/sqlite-vector.c:2243-2373):
    each chip computes distances for its local rows; the result stays
    sharded (no gather) until the caller materializes it.
    """
    return _sharded_scan_distances_impl(
        queries,
        base,
        base_sq_norms,
        metric=metric,
        mesh=mesh,
        axis=axis,
        has_sq=base_sq_norms is not None,
        policy_vtype=policy_vtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=("metric", "mesh", "axis", "has_sq", "policy_vtype"),
)
def _sharded_scan_distances_impl(
    queries, base, base_sq_norms, *, metric, mesh, axis, has_sq, policy_vtype
):
    # module-level jit (static mesh/metric): per-call shard_map/lambda
    # construction re-traced on EVERY invocation — measured ~50x call
    # overhead, and in the streaming tile loop the retrace serialized the
    # host between tile dispatches, defeating the transfer/compute overlap
    def body(q, b, s):
        return scan_distances(
            q, b, metric, base_sq_norms=s, policy_vtype=policy_vtype
        )

    if has_sq:
        fn = shard_map(
            body,
            mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(None, axis),
        )
        return fn(queries, base, base_sq_norms)
    fn = shard_map(
        lambda q, b: body(q, b, None),
        mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(None, axis),
    )
    return fn(queries, base)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "k", "mesh", "axis", "dim", "has_mask"),
)
def _sharded_int4_scan_topk_impl(
    queries, packed, alpha, csq, valid, row_mask,
    *, metric, k, mesh, axis, dim, has_mask,
):
    from sqlite_vector_tpu.ops.quantize4 import int4_scan_topk

    def body(q, pk, al, cs, v, m):
        ax = jax.lax.axis_index(axis)
        shard_rows = pk.shape[0]
        start = (ax * shard_rows).astype(jnp.int32)
        local_valid = jnp.clip(v - start, 0, shard_rows)
        vals, idx = int4_scan_topk(
            q, pk, al, cs, metric, k,
            dim=dim, valid_count=local_valid, row_mask=m,
        )
        gidx = jnp.where(idx >= 0, idx + start, jnp.int32(-1))
        return _merge_candidates_over_axis(vals, gidx, k, axis)

    specs = [P(), P(axis), P(axis), P(axis), P()]
    args = [queries, packed, alpha, csq, valid]
    if has_mask:
        specs.append(P(axis))
        args.append(row_mask)

    def wrapper(q, pk, al, cs, v, *rest):
        return body(q, pk, al, cs, v, rest[0] if has_mask else None)

    fn = shard_map(wrapper, mesh, in_specs=tuple(specs), out_specs=(P(), P()))
    return fn(*args)


def sharded_int4_scan_topk(
    queries: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: jnp.ndarray,
    csq: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    mesh: Mesh,
    *,
    dim: int,
    valid_count: jnp.ndarray | int | None = None,
    row_mask: jnp.ndarray | None = None,
    axis: str = ROWS_AXIS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-chip INT4 fused top-k scan (ops/quantize4.py semantics).

    packed [Npad, ceil(dim/2)] uint8 + per-row alpha/csq, all row-sharded
    over `axis`; queries replicated. The merge is the SAME
    all_gather(B*k)-candidates collective as the exact path — the packed
    codes never cross the ICI."""
    n = packed.shape[0]
    d = mesh.shape[axis]
    if n % d != 0:
        raise ValueError(
            f"sharded_int4_scan_topk: code rows ({n}) must be a multiple of "
            f"the mesh size ({d}); pad before sharding"
        )
    valid = jnp.asarray(n if valid_count is None else valid_count, jnp.int32)
    return _sharded_int4_scan_topk_impl(
        queries, packed, alpha, csq, valid, row_mask,
        metric=metric, k=k, mesh=mesh, axis=axis, dim=dim,
        has_mask=row_mask is not None,
    )


# ---------------------------------------------------------------------------
# 2-D mesh: rows x dim (very large feature dimensions)
# ---------------------------------------------------------------------------


def _compose_2d(q, b, metric, dim_axis, b_sq=None):
    """Distances on a (rows, dim) chip: partial components over the local
    feature slice, psum over `dim` (every metric is dim-separable; int32
    partials stay exact), metric composition shared with the 1-chip path.

    `b_sq` (full-dim row sq-norms for the LOCAL row shard, replicated
    across the dim groups) skips the per-scan base-norm pass — the cached
    analogue of the 1-D path's base_sq_norms (an extra O(N*d/c) HBM read
    per L2/COSINE scan otherwise)."""
    main, q_sq, pb_sq = partial_components(
        q, b, metric, with_b_sq=b_sq is None
    )
    main = jax.lax.psum(main, dim_axis)
    if q_sq is not None:
        q_sq = jax.lax.psum(q_sq, dim_axis)
        b_sq = jax.lax.psum(pb_sq, dim_axis) if b_sq is None else b_sq
    if metric is DistanceMetric.L1:
        if jnp.issubdtype(main.dtype, jnp.integer):
            return main.astype(jnp.float32)
        # same nearly-zero snap as every other float path
        return _snap(main)
    if jnp.issubdtype(main.dtype, jnp.integer):
        # exact-integer contract (see ops.distance._pairwise_int): a float
        # cache would already be rounded above 2^24 — require int32
        if b_sq is not None and b_sq.dtype != jnp.int32:
            b_sq = jnp.sum(
                b.astype(jnp.int32) * b.astype(jnp.int32), axis=-1
            )
            b_sq = jax.lax.psum(b_sq, dim_axis)
        return compose_int(metric, main, q_sq, b_sq)
    return compose_float(
        metric, main, q_sq,
        None if b_sq is None else b_sq.astype(jnp.float32),
    )


def _local_topk_merge_2d(
    q: jnp.ndarray,
    b: jnp.ndarray,
    valid: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    b_sq: jnp.ndarray | None = None,
    *,
    metric: DistanceMetric,
    k: int,
    rows_axis: str,
    dim_axis: str,
    policy_vtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-chip body on a (rows, dim) mesh: partial distance components over
    the local feature slice, psum over `dim` (every metric is
    dim-separable), compose, local top-k, then the candidate merge over
    `rows`. The merge runs redundantly on every dim-group chip — it is
    O(B·k·R), negligible next to the scan. policy_vtype routes through the
    dim-separable non-finite policy kernels (same semantics as the 1-D
    path; b_sq is ignored — policies never use cached norms)."""
    if policy_vtype is not None:
        from sqlite_vector_tpu.ops.nonfinite import policy_pairwise_sharded

        dist = policy_pairwise_sharded(
            q, b, metric, policy_vtype, dim_axis=dim_axis
        )
    else:
        dist = _compose_2d(q, b, metric, dim_axis, b_sq)
    dist = _sanitize_nan(dist)
    shard_rows = b.shape[0]
    start = (jax.lax.axis_index(rows_axis) * shard_rows).astype(jnp.int32)
    local_valid = jnp.clip(valid - start, 0, shard_rows)
    row_idx = jnp.arange(shard_rows, dtype=jnp.int32)
    dist = jnp.where(row_idx[None, :] < local_valid, dist, jnp.inf)
    if mask is not None:
        dist = jnp.where(mask[None, :], dist, jnp.inf)

    # topk_ascending pads to k with +inf/-1 itself when shard_rows < k
    vals, idx = topk_ascending(dist, k)
    gidx = jnp.where(jnp.isposinf(vals), jnp.int32(-1), idx + start)
    return _merge_candidates_over_axis(vals, gidx, k, rows_axis)


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "mesh", "rows_axis", "dim_axis", "has_mask",
        "has_sq", "policy_vtype",
    ),
)
def _sharded_scan_topk_2d_impl(
    queries, base, valid, row_mask, base_sq_norms, *,
    metric, k, mesh, rows_axis, dim_axis, has_mask, has_sq,
    policy_vtype=None,
):
    body = functools.partial(
        _local_topk_merge_2d,
        metric=metric, k=k, rows_axis=rows_axis, dim_axis=dim_axis,
        policy_vtype=policy_vtype,
    )
    in_specs = [P(None, dim_axis), P(rows_axis, dim_axis), P()]
    args = [queries, base, valid]
    if has_mask:
        in_specs.append(P(rows_axis))
        args.append(row_mask)
    if has_sq:
        # full-dim norms: sharded over rows, replicated across dim groups
        in_specs.append(P(rows_axis))
        args.append(base_sq_norms)

    def wrapper(q, b, v, *rest):
        i = 0
        m = rest[i] if has_mask else None
        i += 1 if has_mask else 0
        sq = rest[i] if has_sq else None
        return body(q, b, v, m, sq)

    fn = shard_map(
        wrapper, mesh, in_specs=tuple(in_specs), out_specs=(P(), P())
    )
    return fn(*args)


def sharded_scan_topk_2d(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    k: int,
    mesh: Mesh,
    *,
    valid_count: jnp.ndarray | int | None = None,
    row_mask: jnp.ndarray | None = None,
    base_sq_norms: jnp.ndarray | None = None,
    rows_axis: str = ROWS_AXIS,
    dim_axis: str = DIM_AXIS,
    policy_vtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused top-k scan on a 2-D (rows x dim) mesh for very large dims.

    queries: [B, dpad] sharded over `dim_axis`; base: [Npad, dpad] sharded
    (rows, dim). Rows/dim must divide evenly by the respective mesh axes
    (pad first; feature padding with zeros is distance-neutral for every
    metric). Distances are built from dim-slice partial components psum'd
    over ICI — one [B, N/rows] collective per scan — then merged over rows
    exactly like the 1-D path. policy_vtype (a VectorType) selects the
    non-finite lane-skip policy kernels, which compose over dim shards the
    same way (ops.nonfinite.policy_pairwise_sharded).

    base_sq_norms: optional FULL-dim row sq-norms ([Npad], sharded over
    `rows_axis`, replicated across dim groups; int32 for integer codes) —
    skips the per-scan base-norm pass for L2/COSINE, mirroring the 1-D
    path's caches.

    Returns replicated (distances [B, k], global positions [B, k]).
    """
    n, dim = base.shape
    r = mesh.shape[rows_axis]
    c = mesh.shape[dim_axis]
    if n % r != 0 or dim % c != 0:
        raise ValueError(
            f"sharded_scan_topk_2d: base [{n}, {dim}] must divide evenly by "
            f"the mesh ({r} x {c}); pad before sharding"
        )
    valid = jnp.asarray(n if valid_count is None else valid_count, jnp.int32)
    return _sharded_scan_topk_2d_impl(
        queries, base, valid, row_mask, base_sq_norms,
        metric=metric, k=k, mesh=mesh,
        rows_axis=rows_axis, dim_axis=dim_axis,
        has_mask=row_mask is not None,
        has_sq=base_sq_norms is not None,
        policy_vtype=policy_vtype,
    )


def sharded_scan_distances_2d(
    queries: jnp.ndarray,
    base: jnp.ndarray,
    metric: DistanceMetric,
    mesh: Mesh,
    *,
    base_sq_norms: jnp.ndarray | None = None,
    rows_axis: str = ROWS_AXIS,
    dim_axis: str = DIM_AXIS,
    policy_vtype=None,
) -> jnp.ndarray:
    """Full [B, N] distance matrix on a (rows x dim) mesh: partial
    components psum'd over `dim`, result column-sharded over `rows`
    (replicated across the dim groups). Streaming-vtab analogue.
    base_sq_norms as in sharded_scan_topk_2d; policy_vtype routes through
    the dim-separable non-finite policy kernels (raw values — NaN stays
    NaN, matching the 1-D scan_distances contract)."""
    n, dim = base.shape
    r = mesh.shape[rows_axis]
    c = mesh.shape[dim_axis]
    if n % r != 0 or dim % c != 0:
        raise ValueError(
            f"sharded_scan_distances_2d: base [{n}, {dim}] must divide "
            f"evenly by the mesh ({r} x {c}); pad before sharding"
        )
    return _sharded_scan_distances_2d_impl(
        queries, base, base_sq_norms, metric=metric, mesh=mesh,
        rows_axis=rows_axis, dim_axis=dim_axis,
        has_sq=base_sq_norms is not None,
        policy_vtype=policy_vtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "mesh", "rows_axis", "dim_axis", "has_sq", "policy_vtype"
    ),
)
def _sharded_scan_distances_2d_impl(
    queries, base, base_sq_norms, *, metric, mesh, rows_axis, dim_axis,
    has_sq, policy_vtype=None,
):
    def body(q, b, sq):
        if policy_vtype is not None:
            from sqlite_vector_tpu.ops.nonfinite import policy_pairwise_sharded

            return policy_pairwise_sharded(
                q, b, metric, policy_vtype, dim_axis=dim_axis
            )
        return _compose_2d(q, b, metric, dim_axis, sq)

    if has_sq:
        fn = shard_map(
            body,
            mesh,
            in_specs=(
                P(None, dim_axis), P(rows_axis, dim_axis), P(rows_axis)
            ),
            out_specs=P(None, rows_axis),
        )
        return fn(queries, base, base_sq_norms)
    fn = shard_map(
        lambda q, b: body(q, b, None),
        mesh,
        in_specs=(P(None, dim_axis), P(rows_axis, dim_axis)),
        out_specs=P(None, rows_axis),
    )
    return fn(queries, base)
