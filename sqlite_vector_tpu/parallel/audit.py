"""Collective-traffic audit for the sharded scan executors.

SURVEY.md §2 (parallelism): the ICI candidate merge is "the only
cross-device communication in the serving path" — per query the 1-D scan
communicates O(devices * B * k) bytes (two all-gathers of the [B, k]
candidate values and global ids), never O(N). This module PROVES it from
the compiled artifact instead of asserting it in prose: it lowers the real
executor for a given configuration and parses every collective op out of
the optimized HLO, with shapes and byte counts.

The 2-D (rows x dim) mesh is different by design: its distance composition
psums [B, N/rows] partial components across the dim axis
(parallel/ops.py::_compose_2d), an O(B * N / rows) collective per scan —
the price of dim-sharded HBM reads for very-large-dim datasets. The audit
reports it honestly; docs/ARCHITECTURE.md documents the trade.
"""

from __future__ import annotations

import re

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

# `%all-gather.3 = f32[8,1,20]{...} all-gather(...)`; shard_map psums of
# several components batch into ONE tuple-shaped all-reduce
# `= (f32[4,1024]{1,0}, f32[1024]{0}, ...) all-reduce(...)`
_COLLECTIVE_OP_RE = re.compile(
    r"=\s*(.+?)\s"
    r"(all-gather|all-reduce|reduce-scatter|all-to-all|collective-permute)"
    r"(?:-start)?\("
)
_SHAPE_RE = re.compile(r"\b(\w+)\[([\d,]*)\]")


def collective_bytes_per_query(n_devices: int, batch: int, k: int) -> int:
    """Analytic ICI payload of one 1-D sharded top-k query: each device
    gathers the [B, k] f32 candidate values AND the [B, k] int32 global ids
    from every device — 2 * 4 * D * B * k bytes received per device."""
    return 8 * n_devices * batch * k


def parse_collectives(hlo_text: str) -> list[dict]:
    """Every collective op in an (optimized) HLO dump, with output shape(s)
    and byte size (tuple outputs sum their components). `-done` ops are
    skipped (their `-start` counterpart carries the shape)."""
    out = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_OP_RE.search(line)
        if not m:
            continue
        shapes_s, op = m.group(1), m.group(2)
        shapes = []
        nbytes = 0
        for sm in _SHAPE_RE.finditer(shapes_s):
            dtype, dims_s = sm.group(1), sm.group(2)
            if dtype not in _DTYPE_BYTES:
                continue
            dims = [int(x) for x in dims_s.split(",") if x] if dims_s else []
            shapes.append((dtype, dims))
            nbytes += _DTYPE_BYTES[dtype] * int(np.prod(dims)) if dims else (
                _DTYPE_BYTES[dtype]
            )
        if shapes:
            out.append({"op": op, "shapes": shapes, "bytes": nbytes})
    return out


def audit_sharded_scan(
    mesh,
    *,
    batch: int,
    k: int,
    n: int,
    dim: int,
    metric=None,
    two_d: bool = False,
) -> dict:
    """Compile the real sharded executor for (batch, k, n, dim) and return
    its collective inventory: {"collectives": [...], "total_bytes": int,
    "analytic_merge_bytes": int}. Runs entirely at compile time (abstract
    values; nothing executes)."""
    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.types import DistanceMetric

    metric = metric or DistanceMetric.L2
    if two_d:
        from sqlite_vector_tpu.parallel.mesh import DIM_AXIS, ROWS_AXIS
        from sqlite_vector_tpu.parallel.ops import _sharded_scan_topk_2d_impl

        lowered = jax.jit(
            _sharded_scan_topk_2d_impl,
            static_argnames=(
                "metric", "k", "mesh", "rows_axis", "dim_axis", "has_mask",
                "has_sq", "policy_vtype",
            ),
        ).lower(
            jax.ShapeDtypeStruct((batch, dim), jnp.float32),
            jax.ShapeDtypeStruct((n, dim), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.int32),
            None,
            None,
            metric=metric,
            k=k,
            mesh=mesh,
            rows_axis=ROWS_AXIS,
            dim_axis=DIM_AXIS,
            has_mask=False,
            has_sq=False,
        )
    else:
        from sqlite_vector_tpu.parallel.mesh import ROWS_AXIS
        from sqlite_vector_tpu.parallel.ops import _sharded_scan_topk_impl

        lowered = jax.jit(
            _sharded_scan_topk_impl,
            static_argnames=(
                "metric", "k", "mesh", "axis", "has_sq", "has_mask",
                "policy_vtype",
            ),
        ).lower(
            jax.ShapeDtypeStruct((batch, dim), jnp.float32),
            jax.ShapeDtypeStruct((n, dim), jnp.float32),
            None,
            jax.ShapeDtypeStruct((), jnp.int32),
            None,
            metric=metric,
            k=k,
            mesh=mesh,
            axis=ROWS_AXIS,
            has_sq=False,
            has_mask=False,
        )
    hlo = lowered.compile().as_text()
    cols = parse_collectives(hlo)
    return _result(mesh, cols, batch, k)


def _result(mesh, cols, batch, k):
    d = int(np.prod(list(mesh.shape.values())))
    return {
        "collectives": cols,
        "total_bytes": sum(c["bytes"] for c in cols),
        "analytic_merge_bytes": collective_bytes_per_query(d, batch, k),
        "n_devices": d,
    }


def audit_sharded_int8_scan(
    mesh, *, batch: int, k: int, n: int, dim: int, metric=None
) -> dict:
    """HLO collective inventory of the sharded INT8 code scan (the
    quantized serving path on a 1-D mesh: int8 queries + row-sharded codes
    + per-row sq-norm cache). Same merge contract as the f32 executor —
    this proves the int8 path's collective_bytes figure instead of
    asserting it analytically (r4 weak item 5)."""
    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.parallel.mesh import ROWS_AXIS
    from sqlite_vector_tpu.parallel.ops import _sharded_scan_topk_impl
    from sqlite_vector_tpu.types import DistanceMetric

    metric = metric or DistanceMetric.L2
    lowered = jax.jit(
        _sharded_scan_topk_impl,
        static_argnames=(
            "metric", "k", "mesh", "axis", "has_sq", "has_mask",
            "policy_vtype",
        ),
    ).lower(
        jax.ShapeDtypeStruct((batch, dim), jnp.int8),
        jax.ShapeDtypeStruct((n, dim), jnp.int8),
        jax.ShapeDtypeStruct((n,), jnp.int32),  # sq-norm cache, row-sharded
        jax.ShapeDtypeStruct((), jnp.int32),
        None,
        metric=metric,
        k=k,
        mesh=mesh,
        axis=ROWS_AXIS,
        has_sq=True,
        has_mask=False,
    )
    cols = parse_collectives(lowered.compile().as_text())
    return _result(mesh, cols, batch, k)


def audit_sharded_int4_scan(
    mesh, *, batch: int, k: int, n: int, dim: int, metric=None
) -> dict:
    """HLO collective inventory of the sharded packed-int4 scan
    (parallel/ops.py::_sharded_int4_scan_topk_impl): f32 queries
    (quantized in-graph per shard), row-sharded packed codes + per-row
    alpha/csq. The packed codes must never cross the ICI — only the
    [D, B, k] candidate merge may appear."""
    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.quantize4 import packed_width
    from sqlite_vector_tpu.parallel.mesh import ROWS_AXIS
    from sqlite_vector_tpu.parallel.ops import _sharded_int4_scan_topk_impl
    from sqlite_vector_tpu.types import DistanceMetric

    metric = metric or DistanceMetric.L2
    lowered = jax.jit(
        _sharded_int4_scan_topk_impl,
        static_argnames=("metric", "k", "mesh", "axis", "dim", "has_mask"),
    ).lower(
        jax.ShapeDtypeStruct((batch, dim), jnp.float32),
        jax.ShapeDtypeStruct((n, packed_width(dim)), jnp.uint8),
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
        None,
        metric=metric,
        k=k,
        mesh=mesh,
        axis=ROWS_AXIS,
        dim=dim,
        has_mask=False,
    )
    cols = parse_collectives(lowered.compile().as_text())
    return _result(mesh, cols, batch, k)


def audit_sharded_quantize_build(mesh, *, n: int, dim: int) -> dict:
    """HLO collective inventory of the INT8 quantize build over a
    row-sharded matrix: the global (min, max, any-negative) reduction
    (ops/quantize.py::minmax_and_negative — GSPMD inserts the cross-shard
    psums) plus the elementwise quantize kernel (which must insert NONE).
    Expected traffic: O(1) scalars per device, never O(N) or O(N*dim)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from sqlite_vector_tpu.ops.quantize import (
        minmax_and_negative,
        quantize_device,
    )
    from sqlite_vector_tpu.parallel.mesh import ROWS_AXIS
    from sqlite_vector_tpu.types import QuantType

    rows = NamedSharding(mesh, PartitionSpec(ROWS_AXIS))
    mat = jax.ShapeDtypeStruct((n, dim), jnp.float32, sharding=rows)
    lowered = jax.jit(
        minmax_and_negative, static_argnames=("valid_is_full",)
    ).lower(mat, n, valid_is_full=True)
    cols = parse_collectives(lowered.compile().as_text())
    lowered_q = jax.jit(
        lambda x: quantize_device(x, 0.5, 0.0, QuantType.I8)
    ).lower(mat)
    cols_q = parse_collectives(lowered_q.compile().as_text())
    d = int(np.prod(list(mesh.shape.values())))
    return {
        "minmax_collectives": cols,
        "minmax_bytes": sum(c["bytes"] for c in cols),
        "quantize_collectives": cols_q,
        "quantize_bytes": sum(c["bytes"] for c in cols_q),
        "n_devices": d,
    }


def audit_sharded_int4_quantize_build(mesh, *, n: int, dim: int) -> dict:
    """HLO collective inventory of the INT4 quantize build over a
    row-sharded matrix: per-row scales make the build row-local, so both
    device stages (the per-row absmax reduce and the encode/pack pass —
    quantize4_device's host step between them is a tiny [N] division) must
    compile to ZERO collectives."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from sqlite_vector_tpu.ops.quantize4 import (
        _absmax_device,
        _encode_device,
    )
    from sqlite_vector_tpu.parallel.mesh import ROWS_AXIS

    rows = NamedSharding(mesh, PartitionSpec(ROWS_AXIS))
    rows1 = NamedSharding(mesh, PartitionSpec(ROWS_AXIS))
    mat = jax.ShapeDtypeStruct((n, dim), jnp.float32, sharding=rows)
    scales = jax.ShapeDtypeStruct((n,), jnp.float32, sharding=rows1)
    cols = parse_collectives(
        jax.jit(_absmax_device).lower(mat).compile().as_text()
    )
    cols += parse_collectives(
        jax.jit(_encode_device).lower(mat, scales).compile().as_text()
    )
    d = int(np.prod(list(mesh.shape.values())))
    return {
        "collectives": cols,
        "total_bytes": sum(c["bytes"] for c in cols),
        "n_devices": d,
    }
