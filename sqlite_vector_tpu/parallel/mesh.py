"""Device mesh construction and sharding helpers.

A vector-search database has one natural parallel axis — database rows — so
the default mesh is 1-D over all available devices. (A 2-D mesh splitting the
feature dimension only pays off for dim >> 10k; the reference caps practical
dims at 65536, src/sqlite-vector.c VECTOR_MAX_DIMENSIONS, and typical
embedding dims are 128-4096, so rows-only is the right default.)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

ROWS_AXIS = "rows"
DIM_AXIS = "dim"


def make_mesh_2d(
    rows: int,
    dims: int,
    devices: Sequence[Any] | None = None,
    axis_names: tuple[str, str] = (ROWS_AXIS, DIM_AXIS),
) -> Mesh:
    """Build a 2-D (rows x dim) device mesh for very large feature dims.

    Rows-only (make_mesh) is the right default for embedding dims up to a
    few thousand; the dim axis pays off when per-row slices are so wide that
    a single chip's HBM or matmul tile would be dominated by one row block
    (the reference caps dim at 65536). Each (rows=r, dim=c) chip holds the
    [N/rows, d/dims] sub-block; scans psum partial components over `dim`
    and merge top-k candidates over `rows` (sharded_scan_topk_2d)."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)[: rows * dims]
    if len(devices) < rows * dims:
        raise ValueError(
            f"make_mesh_2d: need {rows * dims} devices, have {len(devices)}"
        )
    return Mesh(np.array(devices).reshape(rows, dims), axis_names)


def block_sharding_2d(mesh: Mesh) -> NamedSharding:
    """Shard rows over the first mesh axis and features over the second."""
    names = mesh.axis_names
    return NamedSharding(mesh, PartitionSpec(names[0], names[1]))


def dim_sharding_2d(mesh: Mesh) -> NamedSharding:
    """Queries on a 2-D mesh: replicated over rows, sharded over features."""
    names = mesh.axis_names
    return NamedSharding(mesh, PartitionSpec(None, names[1]))


def make_mesh(
    n_devices: int | None = None,
    devices: Sequence[Any] | None = None,
    axis_name: str = ROWS_AXIS,
) -> Mesh:
    """Build a 1-D device mesh over `devices` (default: all local devices).

    `n_devices` (when `devices` is not given) must not exceed the available
    device count — silently truncating would hand back a smaller mesh than
    the caller sized their sharding for."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"make_mesh: requested {n_devices} devices but only "
                    f"{len(devices)} are available"
                )
            devices = devices[:n_devices]
    devices = list(devices)
    if not devices:
        raise ValueError("make_mesh: no devices available")
    return Mesh(np.array(devices), (axis_name,))


def row_sharding(mesh: Mesh, axis_name: str = ROWS_AXIS) -> NamedSharding:
    """Shard the leading (row) axis; replicate everything else."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement (queries, scalars)."""
    return NamedSharding(mesh, PartitionSpec())
