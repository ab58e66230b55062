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


def make_mesh(
    n_devices: int | None = None,
    devices: Sequence[Any] | None = None,
    axis_name: str = ROWS_AXIS,
) -> Mesh:
    """Build a 1-D device mesh over `devices` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
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
