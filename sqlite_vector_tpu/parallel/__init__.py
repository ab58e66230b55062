"""Multi-chip execution: device meshes, row-sharded datasets, ICI top-k merge.

The reference is a single-node, single-thread C library (SURVEY.md §2,
"Parallelism & distributed communication: NONE"). This package supplies the
distributed backend the TPU framework needs instead:

  - the embedding matrix [N, dim] is sharded row-wise over a 1-D
    `jax.sharding.Mesh` (the TPU analogue of the reference's chunked
    vector0_* blobs, src/sqlite-vector.c:1314-1320);
  - each chip computes a partial top-k over its local rows (the same fused
    scan used single-chip), then candidates ride ICI through one
    `lax.all_gather` of [k] candidates per chip and a final `lax.top_k`
    merge — the only cross-device communication in the serving path;
  - quantization reductions (global min/max/any-negative,
    src/sqlite-vector.c:1210-1255) become XLA collectives inserted
    automatically by jit over the sharded array.
"""

from sqlite_vector_tpu.parallel.mesh import (
    ROWS_AXIS,
    make_mesh,
    row_sharding,
    replicated_sharding,
)
from sqlite_vector_tpu.parallel.ops import (
    sharded_scan_topk,
    sharded_scan_distances,
)

__all__ = [
    "ROWS_AXIS",
    "make_mesh",
    "row_sharding",
    "replicated_sharding",
    "sharded_scan_topk",
    "sharded_scan_distances",
]
