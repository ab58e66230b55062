"""Multi-chip execution: device meshes, row-sharded datasets, ICI top-k merge.

The reference is a single-node, single-thread C library (SURVEY.md §2,
"Parallelism & distributed communication: NONE"). This package supplies the
distributed backend the TPU framework needs instead:

  - the embedding matrix [N, dim] is sharded row-wise over a 1-D
    `jax.sharding.Mesh` (the TPU analogue of the reference's chunked
    vector0_* blobs, src/sqlite-vector.c:1314-1320) — or block-sharded
    (rows x dim) over a 2-D mesh for very large feature dims, where
    distances are composed from dim-slice partial sums psum'd over ICI
    (sharded_scan_topk_2d; every supported metric is dim-separable);
  - each chip computes a partial top-k over its local rows (the same fused
    scan used single-chip), then candidates ride ICI through one
    `lax.all_gather` of [k] candidates per chip and a final `lax.top_k`
    merge — the only cross-device communication in the serving path;
  - quantization reductions (global min/max/any-negative,
    src/sqlite-vector.c:1210-1255) become XLA collectives inserted
    automatically by jit over the sharded array.
"""

from sqlite_vector_tpu.parallel.mesh import (
    DIM_AXIS,
    ROWS_AXIS,
    block_sharding_2d,
    dim_sharding_2d,
    make_mesh,
    make_mesh_2d,
    row_sharding,
    replicated_sharding,
)
from sqlite_vector_tpu.parallel.ops import (
    sharded_scan_topk,
    sharded_scan_topk_2d,
    sharded_int4_scan_topk,
    sharded_scan_distances,
    sharded_scan_distances_2d,
)
from sqlite_vector_tpu.parallel.audit import (
    audit_sharded_scan,
    audit_sharded_int8_scan,
    audit_sharded_int4_scan,
    audit_sharded_quantize_build,
    audit_sharded_int4_quantize_build,
    collective_bytes_per_query,
    parse_collectives,
)

__all__ = [
    "audit_sharded_scan",
    "audit_sharded_int8_scan",
    "audit_sharded_int4_scan",
    "audit_sharded_quantize_build",
    "audit_sharded_int4_quantize_build",
    "collective_bytes_per_query",
    "parse_collectives",
    "sharded_int4_scan_topk",
    "DIM_AXIS",
    "ROWS_AXIS",
    "block_sharding_2d",
    "dim_sharding_2d",
    "make_mesh",
    "make_mesh_2d",
    "row_sharding",
    "replicated_sharding",
    "sharded_scan_topk",
    "sharded_scan_topk_2d",
    "sharded_scan_distances",
    "sharded_scan_distances_2d",
]
