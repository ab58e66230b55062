"""sqlite_vector_tpu — a TPU-native, index-free vector search engine.

A ground-up re-design of the capability set of sqliteai/sqlite-vector
(brute-force exact + int8-quantized approximate nearest-neighbor search over
five element types and five distance metrics) for TPU hardware:

- the hand-written AVX2/SSE2/NEON/scalar SIMD kernels of the reference
  (reference: src/distance-cpu.c, src/distance-avx2.c, ...) collapse into a
  single XLA/Pallas scan that computes query-batch x database distances as
  MXU matmul fragments with fused top-k selection;
- the 30 MB RAM cache of int8-quantized vectors (reference:
  src/sqlite-vector.c vector_quantize_preload) becomes HBM-resident int8
  shards on a jax.sharding device mesh;
- the single-query SQLite virtual-table API (vector_full_scan,
  vector_quantize_scan) becomes a batched `search(queries, k)` API with
  per-chip partial top-k and a cross-chip merge over ICI.

Public API (see also sqlite_vector_tpu.sqlite for the SQLite-compatible
surface mirroring the reference's SQL functions).
"""

# NOTE: the persistent XLA compile cache is enabled lazily at first engine
# use (Dataset.__init__ -> utils.compile_cache.ensure_persistent_cache), not
# at import — importing this package must not mutate process-wide JAX config.
from sqlite_vector_tpu.utils.compile_cache import enable_persistent_cache

from sqlite_vector_tpu.types import (
    VectorType,
    DistanceMetric,
    QuantType,
    VectorOptions,
    parse_options,
    human_to_number,
    DEFAULT_MAX_MEMORY,
)
from sqlite_vector_tpu.errors import (
    VectorError,
    VectorConfigError,
    VectorCodecError,
    VectorStateError,
)
from sqlite_vector_tpu.codec import (
    vector_from_json,
    vector_as_blob,
    blob_to_array,
    array_to_blob,
)
from sqlite_vector_tpu.dataset import Dataset, VectorStore
from sqlite_vector_tpu.parallel import make_mesh
from sqlite_vector_tpu.serving import BatchingSearcher, serve
from sqlite_vector_tpu.version import __version__, version, backend

__all__ = [
    "VectorType",
    "DistanceMetric",
    "QuantType",
    "VectorOptions",
    "parse_options",
    "human_to_number",
    "DEFAULT_MAX_MEMORY",
    "VectorError",
    "VectorConfigError",
    "VectorCodecError",
    "VectorStateError",
    "vector_from_json",
    "vector_as_blob",
    "blob_to_array",
    "array_to_blob",
    "Dataset",
    "VectorStore",
    "make_mesh",
    "BatchingSearcher",
    "serve",
    "__version__",
    "version",
    "backend",
]
