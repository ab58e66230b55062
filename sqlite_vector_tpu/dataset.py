"""Dataset and VectorStore — the user-facing engine objects.

Design translation from the reference (SURVEY.md section 7):

  SQLite table + BLOB column      -> Dataset: HBM-resident [N, dim] array plus
                                     int64 row ids, padded to a power-of-two
                                     capacity (static shapes for XLA).
  vector_init(t, c, opts)         -> VectorStore.create(name, options...)
                                     (src/sqlite-vector.c:2491-2543)
  vector_quantize(t, c, opts)     -> Dataset.quantize()       (:1406-1459)
  vector_quantize_preload(t, c)   -> Dataset.preload()        (:1338-1404)
  vector_quantize_memory(t, c)    -> Dataset.quantize_memory() (:1486-1499)
  vector_quantize_cleanup(t, c)   -> Dataset.drop_quantization() (:1501-1524)
  vector_full_scan(t, c, v, k)    -> Dataset.search(q, k, exact=True)
  vector_quantize_scan(t, c, v, k)-> Dataset.search(q, k, exact=False)
  *_stream virtual tables         -> Dataset.distances(q)
  streaming inserts, no reindex   -> Dataset.add(vecs, ids): amortized
                                     capacity doubling; quantized codes go
                                     stale until quantize() re-runs (same
                                     contract as the reference, API.md:242)
  _sqliteai_vector metadata       -> JSON manifest (Dataset.save/load)
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sqlite_vector_tpu.codec import blob_to_array, vector_from_json
from sqlite_vector_tpu.errors import (
    VectorCodecError,
    VectorConfigError,
    VectorStateError,
)
from sqlite_vector_tpu.ops.quantize import (
    minmax_and_negative,
    quantize_device,
    resolve_quant_params,
)
from sqlite_vector_tpu.ops.scan import fused_scan_topk, scan_distances
from sqlite_vector_tpu.parallel import (
    row_sharding,
    replicated_sharding,
    sharded_scan_distances,
    sharded_scan_topk,
)
from sqlite_vector_tpu.types import (
    DistanceMetric,
    QuantType,
    VectorOptions,
    VectorType,
    parse_options,
)

MIN_CAPACITY = 1024
# elements per chunk for host-side passes over possibly->RAM row views
# (the non-finite ingest scan and the chunked quantize pipeline)
HOST_CHUNK_ELEMS = 64 << 20
# rows per HBM tile for the host-resident int4 *_stream distance path
# (_distances_i4); partial tails are padded to this shape so one compiled
# executable serves every tile
_I4_STREAM_TILE = 262144

_FLOAT_TYPES = (VectorType.F32, VectorType.F16, VectorType.BF16)

# the reference's nearly-zero snap threshold (src/sqlite-vector.c:994-996);
# the SAME constant the device-side _snap uses — host-side snapping (the
# normalized-cosine fast path's 1 + (-dot) shift) must stay bit-identical
from sqlite_vector_tpu.ops.distance import NEARLY_ZERO as _NEARLY_ZERO


# module-level jitted norm reductions: a fresh jax.jit(lambda) per call
# would defeat jit's function-identity cache and retrace on every
# norm-cache rebuild
@jax.jit
def _sq_norms_int32(x):
    return jnp.sum(x.astype(jnp.int32) * x.astype(jnp.int32), axis=-1)


@jax.jit
def _sq_norms_f32(x):
    x = x.astype(jnp.float32)
    return jnp.sum(x * x, axis=-1)


def _unit_rows(q: np.ndarray) -> np.ndarray:
    """L2-normalize query rows host-side for the normalized-cosine fast
    path; zero-norm rows stay zero (their dot is 0 -> distance exactly 1.0,
    the reference's zero-norm rule)."""
    qf = q.astype(np.float32)
    n = np.linalg.norm(qf, axis=-1, keepdims=True)
    out = np.where(n > 0, qf / np.where(n > 0, n, 1.0), 0.0)
    return out.astype(q.dtype)


def _scan_nonfinite(vectors: Any, dtype: VectorType, count: int) -> bool:
    """Chunked host scan for non-finite values over any row-sliceable array
    (numpy, memmap, or a hostarray.ShardedRows view). One policy for every
    ingest path; integer dtypes never scan."""
    if dtype not in _FLOAT_TYPES or count == 0:
        return False
    dim = int(vectors.shape[1]) if len(vectors.shape) > 1 else 1
    chunk = max(1, HOST_CHUNK_ELEMS // max(dim, 1))
    for s in range(0, count, chunk):
        a = np.asarray(vectors[s : min(s + chunk, count)])
        if a.dtype.name == "bfloat16":
            a = a.astype(np.float32)
        if not np.isfinite(a).all():
            return True
    return False


def _atomic_npy_save(path: str, arr) -> None:
    """np.save through a temp file + os.replace.

    Saving a dataset back onto its own directory can source `arr` from a
    memmap OF THE DESTINATION FILE (load(storage="host") keeps qcodes.npy
    mmap'd; mmap=True keeps the vector shards mmap'd). A plain np.save
    truncates the file first and then reads the source through the dying
    mapping — silently corrupted rows. Writing beside and replacing keeps
    the old inode alive for the mapping until the write completes, and a crash
    mid-save never leaves a half-written .npy behind. The file object
    form keeps np.save from appending ".npy" to the temp name."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)


def _next_capacity(n: int, multiple_of: int = 1) -> int:
    cap = MIN_CAPACITY
    while cap < n:
        cap *= 2
    if multiple_of > 1:
        cap = -(-cap // multiple_of) * multiple_of
    return cap


_UPLOAD_CAP_QUANTUM = 65536


def _upload_capacity(n: int, multiple_of: int = 1) -> int:
    """Row capacity for quantized-code UPLOADS (preload/load): the
    power-of-two growth capacity, but never more than one 64k quantum of
    padding. At 10M rows the pow-2 capacity (16.78M) pads the upload by
    68% — with the r5 refine sidecar resident too that is 19.3 GB on a
    15.7 GB chip (measured OOM, r5 full bench). The quantum preserves
    re-quantize executable reuse for small count drifts (same quantum →
    same shape) while bounding pad waste at 64k rows (25 MB packed)."""
    quantum = -(-max(n, 1) // _UPLOAD_CAP_QUANTUM) * _UPLOAD_CAP_QUANTUM
    cap = min(_next_capacity(n), quantum)
    if multiple_of > 1:
        cap = -(-cap // multiple_of) * multiple_of
    return cap


@functools.partial(jax.jit, static_argnames=("dim",))
def _zero_pad_columns(arr, dim: int):
    """Zero feature columns >= dim (2-D-mesh code matrices: quantized
    padding must stay 0 so padded query lanes contribute nothing)."""
    col = jnp.arange(arr.shape[1], dtype=jnp.int32)
    return jnp.where(col[None, :] < dim, arr, jnp.zeros((), arr.dtype))


@jax.jit
def _device_row_update(vectors, new_rows, start):
    # NOTE: no donate_argnums — donation deletes the old buffer, which a
    # concurrently running search may still reference (caught by
    # tests/test_serving.py::test_concurrent_add_and_search). The transient
    # 2x footprint during an append is the price of lock-free reads.
    return jax.lax.dynamic_update_slice_in_dim(vectors, new_rows, start, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _device_row_update_donated(vectors, new_rows, start):
    # donation IS safe here: the target is a freshly allocated padded buffer
    # no search can reference yet (_upload_rows_padded) — in-place update
    # keeps peak HBM at cap + one chunk instead of 2x cap
    return jax.lax.dynamic_update_slice_in_dim(vectors, new_rows, start, axis=0)


# bytes per host->device chunk in _upload_rows_padded (bounds the transient
# footprint and keeps transfer progress observable/cancelable)
_UPLOAD_CHUNK_BYTES = 512 << 20


def _device_rows_scatter(vectors, pos, rows):
    """Scatter `rows` into `vectors` at row positions `pos` — the O(changed)
    device path for update() (same no-donation rationale as above)."""
    return vectors.at[pos].set(rows)


def _device_rows_gather(vectors, idx):
    """Gather rows by index — device-side compaction: the live rows of the
    existing HBM matrix are permuted into a fresh padded matrix with NO
    host->device matrix transfer (only the [cap]-int32 index uploads).
    Rows past the live count are arbitrary; every scan masks them via
    valid_count."""
    return jnp.take(vectors, idx, axis=0)


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "qtype", "has_mask")
)
def _quantize_and_scan(
    q, codes, scale, offset, valid, sq, mask, *, metric, k, qtype, has_mask
):
    """Query quantization fused into the scan: one device dispatch per
    quantized search instead of two (matters on high-latency links)."""
    qq = quantize_device(q, scale, offset, qtype)
    return fused_scan_topk(
        qq,
        codes,
        metric,
        k,
        valid_count=valid,
        base_sq_norms=sq,
        row_mask=mask if has_mask else None,
    )


@dataclasses.dataclass
class _QuantState:
    qtype: QuantType
    scale: np.float32
    offset: np.float32
    codes: jnp.ndarray | None  # [cap, dim] u8/i8 on device; for INT4 the
    # PACKED [cap, ceil(dim/2)] uint8 array (ops/quantize4.py)
    count: int  # rows quantized
    ids: np.ndarray | None = None  # row ids AT QUANTIZE TIME (codes may be
    # stale relative to the live table after add/remove — the reference's
    # shadow table keeps its own rowids for exactly this reason)
    sq_norms: jnp.ndarray | None = None  # cached int32 |b|^2 for L2/cosine;
    # for INT4 the int32 code square-sums (csq), set at build time
    stale: bool = False  # set when rows are added/changed after quantize
    row_scale: jnp.ndarray | np.ndarray | None = None  # INT4 only: per-row
    # dequant scale alpha_i (f32 [cap]); scale/offset stay 1.0/0.0
    # -- int8 refine sidecar (quantize(qtype='int4', refine=True)): int8/u8
    # codes of the SAME row snapshot, positionally aligned with the packed
    # int4 rows, for the device-side two-stage search (ops/refine.py)
    codes8: jnp.ndarray | np.ndarray | None = None
    qtype8: QuantType | None = None
    scale8: np.float32 | None = None
    offset8: np.float32 | None = None


class Dataset:
    """A named collection of fixed-dimension vectors with one distance metric.

    The TPU analogue of an initialized (table, column) pair in the reference's
    per-connection registry (table_context, src/sqlite-vector.c:126-142).
    """

    def __init__(
        self,
        name: str,
        options: VectorOptions,
        *,
        device: Any = None,
        sharding: Any = None,
        mesh: Any = None,
        storage: str = "hbm",
    ):
        if options.dimension <= 0:
            raise VectorConfigError(
                "Required 'dimension' option is missing (it must be specified "
                "in vector_init)."
            )
        if storage not in ("hbm", "host"):
            raise VectorConfigError(
                f"storage must be 'hbm' or 'host', got '{storage}'"
            )
        # first engine use: turn on the persistent XLA compile cache (lazy —
        # importing the package alone never touches process-wide JAX config)
        from sqlite_vector_tpu.utils.compile_cache import (
            ensure_persistent_cache,
        )

        ensure_persistent_cache()
        self.name = name
        self.options = options
        # 'hbm' pins the matrix on device (the reference's preloaded mode);
        # 'host' keeps it in host RAM and streams row tiles per query (the
        # analogue of the non-preloaded disk-chunk path,
        # src/sqlite-vector.c:1967-1997) — for datasets larger than HBM.
        self._storage = storage
        self._device = device
        self._sharding = sharding
        self._mesh = mesh
        self._mesh_2d = False
        self._dim_mult = 1
        if mesh is not None:
            axes = list(mesh.axis_names)
            if len(axes) == 2:
                # 2-D (rows x dim) mesh: block-sharded matrix, dim-sharded
                # queries, distances via psum'd partial components
                # (parallel.sharded_scan_topk_2d)
                from sqlite_vector_tpu.parallel import (
                    block_sharding_2d,
                    dim_sharding_2d,
                )
                from jax.sharding import NamedSharding, PartitionSpec

                if storage == "host":
                    # measured rationale (round 3, BASELINE.md): host
                    # streaming is transport-bound — 33-41 MB/s sustained
                    # link vs ~300 GB/s device-side scan, a ~10,000x gap.
                    # A 2-D (rows x dim) factorization changes only how the
                    # already->1000x-faster compute is laid out per tile,
                    # moves the same bytes over the link, and adds a psum
                    # per tile; rows-only sharding therefore suffices for
                    # streamed tiles at any mesh shape.
                    raise VectorConfigError(
                        "storage='host' is not supported with a 2-D mesh — "
                        "host streaming shards tiles over rows only (use a "
                        "1-D mesh, or hbm storage). Streamed scans are "
                        "transport-bound, so a dim-sharded tile layout "
                        "cannot help (see STATUS.md)."
                    )
                self._mesh_2d = True
                self._axes_2d = (axes[0], axes[1])
                self._row_sharding = block_sharding_2d(mesh)
                self._repl_sharding = dim_sharding_2d(mesh)
                self._mask_sharding = NamedSharding(mesh, PartitionSpec(axes[0]))
                self._mesh_size = int(mesh.shape[axes[0]])
                self._dim_mult = int(mesh.shape[axes[1]])
            else:
                self._row_sharding = row_sharding(mesh)
                self._repl_sharding = replicated_sharding(mesh)
                self._mask_sharding = self._row_sharding
                self._mesh_size = int(np.prod(list(mesh.shape.values())))
        else:
            self._row_sharding = sharding
            self._repl_sharding = None
            self._mask_sharding = sharding
            self._mesh_size = 1
        import threading

        # serializes mutators (add/remove/update/quantize) against each
        # other; searches snapshot immutable arrays, so a mutation lock is
        # sufficient for the coalesced-serving model (see serving.py)
        self._mutate_lock = threading.RLock()
        self._count = 0
        self._ids = np.zeros((0,), dtype=np.int64)
        # lazy removal: remove() tombstones rows in place (masked out of
        # every scan at zero device traffic — the TPU analogue of the
        # reference's pager-local DELETE) and compaction + full re-upload
        # runs only when tombstones exceed a capacity threshold
        self._dead = np.zeros((0,), dtype=bool)
        self._n_dead = 0
        self._live_np: np.ndarray | None = None  # cached ~dead[:count]
        # per-stage timing of the most recent mode="rerank" call (None
        # until one runs; the fused device path reports all time under
        # stage1_s — it has no host legs)
        self.last_rerank_decomposition: dict | None = None
        self._live_dev: tuple | None = None  # (mask, cap, device mask) cache
        # bumped (under the lock) by every row mutation; quantize() snapshots
        # it so a mutation landing during the lock-free code build marks the
        # fresh codes stale (see quantize)
        self._mutation_gen = 0
        # opaque content token, regenerated on every mutation and persisted
        # through save()/load(): the checkpointed-quantize resume must prove
        # the rows are the SAME build it left off, not merely the same
        # count/dim (an update() changes neither; add+remove can net to the
        # same counts — fuzz seed 2202 resumed a finished checkpoint of the
        # OLD rows and served garbage codes)
        self._data_token = os.urandom(16).hex()
        # bumped only when row POSITIONS move (compaction): search() re-runs
        # if it raced one, so scan positions never map through a different
        # layout's id array (see search)
        self._layout_gen = 0
        # sticky flag: any ingested row contained NaN/Inf. Searches on
        # lane-skip dtypes (f16; bf16 L2) route through the exact non-finite
        # policy kernels only when this (or the query) is set, so the clean
        # hot path pays nothing (SURVEY section 7 hard part #2).
        self._has_nonfinite = False
        self._id_pos_cache: dict[int, int] | None = None
        self._next_rowid = 1
        self._vectors: jnp.ndarray | None = None  # [cap, dim] device array
        # cached f32 row sq-norms, keyed by matrix identity: (matrix, norms).
        # The key makes a stale cache impossible when a mutator swaps
        # self._vectors concurrently with a search's norm lookup.
        self._sq_norms: tuple | None = None
        self._quant: _QuantState | None = None
        # optional observability hook (utils.profiling.timed_search)
        self.stats_recorder = None
        # host mirror for persistence / streaming appends
        self._host_vectors = np.zeros((0, options.dimension), options.type.np_dtype)

    # -- properties ---------------------------------------------------------

    def __len__(self) -> int:
        return self._count - self._n_dead

    @property
    def dimension(self) -> int:
        return self.options.dimension

    @property
    def dtype(self) -> VectorType:
        return self.options.type

    @property
    def metric(self) -> DistanceMetric:
        return self.options.distance

    @property
    def is_quantized(self) -> bool:
        return self._quant is not None

    @property
    def quant_params(self) -> tuple[QuantType, float, float] | None:
        q = self._quant
        return (q.qtype, float(q.scale), float(q.offset)) if q else None

    @property
    def ids(self) -> np.ndarray:
        # under the lock: mid-compaction, _ids and _dead are swapped one
        # after the other and a lock-free boolean index could see mismatched
        # lengths (IndexError for a concurrent reader)
        with self._mutate_lock:
            if self._n_dead:
                return self._ids[: self._count][~self._dead[: self._count]]
            return self._ids[: self._count]

    def memory_bytes(self) -> int:
        """HBM bytes held by the exact-scan matrix (padded capacity)."""
        total = 0
        vecs = self._vectors  # snapshots: may be swapped/dropped concurrently
        quant = self._quant
        if vecs is not None:
            total += vecs.size * vecs.dtype.itemsize
        if quant is not None and isinstance(quant.codes, jnp.ndarray):
            # host-resident codes (host storage before preload()) are not
            # HBM bytes
            total += quant.codes.size
        return total

    # -- ingestion -----------------------------------------------------------

    def add(
        self,
        vectors: np.ndarray | Sequence[Any],
        ids: Sequence[int] | np.ndarray | None = None,
    ) -> np.ndarray:
        """Append vectors; returns the assigned int64 row ids.

        Accepts a [N, dim] array (any castable dtype), a single [dim] vector,
        JSON array strings, or raw little-endian blobs. Zero-cost updates:
        no index rebuild; the quantized codes are merely marked stale
        (reference contract: README.md:117, API.md:242).
        """
        with self._mutate_lock:
            return self._add_locked(vectors, ids)

    def _add_locked(self, vectors, ids):
        arr = self._coerce_batch(vectors)
        n_new = arr.shape[0]
        if n_new == 0:
            return np.zeros((0,), np.int64)
        if ids is None:
            new_ids = np.arange(
                self._next_rowid, self._next_rowid + n_new, dtype=np.int64
            )
        else:
            new_ids = np.asarray(ids, dtype=np.int64)
            if new_ids.shape != (n_new,):
                raise VectorConfigError("ids must have one entry per vector")
            # uniqueness: the reference's rowid model guarantees it; two
            # live rows sharing an id would corrupt get/update/remove and
            # break the SQLite export (duplicate rowid INSERT)
            if len(np.unique(new_ids)) != n_new:
                raise VectorConfigError("add: duplicate ids within the batch")
            cnt = self._count
            live_ids = self._ids[:cnt]
            if self._n_dead:
                live_ids = live_ids[~self._dead[:cnt]]
            if len(live_ids) and np.isin(new_ids, live_ids).any():
                raise VectorConfigError(
                    "add: id(s) already exist — use update() to replace rows"
                )
        self._next_rowid = max(self._next_rowid, int(new_ids.max()) + 1)

        start = self._count
        self._note_nonfinite(arr)
        self._host_append(arr)
        self._ids = np.concatenate([self._ids, new_ids])
        self._dead = np.concatenate([self._dead, np.zeros(n_new, dtype=bool)])
        self._id_pos_cache = None
        self._live_np = None
        self._live_dev = None
        # device first, then publish the count — concurrent searches never
        # see a count covering rows the device matrix doesn't have yet
        self._sync_device(start, count=self._count + n_new)
        self._count += n_new
        self._mutation_gen += 1
        self._data_token = os.urandom(16).hex()
        if self._quant is not None:
            self._quant.stale = True
        return new_ids

    @classmethod
    def from_arrays(
        cls,
        name: str,
        vectors: np.ndarray,
        ids: np.ndarray | Sequence[int] | None = None,
        *,
        options: str | VectorOptions | None = None,
        has_nonfinite: bool | None = None,
        **kwargs: Any,
    ) -> "Dataset":
        """Zero-copy bulk construction: ADOPT an existing [N, dim] host array
        (numpy, memmap, or a hostarray.ShardedRows view) instead of copying
        it through add(). The natural constructor for host-resident (>HBM)
        datasets; with storage='hbm' the matrix is uploaded as usual.

        `has_nonfinite` skips the ingest non-finite scan when the caller
        already knows (None = scan float dtypes; integer dtypes never scan).
        """
        dim = int(vectors.shape[1])
        if isinstance(options, VectorOptions):
            # private copy: never mutate (or share) the caller's object
            opts = dataclasses.replace(options)
        else:
            opts = parse_options(options)
        if opts.dimension <= 0:
            opts.dimension = dim
        if opts.dimension != dim:
            raise VectorConfigError(
                f"Invalid vector dimension: expected {opts.dimension} but "
                f"found {dim}."
            )
        np_dtype = opts.type.np_dtype
        if vectors.dtype != np_dtype:
            raise VectorConfigError(
                f"from_arrays: array dtype {vectors.dtype} does not match "
                f"the dataset type {opts.type.value}; cast first or use add()."
            )
        ds = cls(name, opts, **kwargs)
        n = vectors.shape[0]
        if ids is None:
            ids = np.arange(1, n + 1, dtype=np.int64)
        ids = np.asarray(ids, np.int64)
        if ids.shape != (n,):
            raise VectorConfigError("ids must have one entry per vector")
        if n and len(np.unique(ids)) != n:
            # same contract as add() (:414): duplicate ids corrupt the
            # id->position map and later fail to_sqlite() mid-export
            raise VectorConfigError("from_arrays: duplicate ids")
        if has_nonfinite is None:
            ds._has_nonfinite = _scan_nonfinite(vectors, opts.type, n)
        else:
            ds._has_nonfinite = bool(has_nonfinite)
        ds._attach_host(vectors, ids)
        return ds

    def _attach_host(self, vecs: np.ndarray, ids: np.ndarray) -> None:
        """Adopt an existing (possibly memory-mapped, read-only) host array
        without copying — the load path for >RAM datasets."""
        self._host_vectors = vecs
        self._ids = np.asarray(ids, np.int64)
        self._dead = np.zeros((len(self._ids),), dtype=bool)
        self._n_dead = 0
        self._live_np = None
        self._live_dev = None
        self._id_pos_cache = None
        self._count = len(ids)
        self._next_rowid = int(self._ids.max()) + 1 if len(ids) else 1
        self._sync_device()

    def _note_nonfinite(self, arr: np.ndarray) -> None:
        """Update the sticky non-finite flag from newly ingested rows (one
        cheap host pass over just the new data; integer dtypes skip it)."""
        if self._has_nonfinite or arr.size == 0:
            return
        if getattr(self, "_trust_nonfinite_flag", False):
            return  # load(): the manifest already answered for these rows
        self._has_nonfinite = _scan_nonfinite(arr, self.dtype, arr.shape[0])

    def _host_writable(self) -> bool:
        hv = self._host_vectors
        return isinstance(hv, np.ndarray) and hv.flags.writeable

    def _host_append(self, arr: np.ndarray) -> None:
        """Amortized host-mirror append (capacity doubling, no O(N) copy per
        insert — the reference's zero-cost-update contract, README.md:117)."""
        need = self._count + arr.shape[0]
        cap = self._host_vectors.shape[0]
        if not self._host_writable():
            # read-only mmap / lazy shard view: copy-on-write — materialize
            # a writable copy (tested contract; the copy is O(matrix), so
            # for a truly >RAM dataset prefer rebuilding from source over
            # mutating the mmap view)
            cap = -1
        if need > cap:
            new_cap = max(_next_capacity(need), cap * 2)
            grown = np.zeros((new_cap, self.dimension), self.dtype.np_dtype)
            grown[: self._count] = self._host_vectors[: self._count]
            self._host_vectors = grown
        self._host_vectors[self._count : need] = arr

    def get(self, ids: Sequence[int] | np.ndarray) -> np.ndarray:
        """Fetch stored vectors by row id (the `SELECT col FROM tbl WHERE
        rowid IN (...)` analogue). Unknown ids raise."""
        ids = np.atleast_1d(np.asarray(ids, np.int64))
        # under the lock: the id->position map and the host matrix must be
        # the same generation (a concurrent compaction swaps both)
        with self._mutate_lock:
            id_to_pos = self._id_to_pos()
            try:
                pos = np.asarray([id_to_pos[int(i)] for i in ids], np.int64)
            except KeyError as e:
                raise VectorStateError(
                    f"get: unknown row id {e.args[0]}"
                ) from None
            return np.array(self._host_vectors[pos])

    def to_sqlite(
        self, database: str, table: str, column: str = "vector"
    ) -> None:
        """Export into a reference-compatible SQLite database file.

        Writes the vectors as typed little-endian BLOBs with this dataset's
        row ids as rowids, plus (when quantized) the `vector0_*` shadow table
        and `_sqliteai_vector` metadata — the resulting file is directly
        usable by the C extension (vector_init + vector_quantize_scan with no
        re-quantization) and by `sqlite_vector_tpu.sqlite`."""
        import sqlite_vector_tpu.sqlite as svs

        with self._mutate_lock:
            if self._n_dead and self._can_compact():
                self._compact_locked()  # never export tombstoned rows
            # one same-generation snapshot (a concurrent mutation must not
            # mix mask/ids/count generations); live stays for non-writable
            # >RAM mirrors, filtered during the chunked stream below
            count = self._count
            ids_arr = self._ids
            live = self._live_row_mask()
            host = self._host_vectors
        dim = self.dimension
        chunk_rows = max(1, HOST_CHUNK_ELEMS // max(dim, 1))

        def row_stream():
            # chunk-wise: a ShardedRows >RAM view materializes one chunk at
            # a time, never the whole matrix
            for s in range(0, count, chunk_rows):
                e = min(s + chunk_rows, count)
                block = np.asarray(host[s:e])
                for j in range(e - s):
                    i = s + j
                    if live is None or (i < len(live) and live[i]):
                        yield (
                            int(ids_arr[i]),
                            np.ascontiguousarray(block[j]).tobytes(),
                        )

        conn = svs.connect(database)
        try:
            q = svs._quote(table)
            conn.execute(f"CREATE TABLE IF NOT EXISTS {q} ({svs._quote(column)} BLOB)")
            conn.execute(f"DELETE FROM {q}")
            conn.executemany(
                f"INSERT INTO {q} (rowid, {svs._quote(column)}) VALUES (?, ?)",
                row_stream(),
            )
            conn.commit()
            opts = (
                f"type={self.options.type.value},dimension={self.dimension},"
                f"distance={self.options.distance.value}"
            )
            conn.vector_init(table, column, opts)
            quant = self._quant  # snapshot vs concurrent drop_quantization
            if quant is not None and quant.count:
                conn.vector_quantize(
                    table, column, f"qtype={quant.qtype.value}"
                )
        finally:
            conn.close()

    @classmethod
    def from_sqlite(
        cls,
        database: str,
        table: str,
        column: str,
        options: str,
        **kwargs: Any,
    ) -> "Dataset":
        """Import a (table, column) from a SQLite database file — including
        files written by the C extension."""
        import sqlite_vector_tpu.sqlite as svs

        conn = svs.connect(database)
        try:
            conn.vector_init(table, column, options)
            ctx = conn._lookup(table, column, "from_sqlite")
            src = conn._refresh(ctx)
            ds = cls(f"{table}.{column}", dataclasses.replace(src.options), **kwargs)
            if len(src):
                ds.add(src._host_vectors[: len(src)], src.ids)
            return ds
        finally:
            conn.close()

    def remove(self, ids: Sequence[int] | np.ndarray) -> int:
        """Delete rows by id; returns the number removed.

        The reference gets deletes for free through SQL DELETE on the base
        table (zero-cost updates, README.md:117); here the host mirror is
        compacted and the device matrix re-synced. Quantized codes go stale
        (approximate scans keep serving the old codes until quantize()
        re-runs, same contract as the reference)."""
        with self._mutate_lock:
            return self._remove_locked(ids)

    def _remove_locked(self, ids) -> int:
        ids = np.asarray(ids, np.int64)
        if ids.size == 0 or self._count == 0:
            return 0
        cnt = self._count
        hit = np.isin(self._ids[:cnt], ids) & ~self._dead[:cnt]
        removed = int(hit.sum())
        if removed == 0:
            return 0
        # tombstone: rows stay in place on host AND device; every scan masks
        # them to +inf via the cached live mask. Cost: one [N]-bool mask
        # upload (cached until the next mutation) instead of a full-matrix
        # re-upload — the zero-cost-update contract (reference README.md:117,
        # where SQLite's DELETE is pager-local) for the device tier.
        self._dead[:cnt] |= hit
        self._n_dead += removed
        self._id_pos_cache = None
        self._live_np = None
        self._live_dev = None
        self._mutation_gen += 1
        self._data_token = os.urandom(16).hex()
        if self._quant is not None:
            self._quant.stale = True
        # compact (one full re-upload) only when tombstones hog capacity.
        # Non-writable host mirrors (>RAM mmap / ShardedRows views) are
        # never compacted — that would materialize the whole matrix in RAM;
        # their tombstones are durable and quantize/save/export filter them
        # chunk-wise instead.
        if self._can_compact() and (
            self._n_dead >= max(1024, cnt // 4) or self._n_dead == cnt
        ):
            self._compact_locked()
        return removed

    def _can_compact(self) -> bool:
        return self._storage != "host" or self._host_writable()

    @property
    def tombstones(self) -> int:
        """Rows removed but not yet physically compacted (still occupying
        matrix capacity, masked out of every scan)."""
        return self._n_dead

    def compact(self) -> int:
        """Physically drop tombstoned rows now (e.g. in a maintenance
        window, instead of waiting for the 25% threshold). Returns the
        number of rows dropped; no-op without tombstones.

        Raises on non-writable >RAM host mirrors (mmap/shard views), whose
        tombstones are filtered at quantize/save/export time instead."""
        with self._mutate_lock:
            dropped = self._n_dead
            if dropped == 0:
                return 0
            if not self._can_compact():
                raise VectorStateError(
                    "compact: this dataset's host mirror is a read-only "
                    "mmap/shard view — compaction would materialize the "
                    "matrix. save() to a new directory instead (it filters "
                    "tombstones shard-wise)."
                )
            self._compact_locked()
            return dropped

    def _compact_locked(self) -> None:
        """Physically drop tombstoned rows: compact the host mirror and
        re-upload the device matrix (one atomic swap). Runs from remove()
        past the tombstone threshold and before quantize/save/export, where
        positional row alignment must be dead-free."""
        if self._n_dead == 0:
            return
        cnt = self._count
        old_vecs = self._vectors
        keep = ~self._dead[:cnt]
        kept = np.asarray(self._host_vectors[:cnt][keep])
        self._host_vectors = np.zeros(
            (_next_capacity(len(kept)), self.dimension), self.dtype.np_dtype
        )
        self._host_vectors[: len(kept)] = kept
        self._ids = self._ids[:cnt][keep]
        self._dead = np.zeros((len(kept),), dtype=bool)
        self._n_dead = 0
        self._id_pos_cache = None
        self._live_np = None
        self._live_dev = None
        self._count = len(kept)
        self._mutation_gen += 1
        self._data_token = os.urandom(16).hex()
        self._layout_gen += 1  # positions moved
        if (
            self._storage == "hbm"
            and self._mesh is None
            and old_vecs is not None
        ):
            # device-side compaction: permute the live rows of the existing
            # HBM matrix with one gather — uploads a [cap]-int32 index
            # (~4 MB at 1M rows) instead of the whole matrix (1.5 GB)
            new_cap = _next_capacity(len(kept))
            idx = np.zeros((new_cap,), np.int32)
            idx[: len(kept)] = np.flatnonzero(keep)
            idx_dev = (
                jax.device_put(idx, self._device)
                if self._device is not None
                else jnp.asarray(idx)
            )
            self._vectors = _device_rows_gather(old_vecs, idx_dev)
            self._sq_norms = None
        else:
            self._sync_device(full=True)  # mesh/host tiers: full re-sync

    def update(
        self, ids: Sequence[int] | np.ndarray, vectors: np.ndarray | Sequence[Any]
    ) -> int:
        """Replace the vectors of existing rows in place; returns the count.

        Unknown ids raise (the analogue of UPDATE matching zero rows being
        surfaced, rather than silently inserting)."""
        with self._mutate_lock:
            return self._update_locked(ids, vectors)

    def _update_locked(self, ids, vectors) -> int:
        # a scalar id updates one row (mirrors get()'s ergonomics)
        ids = np.atleast_1d(np.asarray(ids, np.int64))
        arr = self._coerce_batch(vectors)
        if arr.shape[0] != ids.size:
            raise VectorConfigError("ids must have one entry per vector")
        if ids.size == 0:
            return 0
        id_to_pos = self._id_to_pos()
        try:
            pos = np.asarray([id_to_pos[int(i)] for i in ids], np.int64)
        except KeyError as e:
            raise VectorStateError(f"update: unknown row id {e.args[0]}") from None
        if not self._host_writable():
            # mmap-loaded matrix / lazy shard view: materialize a writable copy
            self._host_vectors = np.array(
                self._host_vectors[0 : self._host_vectors.shape[0]]
            )
        self._note_nonfinite(arr)
        self._host_vectors[pos] = arr
        if (
            self._storage == "hbm"
            and self._mesh is None
            and self._vectors is not None
        ):
            # O(changed) device scatter instead of a full re-upload. Pad the
            # batch to a power of two (idempotent duplicate of the last row)
            # so XLA compiles a bounded set of scatter shapes.
            if len(np.unique(pos)) != len(pos):
                # duplicate ids in one batch: numpy host assignment is
                # last-wins but XLA scatter order with repeated indices is
                # implementation-defined — dedupe keeping the LAST occurrence
                # so host and device agree
                last = {int(p): i for i, p in enumerate(pos)}
                sel = np.fromiter(last.values(), np.int64)
                pos, arr = pos[sel], arr[sel]
            npos = len(pos)
            padn = 1 << (npos - 1).bit_length()
            pos_p = np.concatenate(
                [pos, np.full(padn - npos, pos[-1], np.int64)]
            ).astype(np.int32)
            rows_p = np.concatenate(
                [arr, np.broadcast_to(arr[-1], (padn - npos,) + arr.shape[1:])]
            )
            put = (
                (lambda a: jax.device_put(a, self._device))
                if self._device is not None
                else jnp.asarray
            )
            self._vectors = _device_rows_scatter(
                self._vectors, put(pos_p), put(rows_p)
            )
            self._sq_norms = None
        else:
            # mesh-sharded / host-storage matrices take the uniform path
            self._sync_device(full=True)
        self._mutation_gen += 1
        self._data_token = os.urandom(16).hex()
        if self._quant is not None:
            self._quant.stale = True
        return int(ids.size)

    def _coerce_batch(self, vectors: Any) -> np.ndarray:
        dim = self.dimension
        np_dtype = self.dtype.np_dtype
        if isinstance(vectors, (str, bytes, bytearray, memoryview)):
            vectors = [vectors]
        if isinstance(vectors, np.ndarray) and vectors.ndim in (1, 2):
            arr = np.atleast_2d(vectors)
            if arr.shape[1] != dim:
                raise VectorCodecError(
                    f"Invalid vector dimension: expected {dim} but found {arr.shape[1]}."
                )
            return np.ascontiguousarray(arr.astype(np_dtype, copy=False))
        rows = []
        for v in vectors:
            if isinstance(v, str):
                rows.append(vector_from_json(v, self.dtype, dim))
            elif isinstance(v, (bytes, bytearray, memoryview)):
                rows.append(blob_to_array(bytes(v), self.dtype, dim))
            else:
                a = np.asarray(v)
                if a.shape != (dim,):
                    raise VectorCodecError(
                        f"Invalid vector dimension: expected {dim} but found "
                    f"{a.shape[-1] if a.ndim else 'a scalar'}."
                    )
                rows.append(a.astype(np_dtype, copy=False))
        return np.stack(rows) if rows else np.zeros((0, dim), np_dtype)

    @property
    def _dim_padded(self) -> int:
        """Device-matrix feature width: the dataset dim rounded up to the
        dim-axis mesh multiple (2-D meshes only; zero padding is
        distance-neutral for every metric)."""
        d = self.dimension
        m = self._dim_mult
        return -(-d // m) * m if m > 1 else d

    def _pad_dim(self, arr: np.ndarray) -> np.ndarray:
        """Zero-pad the trailing feature axis to _dim_padded."""
        dpad = self._dim_padded
        if arr.shape[-1] >= dpad:
            return arr
        widths = [(0, 0)] * (arr.ndim - 1) + [(0, dpad - arr.shape[-1])]
        return np.pad(np.asarray(arr), widths)

    def _put(self, arr: np.ndarray) -> jnp.ndarray:
        """Place a row-partitioned matrix (database rows / quantized codes)."""
        if self._mesh_2d:
            arr = self._pad_dim(arr)
        if self._row_sharding is not None:
            return jax.device_put(arr, self._row_sharding)
        if self._device is not None:
            return jax.device_put(arr, self._device)
        return jnp.asarray(arr)

    def _upload_rows_padded(
        self, rows: Any, count: int, cap: int
    ) -> jnp.ndarray:
        """Upload `count` rows into a [cap, dim] zero-padded device matrix,
        transferring ONLY the real bytes — the capacity padding is written
        on device. (Host-side padding uploaded the zeros too: the 10M x 768
        int8 preload moved 12.9 GB for 7.7 GB of codes, a 20.7-minute
        transfer on a slow-link day — measured round 3.) Rows stream in
        chunks into a donated fresh buffer, so peak HBM is cap + one chunk.
        Mesh layouts keep the host-side pad (padded rows must shard
        consistently across devices)."""
        dim = int(rows.shape[1]) if count else self.dimension
        dtype = rows.dtype if count else self.dtype.np_dtype
        if self._mesh is not None or self._row_sharding is not None or count == 0:
            # sharded placements (mesh OR an explicit sharding= parameter)
            # keep the host-side pad: the padded rows must land on devices
            # consistently with _put's sharding
            padded = np.zeros((cap, dim), dtype)
            padded[:count] = rows[:count]
            return self._put(padded)
        # single-device: chunked streaming even when cap == count (a
        # power-of-two count would otherwise materialize a >RAM memmap
        # in host RAM in one shot)
        # allocate the zeroed capacity ON device (jnp.zeros is an XLA
        # computation, not a host transfer)
        if self._device is not None:
            with jax.default_device(self._device):
                out = jnp.zeros((cap, dim), dtype)
        else:
            out = jnp.zeros((cap, dim), dtype)
        chunk_rows = max(1, _UPLOAD_CHUNK_BYTES // max(dim * out.dtype.itemsize, 1))
        put = (
            (lambda a: jax.device_put(a, self._device))
            if self._device is not None
            else jnp.asarray
        )
        for s in range(0, count, chunk_rows):
            e = min(s + chunk_rows, count)
            out = _device_row_update_donated(
                out, put(np.ascontiguousarray(rows[s:e])), s
            )
        return out

    def _put_aux_rows(self, vec: np.ndarray, count: int, cap: int) -> jnp.ndarray:
        """Place a per-row sidecar vector ([count] -> zero-padded [cap]),
        sharded over the rows axis on a mesh (the INT4 scale/csq layout the
        shard_map scan consumes alongside the packed codes)."""
        padded = np.zeros((cap,), vec.dtype)
        padded[:count] = vec[:count]
        if self._mask_sharding is not None:
            return jax.device_put(padded, self._mask_sharding)
        if self._device is not None:
            return jax.device_put(padded, self._device)
        return jnp.asarray(padded)

    def _put_query(self, arr: np.ndarray) -> jnp.ndarray:
        """Place a query batch (replicated over rows; dim-sharded on a 2-D
        mesh). NOTE: on 2-D meshes the zero dim-padding happens here, so
        integer query CODES must be quantized before this call — quantizing
        padded zeros would produce nonzero pad codes."""
        if self._mesh_2d and arr.ndim == 2:
            arr = self._pad_dim(arr)
        if self._repl_sharding is not None:
            return jax.device_put(arr, self._repl_sharding)
        if self._device is not None:
            return jax.device_put(arr, self._device)
        return jnp.asarray(arr)

    def _sync_device(
        self, start: int = 0, count: int | None = None, *, full: bool = False
    ) -> None:
        """Bring the device matrix up to date with the host mirror.

        The new matrix is built first and installed with ONE reference
        assignment — concurrent searches snapshot either the old or the new
        matrix, never a torn/None intermediate (remove/update used to null
        self._vectors before re-uploading, which crashed searcher threads in
        the serving soak). full=True forces a complete re-upload even when
        the padded capacity is unchanged (rows moved/changed in place)."""
        if count is None:
            count = self._count
        if self._storage == "host":
            self._vectors = None
            self._sq_norms = None
            return
        cap = _next_capacity(count, self._mesh_size)
        cur_cap = 0 if self._vectors is None else self._vectors.shape[0]
        if full or cap != cur_cap:
            # capacity change or in-place row movement: full (re)upload at
            # the new padded size (only the real rows cross the link —
            # capacity padding is zeroed on device)
            new_vecs = self._upload_rows_padded(
                self._host_vectors, count, cap
            )
        else:
            # amortized append: device-side slice update of the new rows
            # only (no host->device transfer of the existing matrix). Mesh
            # layouts included: GSPMD lowers the dynamic-update-slice on the
            # sharded rows axis to shard-local updates and propagates the
            # operand's sharding, so a mesh append moves just the new rows
            # over the link instead of the full matrix (pinned by
            # test_sharded.py::test_mesh_append_amortized)
            new_rows = np.ascontiguousarray(self._host_vectors[start:count])
            new_vecs = _device_row_update(
                self._vectors, self._put_query(new_rows), start
            )
        self._vectors = new_vecs
        self._sq_norms = None  # recomputed lazily (cache is keyed by matrix)

    # -- queries --------------------------------------------------------------

    def _coerce_queries(self, queries: Any) -> tuple[np.ndarray, bool]:
        """Returns (queries [B, dim] in the dataset dtype, was_single)."""
        dim = self.dimension
        if isinstance(queries, str):
            q = vector_from_json(queries, self.dtype, dim)[None, :]
            return q, True
        if isinstance(queries, (bytes, bytearray, memoryview)):
            return blob_to_array(bytes(queries), self.dtype, dim)[None, :], True
        arr = np.asarray(queries)
        single = arr.ndim == 1
        arr = np.atleast_2d(arr)
        if arr.shape[1] != dim:
            raise VectorCodecError(
                f"Invalid vector dimension: expected {dim} but found {arr.shape[1]}."
            )
        return arr.astype(self.dtype.np_dtype), single

    def _exact_sq_norms(self, vecs: jnp.ndarray | None) -> jnp.ndarray | None:
        """Row sq-norms for the GIVEN matrix snapshot (not self._vectors —
        a mutator may have swapped it since the caller snapshotted)."""
        if self.metric not in (
            DistanceMetric.L2,
            DistanceMetric.SQUARED_L2,
            DistanceMetric.COSINE,
        ):
            return None
        if vecs is None:
            return None
        cache = self._sq_norms
        if cache is not None and cache[0] is vecs:
            return cache[1]
        if self.dtype in (VectorType.I8, VectorType.U8):
            # integer-stored datasets: int32 sums — the exact-integer
            # distance contract requires them (a float32 cache is already
            # rounded above 2^24 and gets discarded/recomputed by both
            # _pairwise_int and the 2-D compose, defeating the cache)
            norms = _sq_norms_int32(vecs)
        else:
            norms = _sq_norms_f32(vecs)
        if self._mesh_2d:
            # full-dim norms, rows-sharded + replicated across dim groups:
            # the layout sharded_scan_*_2d consumes (the 2-D matrix carries
            # zero dim-padding, so the full-width sum is exact)
            norms = jax.device_put(norms, self._mask_sharding)
        self._sq_norms = (vecs, norms)
        return norms

    def _quant_sq_norms(self, quant: "_QuantState") -> jnp.ndarray | None:
        """Cached int32 |code|^2 for L2/SQUARED_L2/COSINE quantized scans
        (exact-integer contract — a float cache would round above 2^24).
        On a 2-D mesh the cache is rows-sharded/dim-replicated so the scan
        skips its per-query base-norm pass (round-2 VERDICT: the 2-D path
        recomputed b_sq on every scan)."""
        if quant.qtype is QuantType.I4:
            # csq is built with the codes (quantize4 needs it for L2 AND
            # cosine); never recompute from the PACKED array
            return quant.sq_norms
        if self.metric not in (
            DistanceMetric.L2,
            DistanceMetric.SQUARED_L2,
            DistanceMetric.COSINE,
        ):
            return None
        if quant.sq_norms is None and isinstance(quant.codes, jnp.ndarray):
            sq = _sq_norms_int32(quant.codes)
            if self._mesh_2d:
                sq = jax.device_put(sq, self._mask_sharding)
            quant.sq_norms = sq
        return quant.sq_norms

    def search(
        self,
        queries: Any,
        k: int,
        *,
        exact: bool = True,
        mode: str | None = None,
        expand: int = 4,
        recall_target: float = 0.95,
        ids_filter: Sequence[int] | np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k nearest neighbors.

        Returns (ids [B, k] int64, distances [B, k] float32), both sorted by
        ascending distance. Slots beyond the number of available rows hold
        id -1 / distance +inf (the reference trims them;
        src/sqlite-vector.c:1816-1817). Single-vector queries return [k]
        shaped results with unfilled slots trimmed.

        ids_filter restricts the search to the given row ids — filtered
        search, the TPU-native form of the reference's "streaming vtab +
        SQL WHERE" composition (src/sqlite-vector.c:2243-2373).

        mode selects the execution strategy (overrides `exact`):
          "exact"     full-precision scan (vector_full_scan);
          "quantized" int8 scan, integer-domain distances
                      (vector_quantize_scan);
          "rerank"    two-stage mixed precision: int8 prefilter of
                      k*expand candidates + exact rescoring — true float
                      distances at near-int8 scan cost (beyond the
                      reference; see ops/rerank.py);
          "refine"    device-side two-stage: int4 prefilter of k*expand
                      candidates + int8-sidecar rescore in ONE dispatch —
                      ~int8-level recall at int4 scan bytes, with NO host
                      round trip and NO f32 matrix needed (the >HBM
                      capacity mode; requires quantize(qtype='int4',
                      refine=True), see ops/refine.py). Positions/ids
                      follow the quantize-time snapshot like "quantized";
          "approx"    full-precision distances + hardware-accelerated
                      approximate selection (lax.approx_min_k) at
                      `recall_target`. MEASURED CAVEAT (r1, re-checked
                      r3): on this engine's shapes the exact
                      hierarchical selection (ops/topk.py) is already
                      selection-bound-free, so approx gives NO speedup
                      over mode="exact" — it exists for API
                      completeness and for workloads whose k/N ratio
                      might someday shift that balance. Prefer "exact"
                      (same cost, recall 1.0) or "rerank"/"quantized"
                      (the modes with measured wins).
        """
        if k < 0:
            raise VectorConfigError("k must be >= 0")
        if mode is None:
            mode = "exact" if exact else "quantized"
        if mode not in ("exact", "quantized", "rerank", "refine", "approx"):
            raise VectorConfigError(
                "mode must be exact|quantized|rerank|refine|approx, "
                f"got '{mode}'"
            )
        q, single = self._coerce_queries(queries)
        if k == 0 or self._count == 0:
            # k=0 -> empty result (reference :1796)
            if single:
                return np.zeros((0,), np.int64), np.zeros((0,), np.float32)
            return (
                np.full((q.shape[0], k), -1, np.int64),
                np.full((q.shape[0], k), np.inf, np.float32),
            )

        def attempt():
            # lane-skip dtypes (f16; bf16) with non-finite data: rerank's
            # int8 prefilter + plain-math rescore cannot honor the policy
            # kernels' semantics, so it would return a different neighbor
            # set than exact/approx on the same data — route to exact, which
            # is policy-true (the reference has no rerank mode to mirror)
            mode_eff = mode
            if (
                mode in ("rerank", "refine")
                and self._nonfinite_policy(q) is not None
            ):
                mode_eff = "exact"
            # ONE quant snapshot for the whole query: the filter-mask space,
            # the scanned codes, and the final id map must all agree even if
            # a concurrent quantize()/drop_quantization() swaps self._quant
            # mid-query
            quant = self._quant
            mask = None
            if ids_filter is not None:
                flt = np.asarray(ids_filter, np.int64)
                if mode_eff in ("exact", "approx"):
                    # exact scans (and approx, which may fall back to exact)
                    # index LIVE rows
                    mask = np.isin(self._ids[: self._count], flt)
                else:
                    # quantized scans and rerank stage 1 index the codes AT
                    # QUANTIZE TIME (the reference's shadow table keeps its
                    # own rowids for the same reason)
                    qids = self._quant_id_map(quant)
                    qcount = quant.count if quant else 0
                    mask = np.isin(qids[:qcount], flt)

            if mode_eff in ("exact", "approx"):
                # exact scans index live rows: tombstoned rows are masked
                # out. Quantized scans serve the quantize-time snapshot
                # unfiltered — the reference's staleness contract (removed
                # rows linger in the shadow table until vector_quantize
                # re-runs, API.md:242); rerank stage 2 drops them via the
                # live id remap.
                live = self._live_row_mask()
                if live is not None:
                    if mask is None:
                        mask = live
                    else:
                        # a concurrent add() may have grown one of the two
                        # since it was computed; combine over the common
                        # prefix (rows past it are fresh appends — live and
                        # unfiltered)
                        m = min(len(mask), len(live))
                        mask = mask[:m] & live[:m]

            policy = (
                self._nonfinite_policy(q)
                if mode_eff in ("exact", "approx")
                else None
            )
            # ONE fast-path decision per query: _has_nonfinite is sticky but
            # can flip mid-query under a concurrent non-finite add(); the
            # scan's metric choice and the host-side shift below must agree
            cosine_fast = mode_eff in (
                "exact", "approx"
            ) and self._cosine_dot_fast(policy, q)

            if mode_eff == "exact":
                vals, idx = self._search_exact(
                    q, k, mask, policy=policy, cosine_fast=cosine_fast
                )
            elif mode_eff == "quantized":
                vals, idx = self._search_quantized(q, k, mask, quant=quant)
            elif mode_eff == "approx":
                if policy is not None:
                    # lane-skip semantics need the exact policy kernels
                    vals, idx = self._search_exact(
                        q, k, mask, policy=policy, cosine_fast=cosine_fast
                    )
                else:
                    vals, idx = self._search_approx(
                        q, k, mask, recall_target, cosine_fast=cosine_fast
                    )
            elif mode_eff == "refine":
                vals, idx = self._search_refine(q, k, mask, expand, quant=quant)
            else:
                vals, idx = self._search_rerank(q, k, mask, expand, quant=quant)

            # single device->host fetch for both outputs (one round trip);
            # device_get returns numpy arrays directly
            vals, idx = jax.device_get((vals, idx))
            if cosine_fast:
                # the fast path scanned -dot; shift to 1 - dot on the host
                # (free; the order was already correct), clamp into the
                # reference's cosine range (it clamps cos to [-1, 1],
                # src/distance-cpu.c:463-465 — narrow-dtype rounding can
                # push a self-dot past 1), and re-apply the nearly-zero
                # snap so self-distances are exactly 0
                vals = np.where(
                    np.isposinf(vals), vals, np.clip(vals + 1.0, 0.0, 2.0)
                )
                vals = np.where(
                    np.abs(vals) <= _NEARLY_ZERO, 0.0, vals
                ).astype(np.float32)
            if mode_eff in ("quantized", "refine"):
                # quantized/refine positions index the codes AT QUANTIZE
                # TIME — map through the snapshot ids, not the (possibly
                # compacted) live ids
                id_map = self._quant_id_map(quant)
            else:  # exact and rerank positions index the live rows
                id_map = self._ids
            # bounds-guarded mapping: under concurrent mutation the scanned
            # matrix may be an older/larger generation than id_map — such
            # slots surface as -1 (trimmed) rather than an IndexError
            n_map = len(id_map)
            valid = (idx >= 0) & (idx < n_map)
            if n_map == 0:
                out_ids = np.full(idx.shape, -1, np.int64)
            else:
                out_ids = np.where(
                    valid, id_map[np.clip(idx, 0, n_map - 1)], -1
                )
            return out_ids, vals, valid

        # positions are only meaningful against the row LAYOUT they were
        # scanned in. Compaction is the one mutation that moves positions;
        # if one lands mid-query the id mapping above could silently pair a
        # distance with the wrong id. Detect via the layout generation and
        # re-run — rare (threshold compactions), so the fast path stays
        # lock-free; the last resort runs under the mutation lock.
        layout0 = self._layout_gen
        out_ids, vals, valid = attempt()
        if self._layout_gen != layout0:
            layout0 = self._layout_gen
            out_ids, vals, valid = attempt()
            if self._layout_gen != layout0:
                with self._mutate_lock:
                    out_ids, vals, valid = attempt()
        if single:
            keep = valid[0]
            return out_ids[0][keep], vals[0][keep]
        return out_ids, vals

    def _id_to_pos(self) -> dict[int, int]:
        """Lazy id -> row-position map over LIVE rows, invalidated on
        mutation (tombstoned rows are not addressable)."""
        if self._id_pos_cache is None:
            dead = self._dead
            self._id_pos_cache = {
                int(v): i
                for i, v in enumerate(self._ids[: self._count])
                if not dead[i]
            }
        return self._id_pos_cache

    def _live_row_mask(self) -> np.ndarray | None:
        """Cached [count]-bool mask of non-tombstoned rows; None when all
        rows are live (the common case pays nothing)."""
        if self._n_dead == 0:
            return None
        if self._live_np is None or len(self._live_np) != self._count:
            self._live_np = ~self._dead[: self._count]
        return self._live_np

    def _mask_to_device(
        self, mask: np.ndarray | None, cap: int, count: int
    ):
        """_pad_mask with a cache for the live-row mask: the tombstone mask
        is identical across queries, so its device copy uploads once per
        mutation instead of once per search."""
        if mask is None:
            return None
        if mask is self._live_np:
            cached = self._live_dev
            # keyed by the np mask OBJECT, not just cap: a racing searcher
            # must never re-install a pre-invalidation device copy (rows
            # removed later would silently resurface from the stale cache)
            if cached is not None and cached[0] is mask and cached[1] == cap:
                return cached[2]
            dm = self._pad_mask(mask, cap, count)
            self._live_dev = (mask, cap, dm)
            return dm
        return self._pad_mask(mask, cap, count)

    def _quant_id_map(self, quant: "_QuantState | None") -> np.ndarray:
        if quant is not None and quant.ids is not None:
            # pad so np indexing with clipped positions stays in bounds
            if len(quant.ids) == 0:
                return np.full((1,), -1, np.int64)
            return quant.ids
        return self._ids

    def _pad_mask(self, mask: np.ndarray | None, cap: int, count: int):
        if mask is None:
            return None
        out = np.zeros((cap,), bool)
        # the mask may be shorter than count when an add() landed between
        # the mask build and the count snapshot — rows past the mask stay
        # excluded for this query (transient skew, never a crash)
        m = min(len(mask), count, cap)
        out[:m] = mask[:m]
        # masks are 1-D over rows: on a 2-D mesh they shard over the rows
        # axis only (self._put would try to block-shard / dim-pad them)
        if self._mask_sharding is not None:
            return jax.device_put(out, self._mask_sharding)
        if self._device is not None:
            return jax.device_put(out, self._device)
        return jnp.asarray(out)

    def _nonfinite_policy(
        self, q: np.ndarray, *, raw_values: bool = False
    ) -> VectorType | None:
        """Resolve whether this search must run the non-finite policy kernels
        (reference lane-skip semantics, src/distance-cpu.c:164-197, 318-468):
        only for dtypes with lane-skip rules, and only when the dataset flag
        or the query itself is non-finite. raw_values=True additionally
        covers f32 L2/SQUARED_L2, whose matmul decomposition matches the
        reference's top-k row EXCLUSION but not its raw +Inf values — the
        streaming vtabs expose the values themselves."""
        from sqlite_vector_tpu.ops.nonfinite import needs_policy, needs_raw_policy

        needed = needs_raw_policy if raw_values else needs_policy
        if not needed(self.dtype, self.metric):
            return None
        if self._has_nonfinite:
            return self.dtype
        qa = q.astype(np.float32) if q.dtype.name == "bfloat16" else q
        return self.dtype if not bool(np.isfinite(qa).all()) else None

    def _cosine_dot_fast(
        self, policy: "VectorType | None", q: np.ndarray | None = None
    ) -> bool:
        """normalized=1 + COSINE: scan as a pure dot product (no norms, no
        sqrt, no divide) over unit-normalized queries; the host applies
        1 + (-dot) after the fetch (a monotonic shift — top-k order is
        already correct). The reference parses `normalized` but never uses
        it in any computation (src/sqlite-vector.c:119, 966, 2533);
        exploiting the user's assertion is a beyond-parity fast path with
        unchanged results on genuinely unit-norm data (zero-norm rows and
        queries still yield distance 1.0, matching the reference's
        zero-norm rule, src/distance-cpu.c:105-109).

        Non-finite data falls back to the plain cosine path: a base row
        with Inf would score -inf on the dot scan (clipped to a bogus 0.0
        top hit) where plain cosine yields NaN -> excluded, and a NaN
        query must return an empty result, not k rows at 1.0. The sticky
        dataset flag covers rows; the query is checked per call.

        F32 storage only: casting a unit-norm row to f16/bf16 re-perturbs
        its norm by up to ~2*eps_dtype (bf16: ~4e-3 — the extended API
        fuzzer caught a self-match at distance 2.2e-3 instead of 0), an
        error the skipped division no longer cancels, large enough to flip
        near-boundary neighbors vs the reference's plain cosine on the
        same stored bytes. Plain cosine's divide removes the cast error
        exactly, and the measured fast-path gain was ~1% (norms are
        cached; the scan is memory-bound), so 16-bit floats take the
        plain path."""
        if not (
            self.metric is DistanceMetric.COSINE
            and bool(self.options.normalized)
            and self.dtype is VectorType.F32
            and policy is None
            and not self._has_nonfinite
        ):
            return False
        if q is not None:
            qa = q.astype(np.float32) if q.dtype.name == "bfloat16" else q
            if not bool(np.isfinite(qa).all()):
                return False
        return True

    def _search_exact(
        self,
        q: np.ndarray,
        k: int,
        mask: np.ndarray | None = None,
        policy: VectorType | None = None,
        cosine_fast: bool | None = None,
    ):
        # cosine_fast: search() snapshots the fast-path decision once per
        # query so the scan and its host-side shift agree even if the
        # sticky non-finite flag flips mid-query (None = decide here, for
        # internal callers like the rerank fallback)
        if cosine_fast is None:
            cosine_fast = self._cosine_dot_fast(policy, q)
        metric = self.metric
        if cosine_fast:
            metric = DistanceMetric.DOT
            q = _unit_rows(q)
        if self._storage == "host":
            from sqlite_vector_tpu.ops.streaming import streaming_scan_topk

            # mesh + host storage compose: each streamed tile is row-sharded
            # across the chips and merged over ICI (BASELINE.md config 5)
            return streaming_scan_topk(
                q,
                self._host_vectors,
                metric,
                k,
                valid_count=self._count,
                row_mask=mask,
                device=self._device,
                mesh=self._mesh,
                policy_vtype=policy,
            )
        # one snapshot of (matrix, count) for the whole scan: a concurrent
        # mutator swaps self._vectors atomically, so we see old or new state,
        # never a torn one
        vecs = self._vectors
        count = self._count
        qd = self._put_query(q)
        dmask = self._mask_to_device(mask, vecs.shape[0], count)
        norms = (
            None if metric is DistanceMetric.DOT
            else self._exact_sq_norms(vecs)
        )
        if self._mesh_2d:
            from sqlite_vector_tpu.parallel import sharded_scan_topk_2d

            return sharded_scan_topk_2d(
                qd,
                vecs,
                metric,
                k,
                self._mesh,
                valid_count=count,
                row_mask=dmask,
                base_sq_norms=norms,
                policy_vtype=policy,
                rows_axis=self._axes_2d[0],
                dim_axis=self._axes_2d[1],
            )
        if self._mesh is not None:
            return sharded_scan_topk(
                qd,
                vecs,
                metric,
                k,
                self._mesh,
                valid_count=count,
                base_sq_norms=norms,
                row_mask=dmask,
                policy_vtype=policy,
            )
        return fused_scan_topk(
            qd,
            vecs,
            metric,
            k,
            valid_count=count,
            base_sq_norms=norms,
            row_mask=dmask,
            policy_vtype=policy,
        )

    def _search_quantized(
        self,
        q: np.ndarray,
        k: int,
        mask: np.ndarray | None = None,
        quant: _QuantState | None = None,
    ):
        quant = self._require_quant("vector_quantize_scan", quant)
        if quant.qtype is QuantType.I4:
            return self._search_quantized_i4(q, k, mask, quant)
        # host-mode codes stream per query UNLESS preload() pinned them in
        # HBM — the reference's preloaded-vs-disk split (4-5x speedup,
        # QUANTIZATION.md:15,23)
        if self._storage == "host" and not isinstance(quant.codes, jnp.ndarray):
            from sqlite_vector_tpu.oracle import quantize as oracle_quantize
            from sqlite_vector_tpu.ops.streaming import streaming_scan_topk

            qq = oracle_quantize(
                q.astype(np.float32), quant.scale, quant.offset, quant.qtype
            )
            return streaming_scan_topk(
                qq,
                quant.codes,
                self.metric,
                k,
                valid_count=quant.count,
                row_mask=mask,
                device=self._device,
                mesh=self._mesh,
            )
        self._quant_sq_norms(quant)  # fill the cache (no-op per metric)
        dmask = self._pad_mask(mask, quant.codes.shape[0], quant.count)
        if self._mesh_2d:
            from sqlite_vector_tpu import oracle
            from sqlite_vector_tpu.parallel import sharded_scan_topk_2d

            # quantize host-side BEFORE the zero dim-padding (quantizing a
            # padded zero would produce a nonzero pad code)
            qq_h = oracle.quantize(
                q.astype(np.float32), quant.scale, quant.offset, quant.qtype
            )
            return sharded_scan_topk_2d(
                self._put_query(qq_h),
                quant.codes,
                self.metric,
                k,
                self._mesh,
                valid_count=quant.count,
                row_mask=dmask,
                base_sq_norms=quant.sq_norms,
                rows_axis=self._axes_2d[0],
                dim_axis=self._axes_2d[1],
            )
        if self._mesh is not None:
            # quantize the query with the stored scale/offset
            # (src/sqlite-vector.c:2162-2177)
            qq = quantize_device(
                self._put_query(q), quant.scale, quant.offset, quant.qtype
            )
            return sharded_scan_topk(
                qq,
                quant.codes,
                self.metric,
                k,
                self._mesh,
                valid_count=quant.count,
                base_sq_norms=quant.sq_norms,
                row_mask=dmask,
            )
        # query quantization (src/sqlite-vector.c:2162-2177) is fused into
        # the scan dispatch — one round trip per search
        dummy = (
            jnp.zeros((0,), bool) if dmask is None else dmask
        )
        return _quantize_and_scan(
            self._put_query(q.astype(np.float32)),
            quant.codes,
            jnp.float32(quant.scale),
            jnp.float32(quant.offset),
            jnp.int32(quant.count),
            quant.sq_norms,
            dummy,
            metric=self.metric,
            k=k,
            qtype=quant.qtype,
            has_mask=dmask is not None,
        )

    def _search_quantized_i4(
        self,
        q: np.ndarray,
        k: int,
        mask: np.ndarray | None,
        quant: _QuantState,
    ):
        """INT4 scan dispatch (ops/quantize4.py): approximate
        original-domain distances from packed codes + per-row scales.
        Query quantization (per-query symmetric int8) happens in-graph —
        one device dispatch per search, like the int8 fused path."""
        from sqlite_vector_tpu.ops.quantize4 import (
            int4_scan_topk,
            int4_streaming_scan_topk,
        )

        if self._storage == "host" and not isinstance(quant.codes, jnp.ndarray):
            return int4_streaming_scan_topk(
                q.astype(np.float32),
                quant.codes,
                quant.row_scale,
                quant.sq_norms,
                self.metric,
                k,
                dim=self.dimension,
                valid_count=quant.count,
                row_mask=mask,
                device=self._device,
                mesh=self._mesh,
            )
        dmask = self._pad_mask(mask, quant.codes.shape[0], quant.count)
        qd = self._put_query(q.astype(np.float32))
        if self._mesh is not None:
            from sqlite_vector_tpu.parallel.ops import sharded_int4_scan_topk

            return sharded_int4_scan_topk(
                qd,
                quant.codes,
                quant.row_scale,
                quant.sq_norms,
                self.metric,
                k,
                self._mesh,
                dim=self.dimension,
                valid_count=quant.count,
                row_mask=dmask,
            )
        return int4_scan_topk(
            qd,
            quant.codes,
            quant.row_scale,
            quant.sq_norms,
            self.metric,
            k,
            dim=self.dimension,
            valid_count=quant.count,
            row_mask=dmask,
        )

    def _search_approx(
        self,
        q: np.ndarray,
        k: int,
        mask: np.ndarray | None,
        recall_target: float,
        cosine_fast: bool | None = None,
    ):
        from sqlite_vector_tpu.ops.scan import approx_scan_topk

        if cosine_fast is None:
            cosine_fast = self._cosine_dot_fast(None, q)
        if self._storage == "host" or self._mesh is not None:
            # approx selection is a single-chip HBM fast path; other layouts
            # fall back to the exact scan (still correct, recall = 1)
            return self._search_exact(q, k, mask, cosine_fast=cosine_fast)
        metric = self.metric
        if cosine_fast:
            metric = DistanceMetric.DOT
            q = _unit_rows(q)
        vecs = self._vectors  # one snapshot (see _search_exact)
        count = self._count
        return approx_scan_topk(
            self._put_query(q),
            vecs,
            metric,
            k,
            valid_count=count,
            base_sq_norms=(
                None if metric is DistanceMetric.DOT
                else self._exact_sq_norms(vecs)
            ),
            recall_target=recall_target,
            row_mask=self._mask_to_device(mask, vecs.shape[0], count),
        )

    def _search_rerank(
        self,
        q: np.ndarray,
        k: int,
        mask: np.ndarray | None,
        expand: int,
        quant: _QuantState | None = None,
    ):
        """int8 prefilter + exact rescore.

        Fast path: when the codes are fresh (not stale) and both matrices are
        HBM-resident on a single chip, the fused device kernel
        (ops/rerank.py) runs both stages in one dispatch. Otherwise stage 1
        runs through the regular quantized scan and the tiny candidate set is
        rescored host-side (works uniformly across hbm/host/mesh and across
        stale snapshots, where quantize-time positions must be re-mapped)."""
        from sqlite_vector_tpu import oracle

        quant = self._require_quant("rerank", quant)
        vecs = self._vectors  # one snapshot (see _search_exact)
        if (
            not quant.stale
            and self._storage == "hbm"
            and self._mesh is None
            and mask is None
            # INT4 uses the generic stage-1 + host-rescore path below (the
            # fused kernel's query-code/base-code matmul is int8-specific)
            and quant.qtype is not QuantType.I4
            and isinstance(quant.codes, jnp.ndarray)
            # under concurrent mutation the matrix may already be a newer
            # generation than the codes (stale flips only after the swap);
            # the fused kernel requires positionally-aligned matrices, so any
            # capacity skew routes to the id-remapping host rescore below
            and vecs is not None
            and vecs.shape[0] == quant.codes.shape[0]
        ):
            from sqlite_vector_tpu.ops.rerank import rerank_topk

            self._quant_sq_norms(quant)  # fill the cache (no-op per metric)
            qq = np.asarray(
                oracle.quantize(
                    q.astype(np.float32), quant.scale, quant.offset, quant.qtype
                )
            )
            t0 = time.perf_counter()
            vals, idx = rerank_topk(
                self._put_query(q.astype(np.float32)),
                vecs,
                self._put_query(qq),
                quant.codes,
                self.metric,
                k,
                expand=expand,
                valid_count=quant.count,
                codes_sq_norms=quant.sq_norms,
            )
            # materialize before stamping the decomposition — the jitted
            # call returns async device arrays, so timing the dispatch
            # alone records microseconds for a multi-ms scan (r5 review).
            # device_get here is the same single fetch search() issues
            # next; it passes numpy through untouched downstream.
            vals, idx = jax.device_get((vals, idx))
            self.last_rerank_decomposition = {
                "batch": q.shape[0],
                "k": k,
                "expand": expand,
                "stage1_s": time.perf_counter() - t0,  # fused: one dispatch
                "translate_s": 0.0,
                "host_gather_s": 0.0,
                "rescore_s": 0.0,
                "gathered_rows": 0,
            }
            return vals, idx

        ke = max(k * expand, k)
        t0 = time.perf_counter()
        _, idx = self._search_quantized(q, ke, mask, quant=quant)
        idx = np.asarray(idx)
        t1 = time.perf_counter()
        b = q.shape[0]
        out_vals = np.full((b, k), np.inf, np.float32)
        out_idx = np.full((b, k), -1, np.int32)
        qf = q.astype(np.float32)
        # stage-1 positions index the quantize-time snapshot; map them to
        # CURRENT row positions via ids (rows may have moved/been removed).
        # The id->position map and the host matrix it indexes must come from
        # the same generation — a concurrent compaction swaps both — so the
        # (cheap, O(B*k*expand)-row) host rescore runs under the mutation
        # lock.
        with self._mutate_lock:
            qids = self._quant_id_map(quant)
            live = self._id_to_pos()
            # translate the whole batch at once, then gather each UNIQUE
            # candidate row exactly once (r5: the per-query loop issued up
            # to B*ke separate mmap reads; batch neighbors overlap heavily
            # on clustered data, and sorted-unique reads are page-cache
            # friendly on the >HBM mmap path)
            flat = idx.reshape(-1)
            ok = flat >= 0
            pos = np.full(flat.shape, -1, np.int64)
            if ok.any():
                cand_ids = np.asarray(qids)[flat[ok]]
                pos[ok] = np.fromiter(
                    (live.get(int(i), -1) for i in cand_ids),
                    np.int64,
                    count=len(cand_ids),
                )
            pos = pos.reshape(b, ke)
            t2 = time.perf_counter()
            keep_any = pos >= 0
            if keep_any.any():
                uniq, inv = np.unique(pos[keep_any], return_inverse=True)
                gathered = np.asarray(
                    self._host_vectors[uniq], dtype=np.float32
                )  # [U, d] — the ONE host gather for the whole batch
            else:
                uniq = np.zeros((0,), np.int64)
                gathered = np.zeros((0, self.dimension), np.float32)
            t3 = time.perf_counter()
            row_of = np.zeros(pos.shape, np.int64)
            if keep_any.any():
                row_of[keep_any] = inv
            for bi in range(b):
                kb = keep_any[bi]
                if not kb.any():
                    continue
                cand_pos = pos[bi][kb]
                cand = gathered[row_of[bi][kb]]
                d = oracle.snap_zero(
                    oracle.distance(qf[bi], cand, self.metric, VectorType.F32)
                )
                # finite-only admission (device-path parity, rerank.py:118,
                # 128; the reference's strict-< slot replacement never admits
                # Inf/NaN): such slots stay +inf/-1 instead of becoming
                # phantom neighbors
                keep = np.isfinite(d)
                d, cand_pos = d[keep], cand_pos[keep]
                order = np.argsort(d, kind="stable")[:k]
                out_vals[bi, : len(order)] = d[order]
                out_idx[bi, : len(order)] = cand_pos[order]
        t4 = time.perf_counter()
        # per-stage decomposition for the LAST rerank call (read by bench.py
        # for the batched-rerank headline; the fused single-dispatch path
        # reports everything under stage1): stage-1 includes the dispatch
        # RTT — the device-only share is visible in the quantized-scan bench
        # lines, and the split here prices the host legs the fused path
        # avoids.
        self.last_rerank_decomposition = {
            "batch": b,
            "k": k,
            "expand": expand,
            "stage1_s": t1 - t0,
            "translate_s": t2 - t1,
            "host_gather_s": t3 - t2,
            "rescore_s": t4 - t3,
            "gathered_rows": int(uniq.size),
        }
        return out_vals, out_idx

    def _search_refine(
        self,
        q: np.ndarray,
        k: int,
        mask: np.ndarray | None,
        expand: int,
        quant: _QuantState | None = None,
    ):
        """Device-side two-stage search: int4 prefilter + int8-sidecar
        rescore in ONE dispatch (ops/refine.py) — no host round trip, no
        full-precision matrix required. Positions index the quantize-time
        snapshot (same contract as mode="quantized"). Requires
        quantize(qtype='int4', refine=True) and device-resident codes
        (preload() on host-storage datasets)."""
        from sqlite_vector_tpu.ops.refine import int4_refine_topk

        quant = self._require_quant("refine", quant)
        if quant.qtype is not QuantType.I4 or quant.codes8 is None:
            raise VectorStateError(
                "refine: requires an int4 quantization with the int8 "
                "refine sidecar — run quantize(qtype='int4', refine=True) "
                "first."
            )
        if not isinstance(quant.codes, jnp.ndarray) or not isinstance(
            quant.codes8, jnp.ndarray
        ):
            raise VectorStateError(
                "refine: codes are host-resident — call preload() first "
                "(refine is a device-side two-stage search; streaming it "
                "through the host would defeat its no-round-trip contract)."
            )
        dmask = self._pad_mask(mask, quant.codes.shape[0], quant.count)
        return int4_refine_topk(
            self._put_query(q.astype(np.float32)),
            quant.codes,
            quant.row_scale,
            quant.sq_norms,
            quant.codes8,
            quant.scale8,
            quant.offset8,
            self.metric,
            k,
            dim=self.dimension,
            expand=expand,
            valid_count=quant.count,
            row_mask=dmask,
        )

    def distances(self, queries: Any, *, exact: bool = True) -> np.ndarray:
        """Full distance vector(s) — the *_stream virtual tables.

        Returns [B, N] (or [N] for a single query) distances over the valid
        rows, unordered (callers sort/filter, as SQLite does for the
        reference's streaming modules, src/sqlite-vector.c:2243-2373).
        """
        q, single = self._coerce_queries(queries)
        if self._count == 0:
            out = np.zeros((q.shape[0], 0), np.float32)
            return out[0] if single else out
        policy = self._nonfinite_policy(q, raw_values=True) if exact else None
        if self._storage == "host":
            from sqlite_vector_tpu.oracle import quantize as oracle_quantize
            from sqlite_vector_tpu.ops.streaming import streaming_scan_distances

            if exact:
                d = streaming_scan_distances(
                    q,
                    self._host_vectors,
                    self.metric,
                    valid_count=self._count,
                    device=self._device,
                    mesh=self._mesh,
                    policy_vtype=policy,
                )
            else:
                quant = self._require_quant("vector_quantize_scan_stream")
                if quant.qtype is QuantType.I4:
                    d = self._distances_i4(q, quant)
                    return d[0] if single else d
                if isinstance(quant.codes, jnp.ndarray):
                    # preload() pinned the codes in HBM: scan them on device
                    # instead of streaming them back through host RAM per
                    # query (the preloaded-vs-disk split, QUANTIZATION.md:15)
                    qq_dev = quantize_device(
                        self._put_query(q.astype(np.float32)),
                        quant.scale, quant.offset, quant.qtype,
                    )
                    d = np.asarray(
                        scan_distances(qq_dev, quant.codes, self.metric)
                    )[:, : quant.count]
                    return d[0] if single else d
                qq = oracle_quantize(
                    q.astype(np.float32), quant.scale, quant.offset, quant.qtype
                )
                d = streaming_scan_distances(
                    qq,
                    quant.codes,
                    self.metric,
                    valid_count=quant.count,
                    device=self._device,
                    mesh=self._mesh,
                )
            if exact:
                live = self._live_row_mask()
                if live is not None and np.asarray(d).shape[1] == len(live):
                    d = np.asarray(d)[:, live]  # drop tombstoned columns
            return d[0] if single else d
        if exact:
            qd = self._put_query(q)
            vecs = self._vectors  # one snapshot (see _search_exact)
            count = self._count
            if self._mesh_2d:
                from sqlite_vector_tpu.parallel import sharded_scan_distances_2d

                d = sharded_scan_distances_2d(
                    qd, vecs, self.metric, self._mesh,
                    base_sq_norms=self._exact_sq_norms(vecs),
                    policy_vtype=policy,
                    rows_axis=self._axes_2d[0], dim_axis=self._axes_2d[1],
                )
            elif self._mesh is not None:
                d = sharded_scan_distances(
                    qd,
                    vecs,
                    self.metric,
                    self._mesh,
                    base_sq_norms=self._exact_sq_norms(vecs),
                    policy_vtype=policy,
                )
            else:
                d = scan_distances(
                    qd,
                    vecs,
                    self.metric,
                    base_sq_norms=self._exact_sq_norms(vecs),
                    policy_vtype=policy,
                )
            d = np.asarray(d)[:, :count]
            live = self._live_row_mask()
            if live is not None and len(live) == count:
                d = d[:, live]  # drop tombstoned columns
        else:
            quant = self._require_quant("vector_quantize_scan_stream")
            if quant.qtype is QuantType.I4:
                d = self._distances_i4(q, quant)
                return d[0] if single else d
            if self._mesh_2d:
                from sqlite_vector_tpu import oracle
                from sqlite_vector_tpu.parallel import sharded_scan_distances_2d

                # quantize before the zero dim-padding (see _put_query)
                qq_h = oracle.quantize(
                    q.astype(np.float32), quant.scale, quant.offset, quant.qtype
                )
                d = sharded_scan_distances_2d(
                    self._put_query(qq_h), quant.codes, self.metric, self._mesh,
                    base_sq_norms=self._quant_sq_norms(quant),
                    rows_axis=self._axes_2d[0], dim_axis=self._axes_2d[1],
                )
            else:
                qq = quantize_device(
                    self._put_query(q), quant.scale, quant.offset, quant.qtype
                )
                if self._mesh is not None:
                    d = sharded_scan_distances(
                        qq, quant.codes, self.metric, self._mesh
                    )
                else:
                    d = scan_distances(qq, quant.codes, self.metric)
            d = np.asarray(d)[:, : quant.count]
        return d[0] if single else d

    def _distances_i4(self, q: np.ndarray, quant: _QuantState) -> np.ndarray:
        """Full [B, N] INT4 distances (approximate, original-domain) — the
        quantize_scan_stream analogue for the 4-bit path."""
        from sqlite_vector_tpu.ops.quantize4 import int4_scan_distances

        dim = self.dimension
        qf = q.astype(np.float32)
        if isinstance(quant.codes, jnp.ndarray):
            d = int4_scan_distances(
                self._put_query(qf), quant.codes, quant.row_scale,
                quant.sq_norms, self.metric, dim=dim,
            )
            return np.asarray(d)[:, : quant.count]
        # host-resident packed codes: tile through HBM
        n = quant.count
        b = qf.shape[0]
        out = np.empty((b, n), np.float32)
        tile = _I4_STREAM_TILE
        qd = self._put_query(qf)
        for s in range(0, n, tile):
            e = min(s + tile, n)
            rows = e - s
            pk = np.ascontiguousarray(quant.codes[s:e])
            al = np.ascontiguousarray(quant.row_scale[s:e])
            cs = np.ascontiguousarray(quant.sq_norms[s:e])
            if rows < tile and n > tile:
                # pad the final partial tile to the fixed tile shape so the
                # jitted executable is reused across tiles AND across calls
                # with drifting counts (alpha=0/csq=0 pad rows are harmless
                # — the [:, :rows] slice below drops them). Without this,
                # every distinct tail shape paid a fresh XLA compile, which
                # dominated *_stream latency on host storage.
                pad = tile - rows
                pk = np.pad(pk, ((0, pad), (0, 0)))
                al = np.pad(al, (0, pad))
                cs = np.pad(cs, (0, pad))
            d = int4_scan_distances(
                qd,
                jnp.asarray(pk),
                jnp.asarray(al),
                jnp.asarray(cs),
                self.metric,
                dim=dim,
            )
            out[:, s:e] = np.asarray(d)[:, :rows]
        return out

    # -- quantization ----------------------------------------------------------

    _QUANT_UNSET = object()

    def _require_quant(
        self, caller: str, quant=_QUANT_UNSET
    ) -> _QuantState:
        # single snapshot read: a concurrent drop_quantization() between a
        # check and a use must not crash a searcher thread (serving.py runs
        # searches and mutations from different threads). A caller that
        # already snapshotted passes its snapshot VERBATIM — including None
        # (quantize() hadn't run at snapshot time): falling back to the
        # live self._quant there would pair a fresh quant with masks built
        # from the None-generation snapshot (empty filtered results)
        q = self._quant if quant is Dataset._QUANT_UNSET else quant
        if q is None or q.codes is None:
            raise VectorStateError(
                f"{caller}: quantization not found — run quantize() first "
                "(reference requires vector_quantize before vector_quantize_scan)."
            )
        return q

    def quantize(
        self,
        options: str | None = None,
        *,
        qtype: QuantType | str | None = None,
        checkpoint: str | None = None,
        refine: bool = False,
    ) -> int:
        """(Re)build int8/uint8 quantized codes; returns the row count.

        refine=True (requires qtype='int4'): additionally builds an int8
        sidecar of the SAME row snapshot for search(mode="refine") — the
        device-side two-stage search (int4 prefilter, int8 rescore, no host
        round trip; ops/refine.py). Costs rows*dim extra bytes on device;
        both code sets of a 10M x 768 dataset fit one chip where the f32
        matrix does not. Single-chip only (meshes route refine through
        rerank instead).

        Serialized against add/remove/update (one mutation at a time);
        concurrent searches keep serving the previous codes until the new
        _QuantState is swapped in. Tombstoned rows are compacted away first
        so codes never cover removed rows.

        Mirrors vector_quantize (src/sqlite-vector.c:1406-1459): existing
        codes are replaced; the scale/offset formulas and AUTO resolution
        match the reference bit-for-bit. The codes land directly in HBM
        (the reference's separate preload step is the default here).

        checkpoint (host-storage datasets): directory for a RESUMABLE build.
        The quantize params and per-chunk progress are persisted there and
        the codes are written into an on-disk memmap; a crashed build picks
        up at the first unfinished chunk on the next call with the same
        directory (the >RAM analogue of the reference's transactional
        rebuild, src/sqlite-vector.c:1418-1452 — its ROLLBACK restarts from
        scratch, ours restarts from the last completed chunk). Any row
        mutation since the checkpoint was written — including an update()
        that changes no counts — discards it and starts over (detected via
        the persisted data token, not just count/dim/qtype), so a stale
        finished checkpoint can never serve codes of older rows.
        """
        with self._mutate_lock:
            if self._n_dead and self._can_compact():
                self._compact_locked()
            gen0 = self._mutation_gen
        # the build itself runs OUTSIDE the lock (it can take seconds on
        # >RAM host builds / cold compiles; searches and short mutations
        # must not queue behind it) — it reads one snapshot of the row
        # state and installs the new _QuantState with one reference swap
        result = self._quantize_build(
            options, qtype=qtype, checkpoint=checkpoint, refine=refine
        )
        with self._mutate_lock:
            quant = self._quant
            if quant is not None and self._mutation_gen != gen0:
                # a mutation landed during the build: same staleness contract
                # as mutating after quantize (mutators flip this themselves
                # for any quant installed before they ran)
                quant.stale = True
        return result

    def _quantize_build(
        self,
        options: str | None = None,
        *,
        qtype: QuantType | str | None = None,
        checkpoint: str | None = None,
        refine: bool = False,
    ) -> int:
        opts = parse_options(options, self.options)
        if qtype is not None:
            opts.qtype = (
                QuantType.from_name(qtype) if isinstance(qtype, str) else qtype
            )
        if refine and opts.qtype is not QuantType.I4:
            raise VectorConfigError(
                "refine=True requires qtype='int4' — the refine sidecar is "
                "the int8 rescore stage of the int4 two-stage search."
            )
        if refine and self._mesh is not None:
            raise VectorConfigError(
                "refine=True is a single-chip device-side path — on meshes "
                "use mode='rerank' (sharded int4 prefilter + exact rescore)."
            )
        if opts.qtype is QuantType.I4 and self._mesh_2d:
            # the 4-bit pack runs along the dim axis; a dim-sharded layout
            # would pack each feature slice separately and change the code
            # stream per mesh shape. Rows-only meshes cover the scale story
            # (docs/ARCHITECTURE.md); int8 remains available on 2-D meshes.
            raise VectorConfigError(
                "qtype=INT4 is not supported on a 2-D (rows x dim) mesh — "
                "use a 1-D rows mesh, or qtype=INT8."
            )
        if self._count == 0:
            # reference: zero rows still records resolved params (:1170-1178)
            resolved = (
                QuantType.U8 if opts.qtype is QuantType.AUTO else opts.qtype
            )
            self._quant = _QuantState(
                resolved, np.float32(1.0), np.float32(0.0), None, 0,
                ids=np.zeros((0,), np.int64),
            )
            return 0
        if self._storage == "host":
            return self._quantize_host(opts, checkpoint, refine=refine)
        # ONE row-state snapshot for the whole build (runs outside the lock;
        # a concurrent mutation is detected by the caller's generation check
        # and marks the installed codes stale)
        vecs = self._vectors
        count = self._count
        ids = self._ids
        count = min(count, len(ids))  # torn snapshot mid-swap: clamp (stale)
        if opts.qtype is QuantType.I4:
            from sqlite_vector_tpu.ops.quantize4 import quantize4_device

            packed, alpha, csq = quantize4_device(vecs)
            if self._mesh is not None:
                # explicit layouts for the shard_map consumers: packed rows
                # shard like the matrix; the per-row scale/csq vectors shard
                # over the same rows axis
                packed = jax.device_put(packed, self._row_sharding)
                alpha = jax.device_put(alpha, self._mask_sharding)
                csq = jax.device_put(csq, self._mask_sharding)
            state = _QuantState(
                QuantType.I4, np.float32(1.0), np.float32(0.0), packed,
                count, ids=ids[:count].copy(), sq_norms=csq, row_scale=alpha,
            )
            if refine:
                # int8 sidecar of the SAME snapshot (AUTO-resolved params,
                # the reference's formulas), positionally aligned with the
                # packed rows — search(mode="refine") gathers its candidate
                # rows from this array on device
                mn, mx, neg = minmax_and_negative(
                    vecs, count, valid_is_full=False
                )
                rq8, s8, o8 = resolve_quant_params(
                    float(mn), float(mx), bool(neg), QuantType.AUTO
                )
                state.codes8 = quantize_device(vecs, s8, o8, rq8)
                state.qtype8, state.scale8, state.offset8 = rq8, s8, o8
            self._quant = state
            return count
        # on a 2-D mesh the device matrix carries zero dim-padding that
        # would poison the global min/max: reduce over the unpadded column
        # slice (still on device), and re-zero the padded code columns after
        # quantizing (a quantized 0 is a nonzero code)
        mat = vecs[:, : self.dimension] if self._mesh_2d else vecs
        mn, mx, neg = minmax_and_negative(mat, count, valid_is_full=False)
        rqtype, scale, offset = resolve_quant_params(
            float(mn), float(mx), bool(neg), opts.qtype
        )
        codes = quantize_device(vecs, scale, offset, rqtype)
        if self._mesh_2d:
            codes = _zero_pad_columns(codes, self.dimension)
        self._quant = _QuantState(
            rqtype, scale, offset, codes, count,
            ids=ids[:count].copy(),
        )
        return count

    def _quantize_host(
        self,
        opts: VectorOptions,
        checkpoint: str | None,
        refine: bool = False,
    ) -> int:
        """Host-resident quantize build: chunked numpy pipeline with
        semantics identical to the device path (the oracle mirrors the
        reference's q_round/scale formulas bit-for-bit). Chunking keeps
        peak RAM at one tile even when _host_vectors is a lazy mmap shard
        view (hostarray.ShardedRows) larger than RAM. With `checkpoint`,
        progress persists across crashes (see quantize())."""
        from sqlite_vector_tpu import oracle

        count = self._count
        # one array-reference snapshot for the whole (long, lock-free)
        # build: a concurrent compaction swaps self._host_vectors and a
        # re-read mid-build would mix generations / short-read a chunk
        host = self._host_vectors
        data_token = self._data_token
        dim = self.dimension
        chunk_rows = max(1, HOST_CHUNK_ELEMS // max(dim, 1))
        starts = range(0, count, chunk_rows)

        # non-writable mirrors (>RAM mmap views) keep their tombstones —
        # compacting would materialize the matrix. Filter dead rows
        # chunk-wise: codes come out compacted (offs = live prefix sums),
        # at one-chunk peak RAM.
        live = self._live_row_mask()
        if live is not None:
            live = live[:count]
            offs = np.zeros(count + 1, np.int64)
            np.cumsum(live, out=offs[1:])
            out_count = int(offs[-1])
            ids_out = self._ids[:count][live].copy()
        else:
            out_count = count
            ids_out = self._ids[:count].copy()
        if out_count == 0:
            resolved = (
                QuantType.U8 if opts.qtype is QuantType.AUTO else opts.qtype
            )
            self._quant = _QuantState(
                resolved, np.float32(1.0), np.float32(0.0), None, 0,
                ids=np.zeros((0,), np.int64),
            )
            return 0

        def _chunk(s: int) -> np.ndarray:
            e = min(s + chunk_rows, count)
            c = np.asarray(host[s:e])
            return c[live[s:e]] if live is not None else c

        if opts.qtype is QuantType.I4:
            return self._quantize_host_i4(
                opts, checkpoint, _chunk, starts, live,
                offs if live is not None else None,
                count, chunk_rows, out_count, ids_out, data_token, dim,
                refine=refine,
            )

        meta = None
        meta_path = codes_path = None
        if checkpoint:
            os.makedirs(checkpoint, exist_ok=True)
            meta_path = os.path.join(checkpoint, "quant_checkpoint.json")
            codes_path = os.path.join(checkpoint, "qcodes.npy")
            meta = self._load_quant_checkpoint(
                meta_path, codes_path, opts, count, chunk_rows, out_count,
                data_token,
            )

        if meta is None:
            # pass 1: global min/max over all chunks (one streaming pass)
            rqtype, scale, offset = oracle.compute_quant_params_chunked(
                (c for c in (_chunk(s) for s in starts) if len(c)),
                opts.qtype,
            )
            done = 0
            if checkpoint:
                if os.path.exists(codes_path):
                    # a completed earlier build in THIS process may still be
                    # serving searches through a mapping of this file (the
                    # lock-free snapshot contract): unlink first so w+
                    # creates a fresh inode instead of truncating the mapped
                    # one mid-read (torn codes, or SIGBUS when the live row
                    # count shrank)
                    os.unlink(codes_path)
                codes = np.lib.format.open_memmap(
                    codes_path, mode="w+", dtype=rqtype.np_dtype,
                    shape=(out_count, dim),
                )
                meta = {
                    "qtype": rqtype.value,
                    "scale": float(scale),
                    "offset": float(offset),
                    "count": count,
                    "live_count": out_count,
                    "dim": dim,
                    "chunk_rows": chunk_rows,
                    "requested_qtype": opts.qtype.value,
                    "data_token": data_token,
                    "done": 0,
                }
                self._write_quant_checkpoint(meta_path, meta)
            else:
                codes = np.empty((out_count, dim), rqtype.np_dtype)
        else:
            rqtype = QuantType.from_name(meta["qtype"])
            scale = np.float32(meta["scale"])
            offset = np.float32(meta["offset"])
            done = int(meta["done"])
            codes = np.lib.format.open_memmap(codes_path, mode="r+")

        # pass 2: quantize chunk by chunk, resuming after `done` chunks
        for ci, s in enumerate(starts):
            if ci < done:
                continue
            e = min(s + chunk_rows, count)
            chunk = _chunk(s).astype(np.float32, copy=False)
            ws, we = (
                (int(offs[s]), int(offs[e])) if live is not None else (s, e)
            )
            if len(chunk):
                if self._has_nonfinite:
                    codes[ws:we] = oracle.quantize(chunk, scale, offset, rqtype)
                else:
                    # finite fast path: bit-identical, half the memory passes
                    oracle.quantize_fast(
                        chunk, scale, offset, rqtype, out=codes[ws:we]
                    )
            if checkpoint:
                codes.flush()
                meta["done"] = ci + 1
                self._write_quant_checkpoint(meta_path, meta)

        self._quant = _QuantState(
            rqtype, scale, offset, codes, out_count,
            ids=ids_out,
        )
        return out_count

    def _quantize_host_i4(
        self, opts, checkpoint, _chunk, starts, live, offs,
        count, chunk_rows, out_count, ids_out, data_token, dim,
        refine: bool = False,
    ) -> int:
        """Host-resident INT4 build: chunked numpy pipeline writing packed
        codes + per-row scales + code square-sums. Per-row params make the
        build single-pass (no global min/max pass — unlike the int8 path,
        each row's scale depends only on that row), so a checkpoint resumes
        at the first unfinished chunk with no parameter state to replay."""
        from sqlite_vector_tpu import oracle
        from sqlite_vector_tpu.ops.quantize4 import packed_width, quantize4_np

        p = packed_width(dim)
        meta = None
        meta_path = codes_path = scale_path = csq_path = None
        if checkpoint:
            os.makedirs(checkpoint, exist_ok=True)
            meta_path = os.path.join(checkpoint, "quant_checkpoint.json")
            codes_path = os.path.join(checkpoint, "qcodes.npy")
            scale_path = os.path.join(checkpoint, "qrow_scale.npy")
            csq_path = os.path.join(checkpoint, "qcsq.npy")
            try:
                with open(meta_path) as f:
                    m = json.load(f)
                if (
                    m.get("qtype") == QuantType.I4.value
                    and m["count"] == count
                    and m.get("live_count", m["count"]) == out_count
                    # content token, not just counts (see the int8 loader)
                    and m.get("data_token") == data_token
                    and m["dim"] == dim
                    and m["chunk_rows"] == chunk_rows
                    and m["requested_qtype"] == opts.qtype.value
                    and all(
                        os.path.exists(pth)
                        for pth in (codes_path, scale_path, csq_path)
                    )
                ):
                    probe = np.lib.format.open_memmap(codes_path, mode="r")
                    ok = probe.shape == (out_count, p)
                    del probe
                    if ok:
                        meta = m
            except Exception:
                meta = None

        if meta is None:
            done = 0
            if checkpoint:
                for pth in (codes_path, scale_path, csq_path):
                    if os.path.exists(pth):
                        # unlink before w+: an earlier completed build may
                        # still serve searches through a mapping of this
                        # file (see the int8 path's comment)
                        os.unlink(pth)
                codes = np.lib.format.open_memmap(
                    codes_path, mode="w+", dtype=np.uint8, shape=(out_count, p)
                )
                rscale = np.lib.format.open_memmap(
                    scale_path, mode="w+", dtype=np.float32, shape=(out_count,)
                )
                csq = np.lib.format.open_memmap(
                    csq_path, mode="w+", dtype=np.int32, shape=(out_count,)
                )
                meta = {
                    "qtype": QuantType.I4.value,
                    "scale": 1.0,
                    "offset": 0.0,
                    "count": count,
                    "live_count": out_count,
                    "dim": dim,
                    "chunk_rows": chunk_rows,
                    "requested_qtype": opts.qtype.value,
                    "data_token": data_token,
                    "done": 0,
                }
                self._write_quant_checkpoint(meta_path, meta)
            else:
                codes = np.empty((out_count, p), np.uint8)
                rscale = np.empty((out_count,), np.float32)
                csq = np.empty((out_count,), np.int32)
        else:
            done = int(meta["done"])
            codes = np.lib.format.open_memmap(codes_path, mode="r+")
            rscale = np.lib.format.open_memmap(scale_path, mode="r+")
            csq = np.lib.format.open_memmap(csq_path, mode="r+")

        # refine=True needs GLOBAL min/max params for the int8 sidecar.
        # Accumulate them DURING this loop (oracle.accumulate_quant_stats,
        # persisted with each chunk's progress) so the sidecar build skips
        # its own full pass over the data — at 10M x 768 that pass re-read
        # 30.7 GB (r5 review). Stats are usable only if they cover every
        # chunk: a resume from a checkpoint written without them (older
        # build, or refine added later) falls back to the sidecar's own
        # params pass.
        stats = (meta or {}).get("refine_stats") if refine else None
        stats_valid = refine and (done == 0 or stats is not None)
        if not stats_valid:
            stats = None
            # Drop any persisted stats from the loaded meta: a refine=False
            # resume of a crashed refine=True build otherwise advances
            # `done` while re-writing the PARTIAL stats on every checkpoint,
            # and a later refine=True resume would trust them (done > 0 and
            # stats non-None) — a sidecar built from min/max that cover only
            # the pre-crash chunks. Stats in the file are trustworthy only
            # because every write couples them with the `done` they cover.
            if meta is not None:
                meta.pop("refine_stats", None)

        for ci, s in enumerate(starts):
            if ci < done:
                continue
            e = min(s + chunk_rows, count)
            chunk = _chunk(s).astype(np.float32, copy=False)
            ws, we = (
                (int(offs[s]), int(offs[e])) if live is not None else (s, e)
            )
            if len(chunk):
                pk, al, cs = quantize4_np(chunk)
                codes[ws:we] = pk
                rscale[ws:we] = al
                csq[ws:we] = cs
            if stats_valid:
                stats = oracle.accumulate_quant_stats(stats, chunk)
            if checkpoint:
                codes.flush()
                rscale.flush()
                csq.flush()
                meta["done"] = ci + 1
                if stats_valid:
                    meta["refine_stats"] = stats
                self._write_quant_checkpoint(meta_path, meta)

        if stats_valid and stats is None:
            # zero chunks processed fresh (empty dataset): an explicit
            # empty accumulation keeps the no-rows params path
            stats = oracle.accumulate_quant_stats(
                None, np.empty((0,), np.float32)
            )

        state = _QuantState(
            QuantType.I4, np.float32(1.0), np.float32(0.0), codes, out_count,
            ids=ids_out, sq_norms=csq, row_scale=rscale,
        )
        if refine:
            self._build_refine_sidecar_host(
                state, opts, checkpoint, _chunk, starts, live, offs,
                count, chunk_rows, out_count, data_token, dim,
                stats=stats if stats_valid else None,
            )
        self._quant = state
        return out_count

    def _build_refine_sidecar_host(
        self, state, opts, checkpoint, _chunk, starts, live, offs,
        count, chunk_rows, out_count, data_token, dim,
        stats: dict | None = None,
    ) -> None:
        """int8 sidecar for the host-resident int4 build: one more chunked
        pass writing [out_count, dim] int8/u8 codes, positionally aligned
        with the packed rows above. With `checkpoint` the sidecar lands in
        refine8.npy and resumes per chunk like the main builds (same
        data-token staleness rule). `stats` (the int4 loop's accumulated
        global min/max, oracle.accumulate_quant_stats) skips the dedicated
        params pass — None falls back to re-streaming the chunks."""
        from sqlite_vector_tpu import oracle

        meta = None
        meta_path = codes_path = None
        if checkpoint:
            meta_path = os.path.join(checkpoint, "refine8_checkpoint.json")
            codes_path = os.path.join(checkpoint, "refine8.npy")
            try:
                with open(meta_path) as f:
                    m = json.load(f)
                if (
                    m["count"] == count
                    and m.get("live_count", m["count"]) == out_count
                    and m.get("data_token") == data_token
                    and m["dim"] == dim
                    and m["chunk_rows"] == chunk_rows
                    and os.path.exists(codes_path)
                ):
                    probe = np.lib.format.open_memmap(codes_path, mode="r")
                    if probe.shape == (out_count, dim):
                        meta = m
                    del probe
            except Exception:
                meta = None

        if meta is None:
            if stats is not None:
                # params from the int4 loop's accumulation — no second
                # pass over the (possibly >RAM) data
                rq8, s8, o8 = oracle.quant_params_from_stats(
                    QuantType.AUTO, stats
                )
            else:
                # params pass: AUTO-resolved over the same snapshot
                rq8, s8, o8 = oracle.compute_quant_params_chunked(
                    (c for c in (_chunk(s) for s in starts) if len(c)),
                    QuantType.AUTO,
                )
            done = 0
            if checkpoint:
                if os.path.exists(codes_path):
                    os.unlink(codes_path)  # fresh inode (live mappings)
                codes8 = np.lib.format.open_memmap(
                    codes_path, mode="w+", dtype=rq8.np_dtype,
                    shape=(out_count, dim),
                )
                meta = {
                    "qtype": rq8.value,
                    "scale": float(s8),
                    "offset": float(o8),
                    "count": count,
                    "live_count": out_count,
                    "dim": dim,
                    "chunk_rows": chunk_rows,
                    "data_token": data_token,
                    "done": 0,
                }
                self._write_quant_checkpoint(meta_path, meta)
            else:
                codes8 = np.empty((out_count, dim), rq8.np_dtype)
        else:
            rq8 = QuantType.from_name(meta["qtype"])
            s8 = np.float32(meta["scale"])
            o8 = np.float32(meta["offset"])
            done = int(meta["done"])
            codes8 = np.lib.format.open_memmap(codes_path, mode="r+")

        for ci, s in enumerate(starts):
            if ci < done:
                continue
            e = min(s + chunk_rows, count)
            chunk = _chunk(s).astype(np.float32, copy=False)
            ws, we = (
                (int(offs[s]), int(offs[e])) if live is not None else (s, e)
            )
            if len(chunk):
                if self._has_nonfinite:
                    codes8[ws:we] = oracle.quantize(chunk, s8, o8, rq8)
                else:
                    oracle.quantize_fast(chunk, s8, o8, rq8, out=codes8[ws:we])
            if checkpoint:
                codes8.flush()
                meta["done"] = ci + 1
                self._write_quant_checkpoint(meta_path, meta)

        state.codes8 = codes8
        state.qtype8 = rq8
        state.scale8 = np.float32(s8)
        state.offset8 = np.float32(o8)

    @staticmethod
    def _write_quant_checkpoint(meta_path: str, meta: dict) -> None:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)  # atomic: a crash never corrupts the meta

    def _load_quant_checkpoint(
        self,
        meta_path: str,
        codes_path: str,
        opts: VectorOptions,
        count: int,
        chunk_rows: int,
        live_count: int,
        data_token: str,
    ) -> dict | None:
        """Return the checkpoint meta if it matches this build, else None
        (start over). A finished checkpoint (done == nchunks) is still
        resumed — the final loop below skips every chunk and the codes load
        straight from the memmap."""
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            if (
                meta["count"] == count
                # removals between resume attempts change the live row set
                # the stored code offsets were computed for
                and meta.get("live_count", meta["count"]) == live_count
                # counts alone cannot prove the rows are unchanged: an
                # update() keeps every count identical, and add()+remove()
                # can net out — only the mutation-regenerated content token
                # ties this checkpoint to the exact row state it was built
                # from (fuzz seed 2202: a finished checkpoint of OLD rows
                # was resumed and served wrong codes)
                and meta.get("data_token") == data_token
                and meta["dim"] == self.dimension
                and meta["chunk_rows"] == chunk_rows
                and meta["requested_qtype"] == opts.qtype.value
                and os.path.exists(codes_path)
            ):
                probe = np.lib.format.open_memmap(codes_path, mode="r")
                ok = probe.shape == (live_count, self.dimension)
                del probe
                if ok:
                    return meta
        except Exception:
            pass
        return None

    def quantize_memory(self) -> int:
        """Bytes needed for the quantized representation.

        The reference reports SUM(LENGTH(data)) over the shadow table, i.e.
        rows * (8-byte rowid + dim bytes) (src/sqlite-vector.c:1486-1499).
        We report the same formula for parity even though our HBM layout
        stores ids separately.
        """
        quant = self._require_quant("vector_quantize_memory")
        if quant.qtype is QuantType.I4:
            from sqlite_vector_tpu.ops.quantize4 import packed_width

            # no reference formula to mirror at 4 bits: report the honest
            # record layout — 8-byte rowid + 4-byte per-row scale + 4-byte
            # per-row csq + packed codes. This matches the persisted shadow
            # record stride (16 + P, sqlite.py vector_quantize), so the
            # Dataset API and the SQL surface's vector_quantize_memory
            # (SUM(LENGTH(data))) agree byte-for-byte.
            base = quant.count * (16 + packed_width(self.dimension))
            if quant.codes8 is not None:
                # the refine sidecar's int8 codes (no rowids of their own —
                # rows are positionally aligned with the packed records)
                base += quant.count * self.dimension
            return base
        return quant.count * (8 + self.dimension)

    def _code_upload_capacity(self, count: int) -> int:
        """Row capacity for quantized-code uploads.

        When a device-resident vector matrix exists, codes MUST share its
        row capacity: the fused rerank kernel requires positional capacity
        equality (the `vecs.shape[0] == quant.codes.shape[0]` gate in
        _search_rerank), and codes are at most a quarter of the matrix's
        bytes, so matching its pow-2 padding adds no new OOM risk. Without
        a resident matrix (host storage — the 10M regime whose 68% pow-2
        pad OOMed the r5 bench) use the padding-bounded _upload_capacity.

        A STALE quantization can carry more rows than the live matrix (a
        load() after remove+save compacts vectors but keeps the quantized
        snapshot at its own count — the reference's staleness contract);
        matching the smaller matrix capacity would truncate or misplace
        those rows, so fall back to the bounded capacity. The fused gate
        can't match anyway — it also requires `not quant.stale`."""
        vecs = self._vectors
        if vecs is not None and count <= int(vecs.shape[0]):
            return int(vecs.shape[0])
        return _upload_capacity(count, self._mesh_size)

    def preload(self) -> None:
        """Pin the quantized codes in HBM.

        A no-op for hbm-storage datasets (codes are uploaded at quantize()
        time). For host-storage datasets this is the reference's
        vector_quantize_preload (src/sqlite-vector.c:1338-1404): quantized
        scans switch from per-query host->HBM streaming to the resident
        fused path — the 4-5x speedup the reference documents.
        """
        quant = self._require_quant("vector_quantize_preload")
        if quant.codes is not None and not isinstance(quant.codes, jnp.ndarray):
            codes = quant.codes  # may be an on-disk memmap — stream chunks
            cap = self._code_upload_capacity(quant.count)
            if quant.qtype is QuantType.I4:
                # packed codes + the per-row scale/csq sidecars
                quant.codes = self._upload_rows_padded(
                    codes, quant.count, cap
                )
                quant.row_scale = self._put_aux_rows(
                    np.asarray(quant.row_scale, np.float32), quant.count, cap
                )
                quant.sq_norms = self._put_aux_rows(
                    np.asarray(quant.sq_norms, np.int32), quant.count, cap
                )
                if quant.codes8 is not None and not isinstance(
                    quant.codes8, jnp.ndarray
                ):
                    # the int8 refine sidecar rides along (mode="refine" is
                    # device-side only)
                    quant.codes8 = self._upload_rows_padded(
                        quant.codes8, quant.count, cap
                    )
                return
            quant.codes = self._upload_rows_padded(codes, quant.count, cap)
            quant.sq_norms = None

    def drop_quantization(self) -> None:
        """Free quantized codes (reference: vector_quantize_cleanup :1501-1524).

        Silent no-op when no quantization exists (:1510)."""
        self._quant = None

    @property
    def quant_stale(self) -> bool:
        """True when rows changed after the last quantize() — approximate
        scans still run on the old codes, same as the reference until
        vector_quantize is re-run."""
        return bool(self._quant and self._quant.stale)

    # -- persistence -----------------------------------------------------------

    def save(
        self,
        directory: str,
        *,
        shard_rows: int | None = None,
        resume: bool = False,
    ) -> None:
        """Persist to a directory: manifest.json + npy shard files.

        The analogue of the `_sqliteai_vector` metadata table plus the
        vector0_* shadow tables (src/sqlite-vector.c:114, 1000-1026).
        `shard_rows` splits the matrix into multiple files. `resume=True`
        skips shards already on disk ONLY when their provenance is proven,
        shard by shard: an interrupted save's marker proves exactly the
        shards it recorded as completed under this dataset's current data
        token, and a completed manifest with the token proves every shard
        it lists. Mere existence of a file is never proof — a full rewrite
        that crashed early leaves the PREVIOUS generation's shard files
        behind under this attempt's marker token, and trusting existence
        would re-commit those stale bytes on retry. A marker carrying a
        DIFFERENT token is active disproof (some other attempt partially
        overwrote the directory): nothing on disk is trusted even when the
        old manifest token matches. Any mutation — including a same-count
        update() — regenerates the token, so resume falls back to a full
        rewrite instead of silently keeping stale bytes (the counts-only
        skip heuristic this replaces had the same failure shape as the
        checkpointed-quantize bug at fuzz seed 2202).
        """
        with self._mutate_lock:
            if self._n_dead and self._can_compact():
                self._compact_locked()  # never persist tombstoned rows
            # one same-generation snapshot of the row state: a concurrent
            # mutation must not mix mask/ids/count generations mid-save.
            # Non-writable (>RAM mmap) mirrors keep tombstones; the shard
            # loop filters them instead of materializing a compacted copy
            count = self._count
            n_dead = self._n_dead
            ids_arr = self._ids
            live = self._live_row_mask()
            vecs = self._host_vectors
            data_token = self._data_token
        os.makedirs(directory, exist_ok=True)
        marker_path = os.path.join(directory, "save_in_progress.json")
        # which shard files are PROVEN to hold this row state's bytes
        # (file name -> row count); shards outside this map always rewrite
        proven_shards: dict[str, int] = {}
        marker_state = None
        try:
            with open(marker_path) as f:
                marker_state = json.load(f)
        except (OSError, ValueError):
            marker_state = None
        if resume:
            if marker_state is not None:
                # an interrupted save proves ONLY the shards its marker
                # recorded as done; a mismatched token is disproof and
                # deliberately does NOT fall through to the manifest check
                # (that save may have already overwritten manifest-proven
                # shards with foreign content)
                if marker_state.get("data_token") == data_token:
                    proven_shards = {
                        str(k): int(v)
                        for k, v in (
                            marker_state.get("done_shards") or {}
                        ).items()
                    }
            else:
                try:
                    with open(
                        os.path.join(directory, "manifest.json")
                    ) as f:
                        m = json.load(f)
                    if m.get("data_token") == data_token:
                        proven_shards = {
                            str(sh["file"]): int(sh["rows"])
                            for sh in m.get("vector_shards") or []
                        }
                except (OSError, ValueError, KeyError, TypeError):
                    pass
        resume = bool(proven_shards)
        # marker lands BEFORE any shard so a crash mid-save leaves proof of
        # what the partial shards contain; per-shard completion is appended
        # as each shard commits; removed after the manifest commits
        done_shards: dict[str, int] = {}

        def _commit_marker() -> None:
            with open(marker_path + ".tmp", "w") as f:
                json.dump(
                    {"data_token": data_token, "done_shards": done_shards},
                    f,
                )
            os.replace(marker_path + ".tmp", marker_path)

        _commit_marker()
        manifest = {
            "name": self.name,
            "version": 2,
            "type": self.options.type.value,
            "dimension": self.options.dimension,
            "distance": self.options.distance.value,
            "normalized": self.options.normalized,
            "max_memory": self.options.max_memory,
            "count": count - n_dead,
            "next_rowid": self._next_rowid,
            "has_nonfinite": self._has_nonfinite,
            "data_token": data_token,
            "quant": None,
        }
        if live is not None:
            _atomic_npy_save(
                os.path.join(directory, "ids.npy"),
                ids_arr[:count][live[:count]],
            )
        else:
            _atomic_npy_save(os.path.join(directory, "ids.npy"), ids_arr[:count])
        # bfloat16 isn't a numpy-native dtype: store the raw uint16 bits
        if self.options.type is VectorType.BF16:
            vecs = vecs.view(np.uint16)
        if shard_rows:
            # sliced per shard so a lazy mmap view (ShardedRows) is never
            # materialized in full — >RAM datasets round-trip shard by shard
            shards = []
            for i, start in enumerate(range(0, max(count, 1), shard_rows)):
                name = f"vectors-{i:05d}.npy"
                end = min(start + shard_rows, count)
                part = np.asarray(vecs[start:end])
                if live is not None:
                    part = part[live[start:end]]
                path = os.path.join(directory, name)
                # resume mode: skip only shards with recorded provenance
                # (proven for this exact data token — never bare existence)
                if not (
                    resume
                    and proven_shards.get(name) == len(part)
                    and os.path.exists(path)
                ):
                    # atomic: `part` may be a view of THIS file's mmap when
                    # a host/mmap-loaded dataset saves onto its own directory
                    _atomic_npy_save(path, part)
                done_shards[name] = len(part)
                _commit_marker()  # crash after this point proves the shard
                shards.append({"file": name, "rows": len(part)})
            manifest["vector_shards"] = shards
        else:
            full = np.asarray(vecs[:count])
            if live is not None:
                full = full[live[:count]]
            _atomic_npy_save(os.path.join(directory, "vectors.npy"), full)
        quant = self._quant  # one snapshot vs a concurrent drop_quantization
        if quant is not None:
            manifest["quant"] = {
                "qtype": quant.qtype.value,
                "scale": float(quant.scale),
                "offset": float(quant.offset),
                "count": quant.count,
                "stale": quant.stale,
            }
            if quant.codes is not None:
                # slice off 2-D-mesh dim padding: load() rebuilds its own
                # padded layout from the true dimension. Atomic: host-storage
                # loads keep quant.codes as a memmap of THIS qcodes.npy —
                # plain np.save truncated the file while reading through the
                # mapping (all-garbage codes on the second save/load cycle,
                # caught by fuzz seed 642)
                codes_np = np.asarray(quant.codes)[: quant.count]
                if quant.qtype is not QuantType.I4:
                    codes_np = codes_np[:, : self.options.dimension]
                # (INT4 columns are the packed width, never dim-padded —
                # 2-D meshes reject the 4-bit path at quantize time)
                _atomic_npy_save(
                    os.path.join(directory, "qcodes.npy"), codes_np
                )
            if quant.qtype is QuantType.I4 and quant.row_scale is not None:
                _atomic_npy_save(
                    os.path.join(directory, "qrow_scale.npy"),
                    np.asarray(quant.row_scale)[: quant.count],
                )
                _atomic_npy_save(
                    os.path.join(directory, "qcsq.npy"),
                    np.asarray(quant.sq_norms)[: quant.count],
                )
            if quant.codes8 is not None:
                # the int8 refine sidecar persists alongside the packed
                # codes so mode="refine" survives save/load
                manifest["quant"]["refine"] = {
                    "qtype8": quant.qtype8.value,
                    "scale8": float(quant.scale8),
                    "offset8": float(quant.offset8),
                }
                _atomic_npy_save(
                    os.path.join(directory, "qcodes8.npy"),
                    np.asarray(quant.codes8)[: quant.count],
                )
            if quant.ids is not None:
                _atomic_npy_save(
                    os.path.join(directory, "qids.npy"), quant.ids
                )
        mpath = os.path.join(directory, "manifest.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(mpath + ".tmp", mpath)
        try:
            os.unlink(marker_path)  # the manifest is now the provenance
        except OSError:
            pass

    @classmethod
    def save_stream(
        cls,
        directory: str,
        chunks,
        *,
        options: str | VectorOptions | None = None,
        name: str = "dataset",
        ids_start: int = 1,
    ) -> int:
        """Out-of-core dataset creation: write a save()-compatible directory
        from an iterator of [rows, dim] chunks WITHOUT ever materializing
        the matrix in RAM (each chunk becomes one shard file). The streaming
        analogue of the reference's row-by-row INSERT ingestion — a dataset
        far larger than host RAM can be built chunk by chunk and then opened
        with `Dataset.load(directory, storage="host", mmap=True)` (lazy
        mmap shard view; scans stream tiles through HBM).

        Returns the total row count. Row ids are assigned sequentially from
        `ids_start` (the reference's rowid model).
        """
        if isinstance(options, VectorOptions):
            opts = dataclasses.replace(options)
        else:
            opts = parse_options(options)
        os.makedirs(directory, exist_ok=True)
        # same crash discipline as save(): an in-progress marker lands
        # before any shard (a crash mid-stream over a previously completed
        # directory leaves DISPROOF — load() refuses the mixed-generation
        # state instead of stitching old manifest + new shards), every file
        # commits via temp+rename (a truncated shard can never appear under
        # its final name, and live mappings of an older generation keep
        # their inodes), and the marker is removed only after the manifest.
        data_token = os.urandom(16).hex()
        marker_path = os.path.join(directory, "save_in_progress.json")
        with open(marker_path + ".tmp", "w") as f:
            json.dump({"data_token": data_token, "done_shards": {}}, f)
        os.replace(marker_path + ".tmp", marker_path)
        np_dtype = opts.type.np_dtype
        shards = []
        count = 0
        dim = opts.dimension
        has_nonfinite = False
        for i, chunk in enumerate(chunks):
            arr = np.asarray(chunk)
            if arr.ndim != 2:
                raise VectorConfigError(
                    f"save_stream: chunk {i} is not a [rows, dim] array"
                )
            if dim <= 0:
                dim = int(arr.shape[1])
            if arr.shape[1] != dim:
                raise VectorConfigError(
                    f"Invalid vector dimension: expected {dim} but found "
                    f"{arr.shape[1]}."
                )
            if arr.dtype != np_dtype:
                arr = arr.astype(np_dtype)
            if not has_nonfinite:
                has_nonfinite = _scan_nonfinite(arr, opts.type, len(arr))
            fname = f"vectors-{i:05d}.npy"
            out = arr.view(np.uint16) if opts.type is VectorType.BF16 else arr
            _atomic_npy_save(os.path.join(directory, fname), out)
            shards.append({"file": fname, "rows": int(len(arr))})
            count += len(arr)
        if dim <= 0:
            raise VectorConfigError(
                "Required 'dimension' option is missing (it must be "
                "specified in vector_init)."
            )
        if not shards:
            # empty dataset: load() treats an empty shard list as "no
            # shards" and would look for vectors.npy — write one empty
            # shard so the round trip matches save()'s behavior
            out = np.zeros((0, dim), np_dtype)
            if opts.type is VectorType.BF16:
                out = out.view(np.uint16)
            _atomic_npy_save(
                os.path.join(directory, "vectors-00000.npy"), out
            )
            shards.append({"file": "vectors-00000.npy", "rows": 0})
        _atomic_npy_save(
            os.path.join(directory, "ids.npy"),
            np.arange(ids_start, ids_start + count, dtype=np.int64),
        )
        manifest = {
            "name": name,
            "version": 2,
            "type": opts.type.value,
            "dimension": dim,
            "distance": opts.distance.value,
            "normalized": opts.normalized,
            "max_memory": opts.max_memory,
            "count": count,
            "next_rowid": ids_start + count,
            "has_nonfinite": has_nonfinite,
            "data_token": data_token,  # matches the marker: a matching
            # leftover marker is provably this same completed stream
            "quant": None,
            "vector_shards": shards,
        }
        mpath = os.path.join(directory, "manifest.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(mpath + ".tmp", mpath)
        try:
            os.remove(marker_path)
        except OSError:
            pass
        return count

    @classmethod
    def load(
        cls,
        directory: str,
        *,
        device: Any = None,
        sharding: Any = None,
        mesh: Any = None,
        storage: str = "hbm",
        mmap: bool = False,
    ) -> "Dataset":
        with open(os.path.join(directory, "manifest.json")) as f:
            manifest = json.load(f)
        marker_path = os.path.join(directory, "save_in_progress.json")
        if os.path.exists(marker_path):
            # a save crashed before committing its manifest. If it was
            # saving DIFFERENT content than the manifest describes, some
            # shard files may already hold the newer generation's bytes —
            # the manifest would stitch mixed-generation rows together.
            # A matching token means the interrupted save was re-writing
            # the same content the manifest already proves: safe to load.
            try:
                with open(marker_path) as f:
                    marker_token = json.load(f).get("data_token")
            except (OSError, ValueError):
                marker_token = None
            if marker_token != manifest.get("data_token"):
                raise ValueError(
                    f"{directory!r} holds an interrupted save of different "
                    "content than its manifest describes (shard files may "
                    "be mixed-generation). Re-run Dataset.save() from the "
                    "source data, or delete save_in_progress.json only if "
                    "the directory is known consistent."
                )
        options = VectorOptions(
            type=VectorType.from_name(manifest["type"]),
            dimension=manifest["dimension"],
            normalized=manifest.get("normalized", False),
            max_memory=manifest.get("max_memory", 0) or 0,
            distance=DistanceMetric.from_name(manifest["distance"]),
        )
        ds = cls(
            manifest["name"],
            options,
            device=device,
            sharding=sharding,
            mesh=mesh,
            storage=storage,
        )
        ids = np.load(os.path.join(directory, "ids.npy"))
        shards = manifest.get("vector_shards")
        if shards:
            if mmap and storage == "host":
                parts = [
                    np.load(os.path.join(directory, sh["file"]), mmap_mode="r")
                    for sh in shards
                ]
                vecs = None  # attached shard-by-shard below
            else:
                parts = [
                    np.load(os.path.join(directory, sh["file"])) for sh in shards
                ]
                vecs = np.concatenate(parts) if parts else None
        elif mmap and storage == "host":
            vecs = np.load(
                os.path.join(directory, "vectors.npy"), mmap_mode="r"
            )
        else:
            vecs = np.load(os.path.join(directory, "vectors.npy"))
        if vecs is None and shards:
            # host+mmap sharded: keep the memory maps behind a lazy row view —
            # no RAM copy ever, scans stream tile-by-tile (hostarray.py)
            total = int(sum(sh["rows"] for sh in shards))
            if total:
                from sqlite_vector_tpu.hostarray import ShardedRows

                joined = parts[0] if len(parts) == 1 else ShardedRows(parts)
                if options.type is VectorType.BF16:
                    joined = joined.view(options.type.np_dtype)
                ds._attach_host(joined, ids)
        elif mmap and storage == "host":
            if options.type is VectorType.BF16:
                vecs = vecs.view(options.type.np_dtype)
            if len(ids):
                ds._attach_host(vecs, ids)
        else:
            if options.type is VectorType.BF16 and vecs is not None:
                vecs = vecs.view(options.type.np_dtype)
            if len(ids):
                # the manifest's has_nonfinite flag (restored below) already
                # answers for these rows — skip add()'s O(N) re-scan
                ds._trust_nonfinite_flag = True
                try:
                    ds.add(vecs, ids)
                finally:
                    ds._trust_nonfinite_flag = False
        ds._next_rowid = manifest.get("next_rowid", ds._next_rowid)
        # restore AFTER the attach/add above (add() regenerates the token):
        # the loaded rows ARE the saved content, so a checkpointed quantize
        # of that content stays resumable across the round trip. Absent from
        # older manifests -> keep the fresh token (worst case: one rebuild)
        ds._data_token = manifest.get("data_token", ds._data_token)
        # mmap/attach loads skip the per-add scan; restore the saved flag
        # (sticky, so OR with anything the add() path already detected)
        ds._has_nonfinite = ds._has_nonfinite or manifest.get(
            "has_nonfinite", False
        )
        q = manifest.get("quant")
        if q:
            qtype = QuantType.from_name(q["qtype"])
            codes_path = os.path.join(directory, "qcodes.npy")
            codes = None
            row_scale = csq = None
            count = q["count"]
            if os.path.exists(codes_path) and count:
                host_codes = np.load(codes_path, mmap_mode="r")
                if qtype is QuantType.I4:
                    row_scale = np.load(
                        os.path.join(directory, "qrow_scale.npy")
                    )
                    csq = np.load(os.path.join(directory, "qcsq.npy"))
                if ds._storage == "host":
                    # host storage streams codes per query until an explicit
                    # preload(); uploading here would pin codes that may not
                    # fit HBM — the very workload host storage serves
                    codes = host_codes
                else:
                    cap = ds._code_upload_capacity(count)
                    codes = ds._upload_rows_padded(host_codes, count, cap)
                    if qtype is QuantType.I4:
                        row_scale = ds._put_aux_rows(
                            row_scale.astype(np.float32), count, cap
                        )
                        csq = ds._put_aux_rows(
                            csq.astype(np.int32), count, cap
                        )
            qids_path = os.path.join(directory, "qids.npy")
            qids = np.load(qids_path) if os.path.exists(qids_path) else None
            ds._quant = _QuantState(
                qtype,
                np.float32(q["scale"]),
                np.float32(q["offset"]),
                codes,
                count,
                ids=qids,
                stale=q.get("stale", False),
                sq_norms=csq,
                row_scale=row_scale,
            )
            r8 = q.get("refine")
            codes8_path = os.path.join(directory, "qcodes8.npy")
            if r8 and count and os.path.exists(codes8_path):
                host8 = np.load(codes8_path, mmap_mode="r")
                if ds._storage == "host":
                    ds._quant.codes8 = host8  # preload() uploads on demand
                else:
                    cap = ds._code_upload_capacity(count)
                    ds._quant.codes8 = ds._upload_rows_padded(
                        host8, count, cap
                    )
                ds._quant.qtype8 = QuantType.from_name(r8["qtype8"])
                ds._quant.scale8 = np.float32(r8["scale8"])
                ds._quant.offset8 = np.float32(r8["offset8"])
        return ds


class VectorStore:
    """A named registry of Datasets — the per-connection vector_context
    (src/sqlite-vector.c:116-181) without the 128-table cap.

    Lookups are case-insensitive (vector_context_lookup :1051)."""

    def __init__(self, *, device: Any = None, sharding: Any = None, mesh: Any = None):
        import threading

        self._datasets: dict[str, Dataset] = {}
        self._device = device
        self._sharding = sharding
        self._mesh = mesh
        # registry mutations are serialized: create()/drop() may be called
        # from serving threads (the reference's per-connection registry is
        # single-threaded by SQLite's connection model)
        self._lock = threading.Lock()

    def create(
        self,
        name: str,
        options: str | VectorOptions | None = None,
        **kwargs: Any,
    ) -> Dataset:
        """Create (or idempotently re-open) a dataset.

        Mirrors vector_init (src/sqlite-vector.c:2491-2543): requires
        dimension; re-init with consistent options returns the existing
        dataset, inconsistent dim/type raises.
        kwargs: dimension=, type=, distance=, ... override the options string.
        """
        if isinstance(options, VectorOptions):
            # never mutate (or share) the caller's object — the kwargs
            # overrides below and Dataset itself would otherwise alias it
            opts = dataclasses.replace(options)
        else:
            opts = parse_options(options)
        if "dimension" in kwargs:
            opts.dimension = int(kwargs["dimension"])
        if "type" in kwargs:
            t = kwargs["type"]
            opts.type = VectorType.from_name(t) if isinstance(t, str) else t
        if "distance" in kwargs:
            d = kwargs["distance"]
            opts.distance = (
                DistanceMetric.from_name(d) if isinstance(d, str) else d
            )
        if "qtype" in kwargs:
            qt = kwargs["qtype"]
            opts.qtype = QuantType.from_name(qt) if isinstance(qt, str) else qt

        key = name.lower()
        with self._lock:
            existing = self._datasets.get(key)
            if existing is not None:
                # consistency checks on re-init (reference :2521-2536)
                if existing.options.dimension != opts.dimension:
                    raise VectorConfigError(
                        "A vector dimension mismatch was detected: dataset was "
                        f"initialized with dimension {existing.options.dimension}."
                    )
                if existing.options.type is not opts.type:
                    raise VectorConfigError(
                        "A vector type mismatch was detected: dataset was "
                        f"initialized with type {existing.options.type.value}."
                    )
                # reference parity: re-init keeps the existing context
                # untouched — a different/defaulted distance is discarded
                # (src/sqlite-vector.c:2539-2541)
                return existing
            ds = Dataset(
                name,
                opts,
                device=self._device,
                sharding=self._sharding,
                mesh=self._mesh,
            )
            self._datasets[key] = ds
            return ds

    def get(self, name: str) -> Dataset:
        ds = self._datasets.get(name.lower())
        if ds is None:
            raise VectorStateError(
                f"Dataset '{name}' not found — call create() first (reference "
                "requires vector_init before any vector operation)."
            )
        return ds

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._datasets

    def drop(self, name: str) -> None:
        with self._lock:
            self._datasets.pop(name.lower(), None)

    def names(self) -> list[str]:
        with self._lock:  # create()/drop() may run from serving threads
            return [ds.name for ds in self._datasets.values()]
