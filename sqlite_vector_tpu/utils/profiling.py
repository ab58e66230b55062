"""Per-query instrumentation and jax.profiler integration.

SURVEY.md §5: the reference has no tracing/profiling subsystem (timing lives
in its example script). Here every search can carry structured timing, and a
profiler session can wrap any region for TensorBoard-compatible traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Iterator


@dataclasses.dataclass
class QueryStats:
    """Timing breakdown for one search call."""

    wall_s: float
    n_rows: int
    n_queries: int
    k: int
    exact: bool
    bytes_scanned: int
    # ICI bytes of the candidate merge on a mesh (0 single-chip): the 1-D
    # serving path's ONLY collective is two all-gathers of [B, k] — proven
    # from the compiled HLO by parallel.audit; this field surfaces the
    # analytic volume per query (8 * devices * B * k bytes). On 2-D
    # (rows x dim) meshes the added per-scan psum term
    # (4 * B * ceil(N / rows_shards) bytes) is ANALYTIC, not HLO-parsed —
    # see timed_search.
    collective_bytes: int = 0

    @property
    def qps(self) -> float:
        return self.n_queries / self.wall_s if self.wall_s else float("inf")

    @property
    def gb_per_s(self) -> float:
        return self.bytes_scanned / self.wall_s / 1e9 if self.wall_s else 0.0

    def __str__(self) -> str:
        return (
            f"{self.n_queries}q x {self.n_rows} rows k={self.k} "
            f"{'exact' if self.exact else 'quantized'}: "
            f"{self.wall_s * 1000:.2f} ms ({self.qps:.1f} QPS, "
            f"{self.gb_per_s:.1f} GB/s)"
        )


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard / Perfetto)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside an active profiler trace."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


class StatsRecorder:
    """Optional ring buffer of recent QueryStats (attach via Dataset.record_stats)."""

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self._entries: list[QueryStats] = []

    def add(self, stats: QueryStats) -> None:
        self._entries.append(stats)
        if len(self._entries) > self.capacity:
            self._entries.pop(0)

    @property
    def entries(self) -> list[QueryStats]:
        return list(self._entries)

    def summary(self) -> dict[str, Any]:
        if not self._entries:
            return {}
        import numpy as np

        walls = np.array([e.wall_s for e in self._entries])
        return {
            "count": len(self._entries),
            "median_ms": float(np.median(walls) * 1000),
            "p99_ms": float(np.percentile(walls, 99) * 1000),
            "total_queries": int(sum(e.n_queries for e in self._entries)),
        }


def timed_search(dataset, queries, k: int, *, exact: bool = True):
    """Run dataset.search with a QueryStats result attached.

    Returns (ids, distances, stats)."""
    import numpy as np

    q = np.atleast_2d(np.asarray(queries))
    t0 = time.perf_counter()
    ids, dist = dataset.search(queries, k, exact=exact)
    wall = time.perf_counter() - t0
    itemsize = 1 if not exact else dataset.dtype.itemsize
    coll = 0
    if getattr(dataset, "_mesh", None) is not None:
        from sqlite_vector_tpu.parallel.audit import (
            collective_bytes_per_query,
        )

        # NOTE: Dataset._mesh_size is the ROWS-AXIS extent on 2-D meshes
        # (dataset.py sets it to mesh.shape[rows_axis] there, and to the
        # total device count on 1-D meshes) — both uses below want exactly
        # that: the candidate merge all-gathers across the rows axis (the
        # dim replicas already agree after the psum), and the psum block is
        # [B, N/rows_shards].
        rows_shards = dataset._mesh_size
        coll = collective_bytes_per_query(rows_shards, q.shape[0], k)
        if getattr(dataset, "_mesh_2d", False):
            # 2-D meshes additionally psum the [B, N/rows_shards] f32
            # partial distance block across the dim axis per scan (the
            # documented price of dim-sharded HBM reads). This term is
            # ANALYTIC (parallel/audit.py's 2-D accounting), not parsed
            # from HLO like the 1-D merge proof.
            coll += 4 * q.shape[0] * (-(-len(dataset) // rows_shards))
    stats = QueryStats(
        wall_s=wall,
        n_rows=len(dataset),
        n_queries=q.shape[0],
        k=k,
        exact=exact,
        bytes_scanned=len(dataset) * dataset.dimension * itemsize,
        collective_bytes=coll,
    )
    if getattr(dataset, "stats_recorder", None) is not None:
        dataset.stats_recorder.add(stats)
    return ids, dist, stats
