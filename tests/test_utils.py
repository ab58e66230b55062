"""Observability utilities and misc surface tests."""

import sqlite3

import numpy as np

import sqlite_vector_tpu as svt
import sqlite_vector_tpu.sqlite as svs
from sqlite_vector_tpu.utils import (
    QueryStats,
    StatsRecorder,
    Timer,
    format_bytes,
    timed_search,
)


def test_timed_search_and_recorder(rng):
    ds = svt.VectorStore().create("obs", "dimension=16,type=FLOAT32")
    ds.stats_recorder = StatsRecorder(capacity=4)
    ds.add(rng.standard_normal((128, 16)).astype(np.float32))
    for _ in range(6):
        ids, dist, stats = timed_search(ds, rng.standard_normal(16).astype(np.float32), 5)
        assert stats.n_rows == 128 and stats.k == 5 and stats.exact
        assert stats.qps > 0 and stats.bytes_scanned == 128 * 16 * 4
    summary = ds.stats_recorder.summary()
    assert summary["count"] == 4  # ring buffer capped
    assert summary["median_ms"] > 0
    assert "exact" in str(stats)


def test_timer_and_format_bytes():
    with Timer() as t:
        sum(range(1000))
    assert t.elapsed >= 0
    assert format_bytes(512) == "512B"
    assert format_bytes(2048) == "2.0KB"
    assert format_bytes(3 * 1024**3) == "3.0GB"


def test_query_stats_str():
    s = QueryStats(wall_s=0.002, n_rows=1000, n_queries=4, k=10, exact=False,
                   bytes_scanned=1000 * 384)
    assert "quantized" in str(s) and "2000" in str(s).replace(".00", "0")


def test_sqlite_wrap_existing_connection(tmp_path, rng):
    raw = sqlite3.connect(str(tmp_path / "w.db"))
    raw.execute("CREATE TABLE t (v BLOB)")
    data = rng.standard_normal((50, 8)).astype(np.float32)
    raw.executemany("INSERT INTO t(v) VALUES (?)", ((r.tobytes(),) for r in data))
    raw.commit()
    conn = svs.wrap(raw)
    conn.vector_init("t", "v", "type=FLOAT32,dimension=8")
    rows = conn.vector_full_scan("t", "v", data[3].tobytes(), 2)
    assert rows[0][0] == 4 and rows[0][1] == 0.0
    # registered SQL functions available on the wrapped connection
    assert raw.execute("SELECT vector_version()").fetchone()[0]


def test_import_does_not_enable_cache(tmp_path):
    # Importing the package must not mutate process-wide JAX cache config
    # (round-2 ADVICE: apps importing us had their own sub-second compiles
    # persisted into an unbounded dir). First Dataset construction enables
    # the cache lazily — and the implicit default keeps JAX's own
    # persistence thresholds.
    import os
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sqlite_vector_tpu as svt\n"
        "assert not getattr(jax.config, 'jax_compilation_cache_dir', None), \\\n"
        "    'import alone must not set the cache dir'\n"
        "svt.VectorStore().create('t', 'dimension=4,type=FLOAT32')\n"
        "assert not getattr(jax.config, 'jax_compilation_cache_dir', None), \\\n"
        "    'implicit default must not enable the cache on plain CPU "
        "(fast compiles; this jax logs a bogus feature-mismatch ERROR per "
        "CPU cache hit)'\n"
        "assert jax.config.jax_persistent_cache_min_compile_time_secs > 0, \\\n"
        "    'implicit default must keep JAX persistence thresholds'\n"
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("SVT_COMPILE_CACHE", "JAX_COMPILATION_CACHE_DIR")
    }
    r = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert r.returncode == 0, r.stderr


def test_persistent_compile_cache_config(tmp_path, monkeypatch):
    # enable_persistent_cache respects the env override and returns the dir
    from sqlite_vector_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = str(tmp_path / "xla-cache")
    monkeypatch.setenv("SVT_COMPILE_CACHE", cache_dir)
    assert enable_persistent_cache() == cache_dir
    import jax

    assert jax.config.jax_compilation_cache_dir == cache_dir
    # a jitted computation lands an executable in the cache dir
    import jax.numpy as jnp

    jax.clear_caches()
    jax.jit(lambda x: x * 2 + 1)(jnp.arange(8.0)).block_until_ready()
    import os

    assert os.path.isdir(cache_dir) and len(os.listdir(cache_dir)) > 0

    # disable spelling returns None and leaves config pointing elsewhere
    monkeypatch.setenv("SVT_COMPILE_CACHE", "off")
    assert enable_persistent_cache() is None

    # a user-configured cache is respected: with no SVT override, the
    # existing jax_compilation_cache_dir wins and is not re-pointed
    monkeypatch.delenv("SVT_COMPILE_CACHE", raising=False)
    assert enable_persistent_cache() == cache_dir  # the dir set above
    assert jax.config.jax_compilation_cache_dir == cache_dir
    # restore the default for other tests in this process
    monkeypatch.setenv("SVT_COMPILE_CACHE", cache_dir)
    enable_persistent_cache()


def test_package_version_consistent_with_pyproject():
    """pyproject.toml's version must track sqlite_vector_tpu.__version__ —
    an editable/wheel install otherwise reports a different version than
    the running package (found at 0.2.0 vs 0.3.0)."""
    import os
    import re

    import sqlite_vector_tpu as svt

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml")) as f:
        m = re.search(r'^version\s*=\s*"([^"]+)"', f.read(), re.M)
    assert m, "pyproject.toml has no version field"
    assert m.group(1) == svt.__version__
