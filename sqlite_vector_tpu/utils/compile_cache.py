"""Persistent XLA compilation cache.

The reference is a prebuilt shared library — its "kernels" load in
microseconds (reference: src/distance-cpu.c init_distance_functions fills a
function-pointer table at extension load). Our kernels are XLA-compiled per
(shape, dtype, metric) specialization, and a cold compile of the fused scan
or quantize graph costs seconds (tens of seconds on a tunneled device, where
compilation round-trips to the remote compiler). To give users the same
instant-start experience, the package enables JAX's persistent compilation
cache by default: compiled executables are serialized to disk keyed by HLO +
compile options + compiler version, so every process after the first pays
only a disk read.

Controls (read once at import):
  SVT_COMPILE_CACHE=<dir>   cache directory (default ~/.cache/sqlite_vector_tpu/xla)
  SVT_COMPILE_CACHE=0|off   disable entirely

If the process already configured a cache (jax_compilation_cache_dir or the
JAX_COMPILATION_CACHE_DIR env var), the package leaves it — and the user's
min-compile-time/min-entry-size thresholds — completely untouched; only an
explicit SVT_COMPILE_CACHE=<dir> overrides a user cache.

The cache is per-machine: CPU-backend entries bake in the compiling host's
ISA features, and XLA warns (and may refuse) when loading them elsewhere —
don't ship the cache directory across machines.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "sqlite_vector_tpu", "xla"
)


def enable_persistent_cache() -> str | None:
    """Point JAX's compilation cache at a durable directory.

    Returns the cache directory in use, or None when disabled (by env or
    because the jax config knobs are unavailable). Safe to call any time:
    it only sets config values — executables compiled before the call are
    simply not cached.
    """
    raw = os.environ.get("SVT_COMPILE_CACHE", "")
    if raw.strip().lower() in ("0", "off", "false", "none", "disable"):
        return None
    try:
        import jax

        prev = getattr(jax.config, "jax_compilation_cache_dir", None)
        if not raw and (prev or os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            # the user configured their own cache — leave it (and their
            # size/time thresholds) completely alone; only an explicit
            # SVT_COMPILE_CACHE=<dir> overrides it
            return prev or os.environ["JAX_COMPILATION_CACHE_DIR"]
        cache_dir = raw or _DEFAULT_DIR
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        if prev is not None and prev != cache_dir:
            # the cache backend is a lazily-initialized singleton bound to
            # the dir it first saw; re-pointing it requires a reset
            try:
                from jax._src import compilation_cache as _cc

                _cc.reset_cache()
            except Exception:
                pass
        # Cache everything: the default 1s/small-entry thresholds skip the
        # many sub-second CPU-backend compiles that dominate test startup.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir
