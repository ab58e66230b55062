"""Persistent XLA compilation cache.

The reference is a prebuilt shared library — its "kernels" load in
microseconds (reference: src/distance-cpu.c init_distance_functions fills a
function-pointer table at extension load). Our kernels are XLA-compiled per
(shape, dtype, metric) specialization, and a cold compile of the fused scan
or quantize graph costs seconds (tens of seconds on a tunneled device, where
compilation round-trips to the remote compiler). To give users the same
instant-start experience, the package enables JAX's persistent compilation
cache at FIRST ENGINE USE (Dataset construction) — not at import, so merely
importing the package never changes process-wide JAX config.

Controls (read at each call):
  SVT_COMPILE_CACHE=<dir>   cache directory; explicit opt-in also lowers the
                            min-compile-time/min-entry-size thresholds to 0
                            so even sub-second compiles persist (what the
                            test suite wants: reloading CPU executables cuts
                            the suite ~4x)
  SVT_COMPILE_CACHE=0|off   disable entirely
  (unset)                   default dir ~/.cache/sqlite_vector_tpu/xla on
                            non-CPU backends only (where cold compiles cost
                            seconds to minutes); JAX's own persistence
                            thresholds are left at their defaults, so only
                            substantial compiles are written — the directory
                            stays bounded for applications that import this
                            package alongside their own JAX code. The plain
                            CPU backend is excluded from the implicit
                            default: compiles there are fast, and this jax
                            release logs a spurious feature-mismatch ERROR
                            per CPU cache hit

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

_ensured = False


def ensure_persistent_cache() -> str | None:
    """Idempotent lazy enablement, called at first engine use
    (Dataset.__init__). Returns the cache dir in use (or None)."""
    global _ensured
    if _ensured:
        try:
            import jax

            return getattr(jax.config, "jax_compilation_cache_dir", None)
        except Exception:
            return None
    _ensured = True
    return enable_persistent_cache()


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
        if not raw:
            # Implicit default: auto-enable only off-CPU. Plain-CPU
            # compiles are fast, and this jax release's CPU AOT cache
            # loader logs a spurious machine-feature-mismatch ERROR line
            # per cache hit (virtual prefer-no-* flags recorded at write
            # are absent from the loader's host-feature set — reproduced
            # with a fresh cache written by an identical process on the
            # same machine): scary per-process noise for little gain. The
            # TPU/GPU backends, where a cold compile costs seconds to
            # minutes, keep the instant-start default; SVT_COMPILE_CACHE=
            # <dir> still opts a CPU process in explicitly.
            if jax.default_backend() == "cpu":
                return None
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        if prev is not None and prev != cache_dir:
            # the cache backend is a lazily-initialized singleton bound to
            # the dir it first saw; re-pointing it requires a reset
            try:
                from jax._src import compilation_cache as _cc

                _cc.reset_cache()
            except Exception:
                pass
        if raw:
            # Explicit opt-in: cache everything, including the many
            # sub-second CPU-backend compiles (test-suite startup).
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # default (no env var): keep JAX's own thresholds so the directory
        # only accumulates substantial compiles
    except Exception:
        return None
    return cache_dir
