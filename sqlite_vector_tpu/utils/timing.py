"""Timing / observability helpers.

The reference has no tracing beyond error printfs; its example does wall-clock
timing (examples/semantic_search/semantic_search.py:167-174). We provide a
first-class timer plus jax.profiler hooks (SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Wall-clock timer that blocks on JAX async dispatch when asked."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


@contextlib.contextmanager
def trace(name: str, enabled: bool = False):
    """Optional jax.profiler trace annotation around a region."""
    if not enabled:
        yield
        return
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


def format_bytes(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024 or unit == "TB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    raise AssertionError("unreachable")  # the TB case returns in the loop
