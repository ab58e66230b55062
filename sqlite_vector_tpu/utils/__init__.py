"""Utilities: timing, logging, profiling hooks."""

from sqlite_vector_tpu.utils.timing import Timer, format_bytes
from sqlite_vector_tpu.utils.profiling import (
    QueryStats,
    StatsRecorder,
    annotate,
    profile_trace,
    timed_search,
)

__all__ = [
    "Timer",
    "format_bytes",
    "QueryStats",
    "StatsRecorder",
    "annotate",
    "profile_trace",
    "timed_search",
]
