"""Utilities: timing, logging, profiling hooks."""

from sqlite_vector_tpu.utils.timing import Timer, format_bytes

__all__ = ["Timer", "format_bytes"]
