"""Operational tools: recall measurement, parity checks, profiling."""
