"""Version and backend introspection.

Mirrors the reference's `vector_version()` / `vector_backend()` SQL functions
(reference: src/sqlite-vector.c:2545-2553, src/distance-cpu.c:20). Where the
reference reports the active SIMD ISA (CPU/SSE2/AVX2/NEON), we report the
active JAX platform and which scan formulation is routed.
"""

from __future__ import annotations

__version__ = "0.4.0"


def version() -> str:
    """Return the framework version string (reference: vector_version())."""
    return __version__


def backend() -> str:
    """Return the active compute backend name (reference: vector_backend()).

    Values:
      - ``"tpu/xla"``     — TPU device; XLA fused scan (the measured-fastest
                            path on v5e — see ops.scan.fused_scan_topk).
      - ``"tpu/pallas"``  — TPU with SVT_FORCE_PALLAS=1: the manual-DMA
                            Pallas kernel is routed where supported.
      - ``"cpu/xla"``     — CPU-only (tests / fallback); XLA scan path.
      - ``"<plat>/xla"``  — any other JAX platform.
    """
    import os

    import jax

    plat = jax.default_backend()
    if plat == "tpu":
        if os.environ.get("SVT_FORCE_PALLAS") == "1":
            return "tpu/pallas"
        return "tpu/xla"
    return f"{plat}/xla"
