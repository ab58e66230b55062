"""Version and backend introspection.

Mirrors the reference's `vector_version()` / `vector_backend()` SQL functions
(reference: src/sqlite-vector.c:2545-2553, src/distance-cpu.c:20). Where the
reference reports the active SIMD ISA (CPU/SSE2/AVX2/NEON), we report the
active JAX platform and whether the fused Pallas scan path is in use.
"""

from __future__ import annotations

__version__ = "0.2.0"


def version() -> str:
    """Return the framework version string (reference: vector_version())."""
    return __version__


def backend() -> str:
    """Return the active compute backend name (reference: vector_backend()).

    Values:
      - ``"tpu/pallas"``  — TPU device present; fused Pallas scan kernels active.
      - ``"cpu/xla"``     — CPU-only (tests / fallback); XLA scan path.
      - ``"<plat>/xla"``  — any other JAX platform.
    """
    import jax

    plat = jax.default_backend()
    if plat == "tpu":
        return "tpu/pallas"
    return f"{plat}/xla"
