"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so the multi-chip
sharding/merge logic is exercised without TPU hardware (SURVEY.md section 4).

Note: this environment's TPU plugin force-sets `jax_platforms` via
jax.config.update() at interpreter startup (sitecustomize), so setting the
JAX_PLATFORMS env var is not enough — we must update the config after import,
before any backend is initialized.
"""

import os

# The persistent compile cache stays ON for tests: reloading the CPU-backend
# executables across test processes cuts the full suite from ~110s to ~25s.
# XLA logs a (benign, same-machine) machine-feature E-line per reloaded CPU
# executable; pytest captures it, so it only appears in failing-test output.

# Explicit SVT_COMPILE_CACHE opt-in lowers the persistence thresholds to 0
# so the suite's many sub-second CPU compiles are reloaded across processes
# (the default/implicit mode keeps JAX's own thresholds — see compile_cache).
os.environ.setdefault(
    "SVT_COMPILE_CACHE",
    os.path.join(
        os.path.expanduser("~"), ".cache", "sqlite_vector_tpu", "xla"
    ),
)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "nonfinite_inputs: deliberately feeds NaN/Inf into jitted code "
        "(auto-skipped when the CI NaN guard sets JAX_DEBUG_NANS)",
    )


def pytest_collection_modifyitems(config, items):
    # the CI NaN-guard step (JAX_DEBUG_NANS=1) excludes whole suites built
    # around non-finite inputs by file; tests in OTHER files that feed
    # deliberate NaN/Inf opt out with this marker instead
    # ask JAX itself (rather than re-parsing the env var) so the skip
    # tracks every spelling JAX accepts ('1'/'true'/'on'/'yes'/...)
    import jax

    if jax.config.jax_debug_nans:
        skip = pytest.mark.skip(
            reason="deliberate non-finite inputs (NaN-guard run)"
        )
        for item in items:
            if "nonfinite_inputs" in item.keywords:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
