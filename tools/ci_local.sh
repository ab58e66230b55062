#!/usr/bin/env bash
# Local replica of .github/workflows/ci.yml's `test` job (minus pip
# installs — this environment is pre-provisioned). Run from the repo root:
#   bash tools/ci_local.sh
# Every step mirrors the workflow step of the same name; STATUS.md records
# the per-round runs of this sequence.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== Build native runtime"
python -c "from sqlite_vector_tpu import native; print('native:', native.available())"

echo "== Run tests"
python -m pytest tests/ -q

echo "== NaN guard (jax_debug_nans)"
JAX_DEBUG_NANS=1 python -m pytest -q tests/test_distance.py \
    tests/test_search.py tests/test_quantize.py tests/test_sharded.py \
    tests/test_capability_matrix.py

echo "== Bench smoke (CPU) — last stdout line must be valid JSON"
# unlike the GitHub job (--skip10m: shared runners), the local replica also
# exercises the 10m-config code path at --quick scale (200k x 768, temp
# cache) so section-ordering/budget-guard regressions surface here
python bench.py --quick --cpu --cache-dir /tmp/ci_bench_cache \
    | tee /tmp/ci_bench_out.txt
python - <<'EOF'
import json
lines = [l for l in open("/tmp/ci_bench_out.txt") if l.strip()]
assert lines, "bench produced no stdout"
last = json.loads(lines[-1])
assert "metric" in last and "value" in last, last
assert last["value"] > 0, last
print("bench artifact OK:", last["metric"], last["value"])
EOF

echo "== Serving soak smoke (in-process)"
python tools/soak_serving.py --cpu --n 10000 --dim 32 --seconds 3 \
    --mutate-period 0.3

echo "== Serving soak smoke (HTTP endpoint)"
python tools/soak_serving.py --cpu --n 10000 --dim 32 --seconds 3 \
    --mutate-period 0.3 --http --fallback

echo "== Multi-chip dryrun (8 virtual devices)"
# pre-select the CPU backend BEFORE the first device touch: dryrun's own
# fallback initializes the default backend first, and on this container
# that is the tunneled TPU plugin — a compile-service wedge would hang the
# whole CI sequence on a step that is defined to run on virtual CPU
python -c "import jax; jax.config.update('jax_platforms', 'cpu'); \
import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "== Editable-install job (package import from outside the repo)"
# --no-build-isolation: this container has zero egress; build with the
# preinstalled setuptools instead of fetching an isolated copy
pip install -e . --quiet --no-deps --no-build-isolation
(cd /tmp && python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import sqlite_vector_tpu as svt
print(svt.version(), svt.backend())
ds = svt.VectorStore().create("t", "dimension=16,type=FLOAT32,distance=L2")
data = np.random.default_rng(0).standard_normal((500, 16)).astype(np.float32)
ids = ds.add(data)
got, dist = ds.search(data[7], 3)
assert got[0] == ids[7] and dist[0] == 0.0
ds.quantize()
a, _ = ds.search(data[7], 3, exact=False)
assert a[0] == ids[7]
print("packaged install OK")
EOF
)

echo "== Wheel job (sdist + wheel + clean-venv smoke)"
bash tools/wheel_smoke.sh /tmp/ci_wheel_smoke

echo "CI-local sequence: ALL GREEN"
