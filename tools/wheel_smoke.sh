#!/usr/bin/env bash
# Distributable-artifact check (round-4 VERDICT item 5, mirroring the
# reference's installable wheels, /root/reference/packages/python/setup.py):
#   1. build the native modules so the wheel ships prebuilt .so files,
#   2. python -m build (sdist + wheel, --no-isolation: zero-egress box),
#   3. install the wheel into a CLEAN venv (--system-site-packages for the
#      baked-in jax/numpy; --no-deps so ONLY our wheel is installed),
#   4. run an import/search/SQL-surface smoke FROM THE WHEEL, outside the
#      repo tree, with csrc/ absent from site-packages (the prebuilt-.so
#      native path).
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$PWD"
OUT="${1:-/tmp/svt_wheel_smoke}"
rm -rf "$OUT" && mkdir -p "$OUT"

echo "== 1. prebuild native modules =="
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import sqlite_vector_tpu.native as n
assert n.available(), "native fast path failed to build"
p = n.vtab_extension_path()
print("native:", n.available(), "vtab:", p)
EOF

echo "== 2. build sdist + wheel =="
rm -rf dist/
python -m build --no-isolation --outdir dist/ >"$OUT/build.log" 2>&1 || {
  tail -30 "$OUT/build.log"; exit 1; }
ls -l dist/

echo "== 3. clean venv + install the wheel =="
python -m venv "$OUT/venv"
# zero-egress box: the runtime deps (jax/numpy/ml_dtypes) come from the
# container's env via a .pth file. Those paths are APPENDED after the
# venv's own site-packages, so the installed wheel always wins imports.
PARENT_SP="$(python -c 'import sysconfig; print(sysconfig.get_paths()["purelib"])')"
VENV_SP="$("$OUT/venv/bin/python" -c 'import sysconfig; print(sysconfig.get_paths()["purelib"])')"
echo "$PARENT_SP" > "$VENV_SP/_parent_env.pth"
"$OUT/venv/bin/pip" install --no-deps --no-index \
  dist/sqlite_vector_tpu-*.whl >"$OUT/pip.log" 2>&1 || {
  tail -20 "$OUT/pip.log"; exit 1; }

echo "== 4. smoke from the wheel (outside the repo, csrc absent) =="
cd "$OUT"
"$OUT/venv/bin/python" - <<'EOF'
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import sqlite_vector_tpu as svt

# really the wheel, not the repo
assert "site-packages" in svt.__file__, svt.__file__
pkg_root = os.path.dirname(os.path.dirname(svt.__file__))
assert not os.path.exists(os.path.join(pkg_root, "csrc")), "csrc leaked"
print("import from:", svt.__file__)
print(svt.version(), svt.backend())

# native prebuilt-.so path (no csrc in the installed tree)
import sqlite_vector_tpu.native as n
assert n.available(), "prebuilt native .so did not activate"
print("native .so active:", os.path.basename(n._so))

# search surface incl. int4
store = svt.VectorStore()
ds = store.create("docs", "dimension=64,type=FLOAT32,distance=L2")
base = np.random.default_rng(0).standard_normal((5000, 64)).astype(np.float32)
ids = ds.add(base)
got, dist = ds.search(base[42], 5)
assert got[0] == ids[42] and dist[0] == 0.0
ds.quantize()
a, _ = ds.search(base[42], 5, exact=False)
assert a[0] == ids[42]
ds.quantize(qtype="int4")
a4, _ = ds.search(base[42], 5, exact=False)
assert a4[0] == ids[42]
print("search surface ok (exact/int8/int4)")

# SQL surface
import sqlite3
from sqlite_vector_tpu.sqlite import connect
conn = connect(":memory:")
conn.execute("CREATE TABLE t(id INTEGER PRIMARY KEY, v BLOB)")
conn.executemany(
    "INSERT INTO t(v) VALUES (vector_as_f32(?, 4))",
    [(f"[{i}, 0, 0, 0]",) for i in range(16)],
)
conn.execute("SELECT vector_init('t', 'v', 'type=FLOAT32,dimension=4')")
rows = list(conn.execute(
    "SELECT id, distance FROM vector_full_scan('t', 'v', '[3,0,0,0]', 3)"
))
assert rows[0][0] == 4 and rows[0][1] == 0.0, rows
n_q = conn.execute("SELECT vector_quantize('t','v')").fetchone()[0]
assert n_q == 16
rows = list(conn.execute(
    "SELECT id FROM vector_quantize_scan('t', 'v', '[3,0,0,0]', 3)"
))
assert rows[0][0] == 4
print("SQL surface ok (vector_init/as_f32/full_scan/quantize/quantize_scan)")
print("WHEEL SMOKE PASSED")
EOF
echo "OK: wheel smoke passed ($OUT)"
