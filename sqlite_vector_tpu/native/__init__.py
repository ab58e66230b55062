"""Native (C++) runtime bindings with transparent build + pure-Python fallback.

The compiled module `_svt_native` provides the host-runtime hot paths (JSON
codec, bulk SQLite blob loading — see csrc/svt_native.cpp). It is compiled
on first import with g++ if a toolchain is available; every caller has a
pure-Python fallback, so the package works without it.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
_repo = os.path.dirname(os.path.dirname(_here))
_src = os.path.join(_repo, "csrc", "svt_native.cpp")
_so = os.path.join(_here, "_svt_native.so")
_vtab_src = os.path.join(_repo, "csrc", "svt_vtab.c")
# entry point sqlite3_svtvtab_init is derived from this file name
_vtab_so = os.path.join(_here, "svtvtab.so")

_native = None
_vtab_checked = False
_vtab_path: str | None = None


def _find_sqlite_ext_header() -> str | None:
    """Locate a directory holding sqlite3ext.h (loadable-extension API)."""
    candidates = ["/usr/include", "/usr/local/include"]
    try:
        import glob

        for base in sys.path + [sysconfig.get_paths()["purelib"]]:
            candidates.extend(
                glob.glob(
                    os.path.join(
                        base, "tensorflow", "include", "external", "org_sqlite"
                    )
                )
            )
    except Exception:
        pass
    for d in candidates:
        if os.path.exists(os.path.join(d, "sqlite3ext.h")):
            return d
    return None


def vtab_extension_path() -> str | None:
    """Build (once) and return the path of the loadable SQLite extension
    registering the real table-valued scan modules (csrc/svt_vtab.c), or
    None when it can't be built (no toolchain / no sqlite3ext.h) — callers
    fall back to the json_each shim."""
    global _vtab_checked, _vtab_path
    if _vtab_checked:
        return _vtab_path
    _vtab_checked = True
    if not os.path.exists(_vtab_src):
        # installed distributions ship only the package (no csrc/): a
        # prebuilt/shipped .so must still activate
        _vtab_path = _vtab_so if os.path.exists(_vtab_so) else None
        return _vtab_path
    if os.path.exists(_vtab_so) and os.path.getmtime(_vtab_so) >= os.path.getmtime(
        _vtab_src
    ):
        _vtab_path = _vtab_so
        return _vtab_path
    inc = _find_sqlite_ext_header()
    if inc is None:
        return None
    cmd = [
        "gcc",
        "-O2",
        "-shared",
        "-fPIC",
        f"-I{inc}",
        _vtab_src,
        "-o",
        _vtab_so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        _vtab_path = _vtab_so
    except Exception:
        _vtab_path = None
    return _vtab_path


def _build() -> bool:
    if not os.path.exists(_src):
        # no sources (installed distribution): use a prebuilt .so if shipped
        return os.path.exists(_so)
    if os.path.exists(_so) and os.path.getmtime(_so) >= os.path.getmtime(_src):
        return True
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        _src,
        "-o",
        _so,
        "-ldl",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception:
        return False


def _load():
    global _native
    if _native is not None:
        return _native
    if not _build():
        return None
    if _here not in sys.path:
        sys.path.insert(0, _here)
    try:
        import _svt_native  # noqa: F401

        _native = _svt_native
    except Exception:
        _native = None
    return _native


def available() -> bool:
    return _load() is not None


def parse_json_vector(json_text: str, vtype, dimension: int = 0):
    """Native vector_from_json fast path. Returns the typed numpy vector, or
    None to signal 'use the pure-Python parser'. Raises VectorCodecError on
    malformed input (same messages as the Python parser)."""
    native = _load()
    if native is None:
        return None
    from sqlite_vector_tpu.errors import VectorCodecError
    from sqlite_vector_tpu.types import VectorType

    check = 1 if vtype is VectorType.U8 else 2 if vtype is VectorType.I8 else 0
    try:
        buf = native.parse_json_f64(json_text, check)
    except ValueError as e:
        raise VectorCodecError(str(e)) from None
    arr64 = np.frombuffer(buf, dtype="<f8")
    if dimension > 0 and dimension != arr64.size:
        raise VectorCodecError(
            f"Invalid JSON vector dimension: expected {dimension} but found "
            f"{arr64.size}."
        )
    if vtype in (VectorType.U8, VectorType.I8):
        return arr64.astype(vtype.np_dtype)  # C truncation toward zero
    return arr64.astype(np.float32).astype(vtype.np_dtype)


def load_blobs(db_path: str, query: str, expected_bytes: int):
    """Native bulk (rowid, blob) loader. Returns (ids int64 [N], data bytes,
    count) or None to signal 'use the Python sqlite3 row loop'."""
    native = _load()
    if native is None:
        return None
    from sqlite_vector_tpu.errors import VectorCodecError

    try:
        ids_bytes, data, count = native.load_blobs(db_path, query, expected_bytes)
    except ValueError as e:
        raise VectorCodecError(str(e)) from None
    except OSError:
        return None
    ids = np.frombuffer(ids_bytes, dtype="<i8")
    return ids, data, count
