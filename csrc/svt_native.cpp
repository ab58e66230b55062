// Native runtime for sqlite_vector_tpu.
//
// The reference implements its runtime in C (codec + SQLite row loops,
// src/sqlite-vector.c:1528-1652, 2071-2117); the TPU framework keeps its
// compute path in XLA/Pallas but implements the host-side runtime natively
// too:
//
//   parse_json_f64  — strtod-based JSON vector parser (vector_from_json
//                     semantics: trailing-comma tolerance, u8/i8 range
//                     checks, strtod number grammar).
//   load_blobs      — bulk (rowid, blob) loader that walks a SQLite table
//                     through the C API directly (dlopen'd libsqlite3),
//                     returning packed ids + vector bytes without the
//                     per-row Python overhead of the sqlite3 module.
//
// Build: see sqlite_vector_tpu/native/__init__.py (auto-compiled once with
// g++; pure-Python fallbacks keep everything working without it).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <dlfcn.h>

// ---------------------------------------------------------------------------
// JSON vector parser
// ---------------------------------------------------------------------------

// check: 0 = none, 1 = uint8 range [0, 255], 2 = int8 range [-128, 127]
static PyObject *parse_json_f64(PyObject *, PyObject *args) {
  const char *s;
  Py_ssize_t n;
  int check;
  if (!PyArg_ParseTuple(args, "s#i", &s, &n, &check)) return nullptr;

  const char *p = s;
  const char *end = s + n;
  while (p < end && isspace((unsigned char)*p)) p++;
  if (p >= end || *p != '[') {
    PyErr_SetString(PyExc_ValueError,
                    "Malformed JSON: expected '[' at the beginning of the array.");
    return nullptr;
  }
  p++;
  const char *start = p;

  // NUL-terminated-scan semantics of the reference (:1563-1641): EOF at the
  // loop top (after '[' or after a comma+spaces) is ACCEPTED; EOF right
  // after a number raises unexpected-character '?'.
  std::vector<double> values;
  values.reserve(64);
  while (p < end) {
    while (p < end && isspace((unsigned char)*p)) p++;
    if (p < end && *p == ']') break;
    char *num_end = nullptr;
    double value = strtod(p, &num_end);
    if (num_end == p) {
      char ch = p < end ? *p : '?';
      PyErr_Format(PyExc_ValueError,
                   "Malformed JSON: expected a number at position %zd (found '%c').",
                   (Py_ssize_t)(p - start + 1), ch);
      return nullptr;
    }
    /* DELIBERATE DEVIATION: the reference's range check
     * `value < 0 || value > 255` (:1601-1615) lets NaN through into an
     * (int8_t)/(uint8_t) cast — undefined behavior with no portable
     * result to mirror. Both of our parse paths reject NaN instead
     * (docs/MIGRATION.md deviations). */
    if (check == 1 && !(value >= 0.0 && value <= 255.0)) {
      PyErr_SetString(PyExc_ValueError, "Value out of range for uint8_t.");
      return nullptr;
    }
    if (check == 2 && !(value >= -128.0 && value <= 127.0)) {
      PyErr_SetString(PyExc_ValueError, "Value out of range for int8_t.");
      return nullptr;
    }
    values.push_back(value);
    p = num_end;
    while (p < end && isspace((unsigned char)*p)) p++;
    if (p < end && *p == ',') {
      p++;
      while (p < end && isspace((unsigned char)*p)) p++;
      if (p < end && *p == ']') break;  // trailing comma tolerated (:1627-1635)
    } else if (p < end && *p == ']') {
      break;
    } else {
      // includes EOF right after a number: reference reports '?'
      char ch = p < end ? *p : '?';
      PyErr_Format(PyExc_ValueError,
                   "Malformed JSON: unexpected character '%c' at position %zd.",
                   ch, (Py_ssize_t)(p - start + 1));
      return nullptr;
    }
  }

  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char *>(values.data()),
      (Py_ssize_t)(values.size() * sizeof(double)));
}

// ---------------------------------------------------------------------------
// SQLite bulk loader (dlopen'd libsqlite3)
// ---------------------------------------------------------------------------

typedef struct sqlite3 sqlite3;
typedef struct sqlite3_stmt sqlite3_stmt;

struct SqliteApi {
  int (*open_v2)(const char *, sqlite3 **, int, const char *);
  int (*prepare_v2)(sqlite3 *, const char *, int, sqlite3_stmt **, const char **);
  int (*step)(sqlite3_stmt *);
  int (*column_type)(sqlite3_stmt *, int);
  long long (*column_int64)(sqlite3_stmt *, int);
  const void *(*column_blob)(sqlite3_stmt *, int);
  int (*column_bytes)(sqlite3_stmt *, int);
  int (*finalize)(sqlite3_stmt *);
  int (*close_db)(sqlite3 *);
  const char *(*errmsg)(sqlite3 *);
  bool ok;
};

static SqliteApi g_sqlite = {};

static bool load_sqlite_api() {
  if (g_sqlite.ok) return true;
  void *h = dlopen("libsqlite3.so.0", RTLD_NOW | RTLD_GLOBAL);
  if (!h) h = dlopen("libsqlite3.so", RTLD_NOW | RTLD_GLOBAL);
  if (!h) return false;
#define LOAD(field, sym)                                   \
  g_sqlite.field = reinterpret_cast<decltype(g_sqlite.field)>(dlsym(h, sym)); \
  if (!g_sqlite.field) return false;
  LOAD(open_v2, "sqlite3_open_v2")
  LOAD(prepare_v2, "sqlite3_prepare_v2")
  LOAD(step, "sqlite3_step")
  LOAD(column_type, "sqlite3_column_type")
  LOAD(column_int64, "sqlite3_column_int64")
  LOAD(column_blob, "sqlite3_column_blob")
  LOAD(column_bytes, "sqlite3_column_bytes")
  LOAD(finalize, "sqlite3_finalize")
  LOAD(close_db, "sqlite3_close")
  LOAD(errmsg, "sqlite3_errmsg")
#undef LOAD
  g_sqlite.ok = true;
  return true;
}

enum { SQLITE_OK_ = 0, SQLITE_ROW_ = 100, SQLITE_DONE_ = 101 };
enum { SQLITE_OPEN_READONLY_ = 1 };
enum { SQLITE_NULL_ = 5 };

// load_blobs(path, query, expected_bytes) -> (ids_bytes, data_bytes, count)
// query must yield (pk INTEGER, blob BLOB) rows. NULL blobs are skipped
// (src/sqlite-vector.c:2093); short blobs raise with the rowid (:1221-1224);
// long blobs contribute their first expected_bytes (scan reads dim elements).
static PyObject *load_blobs(PyObject *, PyObject *args) {
  const char *path;
  const char *query;
  Py_ssize_t expected;
  if (!PyArg_ParseTuple(args, "ssn", &path, &query, &expected)) return nullptr;
  if (!load_sqlite_api()) {
    PyErr_SetString(PyExc_OSError, "libsqlite3 unavailable");
    return nullptr;
  }

  sqlite3 *db = nullptr;
  if (g_sqlite.open_v2(path, &db, SQLITE_OPEN_READONLY_, nullptr) != SQLITE_OK_) {
    if (db) g_sqlite.close_db(db);
    PyErr_Format(PyExc_OSError, "cannot open database '%s'", path);
    return nullptr;
  }
  sqlite3_stmt *stmt = nullptr;
  if (g_sqlite.prepare_v2(db, query, -1, &stmt, nullptr) != SQLITE_OK_) {
    PyErr_Format(PyExc_ValueError, "prepare failed: %s", g_sqlite.errmsg(db));
    g_sqlite.close_db(db);
    return nullptr;
  }

  std::vector<long long> ids;
  std::string data;
  ids.reserve(4096);
  data.reserve((size_t)expected * 4096);

  int rc;
  PyObject *err = nullptr;
  Py_BEGIN_ALLOW_THREADS
  while ((rc = g_sqlite.step(stmt)) == SQLITE_ROW_) {
    if (g_sqlite.column_type(stmt, 1) == SQLITE_NULL_) continue;
    long long rowid = g_sqlite.column_int64(stmt, 0);
    const void *blob = g_sqlite.column_blob(stmt, 1);
    int nbytes = g_sqlite.column_bytes(stmt, 1);
    /* column_blob returns NULL for a zero-length (x'') blob with
     * nbytes == 0: that is a short vector, not a NULL — fall through to
     * the size check so both loaders (this and the Python fallback)
     * report the same "Invalid vector size" error */
    if (!blob) nbytes = 0;
    if (nbytes < expected) {
      Py_BLOCK_THREADS
      err = PyErr_Format(
          PyExc_ValueError,
          "Invalid vector size for rowid %lld: expected at least %zd bytes "
          "but found %d.",
          rowid, expected, nbytes);
      Py_UNBLOCK_THREADS
      break;
    }
    ids.push_back(rowid);
    data.append(reinterpret_cast<const char *>(blob), (size_t)expected);
  }
  Py_END_ALLOW_THREADS
  (void)err;

  g_sqlite.finalize(stmt);
  g_sqlite.close_db(db);
  if (PyErr_Occurred()) return nullptr;
  if (rc != SQLITE_DONE_ && rc != SQLITE_ROW_) {
    PyErr_Format(PyExc_ValueError, "scan failed (sqlite rc=%d)", rc);
    return nullptr;
  }

  PyObject *ids_bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char *>(ids.data()),
      (Py_ssize_t)(ids.size() * sizeof(long long)));
  PyObject *data_bytes =
      PyBytes_FromStringAndSize(data.data(), (Py_ssize_t)data.size());
  if (!ids_bytes || !data_bytes) {
    Py_XDECREF(ids_bytes);
    Py_XDECREF(data_bytes);
    return nullptr;
  }
  PyObject *out = Py_BuildValue("(NNn)", ids_bytes, data_bytes,
                                (Py_ssize_t)ids.size());
  return out;
}

// ---------------------------------------------------------------------------

static PyMethodDef Methods[] = {
    {"parse_json_f64", parse_json_f64, METH_VARARGS,
     "Parse a JSON number array to packed float64 bytes."},
    {"load_blobs", load_blobs, METH_VARARGS,
     "Bulk-load (rowid, blob) pairs from a SQLite database file."},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_svt_native",
                                       nullptr, -1, Methods};

PyMODINIT_FUNC PyInit__svt_native(void) { return PyModule_Create(&moduledef); }
