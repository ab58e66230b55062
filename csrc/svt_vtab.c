/* svt_vtab.c — real table-valued functions for the sqlite_vector_tpu engine.
 *
 * Registers the four virtual-table modules of the reference SQL surface
 * (vector_full_scan, vector_quantize_scan, vector_full_scan_stream,
 * vector_quantize_scan_stream) with the same declared schema, positional
 * argument contract, and planner hints as the C reference
 * (/root/reference/src/sqlite-vector.c:1723-1900, 2243-2487) — so SQL
 * written for the reference runs verbatim:
 *
 *     SELECT id, distance FROM vector_full_scan('docs', 'embedding', ?, 20);
 *
 * The scans themselves run in the TPU engine: xFilter evaluates the
 * Python-registered internal scalar `svt_scan_blob(fname, tbl, col, vec, k)`
 * on the SAME connection, which returns a packed little-endian blob
 * [int64 n][n x (int64 id, float64 distance)]; the cursor walks it. This is
 * a bridge, not a reimplementation — Python's stdlib sqlite3 has no
 * virtual-table API, so the TVF registration must live in a loadable
 * extension.
 *
 * Build: gcc -O2 -fPIC -shared -I<sqlite3ext.h dir> svt_vtab.c -o svtvtab.so
 * Entry point: sqlite3_svtvtab_init (auto-derived from the file name).
 */

#include "sqlite3ext.h"
SQLITE_EXTENSION_INIT1

#include <stdint.h>
#include <string.h>

/* column order in the declared schema (positional TVF argument binding):
 * args (table, column, vector, k) land on hidden columns 0..3 */
#define COL_TBL 0
#define COL_VECTOR 1
#define COL_K 2
#define COL_MEMIDX 3
#define COL_ID 4
#define COL_DISTANCE 5

typedef struct svt_vtab svt_vtab;
struct svt_vtab {
  sqlite3_vtab base;
  sqlite3 *db;
  const char *fname;   /* tag passed to svt_scan_blob */
  int is_stream;       /* 3-arg streaming module */
};

/* user-visible SQL module name for an aux tag (error-message parity with
 * the reference, which passes the SQL function name to its messages) */
static const char *svt_sql_name(const char *tag) {
  if (strcmp(tag, "full") == 0) return "vector_full_scan";
  if (strcmp(tag, "quant") == 0) return "vector_quantize_scan";
  if (strcmp(tag, "full_stream") == 0) return "vector_full_scan_stream";
  return "vector_quantize_scan_stream";
}

/* sqlite_type_name analogue (reference :851-859) */
static const char *svt_type_name(int t) {
  switch (t) {
    case SQLITE_INTEGER: return "INTEGER";
    case SQLITE_FLOAT: return "FLOAT";
    case SQLITE_TEXT: return "TEXT";
    case SQLITE_BLOB: return "BLOB";
    default: return "NULL";
  }
}

typedef struct svt_cursor svt_cursor;
struct svt_cursor {
  sqlite3_vtab_cursor base;
  sqlite3_int64 *ids;
  double *dist;
  sqlite3_int64 n;
  sqlite3_int64 pos;
  /* copies of the filter arguments, exposed through xColumn for the hidden
   * parameter columns — so a WHERE clause duplicating a TVF argument
   * post-filters to true instead of comparing against NULL */
  sqlite3_value *args[4];
};

static void svt_free_args(svt_cursor *c) {
  for (int i = 0; i < 4; i++) {
    if (c->args[i]) {
      sqlite3_value_free(c->args[i]);
      c->args[i] = NULL;
    }
  }
}

static int svt_set_error(sqlite3_vtab *vtab, const char *msg) {
  sqlite3_free(vtab->zErrMsg);
  vtab->zErrMsg = sqlite3_mprintf("%s", msg);
  return SQLITE_ERROR;
}

static int svt_connect(sqlite3 *db, void *aux, int argc,
                       const char *const *argv, sqlite3_vtab **out,
                       char **errmsg) {
  (void)argc;
  (void)argv;
  (void)errmsg;
  int rc = sqlite3_declare_vtab(
      db,
      "CREATE TABLE x(tbl hidden, vector hidden, k hidden, memidx hidden, "
      "id, distance);");
  if (rc != SQLITE_OK) return rc;
  svt_vtab *v = (svt_vtab *)sqlite3_malloc(sizeof(svt_vtab));
  if (!v) return SQLITE_NOMEM;
  memset(v, 0, sizeof(*v));
  v->db = db;
  /* aux encodes the module identity: "full", "quant", "full_stream",
   * "quant_stream" */
  v->fname = (const char *)aux;
  v->is_stream = strstr(v->fname, "stream") != NULL;
  *out = &v->base;
  return SQLITE_OK;
}

static int svt_disconnect(sqlite3_vtab *vtab) {
  sqlite3_free(vtab);
  return SQLITE_OK;
}

static int svt_best_index(sqlite3_vtab *tab, sqlite3_index_info *info) {
  svt_vtab *v = (svt_vtab *)tab;
  if (v->is_stream) {
    /* results are unordered; let SQLite sort (reference :2245-2249) */
    info->estimatedCost = 1e8;
    info->estimatedRows = 100000;
  } else {
    /* top-k results come back pre-sorted by distance ascending. The
     * reference sets orderByConsumed unconditionally (:1853), which silently
     * mis-orders ORDER BY id / ORDER BY distance DESC; we consume the order
     * only when it actually matches what the cursor emits. */
    info->estimatedCost = 1.0;
    info->estimatedRows = 100;
    if (info->nOrderBy == 1 && info->aOrderBy[0].iColumn == COL_DISTANCE &&
        !info->aOrderBy[0].desc) {
      info->orderByConsumed = 1;
    }
  }
  info->idxNum = 1;
  /* positional TVF args land on hidden columns 0..nargs-1; every one must
   * have a USABLE == constraint in this plan. When an argument comes from
   * an outer table that is not yet positioned (correlated nested-loop
   * join), its constraint is present but unusable — returning
   * SQLITE_CONSTRAINT tells the planner to try another join order instead
   * of calling xFilter with a gap in argv ("xBestIndex malfunction"). */
  int nargs = v->is_stream ? 3 : 4;
  int have[4] = {0, 0, 0, 0};
  int present[4] = {0, 0, 0, 0};
  const struct sqlite3_index_constraint *c = info->aConstraint;
  for (int i = 0; i < info->nConstraint; i++, c++) {
    if (c->op != SQLITE_INDEX_CONSTRAINT_EQ) continue;
    /* a stream module called with a 4th positional argument lands an EQ on
     * the dead memidx column; BIND it (argvIndex 4) so xFilter raises the
     * reference's arity error ("expects 3 arguments, but 4 were provided")
     * instead of SQLite silently post-filtering NULL=value to zero rows */
    int bind_max = v->is_stream ? COL_MEMIDX + 1 : nargs;
    if (c->iColumn < COL_TBL || c->iColumn >= bind_max) continue;
    present[c->iColumn] = 1;
    if (!c->usable) continue;
    /* a second EQ term on the same hidden column (e.g. a WHERE clause
     * duplicating a TVF argument): bind only the FIRST (assigning the same
     * argvIndex twice is an xBestIndex malfunction) and leave the duplicate
     * unconsumed (omit=0) — xColumn exposes the bound argument value on the
     * hidden columns, so SQLite evaluates the duplicate as an ordinary
     * post-filter (true when the values match, like the reference) instead
     * of the whole plan failing with 'no query solution' */
    if (have[c->iColumn]) continue;
    info->aConstraintUsage[i].argvIndex = c->iColumn + 1;
    info->aConstraintUsage[i].omit = 1;
    have[c->iColumn] = 1;
  }
  for (int i = 0; i < 4; i++) {
    /* an argument the user DID pass but that is unusable in this join
     * order (e.g. it references an outer table not yet positioned) makes
     * the plan infeasible; a missing SUFFIX of arguments falls through to
     * xFilter's arity error */
    if (present[i] && !have[i]) return SQLITE_CONSTRAINT;
  }
  for (int i = 1; i < 4; i++) {
    /* a GAP in the bound arguments (e.g. WHERE binds tbl, vector, memidx
     * but not k) would leave non-contiguous argvIndex values — SQLite
     * reports that as an 'xBestIndex malfunction'; declare the plan
     * infeasible instead (clear 'no query solution') */
    if (have[i] && !have[i - 1]) return SQLITE_CONSTRAINT;
  }
  return SQLITE_OK;
}

static int svt_open(sqlite3_vtab *vtab, sqlite3_vtab_cursor **out) {
  (void)vtab;
  svt_cursor *c = (svt_cursor *)sqlite3_malloc(sizeof(svt_cursor));
  if (!c) return SQLITE_NOMEM;
  memset(c, 0, sizeof(*c));
  *out = &c->base;
  return SQLITE_OK;
}

static int svt_close(sqlite3_vtab_cursor *cur) {
  svt_cursor *c = (svt_cursor *)cur;
  svt_free_args(c);
  sqlite3_free(c->ids);
  sqlite3_free(c->dist);
  sqlite3_free(c);
  return SQLITE_OK;
}

static int svt_filter(sqlite3_vtab_cursor *cur, int idx_num,
                      const char *idx_str, int argc, sqlite3_value **argv) {
  (void)idx_num;
  (void)idx_str;
  svt_cursor *c = (svt_cursor *)cur;
  svt_vtab *v = (svt_vtab *)cur->pVtab;
  c->n = c->pos = 0;
  /* a cursor can be re-filtered (nested-loop JOIN rewinds); drop the
   * previous result buffers (reference frees likewise, :1799) */
  sqlite3_free(c->ids);
  sqlite3_free(c->dist);
  c->ids = NULL;
  c->dist = NULL;
  svt_free_args(c);

  int nargs = v->is_stream ? 3 : 4;
  if (argc != nargs) {
    char buf[160];
    sqlite3_snprintf(sizeof(buf), buf,
                     "%s expects %d arguments, but %d were provided.",
                     svt_sql_name(v->fname), nargs, argc);
    return svt_set_error(&v->base, buf);
  }
  /* type checks mirroring the reference's wording (:1740-1757 — sans its
   * stray extra vararg, a format/argument mismatch in the original) */
  for (int i = 0; i < argc; i++) {
    int t = sqlite3_value_type(argv[i]);
    const char *want = NULL;
    switch (i) {
      case 0:
      case 1:
        if (t != SQLITE_TEXT) want = "TEXT";
        break;
      case 2:
        if (t != SQLITE_TEXT && t != SQLITE_BLOB) want = "TEXT or BLOB";
        break;
      case 3:
        if (t != SQLITE_INTEGER) want = "INTEGER";
        break;
    }
    if (want) {
      char buf[160];
      sqlite3_snprintf(sizeof(buf), buf,
                       "%s: argument %d must be of type %s (got %s).",
                       svt_sql_name(v->fname), i + 1, want,
                       svt_type_name(t));
      return svt_set_error(&v->base, buf);
    }
  }

  /* keep the parameter values: xColumn returns them for the hidden columns
   * (required for duplicate-EQ post-filters; also what generate_series-style
   * TVFs do) */
  for (int i = 0; i < argc && i < 4; i++) {
    c->args[i] = sqlite3_value_dup(argv[i]);
    if (!c->args[i]) {
      svt_free_args(c);
      return SQLITE_NOMEM;
    }
  }

  sqlite3_stmt *stmt = NULL;
  int rc = sqlite3_prepare_v2(v->db,
                              "SELECT svt_scan_blob(?1, ?2, ?3, ?4, ?5)", -1,
                              &stmt, NULL);
  if (rc != SQLITE_OK) {
    return svt_set_error(
        &v->base,
        "svt_scan_blob is not registered on this connection — open the "
        "database through sqlite_vector_tpu.sqlite.connect()/wrap().");
  }
  sqlite3_bind_text(stmt, 1, v->fname, -1, SQLITE_STATIC);
  sqlite3_bind_value(stmt, 2, argv[0]);
  sqlite3_bind_value(stmt, 3, argv[1]);
  sqlite3_bind_value(stmt, 4, argv[2]);
  if (v->is_stream) {
    sqlite3_bind_int(stmt, 5, 0);
  } else {
    sqlite3_bind_value(stmt, 5, argv[3]);
  }

  rc = sqlite3_step(stmt);
  if (rc != SQLITE_ROW) {
    int err = svt_set_error(&v->base, sqlite3_errmsg(v->db));
    sqlite3_finalize(stmt);
    return err;
  }
  const unsigned char *blob =
      (const unsigned char *)sqlite3_column_blob(stmt, 0);
  sqlite3_int64 nbytes = sqlite3_column_bytes(stmt, 0);
  if (!blob || nbytes < 8) {
    sqlite3_finalize(stmt);
    return SQLITE_OK; /* empty result */
  }
  sqlite3_int64 n;
  memcpy(&n, blob, 8); /* little-endian host (x86/arm) */
  /* overflow-safe form: `nbytes < 8 + n * 16` is UB for a huge/corrupt n
   * (signed overflow wraps negative in practice, defeating the guard) */
  if (n < 0 || n > (nbytes - 8) / 16) {
    sqlite3_finalize(stmt);
    return svt_set_error(&v->base, "svt_scan_blob: malformed result blob");
  }
  c->ids = (sqlite3_int64 *)sqlite3_malloc64((sqlite3_uint64)(n ? n : 1) * 8);
  c->dist = (double *)sqlite3_malloc64((sqlite3_uint64)(n ? n : 1) * 8);
  if (!c->ids || !c->dist) {
    sqlite3_finalize(stmt);
    return SQLITE_NOMEM;
  }
  /* records are [int64 id][float64 distance] pairs */
  for (sqlite3_int64 i = 0; i < n; i++) {
    memcpy(&c->ids[i], blob + 8 + i * 16, 8);
    memcpy(&c->dist[i], blob + 8 + i * 16 + 8, 8);
  }
  c->n = n;
  sqlite3_finalize(stmt);
  return SQLITE_OK;
}

static int svt_next(sqlite3_vtab_cursor *cur) {
  ((svt_cursor *)cur)->pos++;
  return SQLITE_OK;
}

static int svt_eof(sqlite3_vtab_cursor *cur) {
  svt_cursor *c = (svt_cursor *)cur;
  return c->pos >= c->n;
}

static int svt_column(sqlite3_vtab_cursor *cur, sqlite3_context *ctx,
                      int col) {
  svt_cursor *c = (svt_cursor *)cur;
  if (col == COL_ID) {
    sqlite3_result_int64(ctx, c->ids[c->pos]);
  } else if (col == COL_DISTANCE) {
    sqlite3_result_double(ctx, c->dist[c->pos]);
  } else if (col >= COL_TBL && col <= COL_MEMIDX && c->args[col]) {
    /* hidden parameter columns echo their filter arguments (so duplicate
     * EQ terms post-filter to true); unfiltered/absent ones stay NULL */
    sqlite3_result_value(ctx, c->args[col]);
  }
  return SQLITE_OK;
}

static int svt_rowid(sqlite3_vtab_cursor *cur, sqlite3_int64 *rowid) {
  /* the vtab's rowid IS the matched row's id — the reference's documented
   * queries JOIN ON base.rowid = v.rowid (README.md:96-100) */
  svt_cursor *c = (svt_cursor *)cur;
  *rowid = c->ids[c->pos];
  return SQLITE_OK;
}

static sqlite3_module svt_module = {
    /* iVersion    */ 0,
    /* xCreate     */ 0, /* eponymous-only: usable as a TVF, not CREATE-able */
    /* xConnect    */ svt_connect,
    /* xBestIndex  */ svt_best_index,
    /* xDisconnect */ svt_disconnect,
    /* xDestroy    */ 0,
    /* xOpen       */ svt_open,
    /* xClose      */ svt_close,
    /* xFilter     */ svt_filter,
    /* xNext       */ svt_next,
    /* xEof        */ svt_eof,
    /* xColumn     */ svt_column,
    /* xRowid      */ svt_rowid,
    /* xUpdate     */ 0,
    /* xBegin      */ 0,
    /* xSync       */ 0,
    /* xCommit     */ 0,
    /* xRollback   */ 0,
    /* xFindFunction */ 0,
    /* xRename     */ 0,
    /* xSavepoint  */ 0,
    /* xRelease    */ 0,
    /* xRollbackTo */ 0,
    /* xShadowName */ 0,
};

#ifdef _WIN32
__declspec(dllexport)
#endif
int sqlite3_svtvtab_init(sqlite3 *db, char **errmsg,
                         const sqlite3_api_routines *api) {
  (void)errmsg;
  SQLITE_EXTENSION_INIT2(api);
  int rc;
  rc = sqlite3_create_module(db, "vector_full_scan", &svt_module,
                             (void *)"full");
  if (rc != SQLITE_OK) return rc;
  rc = sqlite3_create_module(db, "vector_quantize_scan", &svt_module,
                             (void *)"quant");
  if (rc != SQLITE_OK) return rc;
  rc = sqlite3_create_module(db, "vector_full_scan_stream", &svt_module,
                             (void *)"full_stream");
  if (rc != SQLITE_OK) return rc;
  rc = sqlite3_create_module(db, "vector_quantize_scan_stream", &svt_module,
                             (void *)"quant_stream");
  return rc;
}
