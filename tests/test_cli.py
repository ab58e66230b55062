"""CLI workflow: the sqlite3-shell operator loop, end-to-end.

The reference is driven from the sqlite3 CLI (README.md:36-107:
.load -> vector_init -> INSERT blobs -> vector_quantize ->
vector_full_scan / vector_quantize_scan). These tests drive the same
loop through `python -m sqlite_vector_tpu`, in-process via cli.main().
"""

import json

import numpy as np
import pytest

from sqlite_vector_tpu.cli import main


OPTS = "dimension=16,type=FLOAT32,distance=L2"


@pytest.fixture
def vecs_npy(tmp_path, rng):
    mat = rng.standard_normal((200, 16)).astype(np.float32)
    p = tmp_path / "vecs.npy"
    np.save(p, mat)
    return str(p), mat


def test_version(capsys):
    assert main(["version"]) == 0
    out = capsys.readouterr().out
    assert "sqlite_vector_tpu" in out and "(" in out


def test_sqlite_workflow(tmp_path, vecs_npy, capsys):
    """init -> import -> quantize -> search, metadata persisted in the db."""
    npy, mat = vecs_npy
    db = str(tmp_path / "t.db")
    assert main(["import", db, "docs", "emb", npy, "--create",
                 "--options", OPTS]) == 0
    assert "imported 200" in capsys.readouterr().out
    # idempotent re-init on the populated table (metadata persisted)
    assert main(["init", db, "docs", "emb", OPTS]) == 0
    capsys.readouterr()
    assert main(["quantize", db, "docs", "emb", "--options", OPTS]) == 0
    assert "quantized 200" in capsys.readouterr().out

    q = json.dumps(mat[17].tolist())
    assert main(["search", db, "docs", "emb", q, "-k", "3", "--json",
                 "--options", OPTS]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ids"][0] == 18  # rowids are 1-based
    assert out["distances"][0] == 0.0

    assert main(["search", db, "docs", "emb", q, "-k", "3",
                 "--mode", "quantized", "--options", OPTS]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 3 and lines[0].split("\t")[0] == "18"


def test_dataset_dir_workflow(tmp_path, vecs_npy, capsys):
    """ds-create -> ds-info -> ds-search (exact + rerank via query .npy)."""
    npy, mat = vecs_npy
    d = str(tmp_path / "ds")
    assert main(["ds-create", d, OPTS, "--npy", npy]) == 0
    assert "saved 200 rows" in capsys.readouterr().out

    assert main(["ds-info", d]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["count"] == 200 and info["dimension"] == 16

    qpath = str(tmp_path / "q.npy")
    np.save(qpath, mat[5])
    assert main(["ds-search", d, qpath, "-k", "2", "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["distances"][0] == 0.0

    # host-streaming variant of the same search
    assert main(["ds-search", d, qpath, "-k", "2", "--host", "--json"]) == 0
    out2 = json.loads(capsys.readouterr().out)
    assert out2["ids"] == out["ids"]


def test_warm(capsys):
    assert main(["warm", "--n", "500", "--dim", "16", "-k", "3",
                 "--max-batch", "4", "--modes", "exact,rerank"]) == 0
    out = capsys.readouterr().out
    # 2 modes x buckets {1,2,4} x {unmasked, masked}
    assert "compiled 12 executables" in out
    assert "warm masked exact" in out


def test_search_error_path(tmp_path, capsys):
    db = str(tmp_path / "e.db")
    # search without vector_init -> clean error, exit 1
    main(["init", db, "docs", "emb", OPTS])
    rc = main(["search", db, "missing", "emb", "[1,2]", "--options",
               "dimension=2,type=FLOAT32"])
    assert rc == 1
    assert "error:" in capsys.readouterr().err


def test_recall_command(capsys):
    """`recall` forwards to tools.recall: synthetic build + quantize +
    exact-vs-quantized overlap (the QUANTIZATION.md:43-77 workflow)."""
    assert main(["recall", "--n", "2000", "--dim", "16", "--k", "5",
                 "--queries", "8"]) == 0
    out = capsys.readouterr().out
    assert "recall@5:" in out and "quant params:" in out
    recall = float(out.split("recall@5:")[1].split()[0])
    # self-queries on clustered data: near-perfect overlap expected
    assert recall > 0.8


def test_serve_command(tmp_path, vecs_npy, monkeypatch, capsys):
    """`serve --dir` end-to-end through the real HTTP endpoint.

    The command blocks in cli._serve_block until ctrl-C; the test swaps in
    a block hook that issues a real POST /search against the live server
    and then raises KeyboardInterrupt, exercising the full serve wiring
    (load -> coalescer -> HTTP -> clean shutdown)."""
    import json as _json
    import urllib.request

    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu import cli

    npy, mat = vecs_npy
    d = str(tmp_path / "ds")
    assert main(["ds-create", d, OPTS, "--npy", npy]) == 0
    capsys.readouterr()

    captured = {}
    real_serve = svt.serve

    def capture_serve(*a, **kw):
        captured["server"] = real_serve(*a, **kw)
        return captured["server"]

    def _request_then_interrupt(server):
        host, port = server.server_address[:2]
        body = _json.dumps({"vector": mat[3].tolist(), "k": 2}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/search", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            captured["resp"] = _json.loads(r.read())
        raise KeyboardInterrupt

    monkeypatch.setattr(svt, "serve", capture_serve)
    monkeypatch.setattr(cli, "_serve_block", _request_then_interrupt)
    assert main(["serve", "--dir", d, "--port", "0"]) == 0

    resp = captured["resp"]
    # auto-assigned ids are 1-based (SQLite rowid convention): row 3 -> id 4
    assert resp["ids"][0] == 4 and resp["distances"][0] == 0.0
    out = capsys.readouterr().out
    assert "serving 200 x 16" in out


def test_serve_sigterm_clean_shutdown(tmp_path, vecs_npy):
    """SIGTERM (what production supervisors send) takes the same clean
    shutdown path as ctrl-C: drain the coalescer, stop the server, exit 0."""
    import signal
    import subprocess
    import sys
    import time

    npy, _ = vecs_npy
    d = str(tmp_path / "ds")
    assert main(["ds-create", d, OPTS, "--npy", npy]) == 0

    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "sqlite_vector_tpu", "--cpu",
         "serve", "--dir", d, "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 120
        started = False
        while time.time() < deadline:
            line = proc.stdout.readline()
            if line.startswith("serving"):
                started = True
                break
        assert started, "server never printed its startup line"
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_ds_search_batched_queries(tmp_path, vecs_npy, capsys):
    """A [B, dim] query .npy: --json nests per-query results; the text
    output separates queries instead of crashing on the 2-D array."""
    npy, mat = vecs_npy
    d = str(tmp_path / "dsb")
    assert main(["ds-create", d, OPTS, "--npy", npy]) == 0
    capsys.readouterr()
    qpath = str(tmp_path / "qb.npy")
    np.save(qpath, mat[[5, 9]])
    assert main(["ds-search", d, qpath, "-k", "2", "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ids"][0][0] == 6 and out["ids"][1][0] == 10
    assert out["distances"][0][0] == 0.0
    assert main(["ds-search", d, qpath, "-k", "2"]) == 0
    text = capsys.readouterr().out
    assert "# query 0" in text and "# query 1" in text
