"""Collective-traffic proof for the distributed serving path.

SURVEY.md §2 claims the ICI candidate merge is "the only cross-device
communication in the serving path" and is O(devices * B * k), never O(N).
These tests prove it from the COMPILED artifact (optimized HLO), not from
the source: parallel.audit lowers the real executor and inventories every
collective op with shapes and bytes.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from sqlite_vector_tpu.parallel import (
    audit_sharded_scan,
    audit_sharded_int4_quantize_build,
    audit_sharded_int4_scan,
    audit_sharded_int8_scan,
    audit_sharded_quantize_build,
    collective_bytes_per_query,
    make_mesh,
    make_mesh_2d,
)
from sqlite_vector_tpu.types import DistanceMetric


def test_1d_scan_only_collective_is_the_candidate_merge():
    mesh = make_mesh()  # 8 virtual devices (conftest)
    for b, k, n in [(1, 20, 8192), (16, 5, 65536)]:
        r = audit_sharded_scan(mesh, batch=b, k=k, n=n, dim=64)
        assert r["n_devices"] == 8
        ops = sorted(c["op"] for c in r["collectives"])
        # exactly two all-gathers: [D, B, k] f32 values + s32 global ids
        assert ops == ["all-gather", "all-gather"], r["collectives"]
        for c in r["collectives"]:
            for _, dims in c["shapes"]:
                assert dims == [8, b, k]
        # total == the analytic 8 * D * B * k bytes QueryStats reports
        assert r["total_bytes"] == collective_bytes_per_query(8, b, k)
        # and never O(N): no collective dimension scales with the rows
        for c in r["collectives"]:
            for _, dims in c["shapes"]:
                assert max(dims) <= max(8, b, k)


@pytest.mark.parametrize("metric", [DistanceMetric.COSINE, DistanceMetric.L1])
def test_1d_scan_merge_volume_metric_independent(metric):
    r = audit_sharded_scan(
        make_mesh(), batch=4, k=10, n=4096, dim=32, metric=metric
    )
    assert r["total_bytes"] == collective_bytes_per_query(8, 4, 10)
    assert all(c["op"] == "all-gather" for c in r["collectives"])


@pytest.mark.parametrize(
    "audit", [audit_sharded_int8_scan, audit_sharded_int4_scan],
    ids=["int8", "int4"],
)
def test_quantized_scan_merge_is_the_only_collective(audit):
    """r4 weak item 5: the quantized executors' collective traffic was
    asserted analytically. Proven from the optimized HLO here: the sharded
    int8 AND packed-int4 scans move exactly the two [D, B, k] candidate
    all-gathers — the codes never cross the ICI, and the merge volume
    equals what QueryStats.collective_bytes reports."""
    mesh = make_mesh()
    for b, k, n in [(1, 20, 8192), (16, 5, 65536)]:
        r = audit(mesh, batch=b, k=k, n=n, dim=64)
        ops = sorted(c["op"] for c in r["collectives"])
        assert ops == ["all-gather", "all-gather"], r["collectives"]
        for c in r["collectives"]:
            for _, dims in c["shapes"]:
                assert dims == [8, b, k]
        assert r["total_bytes"] == collective_bytes_per_query(8, b, k)


def test_quantize_build_collectives_are_scalar_reductions():
    """The int8 build's only cross-shard traffic is the global
    (min, max, any-negative) reduction — O(devices) scalars, never
    O(N*dim); the elementwise quantize kernel inserts NO collectives."""
    mesh = make_mesh()
    r = audit_sharded_quantize_build(mesh, n=65536, dim=64)
    assert r["quantize_collectives"] == [], r["quantize_collectives"]
    assert len(r["minmax_collectives"]) >= 1
    for c in r["minmax_collectives"]:
        assert c["op"] == "all-reduce"
        # every reduced operand is scalar-ish: nothing scales with N or dim
        for _, dims in c["shapes"]:
            assert (int(np.prod(dims)) if dims else 1) <= 8
    assert r["minmax_bytes"] <= 4 * 8 * 3  # <= 3 f32-ish scalars per device


def test_int4_quantize_build_is_collective_free():
    """Per-row int4 scales are row-local: the sharded build compiles to
    ZERO collectives (the capability matrix's 'no global pass' claim,
    proven from the artifact)."""
    r = audit_sharded_int4_quantize_build(make_mesh(), n=32768, dim=48)
    assert r["collectives"] == []
    assert r["total_bytes"] == 0


def test_2d_scan_collectives_are_merge_plus_documented_psum():
    mesh = make_mesh_2d(4, 2)
    b, k, n, dim = 4, 20, 4096, 64
    r = audit_sharded_scan(mesh, batch=b, k=k, n=n, dim=dim, two_d=True)
    by_op = {}
    for c in r["collectives"]:
        by_op.setdefault(c["op"], []).append(c)
    # the rows-axis candidate merge (R=4 devices in each gather group)
    gathers = by_op.get("all-gather", [])
    assert len(gathers) == 2
    assert sum(c["bytes"] for c in gathers) == collective_bytes_per_query(
        4, b, k
    )
    # the dim-axis psum of the partial components: ONE all-reduce, whose
    # dominant term is the [B, N/rows] partial-dot block — the documented
    # O(B * N / rows) cost of dim-sharding (docs/ARCHITECTURE.md), batched
    # with the tiny norm partials into a single collective
    reduces = by_op.get("all-reduce", [])
    assert len(reduces) == 1
    shapes = reduces[0]["shapes"]
    assert ("f32", [b, n // 4]) in [(d, s) for d, s in shapes]
    # nothing else crosses the ICI
    assert set(by_op) == {"all-gather", "all-reduce"}


_SCALING_SNIPPET = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from sqlite_vector_tpu.parallel import (
    audit_sharded_scan, collective_bytes_per_query, make_mesh,
)
d = int(sys.argv[1])
mesh = make_mesh()
r = audit_sharded_scan(mesh, batch=2, k=8, n=d * 1024, dim=32)
print(json.dumps({
    "devices": r["n_devices"],
    "total_bytes": r["total_bytes"],
    "analytic": collective_bytes_per_query(r["n_devices"], 2, 8),
}))
"""


def test_merge_volume_scales_linearly_in_devices():
    """8 -> 16 -> 32 virtual devices: the candidate-merge bytes grow as
    O(devices * B * k) exactly (each subprocess re-initializes XLA with a
    different forced device count; the audit runs at compile time)."""
    results = []
    for d in (8, 16, 32):
        env = dict(os.environ)
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={d}"
        env.pop("JAX_PLATFORMS", None)
        out = subprocess.run(
            [sys.executable, "-c", _SCALING_SNIPPET, str(d)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    for d, r in zip((8, 16, 32), results):
        assert r["devices"] == d
        assert r["total_bytes"] == r["analytic"] == 8 * d * 2 * 8
    # strictly linear: doubling devices doubles merge bytes
    assert results[1]["total_bytes"] == 2 * results[0]["total_bytes"]
    assert results[2]["total_bytes"] == 2 * results[1]["total_bytes"]


def test_querystats_surfaces_collective_bytes():
    import sqlite_vector_tpu as svt
    from sqlite_vector_tpu.utils.profiling import timed_search

    rng = np.random.default_rng(0)
    data = rng.standard_normal((256, 16)).astype(np.float32)
    mesh_ds = svt.VectorStore(mesh=make_mesh()).create(
        "m", "dimension=16,type=FLOAT32"
    )
    mesh_ds.add(data)
    _, _, stats = timed_search(mesh_ds, data[:2], 5)
    assert stats.collective_bytes == collective_bytes_per_query(8, 2, 5)
    solo = svt.VectorStore().create("s", "dimension=16,type=FLOAT32")
    solo.add(data)
    _, _, stats = timed_search(solo, data[:2], 5)
    assert stats.collective_bytes == 0
    # 2-D mesh: the stat must include the per-scan psum of the
    # [B, N/rows] partial block across the dim axis, not just the merge
    # (r4 review: the merge-only figure understated 2-D ICI traffic)
    from sqlite_vector_tpu.parallel import make_mesh_2d

    ds2 = svt.VectorStore(mesh=make_mesh_2d(4, 2)).create(
        "m2", "dimension=16,type=FLOAT32"
    )
    ds2.add(data)
    _, _, stats2 = timed_search(ds2, data[:2], 5)
    merge = collective_bytes_per_query(4, 2, 5)  # rows-axis gather only
    psum = 4 * 2 * (-(-len(ds2) // 4))
    assert stats2.collective_bytes == merge + psum
