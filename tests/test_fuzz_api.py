"""Stateful API-sequence fuzzer: Dataset mutations vs a model state.

Random interleavings of add / update / remove / quantize / search /
save+load drive the native Python API while a plain dict mirrors the
expected live rows; every checkpoint validates exact search, quantized
search (against a quantize-time snapshot of the state — the reference's
shadow-table staleness contract), streaming distances, and filters against
the numpy oracle. Unlike test_fuzz_differential this needs no compiled C
reference, so it runs on every CI machine; it exercises engine STATE
transitions (capacity growth, id remapping after removals, stale codes)
rather than SQL parity.
"""

from __future__ import annotations

import numpy as np
import pytest

import sqlite_vector_tpu as svt
from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.types import DistanceMetric, VectorType

from tests.parity import (
    REL_TOL_BY_TYPE,
    assert_topk_parity,
    expected_int4_distances,
)

TYPES = [VectorType.F32, VectorType.F16, VectorType.BF16, VectorType.U8]
METRICS = list(DistanceMetric)


def _rand_rows(rng, n, dim, vtype, normalized=False, inject=False):
    if vtype is VectorType.U8:
        return rng.integers(0, 256, (n, dim)).astype(np.uint8)
    if vtype is VectorType.I8:
        return rng.integers(-128, 128, (n, dim)).astype(np.int8)
    rows = (rng.standard_normal((n, dim)) * 2).astype(np.float32)
    if normalized:
        # normalized=1 fuzzing: the cosine pure-dot fast path must match
        # the oracle's plain cosine on genuinely unit-norm rows
        norms = np.linalg.norm(rows, axis=1, keepdims=True)
        rows = rows / np.where(norms > 0, norms, 1.0)
    if inject and rng.random() < 0.25:
        # sparse NaN/Inf injection: drives the lane-skip policy kernels
        # (1-D and 2-D mesh) through the same mutation/persistence churn
        # as finite data; the sticky has_nonfinite flag keeps the policy
        # path active for the rest of the sequence
        rows[rng.integers(0, n), rng.integers(0, dim)] = rng.choice(
            [np.nan, np.inf, -np.inf]
        )
    return rows.astype(vtype.np_dtype)


@pytest.mark.parametrize("seed", range(10))
def test_api_op_sequences(tmp_path, seed):
    rng = np.random.default_rng(4000 + seed)
    vtype = TYPES[seed % len(TYPES)]
    metric = METRICS[(seed * 2 + 1) % len(METRICS)]
    dim = int(rng.integers(4, 32))
    rel_tol = REL_TOL_BY_TYPE[vtype.value]
    # mesh cycle: none / 1-D rows / 2-D (rows x dim) — the 2-D seeds fuzz
    # block sharding + dim zero-padding (and the dim-separable non-finite
    # policies) through the same op sequences
    if seed % 3 == 0:
        mesh = svt.make_mesh()
    elif seed % 3 == 1:
        from sqlite_vector_tpu.parallel import make_mesh_2d

        mesh = make_mesh_2d(4, 2)
    else:
        mesh = None
    # normalized=1 + COSINE: F32 rides the pure-dot fast path; f16/bf16
    # declare the flag but take plain cosine (the storage cast re-perturbs
    # norms by ~2*eps_dtype — seed 78 of the extended campaign caught the
    # bf16 fast path returning a self-match at 2.2e-3 instead of 0). The
    # plain-cosine oracle is the ground truth for BOTH paths.
    normalized = metric is DistanceMetric.COSINE and vtype in (
        VectorType.F32, VectorType.F16, VectorType.BF16
    )
    # odd seeds with float dtypes inject sparse NaN/Inf (policy paths)
    inject = seed % 2 == 1 and vtype in (
        VectorType.F32, VectorType.F16, VectorType.BF16
    )
    # host (streaming) storage as an independent dimension — the >HBM tile
    # pipeline, its clamped masks, and the chunked host quantize go through
    # the same op sequences; 2-D mesh + host is a rejected config (skip)
    storage = "host" if (seed % 5 == 2 and seed % 3 != 1) else "hbm"
    # int4 seeds: the 4-bit pipeline (r4, beyond the reference) rides the
    # same mutation/persistence churn; rejected on 2-D meshes by contract
    use_int4 = seed % 4 == 3 and seed % 3 != 1
    # refine seeds (r5): the int8 sidecar + device-side two-stage search.
    # Single-chip + device-resident codes by contract (quantize() rejects
    # meshes; search(mode='refine') rejects host-resident codes)
    use_refine = use_int4 and mesh is None and storage == "hbm"
    ds = svt.Dataset(
        f"api{seed}",
        svt.parse_options(
            f"dimension={dim},type={vtype.value},distance={metric.value}"
            + (",normalized=1" if normalized else "")
        ),
        mesh=mesh,
        storage=storage,
    )

    state: dict[int, np.ndarray] = {}  # live rows by id
    qsnap: dict[int, np.ndarray] | None = None  # state at last quantize()

    def do_add():
        n = int(rng.integers(1, 20))
        rows = _rand_rows(rng, n, dim, vtype, normalized, inject)
        ids = ds.add(rows)
        for i, rid in enumerate(ids):
            state[int(rid)] = rows[i]

    def do_update():
        if not state:
            return
        rid = int(rng.choice(list(state)))
        row = _rand_rows(rng, 1, dim, vtype, normalized, inject)[0]
        ds.update(rid, row)
        state[rid] = row

    def do_remove():
        if not state:
            return
        rid = int(rng.choice(list(state)))
        ds.remove([rid])
        del state[rid]

    def do_quantize():
        nonlocal qsnap
        if not state:
            return
        # host-storage seeds alternate the checkpointed build (one shared
        # dir across the sequence: exercises the mismatch-restart and the
        # fresh-inode rebuild while older _QuantState mappings are live)
        if storage == "host" and rng.random() < 0.5:
            kw = {"checkpoint": str(tmp_path / f"ck{seed}")}
        else:
            kw = {}
        if use_int4:
            kw["qtype"] = "int4"
            if use_refine:
                kw["refine"] = True
        assert ds.quantize(**kw) == len(state)
        qsnap = dict(state)

    def do_roundtrip():
        nonlocal ds
        d = str(tmp_path / f"rt{seed}")
        ds.save(d)
        ds = svt.Dataset.load(d, mesh=mesh, storage=storage)

    def check():
        assert len(ds) == len(state)
        if not state:
            return
        ids_all = np.array(sorted(state), np.int64)
        base = np.stack([state[i] for i in ids_all])
        qid = int(rng.choice(ids_all))
        q = state[qid]
        k = int(rng.choice([1, 4]))
        d = oracle.snap_zero(oracle.distance(q[None], base, metric, vtype)[0])

        got_ids, got_vals = ds.search(q, k)
        kk = min(k, len(ids_all))
        assert_topk_parity(
            ids_all, d,
            np.pad(np.asarray(got_ids, np.int64), (0, k - len(got_ids)),
                   constant_values=-1),
            np.pad(np.asarray(got_vals, np.float64), (0, k - len(got_vals)),
                   constant_values=np.inf),
            k, rel_tol=rel_tol, label=f"api seed={seed}",
        )

        # streaming distances over live rows (ids in insertion order)
        live_order = [int(i) for i in ds.ids]
        dm = ds.distances(q)
        want = oracle.snap_zero(
            oracle.distance(
                q[None], np.stack([state[i] for i in live_order]), metric, vtype
            )[0]
        )
        finite = np.isfinite(want)
        np.testing.assert_allclose(
            dm[finite], want[finite], rtol=max(rel_tol, 1e-5), atol=1e-5
        )

        # quantized scans serve the QUANTIZE-TIME snapshot (stale contract)
        if qsnap:
            q_ids = np.array(sorted(qsnap), np.int64)
            qbase = np.stack([qsnap[i] for i in q_ids])
            if use_int4:
                # int4 has no reference ground truth: the pinned numpy spec
                # (quantize4_np + the documented distance composition) IS
                # the oracle — device scans are f32, the spec f64
                from sqlite_vector_tpu.ops.quantize4 import quantize4_np

                packed, alpha, csq = quantize4_np(qbase.astype(np.float32))
                qd = expected_int4_distances(
                    np.asarray(q, np.float32)[None], packed, alpha, csq,
                    metric, dim,
                )[0]
                qtol = 2e-4
            else:
                _, qscale, qoffset = (
                    ds.quant_params[0], ds.quant_params[1], ds.quant_params[2]
                )
                qt = ds.quant_params[0]
                qc = oracle.quantize(
                    qbase.astype(np.float32), np.float32(qscale),
                    np.float32(qoffset), qt,
                )
                qq = oracle.quantize(
                    np.asarray(q, np.float32)[None], np.float32(qscale),
                    np.float32(qoffset), qt,
                )
                qd = oracle.distance(
                    qq, qc, metric,
                    VectorType.I8 if qt is svt.QuantType.I8 else VectorType.U8,
                )[0]
                qtol = 1e-6
            a_ids, a_vals = ds.search(q, k, exact=False)
            assert_topk_parity(
                q_ids, qd,
                np.pad(np.asarray(a_ids, np.int64), (0, k - len(a_ids)),
                       constant_values=-1),
                np.pad(np.asarray(a_vals, np.float64), (0, k - len(a_vals)),
                       constant_values=np.inf),
                k, rel_tol=qtol, label=f"api-quant seed={seed}",
            )

        # rerank: stage-2 rescoring is EXACT by contract — whatever ids come
        # back must carry their true (f32-cast) exact distance, sorted
        # ascending, and reference only live rows. (Recall through the
        # prefilter is a statistical property, not an invariant — not
        # asserted here.) Non-finite seeds skip: rerank routes to the
        # policy/exact fallback there, already covered by the exact check.
        if qsnap and not inject:
            r_ids, r_vals = ds.search(q, k, mode="rerank")
            assert len(r_ids) == len(r_vals) <= k
            rtol_r = max(rel_tol, 1e-5)
            prev = -np.inf
            for rid, rv in zip(r_ids, r_vals):
                assert int(rid) in state, (
                    f"api-rerank seed={seed}: dead/unknown id {rid}"
                )
                want = float(
                    oracle.snap_zero(
                        oracle.distance(
                            np.asarray(q, np.float32)[None],
                            np.asarray(
                                state[int(rid)], np.float32
                            )[None],
                            metric, VectorType.F32,
                        )[0]
                    )[0]
                )
                np.testing.assert_allclose(
                    float(rv), want, rtol=rtol_r,
                    atol=rtol_r * max(1.0, abs(want)),
                    err_msg=f"api-rerank seed={seed}: id {rid} rescore",
                )
                assert rv >= prev - 1e-6, (
                    f"api-rerank seed={seed}: unsorted values"
                )
                prev = rv

        # refine: with expand covering the WHOLE snapshot the int4
        # prefilter is exhaustive, so refine's top-k must be the exact
        # top-k of the int8-dequantized snapshot rows — full set+value
        # parity against the mirrored sidecar quantization (r5). Non-finite
        # seeds skip (refine reroutes to exact there, covered above).
        if qsnap and use_refine and not inject:
            quant = ds._quant
            if quant is not None and quant.codes8 is not None:
                r_ids_all = np.array(sorted(qsnap), np.int64)
                rbase = np.stack(
                    [qsnap[i] for i in r_ids_all]
                ).astype(np.float32)
                c8 = oracle.quantize(
                    rbase, np.float32(quant.scale8),
                    np.float32(quant.offset8), quant.qtype8,
                )
                xhat = (
                    c8.astype(np.float32) / np.float32(quant.scale8)
                    + np.float32(quant.offset8)
                )
                rd = oracle.snap_zero(
                    oracle.distance(
                        np.asarray(q, np.float32)[None], xhat, metric,
                        VectorType.F32,
                    )[0]
                )
                expand_all = -(-len(r_ids_all) // k) + 1
                g_ids, g_vals = ds.search(
                    q, k, mode="refine", expand=expand_all
                )
                assert_topk_parity(
                    r_ids_all, rd,
                    np.pad(np.asarray(g_ids, np.int64),
                           (0, k - len(g_ids)), constant_values=-1),
                    np.pad(np.asarray(g_vals, np.float64),
                           (0, k - len(g_vals)), constant_values=np.inf),
                    k, rel_tol=max(rel_tol, 1e-5),
                    label=f"api-refine seed={seed}",
                )

        # filtered search stays within the filter and finds the best member
        if len(ids_all) >= 4:
            flt = rng.choice(ids_all, size=len(ids_all) // 2, replace=False)
            f_ids, _ = ds.search(q, min(k, len(flt)), ids_filter=flt)
            assert set(int(i) for i in f_ids) <= set(int(i) for i in flt)
            sub = np.array(sorted(flt), np.int64)
            subd = oracle.distance(
                q[None], np.stack([state[int(i)] for i in sub]), metric, vtype
            )[0]
            subd = np.where(np.isnan(subd), np.inf, subd)
            if not np.isposinf(subd).all() and len(f_ids):
                mn = float(subd.min())
                # a non-finite best (DOT's -inf short-circuit) admits no
                # numeric slack: -inf + rel*inf = NaN would empty the
                # winners set (same guard as parity.assert_topk_parity)
                tol = (
                    max(rel_tol, 1e-6) * max(1.0, abs(mn))
                    if np.isfinite(mn) else 0.0
                )
                winners = {
                    int(sub[j]) for j in np.flatnonzero(subd <= mn + tol)
                }
                assert int(f_ids[0]) in winners

    ops = [do_add, do_add, do_update, do_remove, do_quantize, do_roundtrip]
    do_add()
    check()
    for _ in range(10):
        rng.choice(ops)()
        check()
