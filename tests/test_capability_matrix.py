"""The full capability matrix: 5 element types x 5 metrics end-to-end.

The reference implements 25 hand-written kernels per ISA
(src/distance-cpu.c:756-792). This test drives every (dtype, metric) pair
through the public Dataset API and checks neighbor parity with the oracle —
proving the single fused scan covers the entire dispatch table.
"""

import numpy as np
import pytest

import sqlite_vector_tpu as svt
from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.types import DistanceMetric, VectorType

N, DIM, K, B = 400, 32, 10, 2


def _make_data(vtype: VectorType, rng) -> np.ndarray:
    if vtype is VectorType.U8:
        return rng.integers(0, 256, (N, DIM)).astype(np.uint8)
    if vtype is VectorType.I8:
        return rng.integers(-128, 128, (N, DIM)).astype(np.int8)
    return (rng.standard_normal((N, DIM)) * 3).astype(vtype.np_dtype)


@pytest.mark.parametrize("metric", list(DistanceMetric), ids=lambda m: m.value)
@pytest.mark.parametrize("vtype", list(VectorType), ids=lambda t: t.value)
def test_dtype_metric_matrix(vtype, metric, rng):
    data = _make_data(vtype, rng)
    store = svt.VectorStore()
    ds = store.create(
        f"m_{vtype.value}_{metric.value}",
        f"dimension={DIM},type={vtype.value},distance={metric.value}",
    )
    ids = ds.add(data)
    queries = data[rng.integers(0, N, B)]
    got_ids, got_vals = ds.search(queries, K)

    from tests.parity import REL_TOL_BY_TYPE, assert_topk_parity

    ref = oracle.distance(queries, data, metric, vtype)
    for bi in range(B):
        # tie-aware exact comparison: set equality modulo substitutions
        # within the justified numeric band at the selection boundary
        assert_topk_parity(
            ids,
            ref[bi],
            got_ids[bi],
            got_vals[bi],
            K,
            rel_tol=REL_TOL_BY_TYPE[vtype.value],
            label=f"{vtype.value}/{metric.value}[{bi}]",
        )


@pytest.mark.parametrize("vtype", [VectorType.F32, VectorType.F16, VectorType.BF16])
def test_quantize_matrix(vtype, rng):
    """Quantization from every float source dtype, AUTO resolution."""
    data = _make_data(vtype, rng)
    store = svt.VectorStore()
    ds = store.create(f"q_{vtype.value}", f"dimension={DIM},type={vtype.value}")
    ids = ds.add(data)
    assert ds.quantize() == N
    qt, scale, offset = ds.quant_params
    ref_qt, ref_scale, ref_offset = oracle.compute_quant_params(
        data.astype(np.float32), svt.QuantType.AUTO
    )
    assert qt is ref_qt
    np.testing.assert_allclose(scale, ref_scale, rtol=1e-6)
    # self-match through the quantized path
    got, _ = ds.search(data[7], 3, exact=False)
    assert got[0] == ids[7]
