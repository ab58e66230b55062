"""Property/fuzz tests: random shapes, dtypes, metrics, ks vs the oracle.

Catches paddings/tiling/masking edge interactions that fixed-shape tests
miss (odd N at tile boundaries, k near N, tiny dims, duplicate rows).
"""

import numpy as np
import pytest

from sqlite_vector_tpu import oracle
from sqlite_vector_tpu.ops.scan import scan_topk
from sqlite_vector_tpu.types import DistanceMetric, VectorType


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_scan_topk(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(1, 700))
    dim = int(rng.integers(1, 80))
    b = int(rng.integers(1, 5))
    k = int(rng.integers(1, 40))
    metric = list(DistanceMetric)[int(rng.integers(0, 5))]
    row_tile = int(rng.choice([64, 128, 1000]))

    base = rng.standard_normal((n, dim)).astype(np.float32)
    if rng.random() < 0.3 and n > 2:  # inject duplicate rows (tie handling)
        base[1] = base[0]
    q = rng.standard_normal((b, dim)).astype(np.float32)
    if rng.random() < 0.2:
        q[0] = base[n // 2]  # exact self-match

    vals, idx = scan_topk(q, base, metric, k, row_tile=row_tile)
    vals, idx = np.asarray(vals), np.asarray(idx)

    ref = oracle.distance(q, base, metric, VectorType.F32)
    kk = min(k, n)
    for bi in range(b):
        w = np.sort(oracle.snap_zero(ref[bi]))[:kk]
        got = vals[bi][:kk]
        assert (idx[bi][:kk] >= 0).all()
        np.testing.assert_allclose(got, w, rtol=3e-4, atol=3e-4)
        # returned ids actually achieve the returned distances
        np.testing.assert_allclose(
            oracle.snap_zero(ref[bi][idx[bi][:kk]]), got, rtol=3e-4, atol=3e-4
        )
        # unfilled slots
        assert (idx[bi][kk:] == -1).all()
        assert np.isinf(vals[bi][kk:]).all()


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_quantize_roundtrip(seed):
    rng = np.random.default_rng(2000 + seed)
    n, dim = int(rng.integers(1, 300)), int(rng.integers(1, 64))
    scale_mag = float(rng.choice([0.01, 1.0, 100.0]))
    data = (rng.standard_normal((n, dim)) * scale_mag).astype(np.float32)
    if rng.random() < 0.5:
        data = np.abs(data)  # exercise the U8 branch of AUTO

    from sqlite_vector_tpu.ops.quantize import (
        minmax_and_negative,
        quantize_device,
        resolve_quant_params,
    )
    from sqlite_vector_tpu.types import QuantType

    mn, mx, neg = minmax_and_negative(data, n)
    qt, scale, offset = resolve_quant_params(
        float(mn), float(mx), bool(neg), QuantType.AUTO
    )
    dev = np.asarray(quantize_device(data, scale, offset, qt))

    ref_qt, ref_scale, ref_offset = oracle.compute_quant_params(
        data, QuantType.AUTO
    )
    assert qt is ref_qt
    np.testing.assert_allclose(scale, ref_scale, rtol=1e-6)
    ref_codes = oracle.quantize(data, ref_scale, ref_offset, ref_qt)
    # bit parity of the codes (device vs numpy reference)
    np.testing.assert_array_equal(dev, ref_codes)
    # dequantization error bound: half a quantization step
    deq = dev.astype(np.float32) / scale + offset
    step = 1.0 / float(scale)
    assert np.nanmax(np.abs(deq - data)) <= 0.5 * step * 1.01
