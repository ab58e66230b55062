"""TPU compute kernels: distance matrices, fused scans, top-k, quantization.

The reference implements 25 hand-written SIMD kernels (5 metrics x 5 dtypes)
per ISA (src/distance-{cpu,avx2,sse2,neon}.c). On TPU all of them collapse
into two code paths:

  - a float path (f32/f16/bf16) where L2/cosine/dot become MXU matmul
    fragments via the ||a-b||^2 = ||a||^2 + ||b||^2 - 2ab decomposition, and
  - an integer path (u8/i8) using int8 x int8 -> int32 `dot_general`.

`scan.py` is the XLA executor (chunked scan + running top-k); `pallas_scan.py`
is the hand-tiled Pallas kernel used on TPU for the hot configurations.
"""

from sqlite_vector_tpu.ops.distance import pairwise_distance, METRIC_IS_FLOAT_ONLY
from sqlite_vector_tpu.ops.topk import topk_ascending, merge_topk
from sqlite_vector_tpu.ops.scan import scan_topk, scan_distances, fused_scan_topk
from sqlite_vector_tpu.ops.streaming import (
    streaming_scan_topk,
    streaming_scan_distances,
)
from sqlite_vector_tpu.ops.quantize import (
    minmax_and_negative,
    quantize_device,
    resolve_quant_params,
)
from sqlite_vector_tpu.ops.quantize4 import (
    int4_scan_distances,
    int4_scan_topk,
    quantize4_device,
    quantize4_np,
)

__all__ = [
    "int4_scan_distances",
    "int4_scan_topk",
    "quantize4_device",
    "quantize4_np",
    "pairwise_distance",
    "METRIC_IS_FLOAT_ONLY",
    "topk_ascending",
    "merge_topk",
    "scan_topk",
    "fused_scan_topk",
    "scan_distances",
    "streaming_scan_topk",
    "streaming_scan_distances",
    "minmax_and_negative",
    "quantize_device",
    "resolve_quant_params",
]
