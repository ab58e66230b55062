"""TPU probe 2: break down the int8 scan's non-matmul overhead.

i8_dot_min (matmul + row min) measured 1.49 ms; the full scan 2.71 ms.
Isolate: distance assembly, block-minima, hierarchical top-k, approx top-k.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.distance import _pairwise_int
    from sqlite_vector_tpu.ops.topk import topk_ascending, _hierarchical_smallest_k
    from sqlite_vector_tpu.types import DistanceMetric

    N, D, K, M = 1_000_000, 384, 20, 32
    rng = np.random.default_rng(7)
    codes = rng.integers(-128, 128, (N, D)).astype(np.int8)
    qi8 = rng.integers(-128, 128, (M, 1, D)).astype(np.int8)
    dev_i8 = jax.device_put(codes)
    dev_qi8 = jax.device_put(qi8)
    bsq = jnp.sum(dev_i8.astype(jnp.int32) * dev_i8.astype(jnp.int32), axis=-1)
    print("uploaded", flush=True)

    def chain(body):
        @jax.jit
        def run(qs, b, s):
            def step(c, q):
                out = body(q, b, s)
                return c, jax.tree.map(
                    lambda x: x[0] if getattr(x, "ndim", 0) > 1 else x, out
                )

            _, outs = jax.lax.scan(step, jnp.float32(0), qs)
            return outs

        return run

    def timeit(name, fn):
        out = fn(dev_qi8, dev_i8, bsq)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)
        t0 = time.time()
        for _ in range(3):
            out = fn(dev_qi8, dev_i8, bsq)
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf)
        dt = (time.time() - t0) / 3 / M
        print(f"{name:22s} {dt*1e3:7.3f} ms/scan  {N*D/dt/1e9:6.0f} GB/s", flush=True)

    def idot(q, b):
        return jax.lax.dot_general(
            q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    # control: matmul + min (same as probe 1)
    timeit("dot_min", chain(lambda q, b, s: jnp.min(idot(q, b), axis=-1)))
    # + L2 distance assembly (qsq + bsq - 2 dot), still just row-min
    timeit(
        "dist_min",
        chain(lambda q, b, s: jnp.min(_pairwise_int(q, b, DistanceMetric.SQUARED_L2, s), axis=-1)),
    )
    # + block minima reduce only (the hierarchical stage-1)
    def blockmin(q, b, s):
        d = _pairwise_int(q, b, DistanceMetric.SQUARED_L2, s)
        return jnp.min(d.reshape(d.shape[0], -1, 128), axis=-1)

    timeit("dist_blockmin", chain(blockmin))
    # + full hierarchical top-k
    def full_hier(q, b, s):
        d = _pairwise_int(q, b, DistanceMetric.SQUARED_L2, s)
        return topk_ascending(d, K)

    timeit("dist_hier_topk", chain(full_hier))
    # approx selection instead
    def full_approx(q, b, s):
        d = _pairwise_int(q, b, DistanceMetric.SQUARED_L2, s)
        return jax.lax.approx_min_k(d, K, recall_target=0.99)

    timeit("dist_approx_topk", chain(full_approx))
    # two-stage: block minima -> top-k groups -> gather from the DISTANCE
    # matrix is what _hierarchical_smallest_k does; time it standalone
    def hier_only(q, b, s):
        d = _pairwise_int(q, b, DistanceMetric.SQUARED_L2, s)
        return _hierarchical_smallest_k(d, K)

    timeit("dist_hier_direct", chain(hier_only))


if __name__ == "__main__":
    sys.exit(main())
