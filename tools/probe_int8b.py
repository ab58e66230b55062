"""TPU probe 2b: where does the selection stage's ~1.2 ms go?

In-run control: dist_min (matmul + distance assembly + row min) ~1.5 ms.
Variants add selection stages one at a time.
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
    from sqlite_vector_tpu.ops.topk import topk_ascending
    from sqlite_vector_tpu.types import DistanceMetric

    N, D, K, M = 1_000_000, 384, 20, 32
    G = -(-N // 128)
    NPAD = G * 128
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
                out = body(q + (c * 0).astype(q.dtype), b, s)
                return jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32), out

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
        return dt

    def dist(q, b, s):
        return _pairwise_int(q, b, DistanceMetric.SQUARED_L2, s)

    def pad(d):
        return jnp.pad(d, ((0, 0), (0, NPAD - N)), constant_values=jnp.inf)

    # control
    timeit("dist_min", chain(lambda q, b, s: jnp.min(dist(q, b, s), axis=-1)))
    # + block-minima reshape reduce only
    timeit(
        "dist_blockmin",
        chain(lambda q, b, s: jnp.min(pad(dist(q, b, s)).reshape(1, G, 128), axis=-1)),
    )
    # + top_k over the minima (no gather/final stage)
    def bm_topk(q, b, s):
        mins = jnp.min(pad(dist(q, b, s)).reshape(1, G, 128), axis=-1)
        return jax.lax.top_k(-mins, K)

    timeit("blockmin_topk", chain(bm_topk))
    # full hierarchical (sort + gather + final top_k)
    timeit("dist_hier_topk", chain(lambda q, b, s: topk_ascending(dist(q, b, s), K)))
    # hardware approximate selection
    timeit(
        "dist_approx",
        chain(lambda q, b, s: jax.lax.approx_min_k(dist(q, b, s), K, recall_target=0.99)),
    )
    # plain full top_k for reference
    timeit("dist_full_topk", chain(lambda q, b, s: jax.lax.top_k(-dist(q, b, s), K)))


if __name__ == "__main__":
    sys.exit(main())
