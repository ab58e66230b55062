"""TPU probe 4: B=1 layout tricks + batched per-query costs.

  i8_b1_ctl      : int8 dot+min, codes [N, d]        (B=1 floor control)
  i8_b1_T        : int8 dot+min, codes stored [d, N] (transposed layout)
  i8_full_b1     : current full int8 scan, B=1
  i8_full_b64    : current full int8 scan, 64 queries/dispatch (per query)
  f32_full_b8    : f32 full scan, 8 queries/dispatch (per query)
  f32_full_b64   : f32 full scan, 64 queries/dispatch (per query)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.scan import fused_scan_topk
    from sqlite_vector_tpu.types import DistanceMetric

    N, D, K = 1_000_000, 384, 20
    rng = np.random.default_rng(7)
    f32 = rng.standard_normal((N, D)).astype(np.float32)
    codes = rng.integers(-128, 128, (N, D)).astype(np.int8)
    dev_f32 = jax.device_put(f32)
    dev_i8 = jax.device_put(codes)
    dev_i8T = jax.device_put(np.ascontiguousarray(codes.T))
    bsq = jnp.sum(dev_i8.astype(jnp.int32) * dev_i8.astype(jnp.int32), axis=-1)
    print("uploaded", flush=True)

    def chain(body, batch):
        @jax.jit
        def run(qs, b, s):
            def step(c, q):
                out = body(q + (c * 0).astype(q.dtype), b, s)
                return (
                    jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32),
                    out,
                )

            _, outs = jax.lax.scan(step, jnp.float32(0), qs)
            return outs

        return run

    def timeit(name, fn, qs, b, s, per):
        out = fn(qs, b, s)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)
        t0 = time.time()
        for _ in range(3):
            out = fn(qs, b, s)
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf)
        dt = (time.time() - t0) / 3 / per
        print(f"{name:14s} {dt*1e3:7.3f} ms/query", flush=True)

    def idot(q, b):
        return jax.lax.dot_general(
            q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    def idotT(q, bT):
        return jax.lax.dot_general(
            q, bT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    M = 32
    qi8 = jax.device_put(rng.integers(-128, 128, (M, 1, D)).astype(np.int8))
    qi8_b64 = jax.device_put(
        rng.integers(-128, 128, (2, 64, D)).astype(np.int8)
    )
    q32_b8 = jax.device_put(f32[: 4 * 8].reshape(4, 8, D))
    q32_b64 = jax.device_put(f32[: 2 * 64].reshape(2, 64, D))

    timeit("i8_b1_ctl", chain(lambda q, b, s: jnp.min(idot(q, b), axis=-1), 1),
           qi8, dev_i8, bsq, M)
    timeit("i8_b1_T", chain(lambda q, b, s: jnp.min(idotT(q, b), axis=-1), 1),
           qi8, dev_i8T, bsq, M)
    full = lambda q, b, s: fused_scan_topk(  # noqa: E731
        q, b, DistanceMetric.SQUARED_L2, K, valid_count=N, base_sq_norms=s
    )
    timeit("i8_full_b1", chain(full, 1), qi8, dev_i8, bsq, M)
    timeit("i8_full_b64", chain(full, 64), qi8_b64, dev_i8, bsq, 128)
    f32full = lambda q, b, s: fused_scan_topk(  # noqa: E731
        q, b, DistanceMetric.SQUARED_L2, K, valid_count=N
    )
    timeit("f32_full_b8", chain(f32full, 8), q32_b8, dev_f32, None, 32)
    timeit("f32_full_b64", chain(f32full, 64), q32_b64, dev_f32, None, 128)


if __name__ == "__main__":
    sys.exit(main())
