"""TPU probe 5: B=1 epilogue on packed 1-D [N] arrays.

A [1, N] intermediate is physically padded to 8 sublanes (8x traffic for
every epilogue pass); a 1-D [N] array packs vregs densely. Squeeze the
distance row once and run block-minima/top-k in 1-D.

  f32_cur  : current fused_scan_topk          (baseline)
  f32_1d   : squeeze + 1-D epilogue
  i8_cur   : current int8 fused_scan_topk
  i8_1d    : int8, 1-D epilogue
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

    N, D, K, M = 1_048_576, 384, 20, 32  # N already a multiple of 128
    G = N // 128
    rng = np.random.default_rng(7)
    f32 = rng.standard_normal((N, D)).astype(np.float32)
    codes = rng.integers(-128, 128, (N, D)).astype(np.int8)
    dev_f32 = jax.device_put(f32)
    dev_i8 = jax.device_put(codes)
    q32 = jax.device_put(f32[:M][:, None, :])
    qi8 = jax.device_put(rng.integers(-128, 128, (M, 1, D)).astype(np.int8))
    bsq_f = jnp.sum(dev_f32 * dev_f32, axis=-1)
    bsq_i = jnp.sum(dev_i8.astype(jnp.int32) * dev_i8.astype(jnp.int32), axis=-1)
    print("uploaded", flush=True)

    def chain(body):
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

    def timeit(name, fn, qs, b, s):
        out = fn(qs, b, s)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)
        t0 = time.time()
        for _ in range(3):
            out = fn(qs, b, s)
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf)
        dt = (time.time() - t0) / 3 / M
        print(f"{name:8s} {dt*1e3:7.3f} ms/query", flush=True)

    def topk1d(d, k):
        """1-D hierarchical exact top-k: [N] -> (vals [k], idx [k])."""
        mins = jnp.min(d.reshape(G, 128), axis=-1)  # [G] packed
        _, gidx = jax.lax.top_k(-mins, k)
        gidx = jnp.sort(gidx)
        pos = (gidx[:, None] * 128 + jnp.arange(128, dtype=jnp.int32)).reshape(-1)
        cand = d[pos]  # 1-D gather of k*128 elements
        negv, cpos = jax.lax.top_k(-cand, k)
        return -negv, pos[cpos]

    def scan1d(q, b, s, is_int):
        if is_int:
            dot = jax.lax.dot_general(
                q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )[0]
            qsq = jnp.sum(q.astype(jnp.int32) * q.astype(jnp.int32))
            d = (s - 2 * dot).astype(jnp.float32)
            vals, idx = topk1d(d, K)
            return vals + qsq.astype(jnp.float32), idx
        dot = jax.lax.dot_general(
            q, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[0]
        qsq = jnp.sum(q.astype(jnp.float32) ** 2)
        d = s - 2.0 * dot
        vals, idx = topk1d(d, K)
        return vals + qsq, idx

    cur = lambda q, b, s: fused_scan_topk(  # noqa: E731
        q, b, DistanceMetric.SQUARED_L2, K, valid_count=N, base_sq_norms=s
    )
    timeit("f32_cur", chain(cur), q32, dev_f32, bsq_f)
    timeit("f32_1d", chain(lambda q, b, s: scan1d(q, b, s, False)), q32, dev_f32, bsq_f)
    timeit("i8_cur", chain(cur), qi8, dev_i8, bsq_i)
    timeit("i8_1d", chain(lambda q, b, s: scan1d(q, b, s, True)), qi8, dev_i8, bsq_i)

    # correctness vs current
    v1, i1 = cur(qi8[0], dev_i8, bsq_i)
    v2, i2 = scan1d(qi8[0], dev_i8, bsq_i, True)
    print("i8 1d == cur:", bool((np.asarray(i1)[0] == np.asarray(i2)).all()),
          bool((np.asarray(v1)[0] == np.asarray(v2)).all()))
    v1, i1 = cur(q32[0], dev_f32, bsq_f)
    v2, i2 = scan1d(q32[0], dev_f32, bsq_f, False)
    print("f32 1d idx == cur:", bool((np.asarray(i1)[0] == np.asarray(i2)).all()))


if __name__ == "__main__":
    sys.exit(main())
