"""TPU probe: why is the int8 scan at 1/3 of the f32 path's bandwidth?

Variants (1M x 384, B=1, device-side chained timing):
  f32_full   : current f32 exact scan (bandwidth reference)
  i8_full    : current int8 fused scan (the slow path under test)
  i8_dot_min : int8 dot_general->int32 + row-min only (isolates the matmul)
  bf16_dot_min: codes cast to bf16 IN-GRAPH + bf16 matmul (f32 accum) + min
  bf16p_dot_min: persistent bf16 copy of codes (cast outside) + matmul + min
  i8_full_bf16mm: full fused scan but with the bf16-cast matmul formulation

Integer exactness of the bf16 trick: int8 values are exactly representable
in bf16 (integers up to 256); the MXU multiplies exactly and accumulates in
f32, where partial sums stay < 2^24 for dim*127^2 < 2^24 (dim <= 1040) —
so results are bit-equal to the int32 path at dim=384.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.scan import fused_scan_topk
    from sqlite_vector_tpu.ops.topk import topk_ascending
    from sqlite_vector_tpu.types import DistanceMetric

    N, D, K, M = 1_000_000, 384, 20, 32
    rng = np.random.default_rng(7)
    print("generating...", flush=True)
    f32 = rng.standard_normal((N, D)).astype(np.float32)
    codes = rng.integers(-128, 128, (N, D)).astype(np.int8)
    q32 = rng.standard_normal((M, 1, D)).astype(np.float32)
    qi8 = rng.integers(-128, 128, (M, 1, D)).astype(np.int8)

    dev_f32 = jax.device_put(f32)
    dev_i8 = jax.device_put(codes)
    dev_bf16 = jax.device_put(codes.astype(jnp.bfloat16))
    dev_q32 = jax.device_put(q32)
    dev_qi8 = jax.device_put(qi8)
    print("uploaded", flush=True)

    def chain(body, qs, *args):
        @jax.jit
        def run(qs, *a):
            def step(c, q):
                out = body(q, *a)
                return c, jax.tree.map(lambda x: x[0] if x.ndim > 1 else x, out)

            _, outs = jax.lax.scan(step, jnp.float32(0), qs)
            return outs

        return run

    def timeit(name, fn, *args, nbytes):
        out = fn(*args)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)  # sync
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = fn(*args)
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf)
        dt = (time.time() - t0) / reps / M
        print(
            f"{name:18s} {dt*1e3:7.3f} ms/scan  {nbytes/dt/1e9:6.0f} GB/s",
            flush=True,
        )
        return dt

    def idot(q, b):
        return jax.lax.dot_general(
            q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    def bdot(q, b):
        return jax.lax.dot_general(
            q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    # full current paths
    f32_full = chain(
        lambda q, b: fused_scan_topk(q, b, DistanceMetric.L2, K, valid_count=N),
        dev_q32,
    )
    i8_full = chain(
        lambda q, b: fused_scan_topk(q, b, DistanceMetric.L2, K, valid_count=N),
        dev_qi8,
    )
    # isolated matmul + min
    i8_dot_min = chain(lambda q, b: jnp.min(idot(q, b), axis=-1), dev_qi8)
    bf16_dot_min = chain(
        lambda q, b: jnp.min(
            bdot(q.astype(jnp.bfloat16), b.astype(jnp.bfloat16)), axis=-1
        ),
        dev_qi8,
    )
    bf16p_dot_min = chain(
        lambda q, b: jnp.min(bdot(q.astype(jnp.bfloat16), b), axis=-1), dev_qi8
    )

    # full int8 scan with the bf16-cast matmul + int32-exact L2 assembly
    def i8_bf16_scan(q, b, bsq):
        dot = bdot(q.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
        qi = q.astype(jnp.int32)
        qsq = jnp.sum(qi * qi, axis=-1, keepdims=True).astype(jnp.float32)
        d = qsq + bsq.astype(jnp.float32)[None, :] - 2.0 * dot
        vals, idx = topk_ascending(d, K)
        return vals, idx

    bsq_i = jnp.sum(
        dev_i8.astype(jnp.int32) * dev_i8.astype(jnp.int32), axis=-1
    )
    i8_full_bf16 = chain(lambda q, b, s: i8_bf16_scan(q, b, s), dev_qi8)

    nb_f32, nb_i8 = N * D * 4, N * D * 1
    print("compiling + timing (each first call is a slow remote compile)...")
    timeit("f32_full", f32_full, dev_q32, dev_f32, nbytes=nb_f32)
    timeit("i8_full", i8_full, dev_qi8, dev_i8, nbytes=nb_i8)
    timeit("i8_dot_min", i8_dot_min, dev_qi8, dev_i8, nbytes=nb_i8)
    timeit("bf16_dot_min", bf16_dot_min, dev_qi8, dev_i8, nbytes=nb_i8)
    timeit("bf16p_dot_min", bf16p_dot_min, dev_qi8, dev_bf16, nbytes=N * D * 2)
    timeit("i8_full_bf16mm", i8_full_bf16, dev_qi8, dev_i8, bsq_i, nbytes=nb_i8)

    # exactness check of the bf16 formulation vs the int32 path
    qd = dev_qi8[0]
    exact = np.asarray(idot(qd, dev_i8[:4096]))
    viabf = np.asarray(
        bdot(qd.astype(jnp.bfloat16), dev_i8[:4096].astype(jnp.bfloat16))
    ).astype(np.int64)
    print("bf16 dot exact:", bool((exact == viabf).all()))


if __name__ == "__main__":
    sys.exit(main())
