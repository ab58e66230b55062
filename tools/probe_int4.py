#!/usr/bin/env python
"""Hardware probe: int4 scan routing + Mosaic compile envelope (round 4).

Times, device-side (M chained scans in one executable, loop-carried, with a
device->host fetch as the sync point — the ~30 ms dispatch RTT never lands
in the numbers):

  - int8 resident code scan (the r3 path; 1 B/elem)        [control]
  - int4 Pallas packed scan (0.5 B/elem, unpack in VMEM)
  - int4 XLA tile loop (0.5 B read + unpacked tile spill)

and probes which (batch, rows) configurations the Mosaic compiler accepts
for the int4 kernel (the supports() fence must reject every config measured
to crash).

Usage: python tools/probe_int4.py [--n 1000000] [--dim 384] [--envelope]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def chained_int4(metric, k, dim, M, force_xla):
    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops import quantize4 as q4

    @jax.jit
    def chained(qs, packed, alpha, csq):
        def body(c, q):
            if force_xla:
                vals, idx = q4._int4_scan_topk_impl(
                    q + c * 0, packed, alpha, csq,
                    jnp.int32(packed.shape[0]), jnp.zeros((0,), bool),
                    metric=metric, k=k, dim=dim,
                    row_tile=q4.INT4_ROW_TILE, has_mask=False,
                )
            else:
                from sqlite_vector_tpu.ops import pallas_int4

                vals, idx = pallas_int4.pallas_int4_scan_topk(
                    q + c * 0, packed, alpha, csq, metric, k, dim=dim,
                    interpret=False,
                )
            return vals[0, 0], (vals[0], idx[0])

        _, outs = jax.lax.scan(body, jnp.float32(0), qs)
        return outs

    return chained


def chained_int8(metric, k, n, M):
    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.scan import fused_scan_topk

    @jax.jit
    def chained(qs, b, sq):
        def body(c, q):
            vals, idx = fused_scan_topk(
                q + (c * 0).astype(q.dtype), b, metric, k,
                valid_count=n, base_sq_norms=sq,
            )
            return vals[0, 0].astype(jnp.float32), (vals[0], idx[0])

        _, outs = jax.lax.scan(body, jnp.float32(0), qs)
        return outs

    return chained


def time_run(fn, args, M, reps=3):
    import jax

    out = fn(*args)  # compile
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)
        best = min(best, (time.perf_counter() - t0) / M)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--batch", type=int, nargs="+", default=[1, 8])
    p.add_argument("--envelope", action="store_true",
                   help="probe the Mosaic compile envelope (large configs)")
    p.add_argument("--skip-control", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops import quantize4 as q4
    from sqlite_vector_tpu.types import DistanceMetric

    n, dim, k = args.n, args.dim, args.k
    rng = np.random.default_rng(1)
    log(f"generating {n}x{dim} f32 on host...")
    data = rng.standard_normal((n, dim), dtype=np.float32)

    log("quantizing (int4 host build)...")
    packed, alpha, csq = q4.quantize4_np(data)
    log("quantizing (int8)...")
    from sqlite_vector_tpu import oracle
    from sqlite_vector_tpu.types import QuantType

    qt, scale, offset = oracle.compute_quant_params(data[:65536], QuantType.I8)
    codes8 = oracle.quantize_fast(data, scale, offset, qt)

    pk_d = jax.device_put(packed)
    al_d = jax.device_put(alpha)
    cs_d = jax.device_put(csq)
    c8_d = jax.device_put(codes8)
    sq8 = jnp.sum(c8_d.astype(jnp.int32) * c8_d.astype(jnp.int32), axis=-1)
    jax.block_until_ready(sq8)
    del data

    metric = DistanceMetric.L2
    M = 8
    for b in args.batch:
        qs_f = rng.standard_normal((M, b, dim)).astype(np.float32)
        qs_dev = jax.device_put(qs_f)
        q8 = np.asarray(
            oracle.quantize(qs_f.reshape(-1, dim), scale, offset, qt)
        ).reshape(M, b, dim)
        q8_dev = jax.device_put(q8)

        if not args.skip_control:
            t8 = time_run(
                chained_int8(metric, k, n, M), (q8_dev, c8_d, sq8), M
            )
            log(f"B={b} int8 XLA    : {t8*1e3:8.3f} ms "
                f"({n*dim/t8/1e9:6.1f} GB/s of codes)")
        try:
            tp = time_run(
                chained_int4(metric, k, dim, M, force_xla=False),
                (qs_dev, pk_d, al_d, cs_d), M,
            )
            log(f"B={b} int4 Pallas : {tp*1e3:8.3f} ms "
                f"({n*dim/2/tp/1e9:6.1f} GB/s packed, "
                f"{n*dim/tp/1e9:6.1f} GB/s int8-equivalent)")
        except Exception as e:
            log(f"B={b} int4 Pallas : COMPILE/RUN FAIL: {str(e)[:160]}")
        try:
            tx = time_run(
                chained_int4(metric, k, dim, M, force_xla=True),
                (qs_dev, pk_d, al_d, cs_d), M,
            )
            log(f"B={b} int4 XLA    : {tx*1e3:8.3f} ms "
                f"({n*dim/2/tx/1e9:6.1f} GB/s packed)")
        except Exception as e:
            log(f"B={b} int4 XLA    : FAIL: {str(e)[:160]}")

    if args.envelope:
        # Mosaic compile envelope: grow rows/batch; report compile ok/fail
        from sqlite_vector_tpu.ops import pallas_int4

        for b, nn in [(8, 4_000_000), (8, 10_000_000), (64, 1_000_000),
                      (64, 4_000_000), (64, 10_000_000), (128, 10_000_000),
                      (256, 1_000_000), (256, 10_000_000)]:
            if nn * ((dim + 1) // 2) > 6_000_000_000:
                log(f"envelope b={b} n={nn}: skipped (exceeds HBM headroom)")
                continue
            pk = jnp.zeros((nn, (dim + 1) // 2), jnp.uint8)
            al = jnp.zeros((nn,), jnp.float32)
            cs = jnp.zeros((nn,), jnp.int32)
            q = jnp.zeros((b, dim), jnp.float32)
            t0 = time.time()
            try:
                out = pallas_int4.pallas_int4_scan_topk(
                    q, pk, al, cs, metric, k, dim=dim, interpret=False
                )
                np.asarray(out[0])
                log(f"envelope b={b} n={nn}: COMPILES+RUNS "
                    f"({time.time()-t0:.0f}s)")
            except Exception as e:
                log(f"envelope b={b} n={nn}: FAIL after {time.time()-t0:.0f}s"
                    f": {str(e)[:140]}")
            del pk, al, cs, q


if __name__ == "__main__":
    main()
