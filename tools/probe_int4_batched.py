#!/usr/bin/env python
"""Round-5 hardware probe: int4 Pallas kernel at BATCH on big-N configs.

The r4 verdict: at B=64 x 10M x 768 the scan is memory-bound again, but
routing sent it to the XLA tile loop (2.5 B/elem effective) because
b_pad*n = 640M exceeded the 128M compile fence — measured 0.764 ms/q vs
int8's 0.806 = 1.06x instead of the ~2x the halved bytes promise. This
probe answers, with synthetic codes (no 30 GB f32 materialization):

  1. does the manual int4 kernel COMPILE at (B, N) beyond the fence?
  2. if so, what does it measure vs the int8 code scan and the XLA int4
     tile loop at the same batch (within-run comparison)?

Timing is device-side: M chained scans in one executable (loop-carried),
one fetch as the sync point, so the tunnel RTT stays out of the numbers.

Usage: python tools/probe_int4_batched.py [--n 10000000] [--dim 768]
           [--batch 64] [--no-int8] [--envelope-only]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--batch", type=int, nargs="+", default=[64])
    p.add_argument("--no-int8", action="store_true")
    p.add_argument("--no-xla-int4", action="store_true")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--chain", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops import pallas_int4
    from sqlite_vector_tpu.ops import quantize4 as q4
    from sqlite_vector_tpu.ops.scan import fused_scan_topk
    from sqlite_vector_tpu.types import DistanceMetric

    n, dim, k, M = args.n, args.dim, args.k, args.chain
    pw = q4.packed_width(dim)
    rng = np.random.default_rng(7)
    metric = DistanceMetric.L2

    log(f"synthetic packed codes {n}x{pw} (int4) ...")
    packed = rng.integers(0, 256, size=(n, pw), dtype=np.uint8)
    alpha = (0.02 + 0.01 * rng.random(n)).astype(np.float32)
    # csq consistent in magnitude with the codes (exactness irrelevant for
    # timing; keep the surrogate finite)
    csq = rng.integers(1, 49 * dim, size=(n,), dtype=np.int32)
    pk_d = jax.device_put(packed)
    al_d = jax.device_put(alpha)
    cs_d = jax.device_put(csq)
    jax.block_until_ready(cs_d)

    c8_d = sq8 = None
    if not args.no_int8:
        log(f"synthetic int8 codes {n}x{dim} ...")
        codes8 = rng.integers(-127, 128, size=(n, dim), dtype=np.int8)
        c8_d = jax.device_put(codes8)
        # jit so the int32 upcast fuses into the reduce — the eager form
        # materializes a 30 GB int32 image of the codes (r4 bench lesson)
        sq8 = jax.jit(
            lambda c: jnp.sum(
                c.astype(jnp.int32) * c.astype(jnp.int32), axis=-1
            )
        )(c8_d)
        jax.block_until_ready(sq8)
        del codes8

# arrays are passed as ARGUMENTS, never closed over: a captured device
    # array becomes an HLO constant, and this tunneled toolchain ships
    # constants to the remote compile service (a closed-over 3.84 GB codes
    # array turned one compile into a 30+ minute hang — r5 lesson)

    @jax.jit
    def chained_pallas(qs, pk, al, cs):
        def body(c, q):
            vals, idx = pallas_int4.pallas_int4_scan_topk(
                q + c * 0, pk, al, cs, metric, k, dim=dim,
                interpret=False,
            )
            return vals[0, 0], (vals[:, 0], idx[:, 0])

        _, outs = jax.lax.scan(body, jnp.float32(0), qs)
        return outs

    @jax.jit
    def chained_xla_int4(qs, pk, al, cs):
        def body(c, q):
            vals, idx = q4._int4_scan_topk_impl(
                q + c * 0, pk, al, cs,
                jnp.int32(n), jnp.zeros((0,), bool),
                metric=metric, k=k, dim=dim,
                row_tile=q4.INT4_ROW_TILE, has_mask=False,
            )
            return vals[0, 0], (vals[:, 0], idx[:, 0])

        _, outs = jax.lax.scan(body, jnp.float32(0), qs)
        return outs

    @jax.jit
    def chained_int8(qs, c8, sq):
        def body(c, q):
            vals, idx = fused_scan_topk(
                q + (c * 0).astype(q.dtype), c8, metric, k,
                valid_count=n, base_sq_norms=sq,
            )
            return vals[0, 0].astype(jnp.float32), (vals[:, 0], idx[:, 0])

        _, outs = jax.lax.scan(body, jnp.float32(0), qs)
        return outs

    def time_run(fn, *fargs):
        t0 = time.time()
        out = fn(*fargs)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*fargs)
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf)
            best = min(best, (time.perf_counter() - t0) / M)
        return best, compile_s

    for b in args.batch:
        qs = jax.device_put(
            rng.standard_normal((M, b, dim)).astype(np.float32)
        )
        jax.block_until_ready(qs)
        bpn = -(-max(b, 8) // 8) * 8 * n
        log(f"--- B={b} N={n} dim={dim} (b_pad*n = {bpn/1e6:.0f}M) ---")

        try:
            t, cs_ = time_run(chained_pallas, qs, pk_d, al_d, cs_d)
            log(f"B={b} int4 Pallas : {t*1e3:8.2f} ms/scan "
                f"({t*1e3/b:7.4f} ms/q, {n*pw/t/1e9:6.1f} GB/s packed) "
                f"[compile {cs_:.0f}s]")
        except Exception as e:
            log(f"B={b} int4 Pallas : FAIL: {str(e)[:300]}")

        if not args.no_xla_int4:
            try:
                t, cs_ = time_run(chained_xla_int4, qs, pk_d, al_d, cs_d)
                log(f"B={b} int4 XLA    : {t*1e3:8.2f} ms/scan "
                    f"({t*1e3/b:7.4f} ms/q, {n*pw/t/1e9:6.1f} GB/s packed) "
                    f"[compile {cs_:.0f}s]")
            except Exception as e:
                log(f"B={b} int4 XLA    : FAIL: {str(e)[:200]}")

        if not args.no_int8:
            q8 = jnp.clip(jnp.round(qs * 20), -127, 127).astype(jnp.int8)
            q8 = jax.device_put(np.asarray(q8))
            try:
                t, cs_ = time_run(chained_int8, q8, c8_d, sq8)
                log(f"B={b} int8 XLA    : {t*1e3:8.2f} ms/scan "
                    f"({t*1e3/b:7.4f} ms/q, {n*dim/t/1e9:6.1f} GB/s codes) "
                    f"[compile {cs_:.0f}s]")
            except Exception as e:
                log(f"B={b} int8 XLA    : FAIL: {str(e)[:200]}")


if __name__ == "__main__":
    main()
