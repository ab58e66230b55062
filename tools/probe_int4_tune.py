#!/usr/bin/env python
"""Round-5 knob sweep: manual int4 Pallas kernel (nbuf, tile_rows) at
B=64 x 10M x 768 — one upload, many configs (the env knobs are read at
trace time, so each config is a fresh jit closure over the same resident
arrays). Also re-times the int8 B=64 control ALONE (the combined probe
OOMs with both code sets + the [B,N] int8 intermediate resident).

Usage: python tools/probe_int4_tune.py [--n 10000000] [--dim 768]
           [--batch 64] [--int8-control]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--chain", type=int, default=4)
    p.add_argument("--int8-control", action="store_true",
                   help="time the int8 B=64 scan alone instead (needs "
                   "only the 1 B/elem codes resident)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    n, dim, k, M, B = args.n, args.dim, args.k, args.chain, args.batch
    rng = np.random.default_rng(7)

    def time_run(fn, fargs):
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

    from sqlite_vector_tpu.types import DistanceMetric

    metric = DistanceMetric.L2

    if args.int8_control:
        from sqlite_vector_tpu.ops.scan import fused_scan_topk

        log(f"synthetic int8 codes {n}x{dim} ...")
        codes8 = rng.integers(-127, 128, size=(n, dim), dtype=np.int8)
        c8_d = jax.device_put(codes8)
        sq8 = jax.jit(
            lambda c: jnp.sum(
                c.astype(jnp.int32) * c.astype(jnp.int32), axis=-1
            )
        )(c8_d)
        jax.block_until_ready(sq8)
        del codes8
        qs = jax.device_put(
            rng.integers(-127, 128, size=(M, B, dim)).astype(np.int8)
        )

        @jax.jit
        def chained(qs, c8, sq):
            def body(c, q):
                vals, idx = fused_scan_topk(
                    q + (c * 0).astype(q.dtype), c8, metric, k,
                    valid_count=n, base_sq_norms=sq,
                )
                return vals[0, 0].astype(jnp.float32), (vals[:, 0], idx[:, 0])

            _, outs = jax.lax.scan(body, jnp.float32(0), qs)
            return outs

        t, cs = time_run(chained, (qs, c8_d, sq8))
        log(f"B={B} int8 XLA alone: {t*1e3:8.2f} ms/scan "
            f"({t/B*1e3:.4f} ms/q, {n*dim/t/1e9:6.1f} GB/s codes) "
            f"[compile {cs:.0f}s]")
        return

    from sqlite_vector_tpu.ops import pallas_int4
    from sqlite_vector_tpu.ops import quantize4 as q4

    pw = q4.packed_width(dim)
    log(f"synthetic packed codes {n}x{pw} (int4) ...")
    packed = rng.integers(0, 256, size=(n, pw), dtype=np.uint8)
    alpha = (0.02 + 0.01 * rng.random(n)).astype(np.float32)
    csq = rng.integers(1, 49 * dim, size=(n,), dtype=np.int32)
    pk_d = jax.device_put(packed)
    al_d = jax.device_put(alpha)
    cs_d = jax.device_put(csq)
    jax.block_until_ready(cs_d)
    del packed
    qs_dev = jax.device_put(
        rng.standard_normal((M, B, dim)).astype(np.float32)
    )

    def make_chained():
        @jax.jit
        def chained(qs, pk, al, cs):
            def body(c, q):
                vals, idx = pallas_int4.pallas_int4_scan_topk(
                    q + c * 0, pk, al, cs, metric, k, dim=dim,
                    interpret=False,
                )
                return vals[0, 0], (vals[:, 0], idx[:, 0])

            _, outs = jax.lax.scan(body, jnp.float32(0), qs)
            return outs

        return chained

    configs = [
        (4, None), (2, None), (6, None), (8, None),
        (4, 4096), (4, 8192), (2, 8192), (8, 2048),
    ]
    for nbuf, tile in configs:
        os.environ["SVT_PALLAS_INT4_NBUF"] = str(nbuf)
        if tile is None:
            os.environ.pop("SVT_PALLAS_INT4_TILE_ROWS", None)
        else:
            os.environ["SVT_PALLAS_INT4_TILE_ROWS"] = str(tile)
        try:
            t, cs = time_run(make_chained(), (qs_dev, pk_d, al_d, cs_d))
            log(f"nbuf={nbuf} tile={tile or 'auto'}: {t*1e3:8.2f} ms/scan "
                f"({t/B*1e3:.4f} ms/q, {n*pw/t/1e9:6.1f} GB/s packed) "
                f"[compile {cs:.0f}s]")
        except Exception as e:
            log(f"nbuf={nbuf} tile={tile or 'auto'}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
