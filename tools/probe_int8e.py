"""TPU probe 5 (round 3, VERDICT watch item): fuse the block-minima finish
into the matvec dispatch itself.

Prior probes (probe_int8*.py, STATUS.md table) showed the int8 B=1 scan at
2.5-3.0 ms vs a 1.4-1.6 ms dot+min floor, with four epilogue
reformulations measurement-identical. This probe tests the one shape not
yet tried: codes pre-grouped as [G, 128, D] so XLA can fuse the per-block
min directly into the batched matvec's consumer (the [NPAD] distance
vector is never materialized), then rescore ONLY the k winning blocks
with a second tiny matmul (k*128*D MACs):

  i8_ctl_dotmin : matvec + global min (floor control)
  i8_cur_full   : current fused_scan_topk int path
  i8_grp_min    : grouped matvec + fused block-min only ([G] out; stage-1
                  cost — how much of the epilogue fuses away)
  i8_grp_full   : grouped stage-1 + top_k(G) + gather k code blocks +
                  rescore matmul + final top_k (full result)

Timing: chained lax.scan dispatch (loop-carried q dependence), device
sync via np.asarray — see .claude/skills/verify/SKILL.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.scan import fused_scan_topk
    from sqlite_vector_tpu.types import DistanceMetric

    N, D, K, M = 1_000_000, 384, 20, 16
    NPAD = -(-N // 128) * 128
    G = NPAD // 128
    rng = np.random.default_rng(7)
    codes = rng.integers(-128, 128, (NPAD, D)).astype(np.int8)
    codes[N:] = 0
    qi8 = rng.integers(-128, 128, (M, 1, D)).astype(np.int8)

    dev_i8 = jax.device_put(codes)
    dev_i8g = jax.device_put(codes.reshape(G, 128, D))  # pre-grouped layout
    dev_qi8 = jax.device_put(qi8)
    bsq = jnp.sum(dev_i8.astype(jnp.int32) * dev_i8.astype(jnp.int32), axis=-1)
    bsq = bsq.at[N:].set(jnp.int32(2**30))  # padding rows never win
    bsqg = bsq.reshape(G, 128)
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
        print(
            f"{name:16s} {dt*1e3:7.3f} ms/scan  "
            f"{N*D/dt/1e9:6.0f} GB/s",
            flush=True,
        )

    def idot(q, b):
        return jax.lax.dot_general(
            q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    def gdot(q, bg):
        # [G,128,D] x [1,D] -> [G,128]: contract D, no batch dims (q is
        # broadcast); XLA sees one 3-D contraction instead of matvec+reshape
        return jax.lax.dot_general(
            bg, q[0], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def grp_min(q, bg, sg):
        dp = sg - 2 * gdot(q, bg)  # [G, 128] int32
        return jnp.min(dp, axis=-1)  # fused into the contraction's consumer

    def grp_full(q, bg, sg):
        mins = grp_min(q, bg, sg)  # [G]
        _, gidx = jax.lax.top_k(-mins, K)
        gidx = jnp.sort(gidx, axis=-1)
        cb = jnp.take(bg, gidx, axis=0)  # [K,128,D] code gather (~1 MB)
        csq = jnp.take(sg, gidx, axis=0)  # [K,128]
        cd = csq - 2 * jax.lax.dot_general(
            cb, q[0], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # rescore winners only
        negv, cpos = jax.lax.top_k(-cd.reshape(1, K * 128), K)
        qsq = jnp.sum(q.astype(jnp.int32) * q.astype(jnp.int32), axis=-1)
        vals = (-negv + qsq).astype(jnp.float32)
        flat = (gidx[:, None] * 128 + jnp.arange(128, dtype=jnp.int32)).reshape(
            1, K * 128
        )
        idx = jnp.take_along_axis(flat, cpos, axis=-1)
        return vals, idx

    timeit(
        "i8_ctl_dotmin",
        chain(lambda q, b, s: jnp.min(idot(q, b), axis=-1)),
        dev_qi8, dev_i8, bsq, M,
    )
    timeit(
        "i8_cur_full",
        chain(lambda q, b, s: fused_scan_topk(
            q, b, DistanceMetric.SQUARED_L2, K, valid_count=N,
            base_sq_norms=s,
        )),
        dev_qi8, dev_i8, bsq, M,
    )
    timeit("i8_grp_min", chain(grp_min), dev_qi8, dev_i8g, bsqg, M)
    timeit("i8_grp_full", chain(grp_full), dev_qi8, dev_i8g, bsqg, M)

    # correctness: grouped full == current on one query
    q1 = dev_qi8[0]
    v_cur, i_cur = fused_scan_topk(
        q1, dev_i8, DistanceMetric.SQUARED_L2, K, valid_count=N,
        base_sq_norms=bsq,
    )
    v_g, i_g = grp_full(q1, dev_i8g, bsqg)
    print(
        "grp == current:",
        bool((np.asarray(i_cur) == np.asarray(i_g)).all()),
        bool((np.asarray(v_cur) == np.asarray(v_g)).all()),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
