"""Pallas manual-DMA kernel sweep (VERDICT round-1 item 2).

Round 1 measured the manual multi-buffered kernel plateauing at ~175 GB/s
while XLA sustains 350-500 GB/s on the identical access pattern. Sweep
(nbuf, vmem_budget) -> tile_n combinations; each config runs in its OWN
subprocess because the kernel reads the env at trace time.

Usage: python tools/probe_pallas_sweep.py            # run the sweep
       python tools/probe_pallas_sweep.py one <nbuf> <budget_mb>
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(nbuf: int, budget_mb: int) -> None:
    os.environ["SVT_PALLAS_NBUF"] = str(nbuf)
    os.environ["SVT_PALLAS_VMEM_BUDGET"] = str(budget_mb * 1024 * 1024)
    os.environ["SVT_PALLAS_MANUAL"] = "1"

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sqlite_vector_tpu.ops.pallas_scan import pallas_scan_topk
    from sqlite_vector_tpu.types import DistanceMetric

    N, D, K, M = 1_000_000, 384, 20, 16
    rng = np.random.default_rng(7)
    base = jax.device_put(rng.standard_normal((N, D)).astype(np.float32))
    qs = jax.device_put(rng.standard_normal((M, 1, D)).astype(np.float32))

    @jax.jit
    def run(qs, b):
        def step(c, q):
            vals, idx = pallas_scan_topk(
                q + c * 0, b, DistanceMetric.SQUARED_L2, K, valid_count=N
            )
            return vals[0, 0], (vals[0], idx[0])

        _, outs = jax.lax.scan(step, jnp.float32(0), qs)
        return outs

    out = run(qs, base)
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)
    t0 = time.time()
    for _ in range(3):
        out = run(qs, base)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)
    dt = (time.time() - t0) / 3 / M
    print(
        f"nbuf={nbuf:2d} budget={budget_mb:3d}MB : {dt*1e3:7.3f} ms/scan "
        f"{N*D*4/dt/1e9:6.0f} GB/s",
        flush=True,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        return run_one(int(sys.argv[2]), int(sys.argv[3]))
    configs = [
        (2, 8),   # tile 1024 (round-1 shapes)
        (4, 8),   # tile 1024  (round-1 default)
        (8, 8),   # tile 512
        (4, 16),  # tile 2048
        (8, 16),  # tile 1024, deeper pipeline
        (16, 16), # tile 512, deepest
        (4, 32),  # tile 4096
        (2, 32),  # tile 8192 (max)
    ]
    for nbuf, mb in configs:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one", str(nbuf), str(mb)],
            check=False,
        )


if __name__ == "__main__":
    main()
