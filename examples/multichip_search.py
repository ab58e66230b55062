#!/usr/bin/env python
"""Multi-chip vector search over a device mesh.

Demonstrates the distributed serving path: the embedding matrix is row-sharded
over every available chip, each chip runs the fused scan on its local rows,
and only B*k candidates cross the ICI in the all_gather merge.

Run on real hardware, or simulate 8 chips on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/multichip_search.py --cpu
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    import sqlite_vector_tpu as svt

    mesh = svt.make_mesh()
    n_dev = len(jax.devices())
    print(f"mesh: {n_dev} x {jax.devices()[0].platform} devices")

    store = svt.VectorStore(mesh=mesh)
    ds = store.create(
        "sharded", f"dimension={args.dim},type=FLOAT32,distance=L2"
    )
    rng = np.random.default_rng(0)
    data = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    ids = ds.add(data)
    print(f"ingested {args.n} x {args.dim}; "
          f"{ds.memory_bytes() / 1e6:.0f} MB across {n_dev} chips "
          f"(~{ds.memory_bytes() / n_dev / 1e6:.0f} MB/chip)")

    qidx = rng.integers(0, args.n, 8)
    queries = data[qidx]
    t0 = time.time()
    got, dist = ds.search(queries, args.k)
    print(f"batched exact search (first call, incl. compile): "
          f"{time.time() - t0:.2f}s")
    # each query is a database row: it must come back first at distance 0
    assert (got[:, 0] == ids[qidx]).all() and (dist[:, 0] == 0.0).all()
    t0 = time.time()
    got, dist = ds.search(queries, args.k)
    print(f"warm: {(time.time() - t0) * 1000:.1f} ms for 8 queries")

    ds.quantize()
    a_ids, a_dist = ds.search(queries, args.k, exact=False)
    overlap = np.mean([
        len(set(got[i].tolist()) & set(a_ids[i].tolist())) / args.k
        for i in range(len(queries))
    ])
    print(f"int8 path recall@{args.k} vs exact: {overlap:.3f}")


if __name__ == "__main__":
    main()
