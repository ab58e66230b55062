"""Recall-measurement workflow (QUANTIZATION.md:43-77 methodology).

The reference documents recall measurement as a SQL recipe joining
vector_full_scan against vector_quantize_scan and counting overlapping
rowids. This tool reproduces that workflow natively:

    from sqlite_vector_tpu.tools.recall import measure_recall
    report = measure_recall(dataset, queries, k=20)
    # report.recall > 0.95 expected (API.md:255)

and as a CLI over synthetic or .npy data:

    python -m sqlite_vector_tpu.tools.recall --n 100000 --dim 384 --k 20
"""

from __future__ import annotations

import dataclasses

import numpy as np

from sqlite_vector_tpu.dataset import Dataset


@dataclasses.dataclass
class RecallReport:
    k: int
    n_queries: int
    match_count: int
    total_count: int

    @property
    def recall(self) -> float:
        return self.match_count / self.total_count if self.total_count else 1.0

    def __str__(self) -> str:
        return (
            f"recall@{self.k}: {self.recall:.4f} "
            f"({self.match_count}/{self.total_count} over "
            f"{self.n_queries} queries)"
        )


def measure_recall(
    dataset: Dataset, queries: np.ndarray, k: int = 20
) -> RecallReport:
    """Exact-vs-quantized neighbor overlap, the reference's recall metric.

    Queries run through both scan paths; recall = |exact ∩ approx| / |exact|
    summed over queries (match_count/total_count, QUANTIZATION.md:60-77).
    """
    queries = np.atleast_2d(np.asarray(queries))
    exact_ids, _ = dataset.search(queries, k)
    approx_ids, _ = dataset.search(queries, k, exact=False)
    match = total = 0
    for e_row, a_row in zip(exact_ids, approx_ids):
        e = set(int(i) for i in e_row if i >= 0)
        a = set(int(i) for i in a_row if i >= 0)
        match += len(e & a)
        total += len(e)
    return RecallReport(
        k=k, n_queries=len(queries), match_count=match, total_count=total
    )


def main() -> None:
    import argparse

    from sqlite_vector_tpu.types import QuantType

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--queries", type=int, default=64)
    p.add_argument("--metric", default="L2")
    p.add_argument("--qtype", default="AUTO", choices=["AUTO", "INT8", "UINT8"])
    p.add_argument("--data", help=".npy file with [N, dim] vectors (else synthetic)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    if args.data:
        data = np.load(args.data).astype(np.float32)
        args.n, args.dim = data.shape
    else:
        # clustered synthetic data: more realistic than iid gaussian
        centers = rng.standard_normal((32, args.dim)).astype(np.float32) * 2
        assign = rng.integers(0, 32, args.n)
        data = centers[assign] + rng.standard_normal(
            (args.n, args.dim)
        ).astype(np.float32)

    from sqlite_vector_tpu import VectorStore

    store = VectorStore()
    ds = store.create(
        "recall", f"dimension={args.dim},type=FLOAT32,distance={args.metric}"
    )
    ds.add(data)
    qt = QuantType.AUTO if args.qtype == "AUTO" else QuantType.from_name(args.qtype)
    ds.quantize(qtype=qt)
    queries = data[rng.integers(0, args.n, args.queries)]
    report = measure_recall(ds, queries, args.k)
    print(report)
    print(f"quant params: {ds.quant_params}")


if __name__ == "__main__":
    main()
