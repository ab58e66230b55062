"""Extended fuzz campaign: drive the API and differential fuzzers far past
their CI seed ranges.

The CI suite runs 10 API seeds and 9 differential seeds on every push;
this tool runs hundreds (default 140 + 41) as an on-demand soak. It found
a real engine bug CI missed (the bf16 normalized-cosine fast-path
deviation, round 3 — see STATUS.md "Late-r3 extended fuzz campaign").

Usage (CPU backend, ~15-20 min at the defaults):
    python tools/fuzz_campaign.py
    python tools/fuzz_campaign.py --api-seeds 500 --diff-seeds 100
The differential half needs the compiled C reference
(/tmp/refbuild/vector.so — see .claude/skills/verify/SKILL.md); it is
skipped with a notice when absent.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tests.conftest  # noqa: F401  (forces CPU backend + 8 virtual devices)
from tests import test_fuzz_api, test_fuzz_differential


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--api-seeds", type=int, default=140,
                   help="API-fuzzer seeds, starting at --api-start")
    p.add_argument("--diff-seeds", type=int, default=40,
                   help="differential seeds, starting at --diff-start")
    p.add_argument("--api-start", type=int, default=10,
                   help="first API seed (CI covers 0-9; past campaigns "
                   "covered 10-590 — raise this to explore fresh seeds)")
    p.add_argument("--diff-start", type=int, default=8,
                   help="first differential seed (CI covers 0-7; past "
                   "campaigns covered 8-168)")
    p.add_argument("--progress-every", type=int, default=20)
    args = p.parse_args()

    fails: list[tuple[str, object, str]] = []

    def run(kind, fn, seed):
        with tempfile.TemporaryDirectory() as d:
            try:
                fn(pathlib.Path(d), seed)
            except Exception:
                fails.append((kind, seed, traceback.format_exc()))
                print(f"FAIL {kind} seed={seed}", flush=True)

    for seed in range(args.api_start, args.api_start + args.api_seeds):
        run("api", test_fuzz_api.test_api_op_sequences, seed)
        if seed % args.progress_every == 0:
            print(f"api seed {seed} done", flush=True)

    have_ref = os.path.exists("/tmp/refbuild/vector.so")
    if have_ref:
        for seed in (
            list(range(args.diff_start, args.diff_start + args.diff_seeds))
            + ["mesh"]
        ):
            run(
                "diff",
                test_fuzz_differential.test_differential_op_sequences,
                seed,
            )
            if isinstance(seed, int) and seed % args.progress_every == 0:
                print(f"diff seed {seed} done", flush=True)
    else:
        print("differential half SKIPPED: /tmp/refbuild/vector.so not built")

    print(f"campaign done: {len(fails)} failures "
          f"({args.api_seeds} api + "
          f"{(args.diff_seeds + 1) if have_ref else 0} diff seeds)")
    for kind, seed, tb in fails[:5]:
        print("=" * 60, kind, seed)
        print(tb[-3000:])
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
