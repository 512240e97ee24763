"""Repeat-run profiler for individual bench queries at an arbitrary SF.

Usage: python tools/profile_bench.py [-n REPS] [--sf SF_DIR] key [key ...]
Prints per-rep wall times + min/median so regressions can be separated from
machine variance (BASELINE.md claims ±30%).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--warm-sf",
        default="/root/testdata/sf0.001",
        help="warm-up SF dir; skipped if missing or equal to --sf",
    )
    args = ap.parse_args()

    import __spark_entry__ as em
    from data_transform_spark.session import get_spark

    spark = get_spark("profile")
    qs = em.queries()
    warm = os.path.isdir(args.warm_sf) and os.path.abspath(args.warm_sf) != os.path.abspath(args.sf)
    for key in args.keys:
        # codegen warm-up at the smoke SF (same protocol as bench.py)
        if warm:
            qs[key](spark, args.warm_sf).count()
        reps = []
        for _ in range(args.n):
            t0 = time.time()
            qs[key](spark, args.sf).count()
            reps.append(round(time.time() - t0, 3))
        print(
            f"{key}: reps={reps} min={min(reps)} "
            f"median={statistics.median(reps)}"
        )


if __name__ == "__main__":
    main()
