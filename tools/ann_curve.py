"""Measure the IVF recall/probes curve — the empirical basis for the
SCALING.md row on tuning ANN recall at runtime.

Recall@5 of sim_ann_ivf_topk(probes=p) vs the exact brute-force top-5,
plus wall time per probe setting, at ORACLE_SF (default sf0.01) and one
confirmation row at sf0.1.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__  # noqa: F401

from data_transform_spark.pipeline.similarity import (
    sim_ann_ivf_topk,
    sim_topk_bruteforce,
)
from data_transform_spark.session import get_spark


def recall(spark, sf, probes):
    exact = sim_topk_bruteforce(spark, sf).select("query_id", "neighbor_id")
    t0 = time.time()
    ann = sim_ann_ivf_topk(spark, sf, probes=probes).select("query_id", "neighbor_id")
    n_hit = exact.join(ann, ["query_id", "neighbor_id"]).count()
    wall = time.time() - t0
    n_exact = exact.count()
    return n_hit / n_exact, wall


def main():
    spark = get_spark("ann-curve")
    for sf in (os.environ.get("ORACLE_SF", "/root/testdata/sf0.01"),):
        for probes in (1, 2, 4, 8, 16):
            r, w = recall(spark, sf, probes)
            print(f"{os.path.basename(sf)} probes={probes:2d} recall@5={r:.3f} wall={w:.2f}s", flush=True)


if __name__ == "__main__":
    main()
