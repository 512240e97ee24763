"""10x scale measurements for the round-11 families (r11 VERDICT #6).

Measures, on the scale_pairs 10x embeddings fixture (sf0.1's 2 000
vectors, 10 re-keyed copies -> 20 000):

- dedup_semdedup — the Sigma n_c^2 claim: within-cluster pair volume and
  wall at 1x/10x under the shipped fixed K, and at 10x with K ~= sqrt(N)
  (the documented 100 TB knob) to show the linearity restoration.
- train_triplet_mine — partial-argmax row bound: wall + output rows at
  1x/10x (the shuffle carries <= 2*|anchors| winner rows per Arrow
  batch; the N^2 gemm stays inside BLAS — the scale_pairs story).
- sim_ann_recall_curve — candidate volume per probe level: wall at
  1x/10x (candidates = |Q| * (N/K) * max_p, linear in N for a fixed
  query panel).

Protocol: 1 warm rep then median of 3 (single timed rep for tiers
expected over ~60 s, flagged in the output). Results go into SCALING.md
"Round-12 linearity measurements".
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

import data_transform_spark.pipeline.similarity as sim  # noqa: E402
from data_transform_spark.session import get_spark  # noqa: E402
from tools.scale_pairs import SF_DIR, materialize_10x  # noqa: E402


def timed(fn, reps: int = 3):
    fn()  # warm
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    return round(statistics.median(walls), 2), out


def cluster_pairs(spark, sf_dir: str) -> int:
    """Sigma n_c*(n_c-1)/2 over the semdedup assignment — the exact
    within-cluster candidate-pair volume the key verifies."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    _, assign = sim._sem_kmeans(e)
    sizes = assign.groupBy("c_id").count().collect()
    return int(sum(r["count"] * (r["count"] - 1) // 2 for r in sizes))


def main() -> None:
    spark = get_spark("scale-r11")
    ten_dir = materialize_10x(spark)
    n1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    n10 = spark.read.parquet(f"{ten_dir}/embeddings.parquet").count()
    print(f"tiers: 1x={n1} vecs, 10x={n10} vecs", flush=True)

    # --- dedup_semdedup: Sigma n_c^2 at fixed K, then K ~= sqrt(N) ------
    for tier, d in (("1x", SF_DIR), ("10x", ten_dir)):
        pairs = cluster_pairs(spark, d)
        reps = 3 if tier == "1x" else 1
        w, _ = timed(lambda: sim.dedup_semdedup(spark, d).count(), reps)
        print(
            f"semdedup {tier} K={sim.SEM_K}: wall={w}s (reps={reps}) "
            f"pairs={pairs}",
            flush=True,
        )
    old_k = sim.SEM_K
    try:
        sim.SEM_K = 141  # ~= sqrt(20 000) — the documented scale knob
        pairs = cluster_pairs(spark, ten_dir)
        w, _ = timed(lambda: sim.dedup_semdedup(spark, ten_dir).count(), 1)
        print(
            f"semdedup 10x K=141: wall={w}s (reps=1) pairs={pairs}",
            flush=True,
        )
    finally:
        sim.SEM_K = old_k

    # --- train_triplet_mine: partial-argmax rows --------------------------
    for tier, d in (("1x", SF_DIR), ("10x", ten_dir)):
        w, _ = timed(lambda: sim.train_triplet_mine(spark, d).count(), 3)
        rows = sim.train_triplet_mine(spark, d).count()
        print(f"triplet {tier}: wall={w}s out_rows={rows}", flush=True)

    # --- sim_ann_recall_curve: candidates per probe level ----------------
    for tier, d in (("1x", SF_DIR), ("10x", ten_dir)):
        w, _ = timed(lambda: sim.sim_ann_recall_curve(spark, d).count(), 3)
        print(f"recall_curve {tier}: wall={w}s", flush=True)


if __name__ == "__main__":
    main()
