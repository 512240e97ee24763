"""Hot-band-bucket scale measurement for the incremental MinHash store join
(r10 VERDICT #7).

Plants a duplicate-heavy batch against the sf0.1-staged store: K exact
copies of one history doc (all 24 of its band buckets become one hot key
each, candidate fan-out ~24*C(K+1,2) before canonical dedup) vs a uniform
batch of K distinct history texts (baseline bucket load). Times
minhash_incr_pairs end-to-end (count()) with bench.py's warm protocol
(1 warm rep, median of 3) and prints one JSON line for SCALING.md.

Adversarial-bucket posture documented in SCALING.md "Round-11": AQE's
skew-join split handles moderately hot buckets; a truly adversarial bucket
(one key holding a constant fraction of the corpus) is pre-split by
salting the band join key — bucket -> (bucket, sig_hash % S) — which is
recall-lossless here because docs in the same bucket share the band by
construction, so salting only thins VERIFICATION candidates, never the
pigeonhole guarantee.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_transform_spark.io import load_table  # noqa: E402
from data_transform_spark.pipeline.dedup import (  # noqa: E402
    minhash_incr_pairs,
    minhash_stage_store,
)
from data_transform_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("SKEW_K", "500"))


def timed(fn, reps: int = 3) -> float:
    fn()  # warm
    return statistics.median(
        [(lambda t0=time.time(): (fn(), time.time() - t0)[1])() for _ in range(reps)]
    )


def main() -> None:
    spark = get_spark("skew_store")
    staged = minhash_stage_store(spark, SF_DIR)
    hist_bands = spark.read.parquet(f"{staged}/bands")
    hist_sh = spark.read.parquet(f"{staged}/shingles")
    hist = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 10 < 8)
        .orderBy("doc_id")
        .limit(K)
        .collect()
    )
    hot = spark.createDataFrame(
        [(20_000_000 + i, hist[0]["text"]) for i in range(K)],
        "doc_id long, text string",
    ).repartition(32)
    uniform = spark.createDataFrame(
        [(20_000_000 + i, r["text"]) for i, r in enumerate(hist)],
        "doc_id long, text string",
    ).repartition(32)

    out = {"sf_dir": SF_DIR, "k": K}
    for name, batch in [("uniform", uniform), ("hot_bucket", hot)]:
        pairs = None

        def run(b=batch):
            nonlocal pairs
            pairs = minhash_incr_pairs(hist_bands, hist_sh, b).count()

        out[f"{name}_sec"] = round(timed(run), 2)
        out[f"{name}_pairs"] = pairs
    out["hot_over_uniform"] = round(
        out["hot_bucket_sec"] / max(out["uniform_sec"], 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
