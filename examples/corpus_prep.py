"""End-to-end training-corpus preparation with data_transform_spark.

Composes the library the way a real corpus job does, start to finish:

    scan -> near-dup dedup (minhash survivors) -> language/quality gates
    -> benchmark decontamination -> domain mixing -> weighted sampling
    -> sequence packing -> shard assignment -> partitioned parquet out

Run:  python examples/corpus_prep.py [sf_dir]   (default sf0.001)

Every stage is the same registered operator the driver hash-verifies; this
script only wires them together and writes the result. On a cluster,
swap get_spark() for your session and the paths for object-store URIs —
nothing else changes: each stage is a declarative DataFrame transform, so
the whole pipeline is ONE lazy plan until the final write.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import data_transform_spark.operators  # noqa: E402,F401
import data_transform_spark.pipeline  # noqa: E402,F401
from data_transform_spark.io import load_table  # noqa: E402
from data_transform_spark.pipeline.curation import _u01  # noqa: E402
from data_transform_spark.pipeline.dedup import dedup_near_survivors  # noqa: E402
from data_transform_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".scratch", "corpus_out"
    )
    spark = get_spark("corpus-prep")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. near-dup dedup: keep one canonical survivor per minhash cluster
    survivors = dedup_near_survivors(spark, sf_dir).select("doc_id")
    deduped = docs.join(survivors, "doc_id", "left_semi")

    # 2. language + quality gates (same predicates as pipeline_e2e)
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) * 1.0 / n_tok
    gated = deduped.filter(
        F.col("lang").isin("en", "de", "es") & n_tok.between(10, 400) & (ttr >= 0.15)
    )

    # 3. decontamination: drop docs sharing an 8-gram with the benchmark set
    from data_transform_spark.registry import QUERIES

    contaminated = QUERIES["decontaminate_ngram"](spark, sf_dir).select("doc_id")
    clean = gated.join(contaminated, "doc_id", "left_anti")

    # 4. domain mixing then weighted sampling (independent md5 salts)
    mix_rate = F.when(
        F.substring("source", 4, 10).cast("int") < 10, F.lit(0.9)
    ).otherwise(F.lit(0.4))
    mixed = clean.filter(_u01(F.col("doc_id"), ":mix") < mix_rate)
    keep_rate = F.least(F.col("n_chars") / 800.0, F.lit(1.0))
    sampled = mixed.filter(_u01(F.col("doc_id"), ":w") < keep_rate)

    # 5. shard assignment + partitioned write (hive layout, pruned reads)
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 8
    ).alias("shard")
    final = sampled.select("doc_id", "lang", "source", "n_chars", "text", shard)
    final.write.mode("overwrite").partitionBy("shard").parquet(out)

    kept = spark.read.parquet(out)
    print(
        f"{n0} docs -> {kept.count()} kept across "
        f"{kept.select('shard').distinct().count()} shards at {os.path.abspath(out)}"
    )
    per_lang = kept.groupBy("lang").count().orderBy("lang").collect()
    print("per-lang:", {r["lang"]: r["count"] for r in per_lang})


if __name__ == "__main__":
    main()
