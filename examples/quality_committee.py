"""Quality-committee curation with data_transform_spark (round-11 surface).

The decision layer of a training-data pipeline: three INDEPENDENT quality
signals vote per document, and the corpus ships with an auditable verdict
trail instead of a black-box keep bit:

    1. Gopher rule gate        - hand-built heuristics (word counts,
                                 stopwords, repetition)
    2. trained NB classifier   - supervised weak-label scorer, fit in-plan
    3. DSIR importance weights - target-distribution match

    committee = 2-of-3 majority (quality_ensemble), plus the strict
    conjunction for high-precision shards.

Downstream of the vote, the kept shard gets the standard treatment:
fractional-epoch language upsampling (mix_epochs_upsample) and a
content-addressed manifest (corpus_digest) so tomorrow's run can prove
what it trained on.

Run:  python examples/quality_committee.py [sf_dir]   (default sf0.001)

Every stage is a hash-verified registered operator; this script wires
them into the curation flow and prints the audit a pipeline owner reads.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__  # noqa: E402,F401 — populates the registry
from data_transform_spark import api  # noqa: E402
from data_transform_spark.io import load_table  # noqa: E402
from data_transform_spark.registry import QUERIES  # noqa: E402
from data_transform_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quality-committee")

    # 1. the committee vote (each member independently auditable)
    votes = QUERIES["quality_ensemble"](spark, sf_dir).cache()
    tally = (
        votes.groupBy("n_votes").count().orderBy("n_votes").collect()
    )
    print("committee tally (n_votes -> docs):")
    for r in tally:
        print(f"  {r['n_votes']}: {r['count']}")
    n_major = votes.filter("keep_majority").count()
    n_strict = votes.filter("keep_strict").count()
    print(f"majority keep: {n_major}   strict keep: {n_strict}")

    # 2. member disagreement — where a human should spot-check
    disputed = votes.filter(F.col("keep_majority") != F.col("keep_strict"))
    print(f"disputed docs (majority w/o unanimity): {disputed.count()}")

    # 3. kept shard: majority docs joined back to text
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.join(
        votes.filter("keep_majority").select("doc_id"), "doc_id"
    )

    # 4. language rebalance of the kept shard (fractional-epoch upsample)
    epochs = QUERIES["mix_epochs_upsample"](spark, sf_dir)
    kept_epochs = kept.select("doc_id").join(epochs, "doc_id")
    mix = (
        kept_epochs.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("docs"),
            F.count(F.lit(1)).alias("rows_after_upsample"),
        )
        .orderBy("lang")
    )
    print("kept shard after language upsampling:")
    for r in mix.collect():
        print(f"  {r['lang']}: {r['docs']} docs -> {r['rows_after_upsample']} rows")

    # 5. manifest of exactly what ships
    manifest = api.corpus_digest(kept, group_col="lang").orderBy("lang")
    print("kept-shard manifest (lang, n_docs, n_tokens, corpus_md5):")
    for r in manifest.collect():
        print(f"  {r['lang']}: {r['n_docs']} docs, {r['n_tokens']} tokens, {r['corpus_md5'][:12]}…")

    votes.unpersist()
    print("OK")


if __name__ == "__main__":
    main()
