"""Incremental corpus refresh with data_transform_spark (round-10 surface).

The nightly shape of a production training-data pipeline: yesterday's
corpus is PUBLISHED (manifest + dedup stores + ANN index all staged);
today a new crawl batch arrives, and every expensive structure updates
INCREMENTALLY — historical text is never rescanned and no quantizer ever
retrains:

    1. corpus manifest        — prove which corpus state the stores match
    2. exact-doc dedup        - new batch vs the historical hash store
    3. substring dedup        - new batch vs the staged digest store
    4. near-dup (MinHash)     - new batch vs the staged band+digest store
    5. scrub + gate the survivors (PII redaction, trained NB quality)
    6. store update           - novel digests append for tomorrow's run
    7. ANN index append       - new vectors encode against the staged
                                IVF-PQ index (zero Lloyd passes)

Run:  python examples/incremental_refresh.py [sf_dir]   (default sf0.001)

The "history" partition is doc_id % 10 < 8 and the "new batch" is
doc_id % 10 >= 8 — the registered keys' split convention, standing in
for yesterday/today. Every stage is the same hash-verified operator the
driver checks; this script wires them into the refresh loop and prints
the per-stage audit a scheduler would log.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import data_transform_spark.operators  # noqa: E402,F401
import data_transform_spark.pipeline  # noqa: E402,F401
from data_transform_spark.io import load_table  # noqa: E402
from data_transform_spark.operators.etl import corpus_manifest  # noqa: E402
from data_transform_spark.pipeline.curation import quality_nb  # noqa: E402
from data_transform_spark.pipeline.dedup import (  # noqa: E402
    dedup_incremental,
    dedup_minhash_incr,
    text_substring_dedup_incr,
    text_substring_store_update,
)
from data_transform_spark.pipeline.similarity import (  # noqa: E402
    sim_ann_index_append,
)
from data_transform_spark.pipeline.text import pii_scrub  # noqa: E402
from data_transform_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental-refresh")

    # 1. manifest: the precondition for trusting every staged store below.
    #    A scheduler compares this against the manifest published with the
    #    stores; a mismatch means rebuild, not refresh.
    manifest = {r.source: r for r in corpus_manifest(spark, sf_dir).collect()}
    print(f"[1] manifest: {len(manifest) - 1} sources, "
          f"corpus digest {manifest['*'].corpus_md5[:12]}…, "
          f"{manifest['*'].n_docs} docs / {manifest['*'].n_tokens} tokens")

    # 2-4. the incremental dedup ladder — each tier consults only its
    #      staged store; history text is never re-read.
    exact_fresh = dedup_incremental(spark, sf_dir).count()
    print(f"[2] exact-doc  : {exact_fresh} batch docs novel vs hash store")

    sub = text_substring_dedup_incr(spark, sf_dir)
    sub_stats = sub.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_removed").alias("removed"),
        F.sum("n_tokens").alias("total"),
    ).collect()[0]
    print(f"[3] substring  : {sub_stats.removed}/{sub_stats.total} batch "
          f"tokens removed as already-published passages")

    near = dedup_minhash_incr(spark, sf_dir).count()
    print(f"[4] near-dup   : {near} verified pairs involve the batch")

    # 5. scrub + score the batch survivors (stateless + trained stages)
    batch = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 >= 8
    )
    scrubbed = pii_scrub(batch.select("doc_id", "text"))
    n_dirty = scrubbed.filter(
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
    ).count()
    kept = (
        quality_nb(spark, sf_dir)
        .filter((F.col("doc_id") % 10 >= 8) & F.col("pred"))
        .count()
    )
    print(f"[5] scrub+gate : {n_dirty} batch docs carried PII spans; "
          f"{kept} pass the trained quality gate")

    # 6. store update: tomorrow's run dedups against history ∪ today
    upd = text_substring_store_update(spark, sf_dir).collect()[0]
    print(f"[6] store      : +{upd.n_batch_novel} novel digests "
          f"({upd.n_hist} -> {upd.n_total})")

    # 7. ANN index append: new vectors encode against the staged index
    row = sim_ann_index_append(spark, sf_dir).collect()[0]
    print(f"[7] ann append : +{row.n_append_codes} code rows "
          f"(staged {row.n_hist_codes}), recall_ok={row.recall_ok}")

    spark.stop()


if __name__ == "__main__":
    main()
