"""10x scale measurements for the round-13 items (r12 VERDICT #5/#6).

On the scale_chunks 10x documents fixture (sf0.1's 5 000 docs, 10
re-keyed copies -> 50 000; the word VOCABULARY is unchanged by
construction, which mirrors the 100 TB reality — vocabulary grows far
sublinearly in corpus size):

- vocab_unigram_lm — the r12-family trainer with no measured exponent
  yet: corpus scan is the only corpus-sized stage; the hard-EM rounds
  (Viterbi + re-cost) run over DISTINCT words, so their cost should be
  flat at 10x. Also re-runs the full DuckDB hash oracle at 10x (the
  MATERIALIZED-CTE caveat re-verified at scale): the 10x dir is made a
  complete fixture by symlinking the other sf0.1 tables.
- pack_bestfit — per-shard BFD with the r13 bisect pick: 10x docs at
  fixed PACK_SHARDS=8 means 10x docs AND 10x open bins per shard; the
  bisect keeps the per-doc pick O(log bins) so wall should stay ~linear
  (the linear-scan variant would grow quadratically in shard size).
- vocab_bpe vs vocab_bpe_batched — both trainers at 10x: rounds are
  vocabulary-sized, so wall should be scan-dominated and the batched
  trainer's advantage (fewer driver syncs) should persist.

Warm protocol: 1 warm rep then median of 3 (BASELINE.md). Results go to
SCALING.md "Round-13 linearity measurements".
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import data_transform_spark.pipeline.training as tr  # noqa: E402
from data_transform_spark.session import get_spark  # noqa: E402
from tools.scale_chunks import SF_DIR, materialize_10x  # noqa: E402

OTHER_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "embeddings",
]


def complete_fixture(ten_dir: str) -> str:
    """Build a complete single-file fixture dir for the oracle harness:
    DuckDB's view registration reads '<dir>/<table>.parquet' as ONE file,
    while Spark writes documents_10x as a directory of part files — so
    compact the 10x documents into a single parquet via DuckDB and
    symlink the other sf0.1 tables alongside. Returns the oracle-ready
    dir (Spark reads single-file parquet equally well, so run_oracle's
    both engines see identical rows)."""
    import duckdb

    out = os.path.join(os.path.dirname(ten_dir.rstrip("/")),
                       "fixture10x_oracle")
    os.makedirs(out, exist_ok=True)
    single = os.path.join(out, "documents.parquet")
    if not os.path.exists(single):
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{ten_dir}/documents.parquet"
            f"/*.parquet')) TO '{single}' (FORMAT PARQUET)"
        )
    for name in OTHER_TABLES:
        link = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(f"{SF_DIR}/{name}.parquet", link)
    return out


def timed(fn, reps: int = 3):
    fn()  # warm
    walls = []
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    return round(statistics.median(walls), 2), out


def main() -> None:
    spark = get_spark("scale-r13")
    ten_dir = materialize_10x(spark)
    oracle_dir = complete_fixture(ten_dir)
    n1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n10 = spark.read.parquet(f"{ten_dir}/documents.parquet").count()
    print(f"tiers: 1x={n1} docs, 10x={n10} docs", flush=True)

    for tier, d in (("1x", SF_DIR), ("10x", ten_dir)):
        w, _ = timed(lambda: tr.vocab_unigram_lm(spark, d).count())
        print(f"vocab_unigram_lm {tier}: wall={w}s", flush=True)

    for tier, d in (("1x", SF_DIR), ("10x", ten_dir)):
        w, bins = timed(lambda: tr.pack_bestfit(spark, d).count())
        print(f"pack_bestfit {tier}: wall={w}s bins={bins}", flush=True)

    for key in ("vocab_bpe", "vocab_bpe_batched"):
        fn = getattr(tr, key)
        for tier, d in (("1x", SF_DIR), ("10x", ten_dir)):
            w, _ = timed(lambda: fn(spark, d).count())
            print(f"{key} {tier}: wall={w}s", flush=True)

    print(
        "10x oracle fixture ready; run the hash oracle with: "
        f"ORACLE_SF={oracle_dir} python tools/run_oracle.py "
        "vocab_unigram_lm vocab_bpe_batched",
        flush=True,
    )


if __name__ == "__main__":
    main()
