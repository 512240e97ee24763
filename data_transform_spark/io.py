"""Table loaders for the fixture star schema + events/documents/embeddings.

All tables are plain parquet scans (columnar, footer schemas, predicate
pushdown and column pruning reach the scan automatically). The one special
case is ``events``: its ``ts`` column is physical INT64 TIMESTAMP(NANOS),
which Spark 4.1.2 cannot read natively. Verified recipe (FIXTURES.md):
read with ``spark.sql.legacy.parquet.nanosAsLong=true`` (ts arrives as long
nanoseconds) then ``timestamp_micros(ts div 1000)`` — integer div, because
ns-since-epoch ~1.7e18 exceeds exact double range. This matches DuckDB's
native ns->us truncation exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def path_of(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path_of(sf_dir, "events"))
    # ts: long ns -> timestamp_ntz at microsecond precision (== DuckDB read).
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(path_of(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def spread(df, min_parts: int | None = None):
    """Repartition a DataFrame only when its scan under-parallelizes.

    Single-file fixture tables (documents, embeddings) arrive as ONE input
    split, serializing any expensive per-row map work (shingle explode,
    wide hash aggregates) onto one core. Spreading costs a shuffle of the
    raw rows — trivial next to the map work it parallelizes. At cluster
    scale a 100 TB scan already has ~800k splits, so this is a no-op there
    (the partition count check keeps it from adding a pointless shuffle).
    Row placement does not affect results: every consumer aggregates by key.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
