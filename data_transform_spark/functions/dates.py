"""§2.H — date/time function bundles (SURVEY.md).

Dialect traps handled (§5.3.3): Spark dayofweek is 1=Sunday vs DuckDB
0=Sunday (oracle +1); Spark datediff(end,start) vs DuckDB
date_diff('day',start,end); DuckDB date_trunc returns DATE for coarse parts
(cast to TIMESTAMP); DATE-typed outputs are emitted as ISO strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "fn_date_extract",
    oracle="""
    SELECT event_id,
           year(ts) AS y, month(ts) AS mo, day(ts) AS d,
           hour(ts) AS h, minute(ts) AS mi, second(ts) AS s,
           weekofyear(ts) AS wk,
           dayofweek(ts) + 1 AS dow
    FROM events
    """,
)
def fn_date_extract(spark, sf_dir):
    """year/month/day/hour/minute/second/week/dow extraction."""
    ev = load_table(spark, sf_dir, "events")
    # every extract is cast to long: Spark emits int32, DuckDB BIGINT, and a
    # strict schema comparison would flag the width (§5.3 addendum)
    return ev.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.second("ts").cast("long").alias("s"),
        F.weekofyear("ts").cast("long").alias("wk"),
        F.dayofweek("ts").cast("long").alias("dow"),  # 1=Sunday; oracle +1
    )


@register(
    "fn_date_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           -- NOT "+ INTERVAL 30 DAY": DuckDB 1.0.0 CSE merges two different
           -- interval-constant additions on the same column (verified bug),
           -- so the day-shift is done in epoch-microsecond space instead.
           make_timestamp(epoch_us(l_shipdate) + 30 * 86400000000) AS ship_plus_30d,
           l_shipdate + INTERVAL 1 MONTH AS ship_plus_1m,
           CAST(last_day(CAST(l_shipdate AS DATE)) AS VARCHAR) AS month_end,
           date_diff('day', l_shipdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002
    FROM lineitem
    """,
)
def fn_date_arith(spark, sf_dir):
    """date_trunc, interval add, last_day, datediff arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"),
        (F.col("l_shipdate") + F.expr("INTERVAL 30 DAYS")).alias("ship_plus_30d"),
        (F.col("l_shipdate") + F.expr("INTERVAL 1 MONTH")).alias("ship_plus_1m"),
        F.last_day(F.col("l_shipdate").cast("date")).cast("string").alias("month_end"),
        F.datediff(
            F.lit("2002-01-01 00:00:00").cast("timestamp_ntz").cast("date"),
            F.col("l_shipdate").cast("date"),
        ).cast("long").alias("days_to_2002"),
    )


@register(
    "fn_date_epoch",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_sec,
           epoch_us(ts) AS unix_us,
           make_timestamp(epoch_us(ts)) AS ts_roundtrip
    FROM events
    """,
)
def fn_date_epoch(spark, sf_dir):
    """epoch seconds/micros extraction and timestamp round-trip."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("ts").cast("long").alias("unix_sec"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("unix_us"),
        F.timestamp_micros(F.unix_micros(F.col("ts").cast("timestamp")))
        .cast("timestamp_ntz")
        .alias("ts_roundtrip"),
    )
