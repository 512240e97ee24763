"""§2.E — window functions (SURVEY.md).

Every window spec carries a total order within its partition (unique tiebreak
key appended — §5.3.2) so results are deterministic and hash-stable. Windows
shuffle once on the partition key; at 100 TB, partitioning on a high-card key
(user_id, custkey) keeps state per-task bounded.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_events, load_table
from data_transform_spark.registry import register


@register(
    "win_row_number",
    oracle="""
    SELECT o_orderkey, o_custkey,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
    """,
)
def win_row_number(spark, sf_dir):
    """row_number per customer ordered by date."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # rank-family outputs are cast to long: Spark emits int32, DuckDB BIGINT
    return o.select(
        "o_orderkey", "o_custkey", F.row_number().over(w).cast("long").alias("rn")
    )


@register(
    "win_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ROUND(percent_rank() OVER w, 6) AS prnk,
           ROUND(cume_dist()    OVER w, 6) AS cdist,
           ntile(4)       OVER w AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)
    """,
)
def win_rank(spark, sf_dir):
    """rank/dense_rank/percent_rank/cume_dist/ntile bundle."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity", "l_orderkey", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           lag(value, 1, -1.0)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value, 1, -1.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def win_lag_lead(spark, sf_dir):
    """lag/lead with defaults per user timeline."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value", 1, -1.0).over(w).alias("prev_value"),
        F.lead("value", 1, -1.0).over(w).alias("next_value"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark, sf_dir):
    """first/last value over an unbounded frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@register(
    "win_running",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(sum(value) OVER w, 4) AS running_sum,
           count(*) OVER w AS running_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_running(spark, sf_dir):
    """running sum/count per user timeline."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 4).alias("running_sum"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@register(
    "win_moving",
    oracle="""
    SELECT event_id, user_id,
           ROUND(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_avg
    FROM events
    """,
)
def win_moving(spark, sf_dir):
    """moving average over a 4-row frame."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("moving_avg")
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_last_hour,
           ROUND(sum(value) OVER w, 4) AS sum_last_hour
    FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_frame(spark, sf_dir):
    """RANGE frame over epoch seconds (range expressed identically both sides)."""
    ev = load_table(spark, sf_dir, "events").withColumn("sec", F.col("ts").cast("long"))
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("sum_last_hour"),
    )


@register(
    "win_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def win_topk_group(spark, sf_dir):
    """Top-3 orders per customer — rank-filter pattern, one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "win_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
    FROM orders
    """,
)
def win_ntile(spark, sf_dir):
    """ntile(4) price quartiles per priority class — equal-height bucketing.

    Total order (price, key) makes bucket assignment deterministic; one
    shuffle on the partition key, identical to every other window here."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_percent_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_percent_rank(spark, sf_dir):
    """percent_rank + cume_dist per priority class.

    Both are small-integer ratios ((rank-1)/(n-1), rank/n) — exact in
    IEEE double in both engines; rounded to 6 for the value hash anyway."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "win_cume_dist",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           cume_dist() OVER (PARTITION BY s_nationkey
                             ORDER BY s_acctbal, s_suppkey) AS cd
    FROM supplier
    """,
)
def win_cume_dist(spark, sf_dir):
    """cume_dist per nation over account balance (unique tiebreak key so the
    cumulative fraction is deterministic). The ratio is position/count over
    small exact integers — bit-identical across engines."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select("s_suppkey", "s_nationkey", F.cume_dist().over(w).alias("cd"))


@register(
    "win_ratio_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           round(o_totalprice / CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey) AS DOUBLE), 6) AS share
    FROM orders
    """,
)
def win_ratio_total(spark, sf_dir):
    """Ratio-to-total: each order's share of its customer's lifetime spend.

    The unbounded-partition sum rides the same single (custkey) shuffle as
    any other window; the partial sums go through DECIMAL(18,2) so the
    per-partition total is exact in any evaluation order (a double window
    sum would make `share` partition-order-dependent — §5.3.1 rule), and
    the final division happens in double on the exact total."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    total = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") / total.cast("double"), 6).alias("share"),
    )


@register(
    "win_islands",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_t
        FROM events
    )
    SELECT user_id, event_type, min(ts) AS island_start,
           count(*) AS island_len
    FROM seq
    GROUP BY user_id, event_type, rn - rn_t
    """,
)
def win_islands(spark, sf_dir):
    """Gaps-and-islands: maximal runs of CONSECUTIVE same-type events per
    user (value-change sessionization, vs ts_sessionize's time-gap rule) —
    "how long do users stay in one activity before switching".

    The classic two-row_number difference: rn (per user) minus rn_t (per
    user+type) is constant exactly within a run, so one grouped aggregate
    over (user, type, rn-rn_t) materializes every island. Both window
    passes AND the final aggregate share the user_id hash partitioning —
    one shuffle total at any scale (plan-pinned)."""
    ev = load_events(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(wu))
        .withColumn("rn_t", F.row_number().over(wt))
        .groupBy("user_id", "event_type", (F.col("rn") - F.col("rn_t")).alias("_g"))
        .agg(
            F.min("ts").alias("island_start"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .drop("_g")
    )


@register(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT user_id, ts, event_id,
           CAST(sum(first_seen) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT)
               AS distinct_types_seen
    FROM flagged
    """,
)
def win_running_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) over a window — which no engine supports
    directly — via the first-occurrence decomposition: flag each (user,
    type)'s first event with one window, then a running sum of flags over
    a second frame on the same (user, ts) sort. "How many distinct
    activities has this user tried so far" at every event.

    Both windows partition on user_id ALONE — the first-seen flag comes
    from a lag over (event_type, ts) order rather than a per-(user, type)
    row_number, because the latter would hash on a different key and cost
    a second exchange. Same flag rows (the first row of each type block in
    (type, ts) order IS that type's earliest event), but the whole query
    is ONE shuffle + two sorts on the reused partitioning (plan-pinned).
    This decomposition is THE scale answer wherever a windowed distinct
    appears — the naive alternative (collect_set over the frame) holds
    per-row state proportional to the frame and blows up on long
    histories."""
    ev = load_events(spark, sf_dir)
    wt = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_type = F.lag("event_type").over(wt)
    return (
        ev.withColumn(
            "first_seen",
            F.when(
                prev_type.isNull() | (prev_type != F.col("event_type")), 1
            ).otherwise(0),
        )
        .withColumn(
            "distinct_types_seen", F.sum("first_seen").over(wr).cast("long")
        )
        .select("user_id", "ts", "event_id", "distinct_types_seen")
    )


@register(
    "win_moving_median",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderkey
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov_median
    FROM orders
    """,
)
def win_moving_median(spark, sf_dir):
    """Moving MEDIAN over a 7-row frame — the robust (outlier-immune)
    counterpart of win_moving's rolling mean, the shape monitoring systems
    use for spiky series. Spark's `percentile` is frame-capable where
    `median` is not (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC); both
    engines linearly interpolate even-sized frames (DuckDB twin:
    quantile_cont), so the rounded values hash-match. Per-frame cost is
    O(frame log frame) — fine for small frames; a 100 TB sliding median
    over large frames would use the two-heap streaming algorithm inside
    applyInPandas instead."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.expr("percentile(o_totalprice, 0.5)").over(w), 4).alias(
            "mov_median"
        ),
    )
