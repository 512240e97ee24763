"""Reshaping + statistical aggregate operators.

unpivot/melt is pivot's inverse (wide → long); the DuckDB twin uses the
portable UNION ALL form so the oracle is dialect-proof. Mode is computed
via count+rank rather than the engines' mode() (whose tie-break is
unspecified on both sides — §5.3.2 determinism rule).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "reshape_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
)
def reshape_unpivot(spark, sf_dir):
    """Wide → long melt of three measure columns (pivot's inverse)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        [
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("discount"),
        ],
        "metric",
        "value",
    )


@register(
    "agg_mode",
    oracle="""
    SELECT user_id, event_type AS modal_type, n
    FROM (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type)
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) = 1
    """,
)
def agg_mode(spark, sf_dir):
    """Most-frequent event_type per user, with a deterministic tie-break
    (count desc, then value asc) — engine mode() leaves ties unspecified."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), "n")
    )


@register(
    "agg_bitwise",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS band, bit_or(user_id) AS bor, bit_xor(user_id) AS bxor
    FROM events GROUP BY event_type
    """,
)
def agg_bitwise(spark, sf_dir):
    """bit_and / bit_or / bit_xor grouped aggregates."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor("user_id").alias("bxor"),
    )


@register(
    "agg_moments",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           ROUND(avg(l_quantity), 6) AS mean,
           ROUND(avg(l_quantity * l_quantity) - avg(l_quantity) * avg(l_quantity), 6) AS m2,
           ROUND(avg(l_quantity * l_quantity * l_quantity)
                 - 3 * avg(l_quantity * l_quantity) * avg(l_quantity)
                 + 2 * avg(l_quantity) * avg(l_quantity) * avg(l_quantity), 4) AS m3
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_moments(spark, sf_dir):
    """Central moments from power sums with IDENTICAL formulas both sides —
    the engines' skewness/kurtosis builtins use different bias corrections
    (verified: 1.138 vs 0.657 on the same 4 values), so moments are the
    portable primitive and any convention is derivable downstream."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    a1 = F.avg(q)
    a2 = F.avg(q * q)
    a3 = F.avg(q * q * q)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(a1, 6).alias("mean"),
        F.round(a2 - a1 * a1, 6).alias("m2"),
        F.round(a3 - 3 * a2 * a1 + 2 * a1 * a1 * a1, 4).alias("m3"),
    )


@register(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regression(spark, sf_dir):
    """OLS aggregates (price ~ quantity), rounded on both engines (§5.3.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@register(
    "agg_mad",
    oracle="""
    WITH med AS (
        SELECT c_mktsegment, median(c_acctbal) AS med
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_mktsegment AS segment,
           round(m.med, 4) AS med,
           round(median(abs(c.c_acctbal - m.med)), 4) AS mad,
           count(*) AS n
    FROM customer c JOIN med m USING (c_mktsegment)
    GROUP BY c.c_mktsegment, m.med
    """,
)
def agg_mad(spark, sf_dir):
    """Robust dispersion per group: median + median-absolute-deviation.

    MAD is inherently two-phase (you need the median before you can rank the
    deviations): phase 1 aggregates the per-group median, phase 2 broadcasts
    that tiny result back onto the fact rows and takes the median of
    |x - med|. Two shuffles on the same group key — at 100 TB the second
    pass re-reads the fact table but shuffles only (key, deviation) pairs,
    and the phase-1 result (one row per group) always broadcasts. Both
    engines interpolate the even-count median identically (midpoint of the
    two central values)."""
    c = load_table(spark, sf_dir, "customer")
    med = c.groupBy("c_mktsegment").agg(F.median("c_acctbal").alias("med"))
    return (
        c.join(F.broadcast(med), "c_mktsegment")
        .groupBy(F.col("c_mktsegment").alias("segment"), "med")
        .agg(
            F.round(F.median(F.abs(F.col("c_acctbal") - F.col("med"))), 4).alias("mad"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("segment", F.round("med", 4).alias("med"), "mad", "n")
    )
