"""§2.G — set operations + canonical dedup (SURVEY.md).

dropDuplicates keeps an arbitrary survivor — useless under a hash oracle —
so dedup_subset picks the canonical survivor (min event_id) via a window,
which is also the deterministic-at-scale pattern (one shuffle on the key).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000
    """,
)
def set_union_all(spark, sf_dir):
    """bag union of two order subsets."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey", "o_orderstatus")
    return a.unionByName(b)


@register(
    "set_union",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 450000
    """,
)
def set_union(spark, sf_dir):
    """deduplicating union of filtered key sets."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 450000).select("o_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_intersect(spark, sf_dir):
    """set intersection of filtered key sets."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.intersect(b)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark, sf_dir):
    """bag intersection preserving multiplicity."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersectAll(b)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def set_except(spark, sf_dir):
    """set difference of customer keys."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.exceptAll(o).distinct()


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except_all(spark, sf_dir):
    """bag (multiset) difference preserving multiplicity."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.exceptAll(b)


@register(
    "dedup_subset",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) = 1
    """,
)
def dedup_subset(spark, sf_dir):
    """Dedup on (user_id, event_type) keeping the canonical min-event_id row."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
    )


@register(
    "set_union_byname",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
           CAST(NULL AS BIGINT) AS nationkey
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE), s_nationkey
    FROM supplier
    """,
)
def set_union_byname(spark, sf_dir):
    """Schema-aligning union: two frames with different column ORDER and
    non-overlapping extras combine by NAME, missing columns null-padded
    (``unionByName(allowMissingColumns=True)``) — the schema-drift-tolerant
    append every multi-source ingest pipeline needs. Positional UNION would
    silently pair mismatched columns; by-name is order-proof and
    narrow-to-wide safe. Pure record concat: zero shuffle at any scale."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),  # extra col, different order
        F.col("s_name").alias("name"),
        F.col("s_suppkey").alias("id"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)
