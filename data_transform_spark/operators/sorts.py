"""§2.F — sorts, limits, top-k (SURVEY.md).

Global ORDER BY is a range-partitioned shuffle in Spark; ORDER BY + LIMIT k
is planned as TakeOrderedAndProject (per-partition top-k then merge at the
driver — exactly what you want at 100 TB). Every limited query carries a
unique tiebreak key (§5.3.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "sort_multi",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
    FROM lineitem
    ORDER BY l_returnflag DESC, l_extendedprice ASC, l_orderkey, l_linenumber
    """,
)
def sort_multi(spark, sf_dir):
    """multi-key asc/desc global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag").orderBy(
        F.col("l_returnflag").desc(),
        F.col("l_extendedprice").asc(),
        "l_orderkey",
        "l_linenumber",
    )


@register(
    "sort_nulls",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    ORDER BY o.o_orderkey ASC NULLS LAST, c.c_custkey
    """,
)
def sort_nulls(spark, sf_dir):
    """NULLS LAST ordering over outer-join output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(F.col("o_orderkey").asc_nulls_last(), F.col("c_custkey"))
    )


@register(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def limit_topk(spark, sf_dir):
    """global top-k via ORDER BY + LIMIT (TakeOrderedAndProject)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25 OFFSET 25
    """,
)
def limit_offset(spark, sf_dir):
    """OFFSET pagination under a total order."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(25)
        .limit(25)
    )
