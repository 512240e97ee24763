"""Flagship query (SURVEY.md §7.2): pricing summary ⋈ regional star rollup.

One DataFrame proving scan → filter → project → 5-way join → agg → join →
sort. Dimensions are broadcast; lineitem is scanned once per branch with
pushed-down predicates; the final result is tiny (flag × status × region).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_transform_spark.io import load_table


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # exact decimal sums: order-independent across partial-agg merge orders
    disc_dec = disc_price.cast("decimal(18,6)")

    pricing = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(disc_dec).cast("double").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

    star = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "l_returnflag", "l_linestatus")
        .agg(F.sum(disc_dec).cast("double").alias("regional_revenue"))
    )

    return pricing.join(star, ["l_returnflag", "l_linestatus"]).orderBy(
        "r_name", "l_returnflag", "l_linestatus"
    )
