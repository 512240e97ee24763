"""The last five TPC-H shapes — q2, q11, q16, q20, q21 — completing 22/22.

The fixture has no `partsupp` table, so these queries were previously
skipped as inexpressible. They are expressible: both engines derive the
SAME part-supplier relation from lineitem —

    ps(ps_partkey, ps_suppkey,
       ps_supplycost = min(l_extendedprice / l_quantity),   -- unit price floor
       ps_availqty   = sum(l_quantity))                     -- lifetime volume

min() over identically-computed IEEE doubles is order-independent and
bit-identical across engines, and l_quantity is integer-valued so its double
sum is exact in any order — the derived relation therefore hash-matches
between Spark and DuckDB with no decimal staging. q21's official
l_receiptdate > l_commitdate predicate (columns absent) is swapped for the
available per-row failure marker l_returnflag = 'R', keeping the official
plan shape (multi-supplier EXISTS + sole-failer NOT EXISTS).

At 100 TB the derived ps is one extra shuffle over lineitem on
(partkey, suppkey) — the same key layout a real partsupp scan would have —
and each query's dims broadcast. q21 is rewritten from double self-semi-join
to a single per-order aggregate joined once (Spark-first: one extra pass
beats two shuffled semi-joins; the oracle keeps the EXISTS form to prove
equivalence).

Money sums follow §5.3.1 (tpch_more.py): DECIMAL(18,6) staging before any
partition-order-dependent SUM of non-integer doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


def _dec(col):
    return col.cast("decimal(18,6)")


_PS_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_supplycost,
           CAST(sum(l_quantity) AS DOUBLE) AS ps_availqty
    FROM lineitem GROUP BY 1, 2
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem-derived part-supplier relation (see module docstring)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "ps_supplycost"
            ),
            F.sum("l_quantity").cast("double").alias("ps_availqty"),
        )
    )


@register(
    "tpch_q2",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    eu AS (
        SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
        FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
    FROM part JOIN eu ON p_partkey = ps_partkey
    WHERE p_size <= 15 AND p_type = 'LARGE'
      AND ps_supplycost = (SELECT min(eu2.ps_supplycost) FROM eu eu2
                           WHERE eu2.ps_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
)
def tpch_q2(spark, sf_dir):
    """Q2 minimum-cost supplier: for each qualifying part, the EUROPE
    supplier(s) offering the regional minimum supply cost.

    The correlated min subquery becomes one per-part aggregate over the
    region-filtered ps joined back (the q17 pattern) — ps is computed ONCE
    and self-compared, never re-scanned per row. supplier/nation/region
    broadcast; the two ps shuffles share the partkey layout. min-of-double
    equality is exact because both sides come from the same IEEE values."""
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    eu = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = eu.groupBy(F.col("ps_partkey").alias("mc_key")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eu.join(F.broadcast(p), eu.ps_partkey == p.p_partkey)
        .join(min_cost, eu.ps_partkey == F.col("mc_key"))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


@register(
    "tpch_q11",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    nat AS (
        SELECT ps_partkey, CAST(ps_supplycost * ps_availqty AS DECIMAL(18,6)) AS val
        FROM ps JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    )
    SELECT ps_partkey, CAST(sum(val) AS DOUBLE) AS part_value
    FROM nat
    GROUP BY ps_partkey
    HAVING CAST(sum(val) AS DOUBLE) >
           (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM nat)
    ORDER BY part_value DESC, ps_partkey
    """,
)
def tpch_q11(spark, sf_dir):
    """Q11 important stock: parts whose NATION_7 inventory value exceeds a
    fraction of the nation's total.

    The scalar threshold subquery is the same aggregate computed over the
    same filtered frame, riding in-plan as a broadcast 1-row cross-join —
    the nation-filtered ps is built once and re-aggregated twice (per-part
    + global), both map-side partial. Values stage through DECIMAL(18,6) so
    the parallel sums hash-match the sequential oracle."""
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            _dec(F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"),
        )
    )
    total = nat.agg((F.sum("val").cast("double") * 0.001).alias("cutoff"))
    return (
        nat.groupBy("ps_partkey")
        .agg(F.sum("val").cast("double").alias("part_value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select("ps_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@register(
    "tpch_q16",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 28, 33)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, sf_dir):
    """Q16 parts/supplier relationship: distinct supplier counts per
    (brand, type, size) bucket, excluding flagged suppliers.

    The official s_comment complaints filter is swapped for the available
    s_acctbal < 0 flag (same NOT IN shape). NOT IN over non-null keys is a
    broadcast anti join; part is a broadcast dim; the count-distinct is the
    only shuffle (two-phase partial under AQE)."""
    ps = derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#12")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 33)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT ps_suppkey FROM ps
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps_availqty > 3.0 * (
              SELECT sum(l_quantity) FROM lineitem
              WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00')
    )
    ORDER BY s_name
    """,
)
def tpch_q20(spark, sf_dir):
    """Q20 excess-stock suppliers: suppliers whose lifetime volume on 'red'
    parts exceeds 3x what they shipped of that part in 1996.

    The correlated per-(part,supplier) 1996 sum becomes one filtered
    aggregate over lineitem joined back on the ps key pair — an inner join,
    so (part,supplier) pairs with no 1996 shipments drop exactly as the
    NULL comparison drops them in the oracle. The part-name IN list is a
    broadcast semi join; the final supplier IN is a semi join against ~100
    distinct suppkeys."""
    ps = derived_partsupp(spark, sf_dir)
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    y96 = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(
            F.col("l_partkey").alias("y_partkey"), F.col("l_suppkey").alias("y_suppkey")
        )
        .agg(F.sum("l_quantity").alias("qty96"))
    )
    excess = (
        ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey, "left_semi")
        .join(
            y96,
            (ps.ps_partkey == F.col("y_partkey"))
            & (ps.ps_suppkey == F.col("y_suppkey")),
        )
        .filter(F.col("ps_availqty") > 3.0 * F.col("qty96"))
        .select("ps_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_5'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21(spark, sf_dir):
    """Q21 suppliers who kept orders waiting: in finished multi-supplier
    orders, the SOLE supplier whose lines were returned ('R' stands in for
    the absent receipt>commit late predicate — same per-row shape).

    Spark-first rewrite of the official EXISTS/NOT-EXISTS pair: one
    per-order aggregate (distinct suppliers, distinct returned-suppliers)
    joined once onto the returned lines — a single extra lineitem pass
    instead of TWO shuffled self-semi-joins. `exists other supplier` is
    n_supp > 1; `not exists other returned supplier` is n_ret_supp == 1
    (the line's own supplier is returned, so 1 means "only me"). The
    DuckDB oracle keeps the official correlated form, proving the rewrite."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == o.o_orderkey, "left_semi")
        .join(per_order, F.col("l_orderkey") == F.col("po_key"))
        .filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
