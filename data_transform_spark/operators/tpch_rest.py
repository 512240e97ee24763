"""TPC-H-shaped queries q7, q8, q9, q13, q15, q17, q22.

The remaining five (q2, q11, q16, q20, q21) live in tpch_full.py, which
derives the absent `partsupp` relation from lineitem identically in both
engines — together the suite covers all 22 TPC-H shapes. Where the fixture
lacks a predicate column, the official filter is swapped for an available
one with the SAME plan shape — each docstring states the swap.

Money arithmetic follows §5.3.1 (tpch_more.py): per-row double math cast to
DECIMAL(18,6) before any partition-order-dependent SUM, back to double,
rounded — hashes stay stable under parallel summation. Scalar thresholds
(q15 max, q17 per-part avg, q22 global avg) stay IN-PLAN as broadcast
1-row/small aggregates, never driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


def _dec(col):
    return col.cast("decimal(18,6)")


_VOLUME_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"


@register(
    "tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(CAST(sum(volume) AS DOUBLE), 4) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark, sf_dir):
    """Q7 volume shipping: bidirectional nation pair, revenue by year.

    lineitem drives; the two nation aliases broadcast, the pair disjunction
    is a post-join filter Catalyst can't push (it spans both aliases) but
    the per-alias IN ('NATION_1','NATION_2') prefilters ARE pushed onto the
    tiny dims. One shuffle each for orders/customer key joins."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1997-12-31 00:00:00").cast("timestamp_ntz"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pair = ("NATION_1", "NATION_2")
    n1 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).cast(
                    "double"
                ),
                4,
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           ROUND(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark, sf_dir):
    """Q8 national market share: NATION_3's slice of PROMO-part revenue sold
    into ASIA, by order year.

    Both numerator and denominator sum through DECIMAL(18,6) partials so the
    ratio is partition-order independent; the division happens on the final
    doubles, rounded to 6. Dims (part-filtered, supplier, nations, region)
    broadcast; lineitem->orders->customer are the only shuffles."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1997-12-31 00:00:00").cast("timestamp_ntz"),
        )
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    volume = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    num = F.sum(F.when(F.col("nation") == "NATION_3", volume).otherwise(_dec(F.lit(0))))
    den = F.sum(volume)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(num.cast("double") / den.cast("double"), 6).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9",
    oracle="""
    SELECT nation, o_year, ROUND(CAST(sum(amount) AS DOUBLE), 4) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(l_extendedprice * (1 - l_discount)
                    - p_retailprice * l_quantity * 0.1 AS DECIMAL(18,6)) AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_type = 'STANDARD'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9(spark, sf_dir):
    """Q9-shaped product-type profit by supplier nation and year.

    The fixture lacks partsupp, so official ps_supplycost is replaced by the
    deterministic proxy p_retailprice * l_quantity * 0.1 and the p_name LIKE
    filter by p_type = 'STANDARD' — the plan shape (part+supplier dims
    broadcast onto lineitem, orders key join, nation rollup) is Q9's."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(amount).cast("double"), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark, sf_dir):
    """Q13 customer order-count distribution (zero-order customers kept).

    The official o_comment NOT LIKE filter is swapped for an available
    predicate (priority <> '1-URGENT') — the shape (left join with an
    ON-clause filter so unmatched customers count 0, double aggregate) is
    Q13's. Two shuffles: custkey join+agg, then the tiny c_count regroup."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark, sf_dir):
    """Q15 top supplier: quarterly revenue per supplier, keep the max.

    The revenue aggregate is computed ONCE and self-compared against its
    in-plan broadcast max (1-row aggregate cross-join) — never a second
    lineitem scan and never a driver-side collect. Ties all surface, as in
    the official query."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).cast(
                "double"
            ),
            4,
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17",
    oracle="""
    SELECT ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#12' AND p_type = 'ECONOMY'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def tpch_q17(spark, sf_dir):
    """Q17 small-quantity-order revenue (correlated per-part avg threshold).

    The correlated scalar subquery becomes one per-part aggregate joined
    back — lineitem is scanned twice but never re-scanned per row. The
    official p_container filter is swapped for p_type (column absent).
    l_quantity values are integer-valued doubles, so the parallel avg is
    exact and the 0.2*avg threshold is bit-identical in both engines."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "ECONOMY")
    )
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("pp_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(
                F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0, 4
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q22",
    oracle="""
    SELECT c_nationkey AS cntry, count(*) AS numcust,
           ROUND(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 4) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                              / count(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    ORDER BY cntry
    """,
)
def tpch_q22(spark, sf_dir):
    """Q22-shaped global-sales-opportunity: rich customers with no orders,
    grouped by nation (the fixture has no c_phone, so nationkey replaces the
    phone-prefix country code; the shape — scalar avg subquery + NOT EXISTS
    anti join + aggregate — is Q22's).

    The global average is an exact DECIMAL sum divided by the count
    (c_acctbal is NOT integer-valued, so a plain double avg would be
    partition-order dependent AND engine-dependent) and rides in-plan as a
    broadcast 1-row cross-join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec(F.col("c_acctbal"))).cast("double"), 4).alias(
                "totacctbal"
            ),
        )
        .orderBy("cntry")
    )
