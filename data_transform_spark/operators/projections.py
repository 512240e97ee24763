"""§2.B — projections, filters, scalar predicates (SURVEY.md).

All expressions are built-in Column ops: they stay inside whole-stage codegen
and push down to the parquet scan where possible. Constants are pinned to the
verified fixture domains (FIXTURES.md) so every oracle is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "project_select",
    oracle="SELECT c_custkey AS cust_id, c_name AS cust_name, c_mktsegment AS segment FROM customer",
)
def project_select(spark, sf_dir):
    """column subset + rename projection."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def project_compute(spark, sf_dir):
    """Row-level arithmetic: same parenthesization both sides → bit-identical
    doubles, so NO rounding (rounding would hit half-way boundaries where the
    engines' decimal-vs-binary rounding disagree — §5.3.1 applies to sums,
    not deterministic per-row products)."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
    )


@register(
    "filter_compare",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 30 AND l_extendedprice < 50000
      AND l_linenumber != 1 AND l_discount >= 0.02 AND l_tax <= 0.06
    """,
)
def filter_compare(spark, sf_dir):
    """all six comparison operators on lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & (F.col("l_extendedprice") < 50000)
        & (F.col("l_linenumber") != 1)
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_tax") <= 0.06)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus IN ('F', 'P')
    """,
)
def filter_in(spark, sf_dir):
    """IN-list membership on priority and status."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderstatus").isin("F", "P")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@register(
    "filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 23:59:59'
      AND l_quantity BETWEEN 10 AND 20
    """,
)
def filter_between(spark, sf_dir):
    """BETWEEN on timestamp and numeric ranges."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1997-12-31 23:59:59").cast("timestamp_ntz"),
        )
        & F.col("l_quantity").between(10, 20)
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")


@register(
    "filter_like",
    oracle="SELECT p_partkey, p_name, p_type FROM part WHERE p_name LIKE '%gear%' AND p_type LIKE 'PRO%'",
)
def filter_like(spark, sf_dir):
    """LIKE pattern matching on part names/types."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%gear%") & F.col("p_type").like("PRO%")).select(
        "p_partkey", "p_name", "p_type"
    )


@register(
    "filter_rlike",
    oracle=r"""
    SELECT p_partkey, p_name FROM part
    WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)$')
    """,
)
def filter_rlike(spark, sf_dir):
    """regex predicate via rlike / regexp_matches."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike(r"^(red|blue) (bolt|gear)$")).select(
        "p_partkey", "p_name"
    )


@register(
    "filter_null",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IS NULL
    """,
)
def filter_null(spark, sf_dir):
    """Fixtures have zero NULLs; produce them via an unmatched outer join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    joined = c.join(o, c.c_custkey == o.o_custkey, "left")
    return joined.filter(F.col("o_orderkey").isNull()).select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "filter_bool",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE (l_quantity > 45 AND l_discount < 0.03)
       OR (NOT (l_returnflag = 'N') AND l_tax > 0.07)
    """,
)
def filter_bool(spark, sf_dir):
    """AND / OR / NOT predicate composition."""
    li = load_table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.03)) | (
        (~(F.col("l_returnflag") == "N")) & (F.col("l_tax") > 0.07)
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber")


@register(
    "expr_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 150000 THEN 'medium'
                ELSE 'small' END AS bucket
    FROM orders
    """,
)
def expr_case(spark, sf_dir):
    """CASE WHEN price bucketing."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 150000, "medium")
        .otherwise("small")
        .alias("bucket"),
    )


@register(
    "expr_coalesce",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_linenumber, 3) AS ln_nullif,
           COALESCE(NULLIF(l_linenumber, 3), -1) AS ln_coalesced,
           GREATEST(l_quantity, l_discount * 100) AS g,
           LEAST(l_quantity, l_tax * 100) AS l
    FROM lineitem
    """,
)
def expr_coalesce(spark, sf_dir):
    """NULLIF / COALESCE / GREATEST / LEAST null-logic bundle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_linenumber"), F.lit(3)).alias("ln_nullif"),
        F.coalesce(F.nullif(F.col("l_linenumber"), F.lit(3)), F.lit(-1)).alias("ln_coalesced"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100).alias("l"),
    )


@register(
    "expr_cast",
    oracle="""
    SELECT CAST(l_orderkey AS VARCHAR) AS ok_str,
           CAST(l_linenumber AS DOUBLE) AS ln_dbl,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    """,
)
def expr_cast(spark, sf_dir):
    """safe cross-type casts (string/double/date-string/bigint)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("ok_str"),
        F.col("l_linenumber").cast("double").alias("ln_dbl"),
        # DATE-typed outputs render differently in the two engines' pandas
        # bridges (date vs midnight datetime) — emit the ISO string instead
        F.col("l_shipdate").cast("date").cast("string").alias("ship_date"),
        # fixture quantities are integral doubles, so trunc == round here
        F.col("l_quantity").cast("long").alias("qty_int"),
    )


@register(
    "project_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def project_distinct(spark, sf_dir):
    """DISTINCT projection of status x priority."""
    return load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "fn_null_handling",
    oracle="""
    SELECT event_id,
           nullif(event_type, 'error') AS type_or_null,
           ifnull(nullif(event_type, 'error'), '(redacted)') AS type_filled,
           CASE WHEN nullif(event_type, 'error') IS NOT NULL
                THEN 'kept' ELSE 'was_error' END AS nvl2_tag,
           (nullif(event_type, 'error') IS NOT DISTINCT FROM event_type)
               AS same_as_raw
    FROM events
    """,
)
def fn_null_handling(spark, sf_dir):
    """The NULL-handling function family beyond coalesce (expr_coalesce):
    nullif (value → NULL on match — the standard way to void sentinel
    values), ifnull (2-arg fill), nvl2 (three-way branch on nullness),
    and equal_null (NULL-safe equality as a FUNCTION, the expression twin
    of join_nullsafe's <=> operator). The oracle rewrites nvl2/equal_null
    into their portable CASE / IS NOT DISTINCT FROM forms — pinning the
    exact NULL semantics each shorthand promises. All row-local,
    codegen'd, shuffle-free."""
    ev = load_table(spark, sf_dir, "events")
    t = F.expr("nullif(event_type, 'error')")
    return ev.select(
        "event_id",
        t.alias("type_or_null"),
        F.expr("ifnull(nullif(event_type, 'error'), '(redacted)')").alias(
            "type_filled"
        ),
        F.expr(
            "nvl2(nullif(event_type, 'error'), 'kept', 'was_error')"
        ).alias("nvl2_tag"),
        F.expr("equal_null(nullif(event_type, 'error'), event_type)").alias(
            "same_as_raw"
        ),
    )
