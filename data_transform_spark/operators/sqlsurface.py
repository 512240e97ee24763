"""SQL-surface operators — subqueries, CTEs, lateral joins (§2 extras).

These keys run through ``spark.sql`` over temp views of the fixture tables:
the point is API parity for users who write SQL rather than DataFrame code.
Catalyst decorrelates the subqueries into the same join plans the DataFrame
API would produce (verified in test_plans — no per-row re-execution), so
the scale story is identical to the join/agg families.

Averages over double money columns go through DECIMAL(18,6) sums divided by
counts so the comparison threshold is partition-order independent (§5.3.1).
"""

from __future__ import annotations

from data_transform_spark.io import load_table
from data_transform_spark.registry import register

_VIEW_TABLES = ["customer", "orders", "lineitem", "part", "supplier", "nation", "region"]


def _views(spark, sf_dir):
    for t in _VIEW_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@register(
    "sql_subquery_scalar",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > 1.4 * (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) FROM part)
    ORDER BY p_partkey
    """,
)
def sql_subquery_scalar(spark, sf_dir):
    """Uncorrelated scalar subquery: parts priced 40% above the mean.

    The subquery runs once and broadcasts as a literal — one extra stage,
    not a per-row probe."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > 1.4 * (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) FROM part)
        ORDER BY p_partkey
        """
    )


@register(
    "sql_exists",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)
def sql_exists(spark, sf_dir):
    """Correlated EXISTS — decorrelated by Catalyst into a left-semi join."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'
                        AND o.o_totalprice > 100000)
        ORDER BY c_custkey
        """
    )


@register(
    "sql_in_subquery",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                                WHERE r_name = 'EUROPE'))
      AND s_acctbal > 0
    ORDER BY s_suppkey
    """,
)
def sql_in_subquery(spark, sf_dir):
    """Nested IN subqueries — planned as two broadcast semi joins."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                                    WHERE r_name = 'EUROPE'))
          AND s_acctbal > 0
        ORDER BY s_suppkey
        """
    )


@register(
    "sql_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """,
)
def sql_correlated(spark, sf_dir):
    """Correlated scalar aggregate subquery: orders 50% above their
    customer's own average. Catalyst decorrelates to one grouped aggregate
    joined back on o_custkey — a single shuffle, never a re-scan per row."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                                    FROM orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
        """
    )


@register(
    "sql_cte",
    oracle="""
    WITH nat_cust AS (
      SELECT c_nationkey, count(*) AS n_cust,
             ROUND(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 4) AS bal_sum
      FROM customer GROUP BY c_nationkey
    ),
    nat_supp AS (
      SELECT s_nationkey, count(*) AS n_supp
      FROM supplier GROUP BY s_nationkey
    )
    SELECT n.n_name, c.n_cust, c.bal_sum, COALESCE(s.n_supp, 0) AS n_supp
    FROM nat_cust c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN nat_supp s ON s.s_nationkey = c.c_nationkey
    ORDER BY n.n_name
    """,
)
def sql_cte(spark, sf_dir):
    """Multi-CTE query: two independent aggregates joined on nation."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        WITH nat_cust AS (
          SELECT c_nationkey, count(*) AS n_cust,
                 ROUND(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 4) AS bal_sum
          FROM customer GROUP BY c_nationkey
        ),
        nat_supp AS (
          SELECT s_nationkey, count(*) AS n_supp
          FROM supplier GROUP BY s_nationkey
        )
        SELECT n.n_name, c.n_cust, c.bal_sum, COALESCE(s.n_supp, 0) AS n_supp
        FROM nat_cust c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN nat_supp s ON s.s_nationkey = c.c_nationkey
        ORDER BY n.n_name
        """
    )


@register(
    "join_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'MACHINERY'
    ORDER BY c.c_custkey, t.o_orderkey
    """,
)
def join_lateral(spark, sf_dir):
    """LATERAL correlated derived table: top-2 orders per customer.

    Spark plans this as a ranked window over one shuffle (decorrelated),
    not an inner re-query per customer row — the only shape that survives
    a 100 TB orders table."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'MACHINERY'
        ORDER BY c.c_custkey, t.o_orderkey
        """
    )


@register(
    "sql_qualify",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS rn
    FROM orders
    QUALIFY rn <= 2
    ORDER BY o_custkey, rn
    """,
)
def sql_qualify(spark, sf_dir):
    """QUALIFY surface: top-2 orders per customer by price. Spark SQL has no
    QUALIFY clause, so the engine rewrites it to the standard subquery +
    WHERE-on-window form (the exact rewrite QUALIFY sugar denotes); the
    oracle keeps DuckDB's native QUALIFY to prove equivalence. Same plan as
    win_topk_group: one shuffle on the partition key, rank filter pushed
    into the window operator."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                                           ORDER BY o_totalprice DESC, o_orderkey)
                        AS BIGINT) AS rn
            FROM orders
        ) WHERE rn <= 2
        ORDER BY o_custkey, rn
        """
    )


@register(
    "sql_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
               AS BIGINT) AS n_f,
           CAST(COALESCE(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)
               AS BIGINT) AS n_o,
           CAST(COALESCE(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)
               AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_pivot(spark, sf_dir):
    """SQL PIVOT clause surface (vs agg_pivot's DataFrame .pivot()): order
    counts per priority pivoted wide by status, absent combinations
    normalized to 0.

    Catalyst rewrites PIVOT into the same single-shuffle conditional
    aggregation the portable oracle spells out — pivoting never costs more
    than the underlying groupBy as long as the IN list is explicit.
    (An UNBOUNDED pivot — values discovered at runtime — needs an extra
    distinct-values job first, which is why the API requires the list for
    plannability at scale.)"""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sql_pivot_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COALESCE(n_f, CAST(0 AS BIGINT)) AS n_f,
               COALESCE(n_o, CAST(0 AS BIGINT)) AS n_o,
               COALESCE(n_p, CAST(0 AS BIGINT)) AS n_p
        FROM (SELECT o_orderpriority, o_orderstatus FROM sql_pivot_orders)
        PIVOT (count(*) FOR o_orderstatus IN ('F' AS n_f, 'O' AS n_o, 'P' AS n_p))
        """
    )


@register(
    "sql_values_inline",
    oracle="""
    SELECT r.r_name, t.tier, count(*) AS n
    FROM region r
    JOIN (VALUES ('AFRICA', 'emerging'), ('AMERICA', 'core'),
                 ('ASIA', 'core'), ('EUROPE', 'core'),
                 ('MIDDLE EAST', 'emerging')) AS t(name, tier)
      ON r.r_name = t.name
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, t.tier
    """,
)
def sql_values_inline(spark, sf_dir):
    """Inline VALUES table surface: a literal lookup (region → market
    tier) joined against real tables without any file or temp view — the
    idiom for small config/mapping tables embedded in a query.

    Catalyst folds the VALUES into a LocalRelation: zero scan, always the
    broadcast side, and the literal rows travel inside the plan — exactly
    how threshold/mapping configs should reach a 100 TB query (vs a
    one-row-per-executor file read). The DataFrame twin is
    spark.createDataFrame; both collapse to the same LocalRelation."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("vi_region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("vi_nation")
    return spark.sql(
        """
        SELECT r.r_name, t.tier, count(*) AS n
        FROM vi_region r
        JOIN (VALUES ('AFRICA', 'emerging'), ('AMERICA', 'core'),
                     ('ASIA', 'core'), ('EUROPE', 'core'),
                     ('MIDDLE EAST', 'emerging')) AS t(name, tier)
          ON r.r_name = t.name
        JOIN vi_nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, t.tier
        """
    )


@register(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           ROUND(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_totalprice > 50000
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark, sf_dir):
    """Named-parameter SQL (`spark.sql(query, args={...})`): values bind as
    typed literals server-side, never via string interpolation — the
    injection-safe templating surface for SQL users. Catalyst folds the
    bound parameters into the plan exactly like inline literals (pushdown
    included), so the parameterization is free at execution time."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               ROUND(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={"cutoff": "1995-01-01", "min_price": 50000},
    )


@register(
    "sql_group_by_all",
    oracle="""
    SELECT r.r_name, o.o_orderpriority, count(*) AS n,
           ROUND(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    JOIN region r ON n2.n_regionkey = r.r_regionkey
    GROUP BY ALL
    """,
)
def sql_group_by_all(spark, sf_dir):
    """GROUP BY ALL: every non-aggregate select item becomes a grouping key
    automatically — the modern-SQL ergonomics surface (identical syntax in
    DuckDB, so the oracle is the same text). Catalyst resolves it to an
    ordinary Aggregate during analysis; the physical plan (partial agg →
    shuffle on the inferred keys → final agg, dims broadcast) is exactly
    the explicit-GROUP BY plan, so the sugar costs nothing at scale."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name, o.o_orderpriority, count(*) AS n,
               ROUND(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        GROUP BY ALL
        """
    )


@register(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE spine(day) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT day + 1 FROM spine WHERE day < DATE '1995-03-31'
    )
    SELECT CAST(s.day AS VARCHAR) AS day, count(o.o_orderkey) AS n_orders,
           ROUND(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total
    FROM spine s LEFT JOIN orders o ON o.o_orderdate = s.day
    GROUP BY s.day
    """,
)
def sql_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (Spark 4): a 90-day calendar spine generated by the
    recursive anchor/step form, left-joined to daily order totals — the
    canonical date-spine pattern that surfaces zero-activity days a plain
    GROUP BY o_orderdate silently drops. The recursion is driver-bounded
    (90 iterations over a one-row frame) and the spine is broadcast into
    the join, so the fact side stays one scan + one aggregate; days with
    no orders report n_orders=0 and NULL total on both engines."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE spine(day) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT date_add(day, 1) FROM spine WHERE day < DATE '1995-03-31'
        )
        SELECT CAST(s.day AS STRING) AS day, count(o.o_orderkey) AS n_orders,
               ROUND(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total
        FROM spine s LEFT JOIN orders o ON o.o_orderdate = s.day
        GROUP BY s.day
        """
    )


@register(
    "sql_cluster_by",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def sql_cluster_by(spark, sf_dir):
    """DISTRIBUTE BY / SORT BY — SQL's handle on the physical layout:
    DISTRIBUTE BY hash-partitions the result on a key (the SQL twin of
    repartition) and SORT BY orders rows *within* each partition (the twin
    of sortWithinPartitions) — together, CLUSTER BY. Row content is
    unchanged, which is exactly the point: these clauses shape downstream
    shuffle-free consumption (bucketed writes, merge joins, ordered
    window scans) without touching semantics, so the oracle is the plain
    filter — the hash compare proves layout clauses never leak into
    values."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_quantity >= 45
        DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_linenumber
        """
    )


@register(
    "sql_exec_immediate",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_totalprice > 150000.0
    GROUP BY o_orderpriority
    """,
)
def sql_exec_immediate(spark, sf_dir):
    """Dynamic SQL the governed way: a session variable (DECLARE / SET
    VAR) holds the threshold and EXECUTE IMMEDIATE runs a query string
    with a `?` placeholder bound via USING — the stored-procedure-style
    surface for parameterized templates built at runtime, with typed
    binding instead of string splicing (same injection-safety story as
    sql_parameterized, but for SQL-managed state). The inner query plans
    exactly like its literal twin — pushdown included — because binding
    happens before analysis."""
    _views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE rfm_threshold DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR rfm_threshold = 150000.0")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority, count(*) AS n
           FROM orders WHERE o_totalprice > ? GROUP BY o_orderpriority'
          USING rfm_threshold
        """
    )


@register(
    "sql_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, v
    FROM (SELECT l_orderkey, l_linenumber, l_quantity AS quantity,
                 l_extendedprice AS price, l_discount AS discount
          FROM lineitem)
    UNPIVOT (v FOR metric IN (quantity, price, discount))
    """,
)
def sql_unpivot(spark, sf_dir):
    """The SQL UNPIVOT clause — same text on both engines — as the
    declarative twin of reshape_unpivot's DataFrame melt: three measure
    columns rotate into (metric, v) rows inside the scan projection, no
    join and no shuffle (row-local expansion, exactly what the UNION ALL
    rewrite would cost but with column pruning still intact). Both
    engines drop NULL measures by default, so the clause is
    dialect-proof here."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, metric, v
        FROM (SELECT l_orderkey, l_linenumber, l_quantity AS quantity,
                     l_extendedprice AS price, l_discount AS discount
              FROM lineitem)
        UNPIVOT (v FOR metric IN (quantity, price, discount))
        """
    )


@register(
    "sql_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_all,
           count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
           ROUND(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      FILTER (WHERE o_orderdate >= DATE '1995-01-01')
                 AS DOUBLE), 2) AS total_recent
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sql_filter_clause(spark, sf_dir):
    """The ANSI FILTER clause — per-aggregate predicates inside ONE
    grouped pass (identical text on both engines): three differently-
    filtered aggregates share a single scan and a single shuffle, where
    the self-join rewrite would cost one scan each. Catalyst compiles
    FILTER to the same conditional-aggregation the count_if/CASE forms
    produce (agg_countif), so the clause is free sugar — but it is the
    form that composes with ANY aggregate, including the DECIMAL-summed
    money column here. NULL-sum groups (no qualifying rows) stay NULL on
    both engines."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_all,
               count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
               ROUND(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          FILTER (WHERE o_orderdate >= DATE '1995-01-01')
                     AS DOUBLE), 2) AS total_recent
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@register(
    "sql_select_except",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    """,
)
def sql_select_except(spark, sf_dir):
    """`SELECT * EXCEPT (cols)` — subtractive projection for wide tables:
    name what to DROP instead of enumerating the 300 columns to keep
    (DuckDB spells it EXCLUDE; the oracle is the explicit column list,
    proving the sugar resolves to plain pruning). Catalyst expands the
    star minus the exclusions during analysis, so column pruning still
    reaches the scan — subtractive projection costs nothing."""
    _views(spark, sf_dir)
    return spark.sql(
        "SELECT * EXCEPT (n_regionkey) FROM nation"
    )


@register(
    "sql_pipe",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           ROUND(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    HAVING count(*) > 1000
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_pipe(spark, sf_dir):
    """SQL pipe syntax (Spark 4's ``|>`` operators, from Google's
    'Pipe Syntax in SQL' VLDB'24 design): the same filtered revenue
    rollup expressed as a linear FROM → WHERE → EXTEND → AGGREGATE →
    WHERE → ORDER BY pipeline instead of inside-out ANSI clauses. The
    post-AGGREGATE WHERE is pipe-flavored HAVING; EXTEND is a projection
    that keeps all input columns. DuckDB has no pipe syntax, so the
    oracle is the ANSI desugaring — proving the pipe form denotes the
    same relation. Catalyst parses pipes into the identical logical plan
    as the ANSI twin (scan with pushed shipdate filter + partial/final
    hash aggregate), so the surface costs nothing at 100 TB."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_items,
                     ROUND(CAST(sum(CAST(disc_price AS DECIMAL(18,6)))
                                AS DOUBLE), 2) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_items > 1000
        |> ORDER BY l_returnflag, l_linestatus
        """
    )
