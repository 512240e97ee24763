"""§2.D — aggregations (SURVEY.md).

Spark plans every groupBy as partial (map-side) + final aggregation
automatically — at 100 TB that map-side combine is what keeps the shuffle
small, so these stay pure DataFrame ops. Float-summing aggregates are rounded
on BOTH sides (oracle-parity rule §5.3.1): double addition is non-associative
and Spark's partition-parallel sum order differs from DuckDB's sequential one.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_events, load_table
from data_transform_spark.registry import register


@register(
    "agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           sum(l_quantity) AS sum_qty,
           ROUND(sum(l_extendedprice), 2) AS sum_price,
           ROUND(avg(l_extendedprice), 4) AS avg_price,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    """ungrouped count/sum/avg/min/max over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           ROUND(sum(l_extendedprice), 2) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           ROUND(avg(l_quantity), 6) AS avg_qty,
           ROUND(avg(l_extendedprice), 4) AS avg_price,
           ROUND(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary — the flagship aggregation.

    Product sums go through DECIMAL(18,6): the per-row product is exact at
    <= 6 decimals, decimal summation is order-independent, and the final
    double is therefore bit-identical on both engines regardless of how
    partial aggregates merge. Rounding a float sum instead can flip at an
    exact .xx5 boundary (4-decimal inputs summed, rounded to 2dp).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = "decimal(18,6)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(disc_price.cast(dec)).cast("double").alias("sum_disc_price"),
            F.sum((disc_price * (1 + F.col("l_tax"))).cast(dec)).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_custs,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark, sf_dir):
    """exact distinct counts per group."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_2pct
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) bounds-checked against exact.

    Spark's HLL sketch has no DuckDB twin, so the hashable contract is the
    error bound: the key emits the exact count plus a boolean asserting the
    sketch landed within 2% (measured max rel-err at sf0.1 is 0.4% with
    rsd=0.02). The oracle emits TRUE — the hash matches iff the bound holds
    on every group."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02) - F.countDistinct("user_id")
            )
            <= 0.02 * F.countDistinct("user_id")
        ).alias("approx_within_2pct"),
    )


@register(
    "agg_sum_distinct",
    oracle="SELECT l_returnflag, sum(DISTINCT l_quantity) AS sum_dist_qty FROM lineitem GROUP BY l_returnflag",
)
def agg_sum_distinct(spark, sf_dir):
    """SUM(DISTINCT quantity) per returnflag."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(F.sum_distinct(F.col("l_quantity")).alias("sum_dist_qty"))


@register(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS top_order,
           arg_min(o_orderkey, o_totalprice) AS bottom_order,
           ROUND(max(o_totalprice), 2) AS top_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_minmax_by(spark, sf_dir):
    """argmax/argmin; per-group price extrema verified unique in the fixture."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("top_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("bottom_order"),
        F.round(F.max("o_totalprice"), 2).alias("top_price"),
    )


@register(
    "agg_collect",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list(n_name ORDER BY n_name), ',') AS names_csv,
           CAST(len(list(n_name ORDER BY n_name)) AS BIGINT) AS n_names
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect(spark, sf_dir):
    """collect_list order is nondeterministic → always sort_array (§5.3.2);
    the collected array is PROJECTED as CSV + length because array cells
    crash the driver canonicalizer."""
    n = load_table(spark, sf_dir, "nation")
    names = F.sort_array(F.collect_list("n_name"))
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", names).alias("names_csv"),
        F.size(names).cast("long").alias("n_names"),
    )


@register(
    "agg_string",
    oracle="SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS name_csv FROM nation GROUP BY n_regionkey",
)
def agg_string(spark, sf_dir):
    """ordered string_agg via sorted collect_list + concat_ws."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("name_csv")
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev(l_quantity), 6) AS sd_qty,
           ROUND(stddev_pop(l_quantity), 6) AS sdp_qty,
           ROUND(var_samp(l_quantity), 6) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    """stddev/variance/corr/covar statistical aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev("l_quantity"), 6).alias("sd_qty"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sdp_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qp"),
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_linestatus,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(median(l_extendedprice), 4) AS med
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_percentile(spark, sf_dir):
    """exact interpolated percentiles and median per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90"),
        F.round(F.median("l_extendedprice"), 4).alias("med"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT c_nationkey, count(*) AS n_cust, ROUND(avg(c_acctbal), 4) AS avg_bal
    FROM customer GROUP BY c_nationkey HAVING count(*) > 50
    """,
)
def agg_having(spark, sf_dir):
    """post-aggregation filter (HAVING count > 50)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
        .filter(F.col("n_cust") > 50)
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS aggregation (per-flag, per-status, both)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_grouping_sets")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM li_grouping_sets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals with NULL markers."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE over returnflag x linestatus with NULL group markers."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_countif",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE value > 100) AS n_big,
           count(*) FILTER (WHERE user_id % 2 = 0) AS n_even_user,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_countif(spark, sf_dir):
    """conditional counts via count_if / FILTER."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.count_if(F.col("user_id") % 2 == 0).alias("n_even_user"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_bool",
    oracle="""
    SELECT event_type,
           bool_and(value > 0) AS all_positive,
           bool_or(value > 400) AS any_huge
    FROM events GROUP BY event_type
    """,
)
def agg_bool(spark, sf_dir):
    """bool_and / bool_or grouped aggregates."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 400).alias("any_huge"),
    )


PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot with an explicit value list (determinism + single-pass plan)."""
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", PIVOT_EVENT_TYPES).count()
    # pivot-count yields NULL for absent combos; oracle's FILTER yields 0
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in PIVOT_EVENT_TYPES],
    )


@register(
    "agg_sketch_merge",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS merged_within_2pct
    FROM events GROUP BY event_type
    """,
)
def agg_sketch_merge(spark, sf_dir):
    """Shard-mergeable distinct-count sketches (Apache DataSketches HLL).

    The 100 TB incremental pattern: each shard aggregates its own HLL
    sketch (hll_sketch_agg), shards are then merged with hll_union_agg —
    so daily/partition-level sketches can be stored and re-merged without
    rescanning raw data. The key bounds-checks the merged estimate against
    the exact count (same contract as agg_approx_distinct); the shard split
    is the content-stable md5 bucket used by shard_assign."""
    ev = load_table(spark, sf_dir, "events")
    shard = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10).cast(
            "long"
        )
        % 8
    )
    per_shard = ev.groupBy("event_type", shard.alias("shard")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_shard.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_users"))
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= 0.02 * F.col("exact_users")
        ).alias("merged_within_2pct"),
    )


@register(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6)))
                      AS DOUBLE)
                 / CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE),
                 6) AS wavg_price,
           ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS plain_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark, sf_dir):
    """Quantity-weighted average price per flag (plain avg alongside for
    contrast) — the weighted-mean primitive behind blended rates/prices.

    Both numerator and denominator are DECIMAL(18,6) partial sums, so the
    final double division is partition-order independent; one map-side
    partial + one shuffle, same as any groupBy aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    num = F.sum(dec(F.col("l_extendedprice") * F.col("l_quantity"))).cast("double")
    den = F.sum(dec(F.col("l_quantity"))).cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(num / den, 6).alias("wavg_price"),
        F.round(
            F.sum(dec(F.col("l_extendedprice"))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("plain_avg_price"),
    )


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS parts,
           count(DISTINCT l_suppkey) AS supps,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark, sf_dir):
    """Several COUNT(DISTINCT ...) over DIFFERENT columns in one aggregate.

    Catalyst plans this with Expand: each input row is replicated once per
    distinct-column (tagged with a grouping id), then a single two-phase
    aggregate dedups and counts every branch — one shuffle total instead of
    one self-join per distinct column (the naive plan). At 100 TB the
    replication factor equals the number of distinct columns, so the
    map-side partial dedup is what keeps the exchange bounded; beyond a few
    columns the sketch path (approx_count_distinct) is the documented
    fallback."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_suppkey").alias("supps"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT COALESCE(o_orderpriority, '<all>') AS priority,
           COALESCE(o_orderstatus, '<all>') AS status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
)
def agg_grouping_id(spark, sf_dir):
    """ROLLUP with GROUPING() flags: subtotal rows carry an explicit
    marker per dimension, so a real NULL in the data can never be confused
    with the NULL that means "all values" — the correctness detail every
    rollup consumer eventually hits.

    Same single Expand+aggregate plan as agg_rollup; grouping() reads the
    expand branch's bitmask, costing nothing extra. The COALESCE to a
    sentinel makes the subtotal rows self-describing for report sinks."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            "g_priority",
            "g_status",
            "n",
        )
    )


CMS_D = 4  # count-min sketch depth (independent hash rows)
CMS_W = 64  # sketch width (cells per row)
CMS_PROBES = 5  # heavy hitters probed against the sketch


@register(
    "agg_cms_heavyhitters",
    oracle=f"""
    WITH h AS (
        SELECT user_id, r,
               CAST(('0x' || substring(md5(CAST(r AS VARCHAR) || ':' ||
                    CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {CMS_W} AS c
        FROM events, unnest([0, 1, 2, 3]) AS t(r)
    ),
    cells AS (SELECT r, c, count(*) AS n FROM h GROUP BY r, c),
    heavy AS (
        SELECT user_id, count(*) AS true_n FROM events GROUP BY user_id
        QUALIFY row_number() OVER (ORDER BY true_n DESC, user_id) <= {CMS_PROBES}
    ),
    probe AS (
        SELECT hv.user_id, hv.true_n, r.r,
               CAST(('0x' || substring(md5(CAST(r.r AS VARCHAR) || ':' ||
                    CAST(hv.user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {CMS_W} AS c
        FROM heavy hv, unnest([0, 1, 2, 3]) AS r(r)
    )
    SELECT p.user_id, p.true_n, CAST(min(ce.n) AS BIGINT) AS est_n,
           min(ce.n) >= p.true_n AS no_undercount
    FROM probe p JOIN cells ce ON p.r = ce.r AND p.c = ce.c
    GROUP BY p.user_id, p.true_n
    """,
)
def agg_cms_heavyhitters(spark, sf_dir):
    """Count-min sketch built as TWO shard sketches merged by cell-wise
    sum, then probed for the top heavy hitters: est(u) = min over rows of
    cell[r][hash_r(u)], with the CMS guarantee est >= true (one-sided
    error) surfacing as the hash-checked no_undercount column.

    The sketch is a d×w integer grid — mergeable by + (shards/executors/
    days combine associatively, demonstrated here by building the two
    event_id-parity shards separately), O(d·w) memory regardless of key
    cardinality, and built in ONE shuffle of (r, c) cells. The oracle
    builds the same cells directly from all events — cell-wise sum over
    shards is definitionally the same multiset count, so the hash match
    also proves the merge correct. Hashes are the engine-portable 32-bit
    md5 prefixes (same recipe as sample_hash)."""
    ev = load_events(spark, sf_dir).select("event_id", "user_id")

    def cms_cells(df):
        rows = df.select(
            "user_id",
            F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r"),
        ).withColumn(
            "c",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("r").cast("string"),
                            F.lit(":"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % CMS_W,
        )
        return rows.groupBy("r", "c").agg(F.count(F.lit(1)).alias("n"))

    shard_a = cms_cells(ev.filter(F.col("event_id") % 2 == 0))
    shard_b = cms_cells(ev.filter(F.col("event_id") % 2 == 1))
    cells = (
        shard_a.unionByName(shard_b)
        .groupBy("r", "c")
        .agg(F.sum("n").alias("n"))
    )
    # orderBy+limit plans as TakeOrderedAndProject (distributed per-partition
    # top-k + tiny driver merge) — a global row_number window here would
    # single-partition the per-user counts
    heavy = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.col("true_n").desc(), "user_id")
        .limit(CMS_PROBES)
    )
    probe = heavy.select(
        "user_id",
        "true_n",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r"),
    ).withColumn(
        "c",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("r").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CMS_W,
    )
    return (
        F.broadcast(probe)
        .join(cells, ["r", "c"])
        .groupBy("user_id", "true_n")
        .agg(
            F.min("n").cast("long").alias("est_n"),
            (F.min("n") >= F.col("true_n")).alias("no_undercount"),
        )
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via bitmaps: keys bucket into 32k-bit
    bitmap segments (bitmap_bucket_number), each (group, bucket) builds
    one bitmap with bitmap_construct_agg, and the group's distinct count
    is the sum of per-bucket bitmap_count — exact, unlike HLL
    (agg_approx_distinct), yet MERGEABLE: bitmaps OR across shards/days
    and counts sum across buckets, so incremental pipelines keep exact
    distincts without re-scanning history. Memory is |buckets touched| ×
    4 KB per group — bounded by the key range, not the row count; the
    classic bitmap-index trade vs count(DISTINCT)'s full shuffle of every
    distinct pair."""
    ev = load_events(spark, sf_dir).select("event_type", "user_id")
    per_bucket = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("b")
    ).agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))"
        ).alias("cnt")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n_users")
    )


@register(
    "agg_listagg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           count(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_listagg(spark, sf_dir):
    """listagg ... WITHIN GROUP (ORDER BY ...) — the ANSI ordered
    string-concatenation aggregate (Spark 4's native surface; DuckDB's twin
    is string_agg with ORDER BY). The explicit WITHIN GROUP ordering is
    what makes the result deterministic — the same §5.3.2 rule that forces
    sort_array around collect_list elsewhere, expressed declaratively so
    the sort rides inside the aggregate instead of as a second pass."""
    na = load_table(spark, sf_dir, "nation")
    return na.groupBy("n_regionkey").agg(
        F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_sketch_intersect",
    oracle="""
    SELECT
        (SELECT count(DISTINCT user_id) FROM events
          WHERE event_type = 'click') AS exact_click,
        (SELECT count(DISTINCT user_id) FROM events
          WHERE event_type = 'purchase') AS exact_purchase,
        (SELECT count(DISTINCT user_id) FROM events
          WHERE event_type IN ('click', 'purchase')) AS exact_either,
        (SELECT count(DISTINCT user_id) FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )) AS exact_both,
        TRUE AS intersect_within_5pct
    """,
)
def agg_sketch_intersect(spark, sf_dir):
    """Set-INTERSECTION estimation from mergeable HLL sketches via
    inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where the
    union sketch is hll_union of the two stored sketches — no rescan of
    either side. This is the audience-overlap primitive (users who clicked
    AND purchased) that pre-aggregated sketch stores answer in O(sketch)
    instead of re-shuffling raw IDs; the error compounds across the three
    estimates, so the bound checks against 5% of |A∪B| (the IE error
    scale), not of the small intersection itself. Exact counts ride
    beside the sketch verdict as broadcast 1-row aggregates."""
    ev = load_events(spark, sf_dir).select("event_type", "user_id")
    a = ev.filter(F.col("event_type") == "click").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk_a"),
        F.countDistinct("user_id").alias("exact_click"),
    )
    b = ev.filter(F.col("event_type") == "purchase").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk_b"),
        F.countDistinct("user_id").alias("exact_purchase"),
    )
    either = ev.filter(F.col("event_type").isin("click", "purchase")).agg(
        F.countDistinct("user_id").alias("exact_either")
    )
    both = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(
            ev.filter(F.col("event_type") == "purchase").select("user_id")
        )
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    est_both = (
        F.expr("hll_sketch_estimate(sk_a)")
        + F.expr("hll_sketch_estimate(sk_b)")
        - F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(either))
        .crossJoin(F.broadcast(both))
        .select(
            "exact_click",
            "exact_purchase",
            "exact_either",
            "exact_both",
            (
                F.abs(est_both - F.col("exact_both"))
                <= 0.05 * F.col("exact_either")
            ).alias("intersect_within_5pct"),
        )
    )


@register(
    "agg_bitmap_merge",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_merge(spark, sf_dir):
    """The INCREMENTAL half of the bitmap-distinct story: per-day partial
    bitmaps (the shape a daily pipeline would persist) OR-merge with
    bitmap_or_agg into exact all-time distincts — no rescan of history,
    no approximation. agg_bitmap_distinct proves construct-and-count;
    this key proves the merge is lossless by building the partials over a
    real shard dimension (calendar day) and hash-matching the exact
    count. Bitmap OR is commutative and associative, so daily partials
    can also roll up month→year hierarchically with the same operator."""
    ev = load_events(spark, sf_dir).select(
        "event_type", "user_id", F.col("ts").cast("date").alias("day")
    )
    per_day = ev.groupBy(
        "event_type", "day", F.expr("bitmap_bucket_number(user_id)").alias("b")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
    )
    merged = per_day.groupBy("event_type", "b").agg(
        F.expr("bitmap_count(bitmap_or_agg(bm))").alias("cnt")
    )
    return merged.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n_users")
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
        SELECT o.o_orderpriority AS pri, o.o_totalprice AS price,
               count(*) AS wt
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority, o.o_orderkey, o.o_totalprice
    ),
    c AS (
        SELECT pri, price, wt,
               sum(wt) OVER (PARTITION BY pri
                             ORDER BY price, wt
                             ROWS UNBOUNDED PRECEDING) AS cum,
               sum(wt) OVER (PARTITION BY pri) AS tot
        FROM w
    )
    SELECT pri AS o_orderpriority,
           min(price) AS weighted_median_price
    FROM c
    WHERE cum * 2 >= tot
    GROUP BY pri
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Weighted median — each order's price weighted by its lineitem
    count, per priority class: the first value whose CUMULATIVE weight
    crosses half the total (lower weighted median, a deterministic
    convention both engines replay exactly — no interpolation, so no
    float averaging of two middles). One shuffle builds the weighted
    value set, one partitioned window accumulates; percentile_approx is
    the sketch when even the per-group sort is too wide at 100 TB. The
    (price, wt) ordering tiebreak makes the cumulative sum — and thus
    the crossing point — total-order stable."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    w = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
        )
        .agg(F.count(F.lit(1)).alias("wt"))
    )
    wc = Window.partitionBy("pri").orderBy("price", "wt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt_tot = Window.partitionBy("pri")
    c = w.select(
        "pri",
        "price",
        F.sum("wt").over(wc).alias("cum"),
        F.sum("wt").over(wt_tot).alias("tot"),
    )
    return (
        c.filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy(F.col("pri").alias("o_orderpriority"))
        .agg(F.min("price").alias("weighted_median_price"))
    )
