"""§2.C — joins (SURVEY.md).

Strategy notes for scale: equi-joins shuffle on their keys and AQE picks
broadcast vs sort-merge at runtime; dimension tables (region/nation/supplier/
customer at 100 TB fact scale) are explicitly broadcast-hinted where we know
they are small. Theta/interval joins are bounded by an equality conjunct or a
small literal side so they never degenerate into an unbounded nested loop.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_events, load_table
from data_transform_spark.registry import register


@register(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner(spark, sf_dir):
    """hash equi-join orders x customer."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_left(spark, sf_dir):
    """left outer join preserving all customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_right",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_right(spark, sf_dir):
    """right outer join preserving all orders."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "join_full",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 9500) c
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 490000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_full(spark, sf_dir):
    """full outer join with unmatched rows on both sides."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 490000)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_acctbal", "o_orderkey", "o_totalprice"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
    """,
)
def join_semi(spark, sf_dir):
    """left semi join (EXISTS) - customers with big orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
    """,
)
def join_anti(spark, sf_dir):
    """left anti join (NOT EXISTS) - customers without big orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def join_cross(spark, sf_dir):
    """cartesian product of the two smallest dims."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_broadcast",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_broadcast(spark, sf_dir):
    """Fact-to-dims with explicit broadcast hints — no shuffle of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            # exact decimal sum -> order-independent, bit-identical double
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "join_theta",
    oracle="""
    SELECT b.band, p.p_partkey, p.p_retailprice
    FROM part p
    JOIN (VALUES ('low', 900.0, 925.0), ('mid', 925.0, 950.0),
                 ('high', 950.0, 975.0), ('top', 975.0, 1000.0)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    """,
)
def join_theta(spark, sf_dir):
    """Non-equi join against a tiny literal band table (broadcast NLJ)."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 900.0, 925.0), ("mid", 925.0, 950.0), ("high", 950.0, 975.0), ("top", 975.0, 1000.0)],
        "band string, lo double, hi double",
    )
    cond = (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi)
    return p.join(F.broadcast(bands), cond).select("band", "p_partkey", "p_retailprice")


@register(
    "join_multiway",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_multiway(spark, sf_dir):
    """TPC-H Q5-shaped 5-way star join; dims broadcast, facts never re-shuffled."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "join_self",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
           ROUND(a.l_extendedprice + b.l_extendedprice, 4) AS pair_price
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    """,
)
def join_self(spark, sf_dir):
    """self-join: line-item pairs within one order."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("ln_a"),
        F.col("b.l_linenumber").alias("ln_b"),
        F.round(F.col("a.l_extendedprice") + F.col("b.l_extendedprice"), 4).alias("pair_price"),
    )


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: each purchase gets the latest click at-or-before its ts.

    Spark has no native as-of join; implemented as union-tag + running
    last(ignorenulls) window — a single shuffle on (user_id), no point-joins.
    At equal ts the click sorts first (tag 0), matching DuckDB's ``>=`` bound.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("ts").alias("click_src_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("timestamp_ntz").alias("click_src_ts"),
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("click_ts", F.last("click_src_ts", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select("event_id", "user_id", "ts", "click_ts")
    )


ASOF_TOL_HOURS = 2  # tolerance window for the bounded as-of join


@register(
    "join_asof_tolerance",
    oracle=f"""
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN c.ts >= p.ts - INTERVAL {ASOF_TOL_HOURS} HOUR
                THEN c.ts END AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a TOLERANCE bound (pandas merge_asof's ``tolerance=``,
    QuestDB/kdb's bounded asof): each purchase takes the latest click
    at-or-before its ts only if that click is within ASOF_TOL_HOURS;
    staler matches become NULL. This completes the asof family
    (backward / forward / nearest / tolerance) — the bound is what makes
    asof joins honest in feeds with gaps: a quote from last Tuesday must
    not price today's trade.

    Same single-shuffle union-tag + running last(ignorenulls) plan as
    join_asof; the tolerance is a row-local post-predicate on the carried
    match, NOT a join-condition change — correct because the carried
    click is the MOST RECENT at-or-before, so if it misses the window no
    other click can be inside it. The oracle nulls DuckDB's ASOF match
    under the identical CASE."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("ts").alias("click_src_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("timestamp_ntz").alias("click_src_ts"),
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("click_src_ts", ignorenulls=True).over(w)
    return (
        unioned.withColumn("raw_click_ts", carried)
        .filter(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(
                F.col("raw_click_ts")
                >= F.col("ts") - F.expr(f"INTERVAL {ASOF_TOL_HOURS} HOURS"),
                F.col("raw_click_ts"),
            ).alias("click_ts"),
        )
    )


def salted_join(left, right, left_key: str, right_key: str, n_salts: int = 8):
    """Skew-resistant equi-join: replicate the build side across n_salts and
    scatter the probe side by a deterministic salt (md5 of the key), so one
    hot key spreads over n_salts reducers instead of stalling one task.

    Result is identical to a plain inner join; only the shuffle layout
    changes. At 100 TB this (or AQE's skewJoin) is mandatory for power-law
    keys; n_salts scales with the observed skew factor.
    """
    salt = (
        F.conv(F.substring(F.md5(F.col(left_key).cast("string")), 1, 4), 16, 10).cast("long")
        % n_salts
    )
    salted_left = left.withColumn("_salt", salt)
    salted_right = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(n_salts).select(F.col("id").alias("_salt"))
        )
    )
    joined = salted_left.join(
        salted_right,
        (F.col(left_key) == F.col(right_key)) & (salted_left["_salt"] == salted_right["_salt"]),
    )
    return joined.drop("_salt")


@register(
    "join_skew_salted",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def join_skew_salted(spark, sf_dir):
    """Salted join, hash-checked equal to the plain join (layout-only change)."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return salted_join(ev, c, "user_id", "c_custkey").select("event_id", "user_id", "c_name")


@register(
    "join_interval",
    oracle="""
    SELECT a.event_id AS err_id, b.event_id AS next_id, b.event_type AS next_type
    FROM (SELECT * FROM events WHERE event_type = 'error') a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
     AND a.event_id <> b.event_id
    """,
)
def join_interval(spark, sf_dir):
    """Interval join bounded by the user_id equality conjunct (hash join +
    residual range filter — never a cartesian)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").alias("a")
    b = ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR"))
        & (F.col("a.event_id") != F.col("b.event_id"))
    )
    return a.join(b, cond).select(
        F.col("a.event_id").alias("err_id"),
        F.col("b.event_id").alias("next_id"),
        F.col("b.event_type").alias("next_type"),
    )


RANGE_BUCKET_W = 10.0  # coarse bucket width for the range-join expansion


@register(
    "join_range_bucketed",
    oracle="""
    WITH bands AS (
        SELECT p_brand,
               min(p_retailprice) AS lo,
               min(p_retailprice) + 0.2 * (max(p_retailprice) - min(p_retailprice)) AS hi
        FROM part GROUP BY p_brand
    ),
    items AS (
        SELECT l_orderkey, l_linenumber, l_extendedprice / l_quantity AS unit
        FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT b.p_brand, count(*) AS n_lines,
           ROUND(min(i.unit), 4) AS min_unit, ROUND(max(i.unit), 4) AS max_unit
    FROM items i JOIN bands b ON i.unit >= b.lo AND i.unit <= b.hi
    GROUP BY b.p_brand
    """,
)
def join_range_bucketed(spark, sf_dir):
    """PURE range join (no equality key): unit prices against per-brand
    price bands — executed as a BUCKETIZED equi-join, the scale shape.

    Naively this is a BroadcastNestedLoopJoin (every row against every
    band — quadratic). Instead each band explodes to the coarse buckets it
    overlaps (width 10, a few per band), each item computes its single
    bucket, and the join becomes bucket-equality + residual range filter —
    shuffle-hash-joinable, linear in rows × avg-bands-per-bucket. The
    DuckDB twin runs the plain range join (its IEJoin), so the hash check
    proves the bucketing is lossless. At 100 TB pick W so a bucket's band
    list stays small; same trick underlies interval/IP-range/geo-band
    joins."""
    p = load_table(spark, sf_dir, "part")
    bands = p.groupBy("p_brand").agg(
        F.min("p_retailprice").alias("lo"),
        (
            F.min("p_retailprice")
            + 0.2 * (F.max("p_retailprice") - F.min("p_retailprice"))
        ).alias("hi"),
    )
    w = F.lit(RANGE_BUCKET_W)
    bands_b = bands.select(
        "p_brand",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / w).cast("long"),
                F.floor(F.col("hi") / w).cast("long"),
            )
        ).alias("bucket"),
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    items = li.select(
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit")
    ).withColumn("bucket", F.floor(F.col("unit") / w).cast("long"))
    return (
        items.join(F.broadcast(bands_b), "bucket")
        .filter((F.col("unit") >= F.col("lo")) & (F.col("unit") <= F.col("hi")))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.min("unit"), 4).alias("min_unit"),
            F.round(F.max("unit"), 4).alias("max_unit"),
        )
    )


@register(
    "join_nullsafe",
    oracle="""
    SELECT l.k, n_name, n_cust
    FROM (SELECT nullif(c_nationkey, 3) AS k, count(*) AS n_cust
          FROM customer GROUP BY 1) l
    JOIN (SELECT nullif(n_nationkey, 3) AS k, n_name FROM nation) r
      ON l.k IS NOT DISTINCT FROM r.k
    ORDER BY n_name
    """,
)
def join_nullsafe(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping, here pairing the NULLed-out
    nation 3 on both sides.

    Spark plans `<=>` as an ordinary equi hash join (NULL hashes to a
    normal bucket under null-safe semantics), so the scale story is
    identical to join_inner — no fallback to nested-loop."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    left = c.groupBy(
        F.nullif(F.col("c_nationkey"), F.lit(3)).alias("k")
    ).agg(F.count(F.lit(1)).alias("n_cust"))
    right = n.select(
        F.nullif(F.col("n_nationkey"), F.lit(3)).alias("rk"), "n_name"
    )
    return (
        left.join(F.broadcast(right), left.k.eqNullSafe(F.col("rk")))
        .select("k", "n_name", "n_cust")
        .orderBy("n_name")
    )


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_bloom_prefilter(spark, sf_dir):
    """Semi-join with a runtime bloom-filter prefilter on the fact side.

    The dim keys (urgent orders) are folded into a 65 536-bit bloom filter
    stored as a <=1024-row (word, mask) table — built with ONE tiny shuffle
    (bit_or per 64-bit word). The fact probe is a broadcast hash join on the
    word index plus a JVM bit test, which discards definite non-members
    BEFORE the exact semi-join shuffles the surviving rows. False positives
    are removed by the exact semi-join, so the result is identical to the
    plain IN — only the shuffled volume changes. This is the manual twin of
    Spark's runtime row-level filtering / DPP: at 100 TB the bitmap stays a
    few KB however large the dim grows (vs an IN-set that grows linearly),
    and the prefilter cuts the fact shuffle by the dim's selectivity.
    """
    m_bits = 16  # 2^16-bit filter -> at most 1024 64-bit words
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    h = F.pmod(F.xxhash64("o_orderkey"), F.lit(1 << m_bits))
    bloom = (
        keys.select(
            F.shiftright(h, 6).alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(o_orderkey), {1 << m_bits}) % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
    )
    lh = F.pmod(F.xxhash64("l_orderkey"), F.lit(1 << m_bits))
    probed = (
        li.withColumn("_w", F.shiftright(lh, 6))
        .withColumn("_b", (lh % 64).cast("int"))
        .join(F.broadcast(bloom), F.col("_w") == F.col("word"))
        .filter(F.expr("(mask & shiftleft(CAST(1 AS BIGINT), _b)) != 0"))
        .drop("_w", "_b", "word", "mask")
    )
    return probed.join(keys, probed.l_orderkey == keys.o_orderkey, "left_semi").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


ASOF_TOL_US = 30 * 60 * 1_000_000  # nearest-match tolerance: 30 minutes


@register(
    "join_asof_nearest",
    oracle=f"""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT c.ts FROM events c
            WHERE c.event_type = 'click' AND c.user_id = p.user_id
              AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= {ASOF_TOL_US}
            ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts
            LIMIT 1) AS click_ts
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-neighbor as-of join: each purchase matches the click with the
    smallest |time delta| within a 30-minute tolerance (earlier click wins a
    tie), NULL when no click qualifies.

    Spark-first plan: union-tag the two event sets and take BOTH directional
    candidates with two window passes over one (user_id, ts) sort — running
    last(ignorenulls) for the backward candidate and first(ignorenulls) over
    the following frame for the forward one — then pick the closer
    candidate. One shuffle, no per-row point join; the oracle's correlated
    ORDER-BY-LIMIT subquery is the O(N*M) semantics it replaces. At equal
    ts the click sorts first (tag 0), so a same-instant click is the
    backward candidate with delta 0, matching the oracle's tie rule.
    """
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("ts").alias("cand_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("timestamp").alias("cand_ts"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "tag")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tus = F.expr("unix_micros(ts)")
    d_back = tus - F.expr("unix_micros(back_ts)")
    d_fwd = F.expr("unix_micros(fwd_ts)") - tus
    return (
        clicks.unionByName(purchases)
        .withColumn("back_ts", F.last("cand_ts", ignorenulls=True).over(back))
        .withColumn("fwd_ts", F.first("cand_ts", ignorenulls=True).over(fwd))
        .filter(F.col("tag") == 1)
        .withColumn(
            "back_ok", F.col("back_ts").isNotNull() & (d_back <= ASOF_TOL_US)
        )
        .withColumn("fwd_ok", F.col("fwd_ts").isNotNull() & (d_fwd <= ASOF_TOL_US))
        .withColumn(
            "click_ts",
            F.when(
                F.col("back_ok") & (~F.col("fwd_ok") | (d_back <= d_fwd)),
                F.col("back_ts"),
            ).when(F.col("fwd_ok"), F.col("fwd_ts")),
        )
        .select("event_id", "user_id", "ts", "click_ts")
    )


@register(
    "join_fuzzy_match",
    oracle="""
    WITH probes AS (
        SELECT c_custkey AS probe_key,
               substring(c_name, 1, 5) || substring(c_name, 7) AS probe_name
        FROM customer WHERE c_custkey % 97 = 0
    ),
    cand AS (
        SELECT p.probe_key, c.c_custkey AS matched_key,
               levenshtein(p.probe_name, c.c_name) AS dist
        FROM probes p JOIN customer c
          ON abs(length(p.probe_name) - length(c.c_name)) <= 2
         AND levenshtein(p.probe_name, c.c_name) <= 2
    )
    SELECT probe_key, matched_key, CAST(dist AS BIGINT) AS dist,
           probe_key = matched_key AS is_source
    FROM cand
    QUALIFY row_number() OVER (PARTITION BY probe_key ORDER BY dist, matched_key) = 1
    """,
)
def join_fuzzy_match(spark, sf_dir):
    """Fuzzy entity-resolution join: a probe set of corrupted names (one
    deleted character) matched back to the customer table within edit
    distance 2, keeping the best (lowest-distance) match per probe — the
    record-linkage shape behind dedupe-by-name, catalog matching, and log
    attribution with dirty keys.

    Plan: probes broadcast (the probe side is small by construction in
    lookup workloads); the LENGTH band |len(a)-len(b)| <= 2 is a LOSSLESS
    prefilter for edit distance <= 2 (each edit changes length by at most
    1) and is evaluated before the O(len²) levenshtein, so the expensive
    predicate only runs on the banded pairs. At 100 TB with a LARGE probe
    side, the same band becomes the join key (bucket by length, replicate
    ±2) and a q-gram prefix filter cuts candidates further — the blocking
    ladder is the containment/jaccard one, applied to strings."""
    c = load_table(spark, sf_dir, "customer")
    probes = c.filter(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("probe_key"),
        F.concat(
            F.substring("c_name", 1, 5), F.expr("substring(c_name, 7)")
        ).alias("probe_name"),
    )
    cand = (
        F.broadcast(probes)
        .join(
            c,
            (
                F.abs(F.length("probe_name") - F.length("c_name")) <= 2
            )
            & (F.levenshtein(F.col("probe_name"), F.col("c_name")) <= 2),
        )
        .select(
            "probe_key",
            F.col("c_custkey").alias("matched_key"),
            F.levenshtein(F.col("probe_name"), F.col("c_name"))
            .cast("long")
            .alias("dist"),
        )
    )
    w = Window.partitionBy("probe_key").orderBy("dist", "matched_key")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "probe_key",
            "matched_key",
            "dist",
            (F.col("probe_key") == F.col("matched_key")).alias("is_source"),
        )
    )


@register(
    "join_hints",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 200000
    """,
)
def join_hints(spark, sf_dir):
    """Join-strategy hints — the explicit override lane when the
    optimizer's estimate is wrong: here SHUFFLE_HASH forces a shuffled
    hash join (build the smaller post-shuffle side as a hash map, no
    sort) where plain cost rules might pick sort-merge or broadcast.
    Values are strategy-invariant — the oracle is the unhinted join — and
    the plan really honors the hint (pinned by the ShuffledHashJoin
    plan-shape test). The hint tiers (BROADCAST > MERGE > SHUFFLE_HASH >
    SHUFFLE_REPLICATE_NL) are the same knobs a 100 TB tuning pass
    reaches for when AQE's runtime stats still can't see through a UDF
    or an exotic filter."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    c = load_table(spark, sf_dir, "customer").hint("shuffle_hash")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "join_asof_forward",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts, p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def join_asof_forward(spark, sf_dir):
    """FORWARD as-of join — each click matched to the EARLIEST purchase
    at-or-after it (time-to-convert attribution), the mirror of
    join_asof's backward lookup. Same single-shuffle shape: union-tag
    both sides, then first(ignorenulls) over the FOLLOWING frame; at
    equal ts the purchase sorts after the click (tag order), so it is
    inside the frame — matching DuckDB's ``<=`` forward ASOF bound.
    Never a per-row point join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.col("ts").alias("purchase_src_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.lit(None).cast("timestamp_ntz").alias("purchase_src_ts"),
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        unioned.withColumn(
            "purchase_ts", F.first("purchase_src_ts", ignorenulls=True).over(w)
        )
        .filter(F.col("tag") == 0)
        .select("event_id", "user_id", "ts", "purchase_ts")
    )



@register(
    "join_interval_overlap",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_shipdate,
               l_shipdate + to_days((CAST(l_quantity AS INTEGER) % 14) + 1)
                   AS l_arrivedate,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_shipdate, l_quantity,
                            l_partkey, l_suppkey) AS rn
        FROM lineitem
    ),
    pairs AS (
        SELECT a.l_orderkey AS okey,
               datediff('day',
                        greatest(a.l_shipdate, b.l_shipdate),
                        least(a.l_arrivedate, b.l_arrivedate)) AS ov_days
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey
         AND a.rn < b.rn
         AND a.l_shipdate <= b.l_arrivedate
         AND b.l_shipdate <= a.l_arrivedate
    ),
    sizes AS (SELECT l_orderkey AS okey, count(*) AS n_lines FROM li GROUP BY 1)
    SELECT s.okey AS l_orderkey, CAST(s.n_lines AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_overlapping_pairs,
           CAST(max(p.ov_days) AS BIGINT) AS max_overlap_days
    FROM sizes s JOIN pairs p ON p.okey = s.okey
    GROUP BY s.okey, s.n_lines
    """,
)
def join_interval_overlap(spark, sf_dir):
    """INTERVAL-OVERLAP self-join (Allen's-algebra overlaps predicate) —
    the family member join_interval (point-in-range probe) and
    join_range_bucketed (banded numeric ranges) don't cover: pairs of
    intervals that overlap EACH OTHER. Here: per order, which line items
    were in transit simultaneously — the concurrency question behind
    shipment consolidation, resource-booking conflicts, and session
    co-presence. Per order with >= 1 overlap: line count, overlapping
    pair count, longest pairwise overlap in days (greatest(start) ..
    least(end), integer datediff — exact cross-engine). The transit
    window is DERIVED (ship + 1..14 days from l_quantity — this fixture
    carries no receiptdate column; the derivation is deterministic and
    identical in both engines, and the operator is agnostic to where the
    interval endpoints come from).

    Scale shape: the self-join is keyed by the natural entity key
    (l_orderkey) — ONE shuffle, candidate pairs bounded by
    lines-per-key², with lines-per-key <= 7 by TPC-H construction;
    never corpus². The oblique inequality predicates ride the equi-join
    as residual join filters, so the plan stays a keyed hash/merge join,
    not a nested loop (plan-pinned). The generic UNKEYED interval
    overlap needs the banded-grid treatment (join_range_bucketed's
    recipe on both endpoints) — documented there; the keyed form is what
    entity-scoped schemas overwhelmingly need."""
    arrive = F.date_add(
        F.col("l_shipdate"), (F.col("l_quantity").cast("int") % 14) + 1
    )
    # pair identity = per-order row_number, NOT l_linenumber: the fixture's
    # (orderkey, linenumber) is NOT unique, and a '<' on a non-unique key
    # silently drops the pairs between duplicates (found by the brute-force
    # test). Ties in the sort key can only occur between rows with
    # identical (shipdate, quantity) — identical INTERVALS — so any
    # deterministic tie assignment yields the same pair statistics.
    w_rn = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_shipdate", "l_quantity", "l_partkey", "l_suppkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_shipdate",
        arrive.alias("l_arrivedate"),
        F.row_number().over(w_rn).alias("rn"),
    )
    a = li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("rn").alias("rn_a"),
        F.col("l_shipdate").alias("ship_a"),
        F.col("l_arrivedate").alias("arr_a"),
    )
    b = li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("rn").alias("rn_b"),
        F.col("l_shipdate").alias("ship_b"),
        F.col("l_arrivedate").alias("arr_b"),
    )
    pairs = (
        a.join(b, "okey")
        .filter(
            (F.col("rn_a") < F.col("rn_b"))
            & (F.col("ship_a") <= F.col("arr_b"))
            & (F.col("ship_b") <= F.col("arr_a"))
        )
        .select(
            "okey",
            F.datediff(
                F.least("arr_a", "arr_b"), F.greatest("ship_a", "ship_b")
            ).alias("ov_days"),
        )
    )
    sizes = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    return (
        sizes.join(pairs, "okey")
        .groupBy("okey", "n_lines")
        .agg(
            F.count(F.lit(1)).alias("n_overlapping_pairs"),
            F.max("ov_days").cast("long").alias("max_overlap_days"),
        )
        .select(
            F.col("okey").alias("l_orderkey"),
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_overlapping_pairs").cast("long").alias("n_overlapping_pairs"),
            "max_overlap_days",
        )
    )
