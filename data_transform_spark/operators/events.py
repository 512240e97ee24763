"""Event-stream analytics composites — funnel and cohort retention.

The two canonical product-analytics shapes over an events table. Both are
one-or-two-shuffle plans keyed on user_id; at 100 TB the events scan
partitions by time and the per-user aggregates are map-side-partial
hash aggregations (no windows over raw events needed).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_events, load_table
from data_transform_spark.registry import register


@register(
    "events_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(t_signup) AS signed_up,
           count(CASE WHEN t_view > t_signup THEN 1 END) AS viewed_after_signup,
           count(CASE WHEN t_click > t_view AND t_view > t_signup THEN 1 END)
               AS clicked_in_order,
           count(CASE WHEN t_purchase > t_click AND t_click > t_view
                       AND t_view > t_signup THEN 1 END) AS completed_funnel
    FROM s
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered funnel: signup → first view → first click → first purchase,
    each stage strictly after the previous one's first occurrence.

    One shuffle: the conditional-min aggregate per user collapses the raw
    events; the funnel conditions are then row-local on the tiny per-user
    frame. Never a self-join per stage (the naive shape, k shuffles)."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(etype):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    in_order2 = F.col("t_view") > F.col("t_signup")
    in_order3 = (F.col("t_click") > F.col("t_view")) & in_order2
    in_order4 = (F.col("t_purchase") > F.col("t_click")) & in_order3
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("signed_up"),
        F.count(F.when(in_order2, 1)).alias("viewed_after_signup"),
        F.count(F.when(in_order3, 1)).alias("clicked_in_order"),
        F.count(F.when(in_order4, 1)).alias("completed_funnel"),
    )


@register(
    "events_retention",
    oracle="""
    WITH f AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        FROM events
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, active_week) / 7 AS INTEGER) AS week_n,
           count(*) AS active_users
    FROM a JOIN f USING (user_id)
    GROUP BY cohort_week, week_n
    """,
)
def events_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-seen week, counted in
    each subsequent active week (week_n = weeks since cohort).

    Two aggregates on the same user_id key — AQE reuses the exchange — then
    a broadcast of the per-user cohort map onto the distinct activity rows.
    The classic triangle retention matrix, fully deterministic."""
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    week_n = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("int")
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", week_n.alias("week_n"))
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


ATTR_WINDOW_H = 24  # attribution lookback, hours


@register(
    "events_attribution",
    oracle=f"""
    WITH touches AS (
        SELECT p.event_id AS purchase_id, p.user_id, p.value AS amount,
               c.event_id AS click_id
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts <= p.ts
         AND c.ts > p.ts - INTERVAL {ATTR_WINDOW_H} HOUR
        WHERE p.event_type = 'purchase'
    )
    SELECT click_id, count(*) AS n_purchases,
           ROUND(CAST(sum(CAST(credit AS DECIMAL(18,8))) AS DOUBLE), 6)
               AS attributed
    FROM (
        SELECT click_id, purchase_id,
               amount / count(*) OVER (PARTITION BY purchase_id) AS credit
        FROM touches
    )
    GROUP BY click_id
    """,
)
def events_attribution(spark, sf_dir):
    """Linear multi-touch attribution: every purchase's value is split
    equally across the user's clicks in the prior {ATTR_WINDOW_H} h, then
    rolled up to attributed revenue per click.

    Two key-partitioned shuffles: the touch join is equality-driven on
    user_id (range residual, never a cartesian — same shape as
    join_interval), the per-purchase fan-out count is a window on
    purchase_id, and the final rollup keys on click_id. Credit fractions
    are summed through DECIMAL(18,8) partials so the rollup is exact in
    any partition order. Last-touch attribution is the join_asof special
    case; position-weighted just changes the credit expression."""
    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("amount"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    touches = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts")
            > F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_H} HOUR")
        ),
    )
    wp = Window.partitionBy("purchase_id")
    credited = touches.select(
        "click_id",
        "purchase_id",
        (F.col("amount") / F.count(F.lit(1)).over(wp)).alias("credit"),
    )
    return credited.groupBy("click_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(
            F.sum(F.col("credit").cast("decimal(18,8)")).cast("double"), 6
        ).alias("attributed"),
    )


ZS_LOOKBACK = 24  # trailing buckets for the rolling baseline
ZS_MIN_N = 12  # minimum history before scoring
ZS_THRESHOLD = 2.0


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH buckets AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, hour_ts, n,
               CAST(sum(n) OVER w AS BIGINT) AS s1,
               CAST(sum(n * n) OVER w AS BIGINT) AS s2,
               count(n) OVER w AS cnt
        FROM buckets
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                     ROWS BETWEEN {ZS_LOOKBACK} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_ts, n,
           round((n - s1 / cnt)
                 / sqrt(greatest((s2 - s1 * s1 / cnt) / (cnt - 1), 1e-9)), 6)
               AS z
    FROM scored
    WHERE cnt >= {ZS_MIN_N}
      AND abs(round((n - s1 / cnt)
                    / sqrt(greatest((s2 - s1 * s1 / cnt) / (cnt - 1), 1e-9)), 6))
          > {ZS_THRESHOLD}
    """,
)
def events_anomaly_zscore(spark, sf_dir):
    """Rolling z-score anomaly detection over hourly event-rate series:
    each (type, hour) bucket is scored against the mean/std of its own
    trailing {ZS_LOOKBACK} buckets (current excluded) and flagged when
    |z| > {ZS_THRESHOLD} with at least {ZS_MIN_N} history points.

    The variance comes from EXPLICIT rolling integer sums (Σn, Σn²) —
    bit-identical across engines and partition orders because the inputs
    are exact integers and both engines evaluate the same expression tree
    (a windowed stddev_samp would tie the result to each engine's
    streaming-moments implementation). Plan: one shuffle for the bucket
    aggregate, one for the per-type window — and |types| is tiny, so at
    100 TB the window stage is trivially parallel while the bucket
    aggregate does the heavy lifting map-side. Gaps (empty hours) simply
    don't produce buckets; compose ts_gapfill first for strict-cadence
    baselines."""
    ev = load_events(spark, sf_dir)
    buckets = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-ZS_LOOKBACK, -1)
    )
    scored = buckets.select(
        "event_type",
        "hour_ts",
        "n",
        F.sum("n").over(w).cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("long").alias("s2"),
        F.count("n").over(w).alias("cnt"),
    )
    mean = F.col("s1") / F.col("cnt")
    var = F.greatest(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("cnt"))
        / (F.col("cnt") - 1),
        F.lit(1e-9),
    )
    z = F.round((F.col("n") - mean) / F.sqrt(var), 6)
    return (
        scored.filter(F.col("cnt") >= ZS_MIN_N)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > ZS_THRESHOLD)
        .select("event_type", "hour_ts", "n", "z")
    )


@register(
    "agg_entropy",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS k
        FROM events GROUP BY user_id, event_type
    ),
    n AS (SELECT user_id, CAST(sum(k) AS BIGINT) AS n FROM c GROUP BY user_id)
    SELECT c.user_id, n.n AS n_events,
           round(-sum((k / n.n) * ln(k / n.n)) / ln(2), 6) AS entropy_bits
    FROM c JOIN n ON c.user_id = n.user_id
    GROUP BY c.user_id, n.n
    """,
)
def agg_entropy(spark, sf_dir):
    """Shannon entropy (bits) of each user's event-type distribution — the
    behavioral-diversity metric: 0 = single-activity users, log2(5) ≈ 2.32
    = uniform across all five types. The same aggregate scores label
    balance in training splits and source diversity in corpus shards.

    Two key-local aggregates on user_id (counts, then the entropy fold) —
    one shuffle, since every stage reuses the same hash partitioning. The
    probabilities come from exact integer counts, and ln/division are
    evaluated with the identical expression tree in both engines (the
    earlier strict audit established that libm/JVM ln agree bit-for-bit
    here via text_tfidf), so the rounded score is engine-portable."""
    ev = load_events(spark, sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("k"))
    n = c.groupBy("user_id").agg(F.sum("k").cast("long").alias("n"))
    p = F.col("k") / F.col("n")
    return (
        c.join(n, "user_id")
        .groupBy("user_id", F.col("n").alias("n_events"))
        .agg(
            F.round(-F.sum(p * F.log(p)) / F.log(F.lit(2.0)), 6).alias(
                "entropy_bits"
            )
        )
    )


BOT_RATE = 6  # events in a single hour
BOT_ENTROPY = 1.2  # bits; low diversity + high rate = automation signature


@register(
    "events_bot_flag",
    oracle=f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    peak AS (SELECT user_id, CAST(max(n) AS BIGINT) AS max_hourly
             FROM hourly GROUP BY user_id),
    c AS (SELECT user_id, event_type, count(*) AS k
          FROM events GROUP BY user_id, event_type),
    tot AS (SELECT user_id, CAST(sum(k) AS BIGINT) AS n FROM c GROUP BY user_id),
    ent AS (
        SELECT c.user_id,
               round(-sum((k / t.n) * ln(k / t.n)) / ln(2), 6) AS entropy_bits
        FROM c JOIN tot t ON c.user_id = t.user_id
        GROUP BY c.user_id
    )
    SELECT p.user_id, p.max_hourly, e.entropy_bits,
           p.max_hourly >= {BOT_RATE} AND e.entropy_bits < {BOT_ENTROPY}
               AS is_bot
    FROM peak p JOIN ent e ON p.user_id = e.user_id
    """,
)
def events_bot_flag(spark, sf_dir):
    """Rule-based automation flag per user: burst rate (max events in any
    one hour) combined with low behavioral entropy — the
    high-volume-single-action signature that poisons engagement data and,
    in a training-corpus pipeline, marks machine-generated interaction
    logs for exclusion.

    Both features reduce over the SAME user_id partitioning (hourly peak
    and type entropy), so the composite is two key-local aggregate chains
    joined on the key — no extra shuffle beyond the feature builds. The
    thresholds are data-model constants; at scale they'd come from a
    broadcast config table, same plan. Every arithmetic input is an exact
    integer count, so the flag is bit-portable across engines."""
    ev = load_events(spark, sf_dir)
    peak = (
        ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.max("n").cast("long").alias("max_hourly"))
    )
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("k"))
    tot = c.groupBy("user_id").agg(F.sum("k").cast("long").alias("n"))
    p = F.col("k") / F.col("n")
    ent = (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(-F.sum(p * F.log(p)) / F.log(F.lit(2.0)), 6).alias(
                "entropy_bits"
            )
        )
    )
    return peak.join(ent, "user_id").select(
        "user_id",
        "max_hourly",
        "entropy_bits",
        (
            (F.col("max_hourly") >= BOT_RATE)
            & (F.col("entropy_bits") < BOT_ENTROPY)
        ).alias("is_bot"),
    )


@register(
    "events_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev
        FROM events
    )
    SELECT prev, event_type AS curr, count(*) AS n,
           count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev) AS p
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, event_type
    """,
)
def events_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences:
    (prev event_type -> curr event_type) counts and row-normalized
    transition probabilities — the user-journey fingerprint behind
    next-action prediction and bot detection.

    One window sort per user (lag) + one aggregation: both shuffle on
    user_id / the 5x5 transition key respectively, so the plan is two
    exchanges regardless of corpus size; the transition matrix itself is
    |event_types|^2 rows — driver-tiny at any scale. p = n / row_total is
    an exact integer-ratio double, bit-identical across engines.
    (event_id breaks ts ties so the sequence — and thus the matrix — is
    deterministic.)"""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    counts = seq.groupBy("prev", F.col("event_type").alias("curr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    row_total = Window.partitionBy("prev")
    return counts.select(
        "prev",
        "curr",
        "n",
        (F.col("n") * 1.0 / F.sum("n").over(row_total)).alias("p"),
    )


@register(
    "events_windowed_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(t_signup) AS signed_up,
           count(CASE WHEN t_view > t_signup
                       AND t_view <= t_signup + INTERVAL 2 HOUR
                      THEN 1 END) AS viewed_within_2h,
           count(CASE WHEN t_view > t_signup
                       AND t_view <= t_signup + INTERVAL 2 HOUR
                       AND t_click > t_view
                       AND t_click <= t_view + INTERVAL 2 HOUR
                      THEN 1 END) AS clicked_within_2h
    FROM s
    """,
)
def events_windowed_funnel(spark, sf_dir):
    """Time-bounded funnel: each stage must follow the previous one's first
    occurrence WITHIN a 2-hour conversion window — the product-analytics
    variant of events_funnel where late conversions don't count. Same
    single-shuffle shape (conditional-min per user, then row-local interval
    checks); the deadline arithmetic is timestamp + INTERVAL, evaluated
    identically on both engines. Never the naive per-stage self-join."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(etype):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
    )
    viewed = (F.col("t_view") > F.col("t_signup")) & (
        F.col("t_view") <= F.expr("t_signup + INTERVAL 2 HOUR")
    )
    clicked = (
        viewed
        & (F.col("t_click") > F.col("t_view"))
        & (F.col("t_click") <= F.expr("t_view + INTERVAL 2 HOUR"))
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("signed_up"),
        F.count(F.when(viewed, 1)).alias("viewed_within_2h"),
        F.count(F.when(clicked, 1)).alias("clicked_within_2h"),
    )


ROLLING_WINDOW_DAYS = 7  # trailing-week active-user window


@register(
    "events_rolling_actives",
    oracle="""
    WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
         days AS (SELECT DISTINCT day FROM ud)
    SELECT CAST(d.day AS VARCHAR) AS day,
           count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS dau,
           count(DISTINCT u.user_id) AS wau
    FROM days d
    JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def events_rolling_actives(spark, sf_dir):
    """DAU / trailing-7-day WAU per calendar day — the engagement headline
    metric. Rolling DISTINCT cannot ride a window frame (no distinct over
    RANGE), so the scalable form is the bounded interval join: distinct
    (user, day) activity rows join to the day spine within the trailing
    window, multiplying the (already day-deduplicated) activity set by at
    most the window length — 7× a |users|·|days| frame, NOT 7× raw events.
    One distinct shuffle + one bounded join + one agg; the spine side is
    tiny and broadcast."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct().select(F.col("day").alias("d"))
    return (
        ud.join(
            F.broadcast(days),
            (F.col("day") >= F.date_sub(F.col("d"), ROLLING_WINDOW_DAYS - 1))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("d"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .select(F.col("d").cast("string").alias("day"), "dau", "wau")
    )


@register(
    "events_dow_seasonality",
    oracle="""
    WITH d AS (
        SELECT dayname(ts) AS dow, count(*) AS n_events
        FROM events GROUP BY 1
    )
    SELECT dow, n_events,
           ROUND(CAST(n_events AS DOUBLE)
                 / (SELECT sum(n_events) FROM d), 6) AS share,
           ROUND(CAST(n_events AS DOUBLE) * 7
                 / (SELECT sum(n_events) FROM d), 4) AS seasonality_index
    FROM d
    """,
)
def events_dow_seasonality(spark, sf_dir):
    """Day-of-week seasonality profile: event share per weekday and the
    seasonality index (share × 7; 1.0 = flat traffic) — the capacity-
    planning / anomaly-baseline primitive. The total rides in-plan as a
    broadcast 1-row aggregate over the 7-row day frame (never an eager
    count), and weekday names — not engine-specific numeric dow
    conventions (Spark counts Sunday=1, DuckDB Sunday=0) — keep the twin
    dialect-proof."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_format("ts", "EEEE").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    total = d.agg(F.sum("n_events").alias("tot"))
    return (
        d.crossJoin(F.broadcast(total))
        .select(
            "dow",
            "n_events",
            F.round(F.col("n_events").cast("double") / F.col("tot"), 6).alias(
                "share"
            ),
            F.round(
                F.col("n_events").cast("double") * 7 / F.col("tot"), 4
            ).alias("seasonality_index"),
        )
    )


@register(
    "events_ab_test",
    oracle="""
    WITH u AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS cohort,
               CASE WHEN max(CASE WHEN event_type = 'purchase'
                                  THEN value END) > 150 THEN 1 ELSE 0 END
                   AS converted
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT
            count(CASE WHEN cohort = 0 THEN 1 END) AS n_a,
            count(CASE WHEN cohort = 1 THEN 1 END) AS n_b,
            CAST(sum(CASE WHEN cohort = 0 THEN converted ELSE 0 END)
                 AS BIGINT) AS conv_a,
            CAST(sum(CASE WHEN cohort = 1 THEN converted ELSE 0 END)
                 AS BIGINT) AS conv_b
        FROM u
    )
    SELECT n_a, n_b, conv_a, conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 0), 4) AS z_score
    FROM s
    """,
)
def events_ab_test(spark, sf_dir):
    """Two-proportion A/B significance: users split into cohorts by the
    stable key hash (user_id parity standing in for the assignment
    bucket), conversion = any purchase above a value threshold (every
    fixture user purchases *something*, so plain any-purchase is
    degenerate — pooled rate 1 zeroes the variance), and the pooled
    z-score — the experiment-readout primitive. One per-user aggregate
    shuffle then a 1-row fold; the z arithmetic (sqrt included) runs on
    identical doubles both engines, so even the test statistic
    hash-matches. At 100 TB the cohort column comes from the assignment
    log joined in, and the same two-level aggregate shape holds."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.when(
                F.max(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                )
                > 150,
                1,
            )
            .otherwise(0)
            .alias("converted")
        )
        .select((F.col("user_id") % 2).cast("long").alias("cohort"), "converted")
    )
    s = u.agg(
        F.count(F.when(F.col("cohort") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("cohort") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("cohort") == 0, F.col("converted")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("cohort") == 1, F.col("converted")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    z = (rate_a - rate_b) / F.expr(
        "nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))"
        " * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))"
        " * (1.0 / n_a + 1.0 / n_b)), 0)"
    )
    return s.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(z, 4).alias("z_score"),
    )


@register(
    "events_time_to_convert",
    oracle="""
    WITH s AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_converted,
           CAST(min(date_diff('second', t_click, t_purchase)) AS BIGINT)
               AS min_seconds,
           CAST(max(date_diff('second', t_click, t_purchase)) AS BIGINT)
               AS max_seconds,
           ROUND(CAST(sum(CAST(date_diff('second', t_click, t_purchase)
                              AS DECIMAL(18,0))) AS DOUBLE) / count(*), 2)
               AS avg_seconds
    FROM s WHERE t_purchase > t_click
    """,
)
def events_time_to_convert(spark, sf_dir):
    """Conversion-latency profile: delay from first click to first
    purchase across converting users (min / max / exact-integer mean).
    Delays are integer epoch-second differences — Spark's
    floor(epoch(b)) − floor(epoch(a)) equals DuckDB's second-boundary
    date_diff, so no float time math enters; the mean divides a
    DECIMAL-exact sum. Same single conditional-min shuffle as the funnel
    family, then a 1-row fold."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(etype):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    s = ev.groupBy("user_id").agg(
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    delay = F.col("t_purchase").cast("long") - F.col("t_click").cast("long")
    return (
        s.filter(F.col("t_purchase") > F.col("t_click"))
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.min(delay).cast("long").alias("min_seconds"),
            F.max(delay).cast("long").alias("max_seconds"),
            F.round(
                F.sum(delay.cast("decimal(18,0)")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("avg_seconds"),
        )
    )


@register(
    "events_stickiness",
    oracle="""
    WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    daily AS (SELECT day, count(*) AS dau FROM ud GROUP BY day)
    SELECT count(*) AS n_days,
           (SELECT count(DISTINCT user_id) FROM ud) AS mau,
           ROUND(CAST(sum(dau) AS DOUBLE) / count(*), 4) AS avg_dau,
           ROUND(CAST(sum(dau) AS DOUBLE) / count(*)
                 / (SELECT count(DISTINCT user_id) FROM ud), 6) AS stickiness
    FROM daily
    """,
)
def events_stickiness(spark, sf_dir):
    """Stickiness (avg DAU / MAU) — the single-number engagement ratio
    product teams track weekly. One distinct pass builds the (user, day)
    activity set; DAU and MAU both fold from it (the day-grouped count
    and the distinct-user count), so raw events are scanned once and the
    ratio math runs on a days-sized frame. The MAU rides in-plan as a
    broadcast 1-row aggregate — never an eager count."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    daily = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    mau = ud.agg(F.countDistinct("user_id").alias("mau"))
    avg_dau = F.col("sum_dau").cast("double") / F.col("n_days")
    return (
        daily.agg(
            F.count(F.lit(1)).alias("n_days"), F.sum("dau").alias("sum_dau")
        )
        .crossJoin(F.broadcast(mau))
        .select(
            "n_days",
            "mau",
            F.round(avg_dau, 4).alias("avg_dau"),
            F.round(avg_dau / F.col("mau"), 6).alias("stickiness"),
        )
    )


MOTIF_CAP = 512  # whale-entity cap: max events per user entering a journey


@register(
    "events_sequence_motif",
    oracle=f"""
    WITH capped AS (
        SELECT user_id, ts, event_id, event_type
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) <= {MOTIF_CAP}
    ),
    j AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS journey
        FROM capped GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(journey) AS BIGINT) AS journey_len,
           md5(journey) AS journey_md5,
           CAST(len(regexp_extract_all(journey, 'v+c+p')) AS BIGINT)
               AS n_browse_buy,
           CAST(len(regexp_extract_all(journey, 'ep')) AS BIGINT)
               AS n_error_then_buy,
           (journey LIKE '%vp%') AS has_direct_view_buy
    FROM j
    """,
)
def events_sequence_motif(spark, sf_dir):
    """Regex motif mining over per-user event SEQUENCES — the general
    pattern tool the funnel family can't express: `events_funnel` tests one
    fixed stage order, `events_transitions` sees only bigrams, but a
    journey string (one char per event, ordered by (ts, event_id)) makes
    ANY sequence question a regexp: non-overlapping view-streak →
    click-streak → purchase episodes (`v+c+p`), error-immediately-before-
    purchase incidents (`ep`), direct view→buy conversions. The five
    fixture event types have distinct initials, so the alphabet is 1:1.

    One shuffle (the window's hash partitioning on user_id is reused by
    the groupBy — Catalyst elides the second exchange); the journey is
    assembled in-JVM by sorting the collected (ts, event_id, char)
    structs — collect_list alone has NO order guarantee — and every regex
    runs JVM-side per user row.

    Whale-entity cap (r7 VERDICT #2 — ENFORCED, not just documented):
    only each user's first MOTIF_CAP events by (ts, event_id) enter the
    journey, via a row_number window filter BEFORE the collect, so the
    per-user array — and the journey string — is provably bounded no
    matter how skewed the entity distribution gets at 100 TB (the
    per-entity-sequence caveat every sessionization shares,
    ts_sessionize). The cutoff is deterministic (total order per user),
    the oracle applies the identical QUALIFY cap, and MOTIF_CAP sits
    well above the fixture max per-user count (99 at sf0.1) so fixture
    hashes are unchanged; a synthetic whale changes no other user's row
    (tests/test_properties.py::test_motif_whale_cap_bounds_journeys).
    Java regex vs RE2 agree on these backtracking-free patterns; the md5
    fingerprint column pins the FULL (capped) journey, so the hash oracle
    proves byte-exact sequence assembly, not just motif counts."""
    ev = load_events(spark, sf_dir)
    w_cap = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w_cap))
        .filter(F.col("rn") <= MOTIF_CAP)
    )
    j = capped.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("c"),
                        )
                    )
                ),
                lambda s: s["c"],
            ),
            "",
        ).alias("journey")
    )
    return j.select(
        "user_id",
        F.length("journey").cast("long").alias("journey_len"),
        F.md5("journey").alias("journey_md5"),
        F.regexp_count("journey", F.lit(r"v+c+p")).cast("long").alias("n_browse_buy"),
        F.regexp_count("journey", F.lit(r"ep")).cast("long").alias("n_error_then_buy"),
        F.col("journey").contains("vp").alias("has_direct_view_buy"),
    )


@register(
    "events_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_day, count(*) AS n_users FROM firsts GROUP BY cohort_day
    ),
    rev AS (
        SELECT f.cohort_day,
               datediff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7
                   AS age_week,
               sum(CAST(e.value AS DECIMAL(18,2))) AS wk_rev
        FROM events e JOIN firsts f USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort_day, age_week,
               sum(wk_rev) OVER (PARTITION BY cohort_day
                                 ORDER BY age_week) AS cum_rev
        FROM rev
    )
    SELECT CAST(c.cohort_day AS VARCHAR) AS cohort_day,
           CAST(c.age_week AS BIGINT) AS age_week,
           s.n_users,
           ROUND(CAST(c.cum_rev AS DOUBLE), 4) AS cum_revenue,
           ROUND(CAST(c.cum_rev AS DOUBLE) / s.n_users, 6) AS ltv_per_user
    FROM cum c JOIN sizes s USING (cohort_day)
    """,
)
def events_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves — the revenue companion to
    events_retention: users cohort by FIRST-activity day, purchase
    revenue buckets into weekly cohort ages, and a cumulative window
    yields each cohort's LTV-per-user trajectory (the payback-period
    curve growth teams plot against acquisition cost).

    Shuffle shape: first-day aggregate (user-keyed — the retention
    recipe), one fact join back to events carrying only (cohort_day),
    a (cohort, week)-keyed revenue rollup, then the cumulative window
    runs over the cohorts × weeks frame (≈ 30 × 5 rows here — always
    calendar-bounded, never event-bounded). Revenue partials go through
    DECIMAL(18,2) (the fixture values are exact 2-decimal currency), so
    cumulative sums are bit-identical in any partition order; only the
    final per-user division rounds in double space."""
    ev = load_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    sizes = firsts.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n_users"))
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_day")) / 7
            )
            .cast("long")
            .alias("age_week"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("wk_rev"))
    )
    wc = (
        Window.partitionBy("cohort_day")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_rev", F.sum("wk_rev").over(wc))
    return cum.join(sizes, "cohort_day").select(
        F.col("cohort_day").cast("string").alias("cohort_day"),
        "age_week",
        "n_users",
        F.round(F.col("cum_rev").cast("double"), 4).alias("cum_revenue"),
        F.round(F.col("cum_rev").cast("double") / F.col("n_users"), 6).alias(
            "ltv_per_user"
        ),
    )


PATH_PREFIX_LEN = 5  # events per user forming the journey prefix
PATH_TOPK = 20  # most-common prefixes reported


@register(
    "events_paths_topk",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, substr(event_type, 1, 1) AS c,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    pfx AS (
        SELECT user_id,
               string_agg(c, '' ORDER BY rn)
                   FILTER (WHERE rn <= {PATH_PREFIX_LEN}) AS prefix,
               max(CASE WHEN rn > {PATH_PREFIX_LEN} AND c = 'p'
                        THEN 1 ELSE 0 END) AS conv
        FROM ranked GROUP BY user_id
    )
    SELECT prefix, count(*) AS n_users,
           CAST(sum(conv) AS BIGINT) AS n_converted_after,
           ROUND(sum(conv) * 1.0 / count(*), 4) AS conv_rate
    FROM pfx GROUP BY prefix
    QUALIFY row_number() OVER (ORDER BY n_users DESC, prefix) <= {PATH_TOPK}
    """,
)
def events_paths_topk(spark, sf_dir):
    """Path analysis — the other half of sequence mining: instead of
    matching KNOWN motifs (events_sequence_motif), surface the most
    COMMON opening journeys and what they lead to. Each user's first
    PATH_PREFIX_LEN events (by ts, event_id — one initial per event, the
    motif alphabet) form a prefix string; prefixes rank by user count,
    and each carries its onward conversion rate: the share of its users
    who purchase AFTER the prefix window. This is the product-analytics
    "top paths" report (which openings retain, which leak) as one plan.

    Shuffle shape: the per-user window and the per-user aggregate share
    one hash partitioning on user_id (exchange reuse, the motif recipe);
    the prefix rollup is a second keyed shuffle on a ≤|users| frame; the
    final top-k is a single-partition window over the PREFIX-cardinality
    aggregate (bounded by alphabet^len = 5^5, the limit_topk shape) —
    never over raw events. Prefix length bounds per-user state exactly
    like the motif cap; conversion uses max-over-flag, not a journey
    rescan."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id",
        F.substring("event_type", 1, 1).alias("c"),
        F.row_number().over(w).alias("rn"),
    )
    pfx = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= PATH_PREFIX_LEN,
                            F.struct("rn", "c"),
                        )
                    )
                ),
                lambda s: s["c"],
            ),
            "",
        ).alias("prefix"),
        F.max(
            F.when(
                (F.col("rn") > PATH_PREFIX_LEN) & (F.col("c") == "p"), 1
            ).otherwise(0)
        ).alias("conv"),
    )
    agg = pfx.groupBy("prefix").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("conv").cast("long").alias("n_converted_after"),
        F.round(F.sum("conv") / F.count(F.lit(1)), 4).alias("conv_rate"),
    )
    wt = Window.orderBy(F.col("n_users").desc(), "prefix")
    return (
        agg.withColumn("_rn", F.row_number().over(wt))
        .filter(F.col("_rn") <= PATH_TOPK)
        .select("prefix", "n_users", "n_converted_after", "conv_rate")
    )


SESS_GAP_US = 600_000_000  # 10-minute session gap in MICROSECONDS (exact:
# fixture timestamps carry microsecond precision, so the gap test must be
# integer-micros in both engines — a seconds cast would truncate and
# disagree with DuckDB's interval arithmetic at sub-second boundaries)


_SESSION_MOTIF_ORACLE = """
    WITH o AS (
        SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS c,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= 600000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    ),
    j AS (
        SELECT user_id, min(ts) AS w_start, count(*) AS n_events,
               string_agg(c, '' ORDER BY ts, event_id) AS journey
        FROM s GROUP BY user_id, sid
    )
    SELECT user_id, w_start, CAST(n_events AS BIGINT) AS n_events,
           CAST(length(journey) AS BIGINT) AS journey_len,
           md5(journey) AS journey_md5,
           CAST(len(regexp_extract_all(journey, 'v+c+p')) AS BIGINT)
               AS n_browse_buy,
           (journey LIKE '%vp%') AS has_direct_view_buy
    FROM j
"""


@register("events_session_motif", oracle=_SESSION_MOTIF_ORACLE)
def events_session_motif(spark, sf_dir):
    """Session-scoped motif mining (r8 VERDICT #6) — the path-mining and
    sessionization families composed: events_sequence_motif's journey
    machinery, but scoped to 10-minute-gap SESSIONS instead of whole user
    histories, so motifs answer "did this VISIT browse then buy" rather
    than "did this user ever". The session rule is EXACTLY stream_session's
    (a session closes when the next event arrives >= gap after the
    previous), so this batch key is the gaps-and-islands twin of the
    registered streaming key stream_session_motif — the two are
    parity-tested against each other under both state-store providers
    (tests/test_streaming.py).

    Per (user, session): start timestamp, event count, the journey string
    (one char per event, ordered by (ts, event_id), md5-pinned so the hash
    proves byte-exact assembly), and the motif columns the whole-history
    key reports (browse→buy episodes, direct view→buy). The gap compare is
    integer MICROSECONDS in both engines — fixture timestamps are
    microsecond-grained, so casting to whole seconds would misplace
    session boundaries.

    Plan: one user_id shuffle shared by the lag window, the island cumsum,
    and the (user, session) aggregate (same-key windows/aggregates reuse
    the exchange); journeys assemble in-JVM from sorted structs; every
    regex is row-local. Per-session state is bounded by the session gap at
    any scale — the same argument as ts_sessionize, and sharper than the
    whole-history key's MOTIF_CAP (a session, unlike a user history, is
    time-bounded by construction)."""
    ev = load_events(spark, sf_dir)
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w_u)
    o = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("c"),
        F.when(gap.isNull() | (gap >= SESS_GAP_US), 1).otherwise(0).alias("new_s"),
    )
    sid = (
        F.sum("new_s")
        .over(w_u.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid")
    )
    s = o.select("user_id", "ts", "event_id", "c", sid)
    j = s.groupBy("user_id", "sid").agg(
        F.min("ts").alias("w_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "c"))),
                lambda r: r["c"],
            ),
            "",
        ).alias("journey"),
    )
    return j.select(
        "user_id",
        "w_start",
        F.col("n_events").cast("long").alias("n_events"),
        F.length("journey").cast("long").alias("journey_len"),
        F.md5("journey").alias("journey_md5"),
        F.size(F.expr(r"regexp_extract_all(journey, 'v+c+p', 0)"))
        .cast("long")
        .alias("n_browse_buy"),
        F.col("journey").contains("vp").alias("has_direct_view_buy"),
    )


@register(
    "events_markov_surprisal",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type AS nxt,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ),
    tr AS (SELECT user_id, prev, nxt FROM o WHERE prev IS NOT NULL),
    ranks AS (
        SELECT prev, nxt,
               row_number() OVER (PARTITION BY prev
                                  ORDER BY count(*) DESC, nxt) AS rnk
        FROM tr GROUP BY prev, nxt
    )
    SELECT t.user_id, count(*) AS n_transitions,
           ROUND(CAST(sum(r.rnk) AS DOUBLE) / count(*), 4) AS avg_rank,
           CAST(max(r.rnk) AS BIGINT) AS max_rank
    FROM tr t JOIN ranks r ON r.prev = t.prev AND r.nxt = t.nxt
    GROUP BY t.user_id
    """,
)
def events_markov_surprisal(spark, sf_dir):
    """Per-USER journey surprisal under the corpus transition model — the
    behavioral-anomaly rung above events_transitions (which models the
    corpus) and events_bot_flag (which gates on fixed heuristics): every
    (prev → next) step a user takes is ranked against all corpus
    continuations of that prev-state (1 = the most common next event),
    and the user scores the mean and worst rank of their steps. Rule-
    abiding users score near 1; scripted or adversarial traffic walks
    low-probability edges and scores high — the score IS the evidence,
    ready for thresholding downstream (no gate baked in).

    Same integer-exact discipline as text_bigram_surprisal: ranks, not
    float log-probs, so the score is bit-identical across engines and
    partition layouts. Plan: one user_id shuffle builds the lag pairs,
    the transition-rank table is states²-sized (broadcast), one per-user
    rollup reuses the user_id partitioning."""
    ev = load_events(spark, sf_dir)
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            "user_id",
            F.col("event_type").alias("nxt"),
            F.lag("event_type").over(w_u).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
    )
    wr = Window.partitionBy("prev").orderBy(F.col("cnt").desc(), "nxt")
    ranks = (
        tr.groupBy("prev", "nxt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("prev", "nxt", F.row_number().over(wr).alias("rnk"))
    )
    return (
        tr.join(F.broadcast(ranks), ["prev", "nxt"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.round(
                F.sum("rnk").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_rank"),
            F.max("rnk").cast("long").alias("max_rank"),
        )
    )


SRM_CHI2_CRIT_U = 3_841_459  # chi-square 95% critical value (df=1), micro


@register(
    "events_ab_srm",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    arms AS (
        SELECT 'parity' AS assignment,
               CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (user_id % 2 <> 0) AS BIGINT) AS n_b
        FROM u
        UNION ALL
        SELECT 'mod10_lossy' AS assignment,
               CAST(count(*) FILTER (user_id % 10 < 4) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (user_id % 10 >= 4) AS BIGINT) AS n_b
        FROM u
    )
    SELECT assignment, n_a + n_b AS n_users, n_a, n_b,
           CAST(round(((2 * n_a - (n_a + n_b)) * (2 * n_a - (n_a + n_b))
                       + (2 * n_b - (n_a + n_b)) * (2 * n_b - (n_a + n_b)))
                      * 1e6 / (2.0 * (n_a + n_b)), 0) AS BIGINT) AS chi2_u,
           round(((2 * n_a - (n_a + n_b)) * (2 * n_a - (n_a + n_b))
                  + (2 * n_b - (n_a + n_b)) * (2 * n_b - (n_a + n_b)))
                 * 1e6 / (2.0 * (n_a + n_b)), 0) >= {SRM_CHI2_CRIT_U}
               AS srm_detected
    FROM arms
    """,
)
def events_ab_srm(spark, sf_dir):
    """Sample-ratio mismatch (SRM) — the guardrail an experimentation
    platform runs BEFORE reading any A/B result: a chi-square test of the
    observed cohort split against the intended 50/50. A failed SRM means
    the assignment itself is broken (lossy bucketing, bot filtering that
    favors one arm) and the readout is invalid regardless of its p-value
    — which is why this key is separate from events_ab_test's z-score.
    Two arms demonstrate both verdicts on one fixture: 'parity'
    (user_id % 2 — the healthy bucketer events_ab_test uses) passes,
    'mod10_lossy' (user_id % 10 < 4 — a bucketer that routes only 40% to
    arm A, simulating dropped assignments) is flagged at sf0.01+ where
    the user panel has power (χ² = 0.04·n for a 40/60 split; the 15-user
    sf0.001 panel is below detection, honestly so).

    Exactness: χ² = ((2n_a−n)² + (2n_b−n)²)/(2n) keeps an integer
    numerator; one IEEE division + round both engines, compared in
    micro-units against the df=1 95% critical value. Plan: one distinct
    over user_id, two 1-row conditional aggregates — scale-free."""
    u = load_table(spark, sf_dir, "events").select("user_id").distinct()

    def arm(name, cond):
        counts = u.agg(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(~cond, 1).otherwise(0)).cast("long").alias("n_b"),
        )
        n = F.col("n_a") + F.col("n_b")
        num = (2 * F.col("n_a") - n) * (2 * F.col("n_a") - n) + (
            2 * F.col("n_b") - n
        ) * (2 * F.col("n_b") - n)
        chi2 = F.round(num * 1e6 / (2.0 * n), 0)
        return counts.select(
            F.lit(name).alias("assignment"),
            n.alias("n_users"),
            "n_a",
            "n_b",
            chi2.cast("long").alias("chi2_u"),
            (chi2 >= SRM_CHI2_CRIT_U).alias("srm_detected"),
        )

    return arm("parity", F.col("user_id") % 2 == 0).unionByName(
        arm("mod10_lossy", F.col("user_id") % 10 < 4)
    )
