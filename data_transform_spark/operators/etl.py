"""ETL staples: merge/upsert, SCD2 effective-dating, data-quality audit.

These are the transformation-library idioms an ETL user reaches for daily;
each is a single declarative plan with an exact SQL twin. At 100 TB the
upsert pattern is the join-based MERGE (shuffle on the key, or storage-layer
MERGE INTO when a table format like Delta/Iceberg is present); SCD2 is one
window pass; DQ checks are one scan plus broadcast-dim anti-joins.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_transform_spark.io import load_events, load_table
from data_transform_spark.registry import register


@register(
    "transform_upsert",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, 'U' AS o_orderstatus
        FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT b.o_orderkey,
           COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
           COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
           u.o_orderkey IS NOT NULL AS was_updated
    FROM orders b LEFT JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def transform_upsert(spark, sf_dir):
    """MERGE/upsert: apply an updates set onto a base snapshot (join-based).

    With a lakehouse table format this becomes MERGE INTO; the join shape and
    semantics are identical — updates win per key, absent keys keep base.
    """
    base = load_table(spark, sf_dir, "orders")
    updates = base.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("u_orderkey"),
        (F.col("o_totalprice") * 1.1).alias("u_totalprice"),
        F.lit("U").alias("u_status"),
    )
    merged = base.join(updates, base.o_orderkey == updates.u_orderkey, "left")
    return merged.select(
        "o_orderkey",
        F.coalesce("u_totalprice", "o_totalprice").alias("o_totalprice"),
        F.coalesce("u_status", "o_orderstatus").alias("o_orderstatus"),
        F.col("u_orderkey").isNotNull().alias("was_updated"),
    )


@register(
    "transform_scd2",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS valid_to,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
    FROM orders
    """,
)
def transform_scd2(spark, sf_dir):
    """SCD2 effective-dating: each order's validity window [valid_from,
    valid_to) per customer via one lead() pass; NULL valid_to = current."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    valid_to = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "dq_checks",
    oracle="""
    SELECT
        (SELECT count(*) FROM lineitem) AS n_rows,
        (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL) AS null_qty,
        (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50) AS qty_out_of_domain,
        (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1) AS disc_out_of_domain,
        (SELECT count(*) FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey) AS orphan_lines,
        (SELECT count(DISTINCT l_orderkey || '#' || l_linenumber) FROM lineitem) AS distinct_pk
    """,
)
def dq_checks(spark, sf_dir):
    """Data-quality audit as ONE action: nulls, domain violations, referential
    orphans (anti-join vs orders), and primary-key uniqueness. The orphan
    count rides in-plan as a broadcast 1-row aggregate cross-join rather than
    an eager driver-side .count() — the audit really is a single job."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    orphans = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lines"))
    )
    return (
        li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("l_quantity").isNull()).alias("null_qty"),
            F.count_if((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
                "qty_out_of_domain"
            ),
            F.count_if((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
                "disc_out_of_domain"
            ),
            F.countDistinct(
                F.concat(F.col("l_orderkey"), F.lit("#"), F.col("l_linenumber"))
            ).alias("distinct_pk"),
        )
        .crossJoin(F.broadcast(orphans))
        .select(
            "n_rows",
            "null_qty",
            "qty_out_of_domain",
            "disc_out_of_domain",
            "orphan_lines",
            "distinct_pk",
        )
    )


@register(
    "cdc_latest_wins",
    oracle="""
    SELECT user_id, event_type AS last_op, ROUND(value, 6) AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
      AND event_type <> 'error'
    """,
)
def cdc_latest_wins(spark, sf_dir):
    """CDC compaction: latest-wins per key by (ts, sequence), rows whose
    final operation is a delete ('error' stands in for the delete op)
    dropped — the change-stream → current-snapshot materialization every
    lakehouse MERGE pipeline runs.

    One shuffle on the key; at 100 TB this is the standard pre-MERGE
    dedup of a CDC feed (e.g. Debezium topic compaction) and the window
    shape makes it order-stable under any partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.round("value", 6).alias("last_value"),
        )
    )


@register(
    "join_pit_scd2",
    oracle="""
    WITH dim AS (
        SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                   AS valid_to
        FROM orders
    )
    SELECT e.event_id, e.user_id, e.ts, d.o_orderkey AS version_key,
           d.valid_from
    FROM events e
    JOIN dim d
      ON e.user_id = d.o_custkey
     AND CAST(e.ts AS DATE) >= d.valid_from
     AND (d.valid_to IS NULL OR CAST(e.ts AS DATE) < d.valid_to)
    """,
)
def join_pit_scd2(spark, sf_dir):
    """Point-in-time join: each event is matched to the SCD2 dimension
    version that was valid AT the event's timestamp ([valid_from,
    valid_to) half-open, NULL valid_to = current).

    The lookup-the-past shape behind every feature-store / as-was report.
    The equality conjunct (user = custkey) drives a hash join; the validity
    range is a residual filter on the matched pairs — never a cartesian.
    Windows per key are non-overlapping by construction (lead() tiling),
    so each event matches at most one version and row counts stay stable.
    At 100 TB both sides hash-partition on the key; a skewed hot key takes
    the salting path like any other equi-join."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dim = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    ev = load_events(spark, sf_dir)
    edate = F.col("ts").cast("date")
    return (
        ev.join(
            dim,
            (ev.user_id == dim.o_custkey)
            & (edate >= dim.valid_from)
            & (dim.valid_to.isNull() | (edate < dim.valid_to)),
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o_orderkey").alias("version_key"),
            "valid_from",
        )
    )


@register(
    "dq_profile",
    oracle="""
    SELECT 'c_custkey' AS col, count(*) - count(c_custkey) AS n_nulls,
           count(DISTINCT c_custkey) AS n_distinct,
           CAST(min(c_custkey) AS VARCHAR) AS min_val,
           CAST(max(c_custkey) AS VARCHAR) AS max_val
    FROM customer
    UNION ALL
    SELECT 'c_name', count(*) - count(c_name), count(DISTINCT c_name),
           min(c_name), max(c_name)
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*) - count(c_mktsegment),
           count(DISTINCT c_mktsegment), min(c_mktsegment), max(c_mktsegment)
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', count(*) - count(c_acctbal),
           count(DISTINCT c_acctbal),
           CAST(CAST(min(c_acctbal) AS DECIMAL(12,2)) AS VARCHAR),
           CAST(CAST(max(c_acctbal) AS DECIMAL(12,2)) AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', count(*) - count(c_nationkey),
           count(DISTINCT c_nationkey),
           CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
    FROM customer
    """,
)
def dq_profile(spark, sf_dir):
    """Column profiling (ANALYZE-style): null count, distinct count, min
    and max per column, long-format — the first query run against any
    unfamiliar 100 TB table, and the stats feed for partition/layout
    decisions.

    One pass per column expressed as 1-row aggregates UNION ALL-ed (Spark
    fuses them over the shared cached scan; column-pruned so each branch
    reads exactly one column). min/max are normalized to strings —
    doubles through DECIMAL(12,2) so the text form is engine-portable. At
    scale the exact count-distinct branches swap to approx_count_distinct
    (the sketch is mergeable across partitions); exact is kept here for
    the hash oracle."""
    c = load_table(spark, sf_dir, "customer")

    def prof(col, minmax):
        return c.agg(
            F.lit(col).alias("col"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            minmax(F.min(col)).alias("min_val"),
            minmax(F.max(col)).alias("max_val"),
        )

    as_str = lambda e: e.cast("string")  # noqa: E731
    as_dec = lambda e: e.cast("decimal(12,2)").cast("string")  # noqa: E731
    return (
        prof("c_custkey", as_str)
        .unionAll(prof("c_name", lambda e: e))
        .unionAll(prof("c_mktsegment", lambda e: e))
        .unionAll(prof("c_acctbal", as_dec))
        .unionAll(prof("c_nationkey", as_str))
    )


@register(
    "agg_incremental_merge",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           ROUND(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total,
           min(o_totalprice) AS mn, max(o_totalprice) AS mx
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_incremental_merge(spark, sf_dir):
    """Incremental aggregation via MERGEABLE partial state: the table is
    split into an 'already processed' half and a 'new data' delta (by
    order date), each half aggregated to per-group partials (count /
    decimal-exact sum / min / max), and the two partial sets are merged —
    count+count, sum+sum, min(min), max(max). The oracle recomputes from
    scratch, so the hash match IS the incremental-equals-full proof.

    The production pattern behind every incremental ETL: at 100 TB you
    never re-aggregate history — you keep yesterday's partials (a tiny
    per-group table) and fold in today's delta. Works for any
    commutative-monoid aggregate; avg rides as sum+count (never avg of
    avgs); exactness of the merged sum comes from DECIMAL partials, the
    same discipline as graph_pagerank."""
    o = load_table(spark, sf_dir, "orders")
    split = "1995-01-01"

    def partials(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_d"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )

    history = partials(o.filter(F.col("o_orderdate") < split))
    delta = partials(o.filter(F.col("o_orderdate") >= split))
    return (
        history.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("total_d").cast("double"), 2).alias("total"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )


@register(
    "join_snapshot_diff",
    oracle="""
    WITH before_s AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 0
    ),
    after_s AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT * FROM (
        SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
               CASE WHEN b.o_orderkey IS NULL THEN 'added'
                    WHEN a.o_orderkey IS NULL THEN 'removed'
                    WHEN a.o_totalprice <> b.o_totalprice THEN 'changed'
                    ELSE 'unchanged' END AS status,
               b.o_totalprice AS price_before,
               a.o_totalprice AS price_after
        FROM before_s b FULL JOIN after_s a ON b.o_orderkey = a.o_orderkey
    ) WHERE status <> 'unchanged'
    """,
)
def join_snapshot_diff(spark, sf_dir):
    """Snapshot reconciliation: diff two versions of a table into a
    row-level change set (added / removed / changed with before+after
    values) via ONE full outer join on the key — the data-diff primitive
    behind CDC backfills, migration validation, and "what changed since
    yesterday" audits. The two snapshots are derived deterministically from
    orders (drop keys %10==0 from 'before'; drop %7==0 and bump prices
    %3==0 in 'after') so the oracle sees identical inputs. At 100 TB both
    sides shuffle once on the join key — same cost as the upsert MERGE
    shape (transform_upsert) — and unchanged rows are filtered before any
    downstream materialization."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    before = o.filter(F.col("o_orderkey") % 10 != 0)
    after = o.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    b = before.alias("b")
    a = after.alias("a")
    joined = b.join(a, F.col("b.o_orderkey") == F.col("a.o_orderkey"), "full_outer")
    status = (
        F.when(F.col("b.o_orderkey").isNull(), "added")
        .when(F.col("a.o_orderkey").isNull(), "removed")
        .when(F.col("a.o_totalprice") != F.col("b.o_totalprice"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce(F.col("b.o_orderkey"), F.col("a.o_orderkey")).alias("o_orderkey"),
            status.alias("status"),
            F.col("b.o_totalprice").alias("price_before"),
            F.col("a.o_totalprice").alias("price_after"),
        )
        .filter(F.col("status") != "unchanged")
    )


PSI_BIN_WIDTH = 50000.0  # totalprice bin width (agg_histogram convention)
PSI_SMOOTH = 0.5  # Laplace smoothing so empty bins stay finite


@register(
    "dq_psi_drift",
    oracle=f"""
    WITH b AS (
        SELECT CAST(floor(o_totalprice / {PSI_BIN_WIDTH}) AS BIGINT) AS bin,
               count(CASE WHEN o_orderkey % 2 = 0 THEN 1 END) AS n_a,
               count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_b
        FROM orders GROUP BY 1
    ),
    t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS nb FROM b)
    SELECT bin, n_a, n_b,
           ROUND(((n_a + {PSI_SMOOTH}) / (ta + nb * {PSI_SMOOTH})
                  - (n_b + {PSI_SMOOTH}) / (tb + nb * {PSI_SMOOTH}))
                 * ln(((n_a + {PSI_SMOOTH}) / (ta + nb * {PSI_SMOOTH}))
                      / ((n_b + {PSI_SMOOTH}) / (tb + nb * {PSI_SMOOTH}))),
                 6) AS psi_term
    FROM b CROSS JOIN t
    """,
)
def dq_psi_drift(spark, sf_dir):
    """Population Stability Index between two cohorts (even vs odd order
    keys standing in for yesterday/today snapshots): totalprice bins by
    the same portable floor-division as agg_histogram, Laplace-smoothed
    shares so empty bins contribute finite terms, per-bin PSI term
    (p−q)·ln(p/q) emitted for auditability (Σ terms is the headline PSI;
    >0.2 conventionally means the feature drifted). ONE grouped pass
    computes both cohorts via conditional counts — never two scans — and
    the totals ride in as a broadcast 1-row aggregate. The ln runs on
    identical doubles on both engines; ROUND(,6) absorbs any last-ulp
    libm disagreement."""
    o = load_table(spark, sf_dir, "orders")
    b = o.groupBy(
        F.floor(F.col("o_totalprice") / PSI_BIN_WIDTH).cast("long").alias("bin")
    ).agg(
        F.count(F.when(F.col("o_orderkey") % 2 == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("o_orderkey") % 2 == 1, 1)).alias("n_b"),
    )
    t = b.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"),
        F.count(F.lit(1)).alias("nb"),
    )
    pa = (F.col("n_a") + PSI_SMOOTH) / (F.col("ta") + F.col("nb") * PSI_SMOOTH)
    pb = (F.col("n_b") + PSI_SMOOTH) / (F.col("tb") + F.col("nb") * PSI_SMOOTH)
    return (
        b.crossJoin(F.broadcast(t))
        .select(
            "bin", "n_a", "n_b",
            F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
        )
    )


@register(
    "corpus_manifest",
    oracle="""
    WITH h AS (
        SELECT source, md5(text) AS h,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    b AS (
        SELECT source, substring(h, 1, 2) AS bucket,
               count(*) AS n_docs, sum(n_tok) AS n_tokens,
               md5(string_agg(h, '' ORDER BY h)) AS bd
        FROM h GROUP BY source, substring(h, 1, 2)
    ),
    ball AS (
        SELECT substring(h, 1, 2) AS bucket,
               count(*) AS n_docs, sum(n_tok) AS n_tokens,
               md5(string_agg(h, '' ORDER BY h)) AS bd
        FROM h GROUP BY substring(h, 1, 2)
    )
    SELECT source,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           md5(string_agg(bd, '' ORDER BY bucket)) AS corpus_md5
    FROM b GROUP BY source
    UNION ALL
    SELECT '*' AS source,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           md5(string_agg(bd, '' ORDER BY bucket)) AS corpus_md5
    FROM ball
    """,
)
def corpus_manifest(spark, sf_dir):
    """Content-addressed corpus manifest — the data-lineage primitive a
    100 TB pipeline publishes with every snapshot: per source (plus the
    '*' whole-corpus row) the doc count, token count, and a single
    CONTENT digest — md5 over the per-doc md5(text) digests concatenated
    in digest order. Order- and reshard-invariant (sorting by the digest
    itself needs no document key), duplicate-aware (two copies contribute
    twice), and byte-sensitive: any added, dropped or edited document
    anywhere flips its source's digest and the '*' digest. Two runs
    compare manifests to PROVE corpus identity without rescanning text —
    the precondition for trusting cached dedup stores, staged ANN
    indexes, or a resumed training job.

    The digest composes HIERARCHICALLY (r10 ADVICE): docs hash into 256
    content-addressed buckets (first hex byte of the doc digest), each
    bucket digests its sorted member digests, and the published digest is
    md5 over the bucket digests in bucket order. No aggregation buffer
    ever holds more than its bucket's 32-byte digests — per-group state
    is O(n_docs/256), and the '*' whole-corpus row is a 256-row rollup of
    bucket digests, never a corpus-sized list on one row. Bucketing is by
    content, so order/reshard invariance and duplicate-awareness are
    unchanged; at 100 TB you add more prefix levels, same invariances.

    Plan: one scan (docs reduce to 32-byte digests immediately), a
    (source, bucket)-keyed aggregate, then a source-keyed rollup of the
    256 bucket digests (plus the same two levels globally for '*')."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )

    def roll(frame, src_col):
        buckets = frame.groupBy(
            src_col.alias("source"), F.substring("h", 1, 2).alias("bucket")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.md5(
                F.concat_ws("", F.array_sort(F.collect_list("h")))
            ).alias("bd"),
        )
        return buckets.groupBy("source").agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("bucket", "bd"))),
                        lambda x: x.bd,
                    ),
                )
            ).alias("corpus_md5"),
        )

    return roll(d, F.col("source")).unionByName(roll(d, F.lit("*")))
