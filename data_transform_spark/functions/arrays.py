"""§2.H — array + higher-order function bundles (SURVEY.md).

Arrays are the bridge between relational ops and the embedding/LLM pipeline
(§2.K). Float arithmetic inside lambdas is forced to DOUBLE on both engines
so element-wise results are bit-identical; array-ordered aggregation
(F.aggregate / list_reduce-style folds) is deterministic, so no rounding is
needed for the fold itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "fn_array",
    oracle="""
    WITH t AS (
        SELECT vec_id,
               embedding,
               embedding[1:3] AS head3,
               list_sort(embedding[1:5]) AS sorted_head,
               flatten([[CAST(vec_id AS DOUBLE)], CAST(embedding[1:2] AS DOUBLE[])]) AS flat
        FROM embeddings
    )
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_el,
           head3[1] AS h1, head3[2] AS h2, head3[3] AS h3,
           sorted_head[1] AS s1, sorted_head[3] AS s3, sorted_head[5] AS s5,
           len(flat) AS flat_len, flat[1] AS f1, flat[3] AS f3,
           list_contains(CAST(embedding AS DOUBLE[]), CAST(embedding[7] AS DOUBLE)) AS has_el7
    FROM t
    """,
)
def fn_array(spark, sf_dir):
    """size / element_at / slice / sort / flatten / contains over embeddings.

    Array construction happens in-plan; the FINAL projection is all scalars
    because the driver's pandas canonicalizer cannot hash container cells
    (round-1 ERR — VERDICT.md "What's wrong" #1)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    head3 = F.slice(emb, 1, 3)
    sorted_head = F.sort_array(F.slice(emb, 1, 5))
    flat = F.flatten(
        F.array(
            F.array(F.col("vec_id").cast("double")),
            F.slice(emb, 1, 2).cast("array<double>"),
        )
    )
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).alias("first_el"),
        F.element_at(head3, 1).alias("h1"),
        F.element_at(head3, 2).alias("h2"),
        F.element_at(head3, 3).alias("h3"),
        F.element_at(sorted_head, 1).alias("s1"),
        F.element_at(sorted_head, 3).alias("s3"),
        F.element_at(sorted_head, 5).alias("s5"),
        F.size(flat).cast("long").alias("flat_len"),
        F.element_at(flat, 1).alias("f1"),
        F.element_at(flat, 3).alias("f3"),
        F.array_contains(emb.cast("array<double>"), F.element_at(emb, 7).cast("double")).alias(
            "has_el7"
        ),
    )


@register(
    "fn_array_lambda",
    oracle="""
    WITH t AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 2.0, 6)) AS doubled,
               list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0) AS positives,
               CAST(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum') AS DOUBLE) AS el_sum,
               list_transform(list_zip(CAST(embedding[1:4] AS DOUBLE[]), CAST(embedding[5:8] AS DOUBLE[])),
                              p -> round(p[1] * p[2], 6)) AS zip_prod
        FROM embeddings
    )
    SELECT vec_id,
           doubled[1] AS d_first, doubled[len(doubled)] AS d_last,
           len(positives) AS n_pos,
           round(CAST(list_aggregate(positives, 'sum') AS DOUBLE), 6) AS pos_sum,
           el_sum,
           zip_prod[1] AS zp1, zip_prod[2] AS zp2, zip_prod[3] AS zp3, zip_prod[4] AS zp4
    FROM t
    """,
)
def fn_array_lambda(spark, sf_dir):
    """transform / filter / aggregate / zip_with — all in DOUBLE space.

    Lambdas run over full arrays in-plan; the final projection is scalar-only
    (driver-canonicalizer constraint). Fold sums are sequential in both
    engines, so pos_sum is bit-stable after a 6-dp round."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    doubled = F.transform(emb_d, lambda x: F.round(x * 2.0, 6))
    positives = F.filter(emb_d, lambda x: x > 0)
    zip_prod = F.zip_with(
        F.slice(F.col("embedding"), 1, 4).cast("array<double>"),
        F.slice(F.col("embedding"), 5, 4).cast("array<double>"),
        lambda a, b: F.round(a * b, 6),
    )
    return e.select(
        "vec_id",
        F.element_at(doubled, 1).alias("d_first"),
        F.element_at(doubled, -1).alias("d_last"),
        F.size(positives).cast("long").alias("n_pos"),
        F.round(F.aggregate(positives, F.lit(0.0), lambda acc, x: acc + x), 6).alias("pos_sum"),
        F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x).alias("el_sum"),
        F.element_at(zip_prod, 1).alias("zp1"),
        F.element_at(zip_prod, 2).alias("zp2"),
        F.element_at(zip_prod, 3).alias("zp3"),
        F.element_at(zip_prod, 4).alias("zp4"),
    )


@register(
    "fn_array_setops",
    oracle="""
    WITH t AS (
        SELECT vec_id,
               CAST(embedding[1:6] AS DOUBLE[]) AS a,
               CAST(embedding[4:9] AS DOUBLE[]) AS b
        FROM embeddings
    ),
    s AS (
        SELECT vec_id,
               list_sort(list_distinct(list_concat(a, b))) AS u,
               list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))) AS i,
               list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))) AS d
        FROM t
    )
    SELECT vec_id,
           len(u) AS u_len, u[1] AS u_first, u[len(u)] AS u_last,
           round(CAST(list_aggregate(u, 'sum') AS DOUBLE), 6) AS u_sum,
           len(i) AS i_len,
           round(CAST(coalesce(list_aggregate(i, 'sum'), 0.0) AS DOUBLE), 6) AS i_sum,
           len(d) AS d_len,
           round(CAST(coalesce(list_aggregate(d, 'sum'), 0.0) AS DOUBLE), 6) AS d_sum
    FROM s
    """,
)
def fn_array_setops(spark, sf_dir):
    """array_union / intersect / except (sorted — the engines' first-seen
    orders are not specified identically); final projection is scalar-only
    (len / first / last / sequential-fold sum of each sorted result)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = F.slice(F.col("embedding"), 1, 6).cast("array<double>")
    b = F.slice(F.col("embedding"), 4, 6).cast("array<double>")

    def fold_sum(arr):
        return F.round(F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x), 6)

    u = F.sort_array(F.array_union(a, b))
    i = F.sort_array(F.array_intersect(a, b))
    d = F.sort_array(F.array_except(a, b))
    return e.select(
        "vec_id",
        F.size(u).cast("long").alias("u_len"),
        F.element_at(u, 1).alias("u_first"),
        F.element_at(u, -1).alias("u_last"),
        fold_sum(u).alias("u_sum"),
        F.size(i).cast("long").alias("i_len"),
        fold_sum(i).alias("i_sum"),
        F.size(d).cast("long").alias("d_len"),
        fold_sum(d).alias("d_sum"),
    )


@register(
    "fn_explode",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
    FROM documents
    """,
)
def fn_explode(spark, sf_dir):
    """posexplode of the tokenized text — the core of §2.K tokenization.

    DuckDB 1.0 lacks WITH ORDINALITY; parallel unnest of the list and a
    generated index series produces the same (token, pos) pairs.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", "token", F.col("pos").cast("long").alias("pos"))


@register(
    "fn_sequence",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           array_to_string(generate_series(1, l_linenumber), ',') AS seq_csv,
           len(generate_series(1, l_linenumber)) AS seq_len,
           CAST(list_aggregate(generate_series(1, l_linenumber), 'sum') AS BIGINT) AS seq_sum
    FROM lineitem
    """,
)
def fn_sequence(spark, sf_dir):
    """sequence generation 1..n, projected as CSV + length + sum (integer
    arrays stringify identically in both engines; container outputs crash
    the driver canonicalizer)."""
    li = load_table(spark, sf_dir, "lineitem")
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat_ws(",", seq.cast("array<string>")).alias("seq_csv"),
        F.size(seq).cast("long").alias("seq_len"),
        F.aggregate(seq, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("seq_sum"),
    )


@register(
    "fn_array_sort_lambda",
    oracle="""
    SELECT doc_id,
           array_to_string(
               list_transform(
                   list_sort(list_transform(string_split(text, ' '),
                             x -> {'l': length(x), 'w': x})),
                   s -> s.w),
               ' ') AS by_len_then_word
    FROM documents
    """,
)
def fn_array_sort_lambda(spark, sf_dir):
    """array_sort with a CUSTOM comparator lambda — ordering tokens by
    (length, then word) in one JVM higher-order call, no explode/re-agg
    round trip. DuckDB has no comparator lambdas, so the oracle proves
    the equivalence through the decorate-sort-undecorate rewrite
    (struct-sort on the same key) — which is also the portable fallback
    when a comparator can't express a stable multi-key order. Row-local,
    shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    cmp_sorted = F.expr(
        """
        array_sort(split(text, ' '),
          (l, r) -> CASE WHEN length(l) < length(r) THEN -1
                         WHEN length(l) > length(r) THEN 1
                         WHEN l < r THEN -1
                         WHEN l > r THEN 1
                         ELSE 0 END)
        """
    )
    return d.select(
        "doc_id", F.array_join(cmp_sorted, " ").alias("by_len_then_word")
    )
