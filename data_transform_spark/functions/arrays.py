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
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_el,
           embedding[1:3] AS head3,
           list_sort(embedding[1:5]) AS sorted_head,
           flatten([[CAST(vec_id AS DOUBLE)], CAST(embedding[1:2] AS DOUBLE[])]) AS flat,
           list_contains(CAST(embedding AS DOUBLE[]), CAST(embedding[7] AS DOUBLE)) AS has_el7
    FROM embeddings
    """,
)
def fn_array(spark, sf_dir):
    """size / element_at / slice / sort / flatten / contains over embeddings."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).alias("first_el"),
        F.slice(emb, 1, 3).alias("head3"),
        F.sort_array(F.slice(emb, 1, 5)).alias("sorted_head"),
        F.flatten(
            F.array(
                F.array(F.col("vec_id").cast("double")),
                F.slice(emb, 1, 2).cast("array<double>"),
            )
        ).alias("flat"),
        F.array_contains(emb.cast("array<double>"), F.element_at(emb, 7).cast("double")).alias(
            "has_el7"
        ),
    )


@register(
    "fn_array_lambda",
    oracle="""
    SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 2.0, 6)) AS doubled,
           list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0) AS positives,
           CAST(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum') AS DOUBLE) AS el_sum,
           list_transform(list_zip(CAST(embedding[1:4] AS DOUBLE[]), CAST(embedding[5:8] AS DOUBLE[])),
                          p -> round(p[1] * p[2], 6)) AS zip_prod
    FROM embeddings
    """,
)
def fn_array_lambda(spark, sf_dir):
    """transform / filter / aggregate / zip_with — all in DOUBLE space."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.transform(emb_d, lambda x: F.round(x * 2.0, 6)).alias("doubled"),
        F.filter(emb_d, lambda x: x > 0).alias("positives"),
        F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x).alias("el_sum"),
        F.zip_with(
            F.slice(F.col("embedding"), 1, 4).cast("array<double>"),
            F.slice(F.col("embedding"), 5, 4).cast("array<double>"),
            lambda a, b: F.round(a * b, 6),
        ).alias("zip_prod"),
    )


@register(
    "fn_array_setops",
    oracle="""
    WITH t AS (
        SELECT vec_id,
               CAST(embedding[1:6] AS DOUBLE[]) AS a,
               CAST(embedding[4:9] AS DOUBLE[]) AS b
        FROM embeddings
    )
    SELECT vec_id,
           list_sort(list_distinct(list_concat(a, b))) AS u,
           list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))) AS i,
           list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))) AS d
    FROM t
    """,
)
def fn_array_setops(spark, sf_dir):
    """array_union / intersect / except (sorted — the engines' first-seen
    orders are not specified identically)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = F.slice(F.col("embedding"), 1, 6).cast("array<double>")
    b = F.slice(F.col("embedding"), 4, 6).cast("array<double>")
    return e.select(
        "vec_id",
        F.sort_array(F.array_union(a, b)).alias("u"),
        F.sort_array(F.array_intersect(a, b)).alias("i"),
        F.sort_array(F.array_except(a, b)).alias("d"),
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
           generate_series(1, l_linenumber) AS seq,
           len(generate_series(1, l_linenumber)) AS seq_len
    FROM lineitem
    """,
)
def fn_sequence(spark, sf_dir):
    """sequence generation 1..n plus its length."""
    li = load_table(spark, sf_dir, "lineitem")
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return li.select(
        "l_orderkey", "l_linenumber", seq.alias("seq"), F.size(seq).cast("long").alias("seq_len")
    )
