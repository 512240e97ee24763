"""§2.H — string function bundles (SURVEY.md).

All built-in Column functions (JVM-side, codegen'd). Dialect traps handled
per §5.3: DuckDB regexp_replace needs the 'g' flag to match Spark's
replace-all; initcap has no DuckDB twin and is excluded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "fn_string_basic",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up,
           lower(p_brand) AS lo,
           trim(concat('  ', p_name, ' ')) AS trimmed,
           substring(p_name, 2, 4) AS sub,
           length(p_name) AS len,
           concat(p_brand, ':', p_type) AS cat,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           rpad(p_brand, 12, '.') AS rpadded,
           reverse(p_name) AS rev,
           left(p_name, 3) AS l3,
           right(p_name, 3) AS r3,
           repeat(p_brand, 2) AS rep,
           split_part(p_name, ' ', 2) AS second_word,
           instr(p_name, 'e') AS epos,
           translate(p_name, 'aeiou', 'AEIOU') AS vowelup,
           ascii(p_name) AS first_code
    FROM part
    """,
)
def fn_string_basic(spark, sf_dir):
    """upper/lower/trim/substring/pad/reverse/split_part/translate bundle."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.substring("p_name", 2, 4).alias("sub"),
        F.length("p_name").cast("long").alias("len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("cat"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.rpad("p_brand", 12, ".").alias("rpadded"),
        F.reverse("p_name").alias("rev"),
        F.left(F.col("p_name"), F.lit(3)).alias("l3"),
        F.right(F.col("p_name"), F.lit(3)).alias("r3"),
        F.repeat("p_brand", 2).alias("rep"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.instr(F.col("p_name"), "e").cast("long").alias("epos"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowelup"),
        F.ascii("p_name").alias("first_code"),  # both engines emit int32
    )


@register(
    "fn_string_regex",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_tok,
           regexp_replace(text, '\b(a|the)\b', '_', 'g') AS no_articles,
           len(string_split_regex(text, '\s+')) AS n_tokens
    FROM documents
    """,
)
def fn_string_regex(spark, sf_dir):
    """regexp bundle; DuckDB regexp_replace gets 'g' to match Spark's all-matches."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_tok"),
        F.regexp_replace("text", r"\b(a|the)\b", "_").alias("no_articles"),
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
    )


@register(
    "fn_string_fuzzy",
    oracle="""
    SELECT p_partkey, p_name,
           levenshtein(p_name, 'red widget') AS lev_to_ref,
           levenshtein(split_part(p_name, ' ', 1), split_part(p_name, ' ', 2)) AS lev_words
    FROM part
    """,
)
def fn_string_fuzzy(spark, sf_dir):
    """Levenshtein edit distance to a reference and between words."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_name",
        F.levenshtein(F.col("p_name"), F.lit("red widget")).cast("long").alias("lev_to_ref"),
        F.levenshtein(
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)),
        ).cast("long").alias("lev_words"),
    )


@register(
    "fn_url",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
                   || '?lang=' || lang AS url,
               lang || ' ' || source AS val
        FROM documents
    )
    SELECT doc_id,
           url,
           regexp_extract(url, 'https://([^/]+)', 1) AS host,
           regexp_extract(url, 'https://[^/]+([^?]*)', 1) AS path,
           split_part(url, '?', 2) AS query,
           val AS decoded,
           TRUE AS round_trip_ok
    FROM t
    """,
)
def fn_url(spark, sf_dir):
    """URL construction, parse_url component extraction, and an
    encode→decode round trip (DuckDB 1.0 has no URL functions, so the twin
    re-derives components with regexp/split_part and checks the round trip
    as a boolean invariant)."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    val = F.concat_ws(" ", "lang", "source")
    decoded = F.url_decode(F.url_encode(val))
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        decoded.alias("decoded"),
        (decoded == val).alias("round_trip_ok"),
    )


@register(
    "fn_collation",
    oracle="""
    SELECT count(CASE WHEN lower(c_mktsegment) = 'building' THEN 1 END)
               AS n_building_ci,
           count(DISTINCT lower(c_mktsegment)) AS n_segments_ci,
           min(lower(c_mktsegment)) AS first_segment_ci
    FROM customer
    """,
)
def fn_collation(spark, sf_dir):
    """Collation-aware string semantics (Spark 4): collate(col,
    'UTF8_LCASE') makes comparisons, DISTINCT, and MIN case-insensitive at
    the type level — no lower() rewrites sprinkled through the query, and
    the collation survives into joins and aggregates. The oracle twin IS
    the lower() rewrite (DuckDB has no column collations), pinning that
    UTF8_LCASE equality == lowercase equality for this data. min() under
    UTF8_LCASE returns the stored spelling, so it is normalized with
    lower() on output to keep the comparison well-defined when mixed-case
    spellings of the same value tie."""
    c = load_table(spark, sf_dir, "customer")
    seg_ci = F.expr("collate(c_mktsegment, 'UTF8_LCASE')")
    return c.agg(
        F.count(F.when(seg_ci == F.lit("building"), 1)).alias("n_building_ci"),
        F.countDistinct(seg_ci).alias("n_segments_ci"),
        F.lower(F.min(seg_ci)).cast("string").alias("first_segment_ci"),
    )


@register(
    "fn_mask",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS name_masked,
           regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS segment_masked,
           regexp_replace(c_name, '[A-Z]', 'X', 'g') AS name_upper_masked
    FROM customer
    """,
)
def fn_mask(spark, sf_dir):
    """mask() — the built-in data-redaction function (Spark 4): uppercase
    → X, lowercase → x, digits → n in ONE codegen'd call, with per-class
    NULL meaning "retain" for selective masking. The declarative
    complement of text_pii_redact's regex pipeline: shape-preserving
    redaction for display/export paths (masked output keeps its shape).
    The oracle is the chained regexp_replace rewrite — pinning that
    mask's character classes are exactly ASCII [A-Z]/[a-z]/[0-9] on this
    data."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("name_masked"),
        F.expr("mask(c_mktsegment)").alias("segment_masked"),
        F.expr("mask(c_name, 'X', NULL, NULL, NULL)").alias("name_upper_masked"),
    )
