"""§2.H — math + hash function bundles (SURVEY.md).

Transcendentals (exp/ln/log10/sqrt/pow) are rounded to 6 dp on both sides:
JVM StrictMath vs C libm may differ in the last ulp. floor/ceil are cast to
BIGINT on the DuckDB side (it returns DOUBLE, Spark returns LONG). bround
(half-even) has no DuckDB twin and is excluded from the oracle (§2.H note).
xxhash64 differs from DuckDB's hash → fn_hash carries md5/sha256 only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS r1,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
           abs(l_discount - 0.05) AS ab,
           round(sqrt(l_extendedprice), 6) AS sq,
           round(exp(l_discount), 6) AS ex,
           round(ln(l_extendedprice), 6) AS lg,
           round(log10(l_extendedprice), 6) AS l10,
           round(pow(l_quantity, 2), 6) AS p2,
           mod(CAST(l_quantity AS BIGINT), 7) AS md,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    """round/floor/ceil/abs/sqrt/exp/ln/log10/pow/mod/sign bundle."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price, 1).alias("r1"),
        F.floor(price).alias("fl"),
        F.ceil(price).alias("ce"),
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.round(F.sqrt(price), 6).alias("sq"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.log(price), 6).alias("lg"),
        F.round(F.log10(price), 6).alias("l10"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("p2"),
        (F.col("l_quantity").cast("long") % 7).alias("md"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
    )


@register(
    "fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_discount), 6) AS s,
           round(cos(l_discount), 6) AS c,
           round(tan(l_discount), 6) AS t,
           round(atan2(l_discount, l_tax + 0.01), 6) AS a2,
           round(degrees(l_discount), 6) AS deg,
           round(radians(l_quantity), 6) AS rad
    FROM lineitem
    """,
)
def fn_trig(spark, sf_dir):
    """Trigonometric bundle, rounded to 6 dp (libm ulp differences)."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(d), 6).alias("s"),
        F.round(F.cos(d), 6).alias("c"),
        F.round(F.tan(d), 6).alias("t"),
        F.round(F.atan2(d, F.col("l_tax") + 0.01), 6).alias("a2"),
        F.round(F.degrees(d), 6).alias("deg"),
        F.round(F.radians("l_quantity"), 6).alias("rad"),
    )


@register(
    "fn_bitwise_scalar",
    oracle="""
    SELECT event_id,
           user_id & 15 AS low_nibble,
           user_id | 256 AS with_flag,
           xor(user_id, 85) AS xored,
           user_id << 2 AS shifted_l,
           user_id >> 1 AS shifted_r
    FROM events
    """,
)
def fn_bitwise_scalar(spark, sf_dir):
    """Scalar bitwise ops (&, |, xor, shifts) on the user_id key."""
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id")
    return ev.select(
        "event_id",
        u.bitwiseAND(F.lit(15)).alias("low_nibble"),
        u.bitwiseOR(F.lit(256)).alias("with_flag"),
        u.bitwiseXOR(F.lit(85)).alias("xored"),
        F.shiftleft(u, 2).alias("shifted_l"),
        F.shiftright(u, 1).alias("shifted_r"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(concat(lang, '|', source)) AS meta_md5
    FROM documents
    """,
)
def fn_hash(spark, sf_dir):
    """Content addressing — the primitive under exact dedup (§2.K)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat(F.col("lang"), F.lit("|"), F.col("source"))).alias("meta_md5"),
    )


@register(
    "fn_encrypt_roundtrip",
    oracle="""
    SELECT count(*) AS n_docs, TRUE AS roundtrip_ok, TRUE AS ciphertext_differs
    FROM documents
    """,
)
def fn_encrypt_roundtrip(spark, sf_dir):
    """Column-level AES-GCM encryption round-trip: every document text is
    encrypted with a 16-byte key and decrypted back, asserting (in-plan)
    that decryption restores the exact bytes and the ciphertext is not the
    plaintext — the column-protection primitive for PII at rest.

    DuckDB has no AES surface, so this key uses the repo's invariant-
    oracle pattern: the Spark side computes the booleans over every row
    (bool_and), the twin states the expected constants. GCM mode is
    randomized per row (fresh IV), so ciphertext is NOT deterministic —
    exactly why the check must be a round-trip property, not a hash. All
    JVM expressions, zero shuffle beyond the final 1-row aggregate."""
    key = "0123456789abcdef"
    d = load_table(spark, sf_dir, "documents").withColumn(
        "ct", F.expr(f"aes_encrypt(encode(text, 'UTF-8'), '{key}')")
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.bool_and(
            F.expr(f"decode(aes_decrypt(ct, '{key}'), 'UTF-8')") == F.col("text")
        ).alias("roundtrip_ok"),
        F.bool_and(F.expr("ct != encode(text, 'UTF-8')")).alias(
            "ciphertext_differs"
        ),
    )


@register(
    "fn_binary",
    oracle="""
    SELECT doc_id,
           base64(encode(source)) AS src_b64,
           hex(source) AS src_hex,
           decode(from_base64(base64(encode(source)))) AS src_roundtrip,
           (decode(from_base64(base64(encode(source)))) = source) AS b64_ok
    FROM documents
    """,
)
def fn_binary(spark, sf_dir):
    """Binary codec bundle: string → bytes (encode), base64 / hex
    rendering, and the unbase64 → decode round-trip — the wire-format
    primitives under every opaque-payload column (multimodal binaries,
    checksummed exports, HTTP-safe IDs). All JVM Column functions; both
    engines emit RFC-4648 base64 with padding and uppercase hex over UTF-8
    bytes, so the strings hash-match exactly."""
    d = load_table(spark, sf_dir, "documents")
    b64 = F.base64(F.encode(F.col("source"), "UTF-8"))
    rt = F.decode(F.unbase64(b64), "UTF-8")
    return d.select(
        "doc_id",
        b64.alias("src_b64"),
        F.hex(F.col("source")).alias("src_hex"),
        rt.alias("src_roundtrip"),
        (rt == F.col("source")).alias("b64_ok"),
    )
