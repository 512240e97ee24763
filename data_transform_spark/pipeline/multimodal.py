"""§2.K — multimodal (binary) columns (SURVEY.md; north-star mandate).

Images/audio/video are opaque BINARY payloads plus typed metadata structs.
The container has no media libraries, so DECODING is stubbed behind a
deterministic fake (clearly marked); everything Spark-side — schema, binary
round-trip, Arrow batch shape through mapInPandas, partitioning — is real
and tested. At 100 TB the pattern is: payloads in parquet binary columns
(or object-store pointers), metadata extracted once via mapInPandas, then
all filtering/grouping happens on the cheap metadata columns.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import functions as F

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "multimodal_binary",
    oracle="""
    SELECT doc_id,
           lower(hex(encode(text))) AS payload_hex,
           'text/plain' AS mime,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_binary(spark, sf_dir):
    """Typed binary column + metadata, hash-checked byte-for-byte vs DuckDB.

    The payload is built and measured as a real BinaryType column; it is
    PROJECTED as lowercase hex because the two engines' pandas bridges
    disagree on raw binary (bytearray vs bytes) — same trap as DATE/MAP.
    """
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.lower(F.hex(payload)).alias("payload_hex"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.md5("text").alias("checksum"),
    )


def fake_decode_image(payload: bytes) -> dict:
    """STUB decoder — deterministic fake in place of a real media library.

    A real deployment would replace this body with PIL/ffmpeg/torchvision
    calls; the Spark plumbing around it (Arrow batches, schema, partition
    mapping) is identical. Raises nothing: pure function of the bytes.
    """
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 192,  # fake 64..255 px
        "height": 64 + h[1] % 192,
        "n_channels": 3,
        "dominant_value": h[2],
    }


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           64 + CAST(('0x' || substring(md5(text), 1, 2)) AS BIGINT) % 192 AS width,
           64 + CAST(('0x' || substring(md5(text), 3, 2)) AS BIGINT) % 192 AS height,
           CAST(3 AS BIGINT) AS n_channels,
           CAST(('0x' || substring(md5(text), 5, 2)) AS BIGINT) AS dominant_value,
           octet_length(encode(text)) AS byte_len
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    """Decode/feature-extract binary payloads via Arrow-batched mapInPandas.

    Shape of a real image pipeline: binary in → metadata columns out, one
    Python worker pass per partition, no driver involvement. The STUB
    decoder derives features from the payload's md5 digest, so the DuckDB
    twin recomputes the same bytes from md5 hex — a full hash oracle over
    the whole Arrow round-trip.
    """
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    src = d.select("doc_id", payload.alias("payload"), F.octet_length(payload).alias("byte_len"))

    def extract(batches):
        for pdf in batches:
            feats = [fake_decode_image(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            out["byte_len"] = pdf["byte_len"].to_numpy()
            yield out

    return src.mapInPandas(
        extract,
        "doc_id long, width long, height long, n_channels long, dominant_value long, byte_len long",
    )
