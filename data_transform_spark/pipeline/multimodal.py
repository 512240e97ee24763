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


RESIZE_TARGET = 128


@register(
    "multimodal_resize",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id, md5(text) AS checksum,
               64 + CAST(('0x' || substring(md5(text), 1, 2)) AS BIGINT) % 192 AS w,
               64 + CAST(('0x' || substring(md5(text), 3, 2)) AS BIGINT) % 192 AS h
        FROM documents
    )
    SELECT doc_id, w AS src_width, h AS src_height,
           CASE WHEN w >= h THEN {RESIZE_TARGET}
                ELSE greatest(1, CAST(floor(w * {RESIZE_TARGET}.0 / h) AS BIGINT))
           END AS out_width,
           CASE WHEN w >= h THEN greatest(1, CAST(floor(h * {RESIZE_TARGET}.0 / w) AS BIGINT))
                ELSE {RESIZE_TARGET}
           END AS out_height,
           md5(checksum || 'x' ||
               CAST(CASE WHEN w >= h THEN {RESIZE_TARGET}
                    ELSE greatest(1, CAST(floor(w * {RESIZE_TARGET}.0 / h) AS BIGINT))
                    END AS VARCHAR) || 'x' ||
               CAST(CASE WHEN w >= h THEN greatest(1, CAST(floor(h * {RESIZE_TARGET}.0 / w) AS BIGINT))
                    ELSE {RESIZE_TARGET}
                    END AS VARCHAR)) AS resized_checksum
    FROM dims
    """,
)
def multimodal_resize(spark, sf_dir):
    """Aspect-preserving resize-to-fit (128 px long side) via Arrow-batched
    mapInPandas — the image-preprocessing stage of a multimodal pipeline.

    The STUB decode derives source dims from the payload md5 (no media libs
    in the container); the resize arithmetic, per-batch Python pass and
    output signature (md5 of checksum x out_w x out_h) are the real
    plumbing a PIL/torchvision body would slot into. Integer-exact in
    doubles (dims <= 255), so the DuckDB twin is a full value hash."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    src = d.select("doc_id", payload.alias("payload"))

    def resize(batches):
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                meta = fake_decode_image(b)
                w, h = meta["width"], meta["height"]
                if w >= h:
                    ow, oh = RESIZE_TARGET, max(1, int(h * float(RESIZE_TARGET) / w))
                else:
                    ow, oh = max(1, int(w * float(RESIZE_TARGET) / h)), RESIZE_TARGET
                checksum = hashlib.md5(b).hexdigest()
                sig = hashlib.md5(f"{checksum}x{ow}x{oh}".encode()).hexdigest()
                rows.append((doc_id, w, h, ow, oh, sig))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_width", "src_height",
                    "out_width", "out_height", "resized_checksum",
                ],
            )

    return src.mapInPandas(
        resize,
        "doc_id long, src_width long, src_height long, "
        "out_width long, out_height long, resized_checksum string",
    )


FRAME_BYTES = 16  # fake frame size
FRAME_STRIDE = 4  # keep every 4th frame


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST((s - 1) / {FRAME_BYTES} AS BIGINT) AS frame_idx,
           md5(substring(text, s, {FRAME_BYTES})) AS frame_md5,
           octet_length(encode(substring(text, s, {FRAME_BYTES}))) AS frame_bytes
    FROM documents,
         unnest(generate_series(1, octet_length(encode(text)),
                                {FRAME_BYTES * FRAME_STRIDE})) AS u(s)
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling from an opaque video-like payload: split the binary
    into fixed 16-byte 'frames', keep every 4th, emit per-frame checksums —
    the mapInPandas shape of ffmpeg keyframe extraction (one Python pass per
    Arrow batch, rows fan OUT per input row).

    The payload is ASCII text bytes, so the DuckDB twin samples the same
    offsets with substring — a full value hash over the fan-out. A real
    decoder body would replace the slicing with ffmpeg calls; schema,
    batching and partitioning are unchanged."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    src = d.select("doc_id", payload.alias("payload"))
    step = FRAME_BYTES * FRAME_STRIDE

    def sample(batches):
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                for s in range(0, len(b), step):
                    frame = b[s : s + FRAME_BYTES]
                    rows.append(
                        (
                            doc_id,
                            s // FRAME_BYTES,
                            hashlib.md5(frame).hexdigest(),
                            len(frame),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_md5", "frame_bytes"]
            )

    return src.mapInPandas(
        sample, "doc_id long, frame_idx long, frame_md5 string, frame_bytes long"
    )
