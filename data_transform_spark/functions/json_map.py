"""§2.H — JSON and map function bundles (SURVEY.md).

events.props is a JSON string of shape {"k": <int>}. DuckDB json_extract
returns a JSON-typed value → cast to BIGINT/VARCHAR on both sides (§5.3.5).
Map-typed OUTPUT columns are avoided entirely: the two engines' pandas
bridges render maps differently ({'k': v} vs {'key': [...], 'value': [...]}),
so maps are built internally but projected as keys/values/scalars.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_transform_spark.io import load_table
from data_transform_spark.registry import register


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS k_missing
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    """JSON extraction from props: typed, string, and missing-path."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(
        F.col("props"), T.StructType([T.StructField("k", T.LongType())])
    )
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_num"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.missing").cast("long").alias("k_missing"),
    )


@register(
    "fn_json_build",
    oracle="""
    SELECT event_id,
           to_json(struct_pack(user_id := user_id, event_type := event_type))::VARCHAR AS payload_json
    FROM events
    """,
)
def fn_json_build(spark, sf_dir):
    """JSON construction (to_json over a struct) — byte-identical formatting
    in both engines (no spaces, field order = struct order)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(F.struct("user_id", "event_type")).alias("payload_json"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT c_custkey,
           to_json(struct_pack(custkey := c_custkey, name := c_name, segment := c_mktsegment))::VARCHAR AS info_json,
           struct_pack(custkey := c_custkey, name := c_name, segment := c_mktsegment).name AS info_name
    FROM customer
    """,
)
def fn_struct(spark, sf_dir):
    """Struct construction + field access; the struct is PROJECTED as JSON
    (byte-identical formatting in both engines — same pattern as
    fn_json_build) because struct cells crash the driver canonicalizer."""
    c = load_table(spark, sf_dir, "customer")
    info = F.struct(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return c.select(
        "c_custkey",
        F.to_json(info).alias("info_json"),
        info.getField("name").alias("info_name"),
    )


@register(
    "fn_map",
    oracle="""
    WITH t AS (
        SELECT event_id, event_type,
               map([event_type], [CAST(json_extract(props, '$.k') AS BIGINT)]) AS m
        FROM events
    )
    SELECT event_id,
           CAST(cardinality(m) AS BIGINT) AS m_size,
           map_keys(m)[1] AS mkey_1,
           map_values(m)[1] AS mval_1,
           map_values(m)[1] AS mval_scalar
    FROM t
    """,
)
def fn_map(spark, sf_dir):
    """map construction from JSON + size/keys/values/element_at lookups —
    all projected as scalars (map cells crash the driver canonicalizer, and
    the engines' pandas bridges render maps differently anyway)."""
    ev = load_table(spark, sf_dir, "events")
    k_val = F.get_json_object("props", "$.k").cast("long")
    m = F.create_map(F.col("event_type"), k_val)
    return ev.select(
        "event_id",
        F.size(m).cast("long").alias("m_size"),
        F.element_at(F.map_keys(m), 1).alias("mkey_1"),
        F.element_at(F.map_values(m), 1).alias("mval_1"),
        F.element_at(m, F.col("event_type")).alias("mval_scalar"),
    )
