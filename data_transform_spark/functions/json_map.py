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
    "fn_map",
    oracle="""
    SELECT event_id,
           map_keys(map([event_type], [CAST(json_extract(props, '$.k') AS BIGINT)])) AS mkeys,
           map_values(map([event_type], [CAST(json_extract(props, '$.k') AS BIGINT)])) AS mvals,
           map_values(map([event_type], [CAST(json_extract(props, '$.k') AS BIGINT)]))[1] AS mval_scalar
    FROM events
    """,
)
def fn_map(spark, sf_dir):
    """map construction from JSON + keys/values/scalar projections."""
    ev = load_table(spark, sf_dir, "events")
    k_val = F.get_json_object("props", "$.k").cast("long")
    m = F.create_map(F.col("event_type"), k_val)
    return ev.select(
        "event_id",
        F.map_keys(m).alias("mkeys"),
        F.map_values(m).alias("mvals"),
        F.element_at(m, F.col("event_type")).alias("mval_scalar"),
    )
