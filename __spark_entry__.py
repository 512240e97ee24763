"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_transform_spark`` (SURVEY.md §2 keys);
this module only adapts the registry to the driver's entry points.
The generated operator inventory is COVERAGE.md; the 100 TB design
contract per operator family is SCALING.md.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import data_transform_spark.functions  # noqa: E402,F401 — populates registry
import data_transform_spark.operators  # noqa: E402,F401 — populates registry
import data_transform_spark.pipeline  # noqa: E402,F401 — populates registry
import data_transform_spark.streaming  # noqa: E402,F401 — populates registry
from data_transform_spark.plans.flagship import flagship  # noqa: E402
from data_transform_spark.registry import ORACLES, QUERIES  # noqa: E402
from data_transform_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_session(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_session(spark)
        return fn(spark, sf_dir)

    return run


# Keys with a green (rows+schema+hash) row in CORRECTNESS_r01.json. The
# driver's round-1 sweep stopped after the first 50 keys in queries() order,
# so keys WITHOUT an official row yet are listed first (grouped by family)
# and the already-verified ones come last — a capped sweep then spends its
# budget where it adds coverage (round-1 VERDICT "Next round" #2).
_GREEN_R1 = {
    "fn_explode", "fn_date_extract", "fn_date_arith", "fn_date_epoch",
    "fn_json", "fn_json_build", "fn_math", "fn_trig", "fn_bitwise_scalar",
    "fn_hash", "fn_string_basic", "fn_string_regex", "fn_string_fuzzy",
    "udf_scalar", "udf_pandas_scalar", "udf_pandas_agg", "udf_grouped_map",
    "udf_map_in_pandas", "udtf_tokenize", "udf_sql_registered",
    "agg_global", "agg_groupby", "agg_count_distinct", "agg_sum_distinct",
    "agg_minmax_by", "agg_string", "agg_stats", "agg_percentile",
    "agg_having", "agg_grouping_sets", "agg_rollup", "agg_cube",
    "agg_countif", "agg_bool", "agg_pivot", "transform_upsert",
    "transform_scd2", "dq_checks", "tpch_q3", "tpch_q6", "sample_hash",
    "shard_assign",
}

# Family order for the not-yet-verified block (module suffix → rank).
_FAMILY_ORDER = [
    "functions.arrays",      # round-1 ERR keys, now flattened — retest first
    "functions.json_map",
    "operators.aggregates",  # agg_collect / agg_approx_distinct were ERR
    "operators.joins",
    "operators.windows",
    "operators.scans",
    "operators.setops",
    "operators.sorts",
    "operators.projections",
    "pipeline.text",
    "pipeline.training",
    "pipeline.multimodal",
    "pipeline.e2e",
    "pipeline.dedup",
    "pipeline.similarity",
    "streaming.ops",
    "operators.extras",
    "operators.reshape",
    "operators.etl",
]


def _sweep_rank(name: str) -> tuple:
    fn = QUERIES[name]
    mod = fn.__module__.removeprefix("data_transform_spark.")
    fam = _FAMILY_ORDER.index(mod) if mod in _FAMILY_ORDER else len(_FAMILY_ORDER)
    ins = list(QUERIES).index(name)
    return (name in _GREEN_R1, fam, ins)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so a
    capped driver sweep reaches officially-unverified keys first."""
    ordered = sorted(QUERIES, key=_sweep_rank)
    return {name: _wrap(QUERIES[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable key."""
    ordered = sorted(QUERIES, key=_sweep_rank)
    return {name: ORACLES[name] for name in ordered if name in ORACLES}
