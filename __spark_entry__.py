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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable key."""
    return dict(ORACLES)
