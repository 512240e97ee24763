"""Importing this package registers all §2 operators into the registry."""

from data_transform_spark.operators import (  # noqa: F401
    aggregates,
    etl,
    events,
    extras,
    graph,
    joins,
    projections,
    reshape,
    scans,
    setops,
    sorts,
    sqlsurface,
    timeseries,
    tpch_full,
    tpch_more,
    tpch_rest,
    windows,
)
