"""Local replica of the driver's correctness gate (SURVEY.md §5.2.2).

For every key declared in data_transform_spark.registry it runs the Spark
query and the DuckDB oracle SQL on the same parquet fixtures and compares:
row count, column names, and an order-insensitive canonical value comparison.
Never declare a key in __spark_entry__.py that has not passed here at sf0.01.

Usage:
    python -m tests.oracle [--sf /root/testdata/sf0.01] [key ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register fixture parquet files as views, same as the driver does."""
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    """Canonical string for one cell — identical across Spark/DuckDB pandas output."""
    if v is None:
        return "<NULL>"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "<NULL>"  # NaN vs NULL: treat alike (queries should avoid NaN)
        if f == 0.0:
            f = 0.0  # collapse -0.0
        return f"{f:.10g}"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if v is pd.NaT:
        return "<NULL>"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, every cell canonicalized, rows sorted."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    # dtype parity (defensive: the driver's schema check may be strict).
    # datetime64 unit (ns vs us) is tolerated — the pandas bridges disagree
    # even on raw passthrough scans and values are equal to the microsecond.
    for c in sorted(spark_pdf.columns):
        st, ot = str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype)
        if st != ot and not (st.startswith("datetime64") and ot.startswith("datetime64")):
            problems.append(f"dtype differs for {c}: spark={st} oracle={ot}")
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        # Show first few differing rows for debugging.
        o_set = set(o_rows)
        s_set = set(s_rows)
        s_only = [r for r in s_rows if r not in o_set][:3]
        o_only = [r for r in o_rows if r not in s_set][:3]
        problems.append(f"values differ; spark-only={s_only} oracle-only={o_only}")
    return problems


def container_columns(schema) -> list[str]:
    """Array/Map/Struct-typed output columns — these crash the DRIVER's
    pandas canonicalizer (unhashable cells), so no declared key may emit
    them (round-1 VERDICT "What's wrong" #1). Containers are fine inside a
    plan; only the final projection is constrained."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def check_key(spark, key: str, sf_dir: str) -> list[str]:
    """Run one declared (query, oracle) pair; return mismatch list."""
    from data_transform_spark.registry import ORACLES, QUERIES

    fn = QUERIES[key]
    sdf = fn(spark, sf_dir)
    bad = container_columns(sdf.schema)
    if bad:
        return [f"container-typed output columns (driver-canon unsafe): {bad}"]
    spark_pdf = sdf.toPandas()
    if key not in ORACLES:
        # rows-only keys: just check the query runs and returns >= 0 rows
        return []
    con = duckdb_connect(sf_dir)
    try:
        oracle_pdf = con.sql(ORACLES[key]).df()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)


def main() -> int:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--sf", default="/root/testdata/sf0.01")
    parser.add_argument("keys", nargs="*")
    args = parser.parse_args()

    import __spark_entry__  # noqa: F401 — populates the registry
    from data_transform_spark.registry import ORACLES, QUERIES
    from data_transform_spark.session import get_spark

    spark = get_spark("oracle-replica")
    keys = args.keys or sorted(QUERIES)
    failed = []
    for key in keys:
        if key not in QUERIES:
            print(f"UNKNOWN {key}")
            failed.append(key)
            continue
        t0 = time.time()
        try:
            problems = check_key(spark, key, args.sf)
        except Exception as e:  # noqa: BLE001 — report and continue
            problems = [f"exception: {type(e).__name__}: {e}"]
        elapsed = time.time() - t0
        tag = "PASS" if not problems else "FAIL"
        mode = "hash" if key in ORACLES else "rows-only"
        print(f"{tag} {key} [{mode}] {elapsed:.2f}s")
        for p in problems:
            print(f"     {p}")
        if problems:
            failed.append(key)
    print(f"\n{len(keys) - len(failed)}/{len(keys)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
