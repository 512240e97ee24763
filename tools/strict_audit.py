"""Strict bit-level oracle audit — NO canonicalization.

The pytest/driver comparator canonicalizes floats to 10 significant digits
(tests/oracle.py), which hides last-bits drift between Spark and DuckDB
expression evaluation. This audit compares raw ``repr`` of every cell, so
a key passes only if both engines produce BIT-IDENTICAL values. Round 5
ran it over the full registry: the single drift it found (pyarrow's
half-to-even ``pc.round`` inside udf_map_in_arrow vs the engines' half-up)
was fixed by moving the rounding JVM-side; everything else was already
bit-exact thanks to the matched-expression-tree discipline (SURVEY §5.3).

Usage:
    python tools/strict_audit.py [key ...]     # default: all oracle keys
"""

from __future__ import annotations

import hashlib
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as em  # noqa: E402

FIXTURE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def vhash(pdf) -> str:
    cols = sorted(pdf.columns)
    cells = [
        "|".join(repr(x) for x in r)
        for r in pdf[cols].itertuples(index=False, name=None)
    ]
    return hashlib.md5("\n".join(sorted(cells)).encode()).hexdigest()


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("strict-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    q, o = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    keys = sys.argv[1:] or sorted(o)
    drift = []
    for k in keys:
        try:
            s = q[k](spark, sf).toPandas()
            d = con.sql(o[k]).df()
            ok = (
                len(s) == len(d)
                and sorted(s.columns) == sorted(d.columns)
                and vhash(s) == vhash(d)
            )
        except Exception as e:  # noqa: BLE001 — audit must survive any key
            ok = False
            print(f"ERR {k} {type(e).__name__}: {str(e)[:100]}", flush=True)
        if not ok:
            drift.append(k)
            print("STRICT-DRIFT", k, flush=True)
    print(f"AUDIT DONE {len(keys) - len(drift)}/{len(keys)} bit-identical; "
          f"drift: {drift}")
    return 1 if drift else 0


if __name__ == "__main__":
    raise SystemExit(main())
