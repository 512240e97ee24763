"""Property-based tests (hypothesis, SURVEY.md §5.2.3) over generated frames.

Algebraic invariants that must hold for ANY input — they catch semantic
slips the fixture-pinned oracles can't (e.g. a dedup that isn't idempotent).
Small example counts: each property round-trips through the JVM.
"""

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # key
        st.integers(min_value=-100, max_value=100),  # val
        st.sampled_from(["a", "b", "c"]),  # tag
    ),
    min_size=0,
    max_size=25,
)

PROP_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    # the driver's verify must be reproducible: same examples every run
    derandomize=True,
)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "val", "tag"])
        if rows
        else pd.DataFrame({"key": pd.Series(dtype="int64"),
                           "val": pd.Series(dtype="int64"),
                           "tag": pd.Series(dtype="object")}),
        schema="key long, val long, tag string",
    )


@given(rows=ROWS)
@settings(**PROP_SETTINGS)
def test_union_all_counts_add(spark, rows):
    df = _df(spark, rows)
    assert df.unionAll(df).count() == 2 * df.count()


@given(rows=ROWS)
@settings(**PROP_SETTINGS)
def test_filter_partitions_rows(spark, rows):
    df = _df(spark, rows)
    cond = F.col("val") > 0
    assert df.filter(cond).count() + df.filter(~cond).count() == df.count()


@given(rows=ROWS)
@settings(**PROP_SETTINGS)
def test_canonical_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    w = Window.partitionBy("key").orderBy("val", "tag")
    dedup1 = df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    dedup2 = dedup1.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    assert sorted(map(tuple, dedup1.collect())) == sorted(map(tuple, dedup2.collect()))


@given(rows=ROWS, rows2=ROWS)
@settings(**PROP_SETTINGS)
def test_semi_join_is_subset_of_left(spark, rows, rows2):
    left = _df(spark, rows)
    right = _df(spark, rows2)
    semi = left.join(right, "key", "left_semi")
    anti = left.join(right, "key", "left_anti")
    assert semi.count() + anti.count() == left.count()
    left_keys = {r["key"] for r in left.collect()}
    assert {r["key"] for r in semi.collect()} <= left_keys


@given(rows=ROWS)
@settings(**PROP_SETTINGS)
def test_groupby_sum_matches_duckdb(spark, rows):
    """Engine-vs-engine equivalence on generated data, not just fixtures."""
    df = _df(spark, rows)
    got = {
        (r["key"],): (r["n"], r["s"])
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    pdf = pd.DataFrame(rows, columns=["key", "val", "tag"])
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        (k,): (n, s)
        for k, n, s in con.sql("SELECT key, count(*), sum(val) FROM t GROUP BY key").fetchall()
    }
    con.close()
    assert got == want
