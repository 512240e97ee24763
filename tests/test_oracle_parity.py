"""Full oracle-parity replica at sf0.001 (fast tier).

The authoritative pre-declaration gate runs at sf0.01 via
``python .scratch/run_oracle.py`` / ``python -m tests.oracle``; this pytest
keeps every declared (query, oracle) pair continuously green at the smoke SF.
"""

import pytest

import __spark_entry__  # noqa: F401 — populates registry
from data_transform_spark.registry import ORACLES, QUERIES
from tests.oracle import check_key


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_oracle_parity(spark, sf_dir, key):
    problems = check_key(spark, key, sf_dir)
    assert not problems, f"{key}: {problems}"


def test_every_hash_key_has_query():
    assert set(ORACLES) <= set(QUERIES)
