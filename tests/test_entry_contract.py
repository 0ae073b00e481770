"""Driver-contract replica: every queries() entry must match its
oracle_sql() in DuckDB (row count + schema + order-insensitive values)
— the same gate the driver runs at sf=0.01 (run here at sf0.001 for
speed; the bench/driver covers larger SFs)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from oracle_harness import compare_one, duck_connection  # noqa: E402


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_connection(sf_dir)


def test_oracle_keys_subset():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_).issubset(set(qs)), "oracle_sql keys must exist in queries"


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns == ["url", "host", "depth", "rank"]


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(spark, con, sf_dir, name):
    sql = E.oracle_sql().get(name)
    if sql is None:
        df = E.queries()[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check for non-SQL-expressible ops
        return
    res = compare_one(spark, con, name, E.queries()[name], sql, sf_dir)
    assert res["status"] == "OK", json.dumps(res, default=str)[:2000]
