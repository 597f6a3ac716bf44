"""The main correctness gate, run locally at sf0.001: every oracle-paired
query in plans/queries.py must match its DuckDB oracle bit-for-bit (the
driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from clickhouse_sinker_spark.plans.queries import ORACLES, QUERIES

from .conftest import SF_DIR
from .oracle_util import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    ok, msg = compare(df, ORACLES[name], SF_DIR)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
