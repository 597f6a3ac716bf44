"""Oracle result-type audit (VERDICT r4 item 1).

The correctness driver hashes typed cells.  Empirically it tolerates
width-only differences (int32 vs int64, datetime64[ns] vs [us]) but NOT
types pandas can't map onto a standard numpy dtype: DuckDB HUGEINT
(int128 — what an uncast ``SUM`` over integers returns), UHUGEINT and
DECIMAL all hash differently from Spark's BIGINT/DOUBLE even when every
value is equal (that is exactly how ``window_sessionize`` went red in
round 4 while being value-identical).  This audit runs every registered
oracle in DuckDB at sf0.001 and fails if any output column has one of
those types — closing the class, not the instance.

DuckDB-only (no Spark session needed), so the whole sweep is seconds.
"""

from __future__ import annotations

import pytest

from clickhouse_sinker_spark.plans.queries import ORACLES

from .oracle_util import duck_con

SF_DIR = "/root/testdata/sf0.001"

BANNED = ("HUGEINT", "UHUGEINT")
BANNED_PREFIX = ("DECIMAL", "INTERVAL")


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_dtypes(con, name):
    rel = con.sql(ORACLES[name])
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ)
        if t in BANNED or any(t.startswith(p) for p in BANNED_PREFIX):
            bad.append((col, t))
    assert not bad, (
        f"oracle '{name}' emits driver-unhashable column types {bad}; "
        "cast integer aggregates to BIGINT and decimals to DOUBLE in the "
        "oracle SQL (and mirror the cast on the Spark side)"
    )
