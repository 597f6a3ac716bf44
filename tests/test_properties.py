"""Property-based tests (hypothesis) for the cast semantics — broader than
the reference's fixed edge-value matrix (SURVEY §5 notes the reference has
no property tests; these subsume its ±2^63 / ±inf cases by generation)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from clickhouse_sinker_spark.functions.casts import saturating_cast
from clickhouse_sinker_spark.functions.hashing import shard_knuth, shard_stripe
from clickhouse_sinker_spark.typemap import INT_BOUNDS


def _model_saturate(v, lo: int, hi: int) -> int:
    """Reference semantics (parser/fastjson.go:129-188): integers parse
    exactly and clamp; floats truncate toward zero (Go ``int64(float64)``)
    then clamp; ±inf clamps by sign."""
    if isinstance(v, float):
        if math.isinf(v):
            return lo if v < 0 else hi
        v = int(v)  # truncate toward zero
    return max(lo, min(hi, v))


def _projection_int_expr(ch: str):
    """The exact expression operators/project.py builds for integer dims:
    integral values via exact decimal, fractional/overflow via double."""
    dec = F.col("v").try_cast("decimal(38,9)")
    is_int_literal = F.col("v").cast("string").rlike(r"^-?\d+$")
    return F.when(
        dec.isNotNull() & is_int_literal, saturating_cast(dec, ch)
    ).otherwise(saturating_cast(F.col("v").try_cast("double"), ch))


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**70), max_value=2**70),
            st.floats(allow_nan=False, allow_infinity=True, width=64),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_saturating_cast_matches_model(spark, values):
    for ch in ("Int8", "Int32", "Int64", "UInt16", "UInt64"):
        lo, hi = INT_BOUNDS[ch]
        df = spark.createDataFrame([(str(v),) for v in values], "v string")
        got = [r[0] for r in df.select(_projection_int_expr(ch).alias("o")).collect()]
        for v, g in zip(values, got):
            expect = _model_saturate(v, lo, hi)
            assert g is not None, (ch, v)
            assert int(g) == expect, (ch, v, g, expect)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=50))
def test_shard_policies_in_range_and_stable(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    out = df.select(
        shard_stripe("k", 16, 8).alias("s"),
        shard_knuth("k", 8).alias("h"),
    ).collect()
    again = df.select(shard_knuth("k", 8).alias("h")).collect()
    for r, r2 in zip(out, again):
        assert 0 <= r["s"] < 8 and 0 <= r["h"] < 8
        assert r["h"] == r2["h"]  # deterministic on content


# (python strftime, spark layout, truncation) triples for the offset-less
# members of DATETIME_LAYOUTS (P9, parser/parser.go:31-65)
_DT_LAYOUTS = [
    ("%Y-%m-%dT%H:%M:%S", "sec"),
    ("%Y-%m-%d %H:%M:%S", "sec"),
    ("%Y-%m-%d", "day"),
    ("%d/%m/%Y", "day"),
    ("%m/%d/%Y %H:%M:%S", "sec"),
    ("%Y%m%d %H:%M:%S", "sec"),
]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=__import__("datetime").datetime(1900, 1, 1),
            max_value=__import__("datetime").datetime(2260, 12, 31),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_datetime_layout_roundtrip(spark, dts):
    """Any value formatted in any auto-detected layout parses back to the
    same instant (truncated to the layout's precision) via the P9 chain."""
    from clickhouse_sinker_spark.functions.casts import parse_datetime_any

    for fmt, prec in _DT_LAYOUTS:
        vals = [d.replace(microsecond=0) for d in dts]
        df = spark.createDataFrame([(d.strftime(fmt),) for d in vals], "v string")
        got = [r[0] for r in df.select(parse_datetime_any("v").alias("o")).collect()]
        for d, g in zip(vals, got):
            want = d.replace(hour=0, minute=0, second=0) if prec == "day" else d
            assert g == want, (fmt, d, g)
