"""As-of join — for each left row, the latest right row with
``right.ts <= left.ts`` per key (time-series point-in-time enrichment).

Spark has no native as-of join (pandas-on-Spark's merge_asof collects per
group); the scalable formulation here is the union-window linear scan:

    tag left/right → union → window(partitionBy key, orderBy ts, side)
    → last non-null right value seen so far → keep left rows

One shuffle + one sort per side (the same cost as a sort-merge join), no
row explosion, no per-key quadratic blowup — this is the plan you want at
100 TB (a naive ``right.ts <= left.ts`` theta-join explodes quadratically
per key).  At equal timestamps the right row sorts BEFORE the left row
(side tag ascending), so a right update at exactly t matches a left probe
at t — the standard ASOF semantics (DuckDB's ASOF JOIN matches this,
which makes the operator oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, enriched with the most recent
    ``value_cols`` from ``right`` at or before its timestamp (NULL if no
    prior right row).  ``left`` and ``right`` must both carry ``on`` and
    ``ts`` columns.

    ``tolerance_s`` bounds staleness per VALUE: each enriched column is
    forward-filled from the newest right row where that column was non-null,
    and the tolerance is judged against that column's own source timestamp
    (the (ts, value) pair rides the window together as a struct — no extra
    shuffle).  This is column-level staleness; pandas merge_asof instead
    matches one whole right row per left row (its nulls included) and
    applies tolerance to that row.  With right rows that are fully
    populated — the common case — the two definitions coincide."""
    lcols = left.columns
    l = left.select(*lcols, F.lit(1).alias("__side"))
    r = right.select(
        on,
        ts,
        *[F.col(c) for c in value_cols],
        F.lit(0).alias("__side"),
    )
    # align schemas for the union: left gets null value slots, right gets
    # null payload slots
    for c in value_cols:
        l = l.withColumn(f"__v_{c}", F.lit(None).cast(r.schema[c].dataType))
    l = l.withColumn("__v_ts", F.lit(None).cast("timestamp"))
    r = r.select(
        on,
        ts,
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(ts).cast("timestamp").alias("__v_ts"),
        "__side",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in (on, ts)
        ],
    )
    unioned = l.unionByName(r)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    if tolerance_s is None:
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}", F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w)
            )
    else:
        # each column's (source ts, value) travels as one struct so the
        # staleness check uses the timestamp of the row that VALUE came
        # from — not the newest right row overall, whose null in this
        # column may hide a much older fill.
        for c in value_cols:
            pair = F.when(
                F.col(f"__v_{c}").isNotNull(),
                F.struct(F.col("__v_ts").alias("t"), F.col(f"__v_{c}").alias("v")),
            )
            last_pair = F.last(pair, ignorenulls=True).over(w)
            fresh = (
                F.col(ts).cast("timestamp").cast("double") - last_pair["t"].cast("double")
            ) <= F.lit(float(tolerance_s))
            out = out.withColumn(f"{c}{suffix}", F.when(fresh, last_pair["v"]))
    return out.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"{c}{suffix}") for c in value_cols]
    )
