"""Prometheus time-series mode: metric/series split + series dedup
(≙ D1/D2/D3: task/task.go:236-272, output/clickhouse.go:163-249,308-433).

The reference splits each datapoint row into a metric row
(dims + __series_id__) and a series row (__series_id__, __mgmt_id__, labels
JSON, label columns), and writes a series row only when the series id is new
or its mgmt id changed (in-memory BmSeries map, warmed from ClickHouse).

Spark-first re-expression:

- batch: the split is two selects from one DataFrame; "new or changed"
  dedup is a groupBy(__series_id__) keeping the latest mgmt id — one
  shuffle on series id, which the sortingkey sharding already co-locates.
- streaming: ``streaming.state.series_dedup_stream`` keeps the sid→mid map
  in Spark state store (applyInPandasWithState) with JDBC warm-start —
  see that module.
- labels JSON: built with deterministic key order (sorted), excluding
  ``__name__``, ``le`` and blacklisted labels (task/task.go:262-270).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["split_metric_series", "labels_json", "dedup_series_latest"]

EXCLUDED_LABELS = ("__name__", "le", "__series_id__", "__mgmt_id__")


def labels_json(label_cols: list[str], blacklist: tuple[str, ...] = ()) -> F.Column:
    """Deterministic labels JSON string from label columns, keys sorted,
    excluding __name__/le/blacklist (task/task.go:262-270).  Built by
    concat so the byte layout is engine-independent (oracle-exact)."""
    keep = sorted(c for c in label_cols if c not in EXCLUDED_LABELS and c not in blacklist)
    parts = []
    for c in keep:
        # JSON-escape the value (the reference JSON-encodes label values,
        # task/task.go:262-270): backslash first, then quote, then control
        # whitespace — otherwise a value containing " or \ emits malformed
        # JSON.  Keys are trusted column names (no escaping needed).
        v = F.col(c).cast("string")
        v = F.regexp_replace(v, r"\\", r"\\\\")
        v = F.regexp_replace(v, '"', '\\\\"')
        v = F.regexp_replace(v, "\n", "\\\\n")
        v = F.regexp_replace(v, "\t", "\\\\t")
        v = F.regexp_replace(v, "\r", "\\\\r")
        parts.append(
            F.when(
                F.col(c).isNotNull(),
                F.concat(F.lit(f'"{c}":"'), v, F.lit('"')),
            )
        )
    inner = F.concat_ws(",", *parts) if parts else F.lit("")
    return F.concat(F.lit("{"), inner, F.lit("}"))


def split_metric_series(
    df: DataFrame,
    metric_cols: list[str],
    label_cols: list[str],
    blacklist: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """One input → (metric_df, series_df)  (≙ task/task.go:236-272).

    metric_df: __series_id__ + metric columns.
    series_df: one row per (series_id, mgmt_id) with labels JSON + label
    columns — deduplicated deterministically (min over tie columns).
    """
    metric = df.select("__series_id__", *metric_cols)
    keep_labels = [c for c in label_cols if c not in blacklist and c not in EXCLUDED_LABELS]
    series = (
        df.select(
            "__series_id__",
            "__mgmt_id__",
            labels_json(label_cols, blacklist).alias("labels"),
            *keep_labels,
        )
        .groupBy("__series_id__")
        .agg(
            F.max("__mgmt_id__").alias("__mgmt_id__"),
            F.max_by("labels", "__mgmt_id__").alias("labels"),
            *[F.max_by(c, "__mgmt_id__").alias(c) for c in keep_labels],
        )
    )
    return metric, series


def dedup_series_latest(df: DataFrame, sid: str = "__series_id__", mid: str = "__mgmt_id__") -> DataFrame:
    """Series-change detection in batch form: latest mgmt id per series
    (the reference writes a series row iff sid new or mid changed —
    output/clickhouse.go:163-228; over a bounded batch that reduces to
    keep-latest per sid)."""
    others = [c for c in df.columns if c not in (sid, mid)]
    return df.groupBy(sid).agg(
        F.max(mid).alias(mid), *[F.max_by(c, mid).alias(c) for c in others]
    )
