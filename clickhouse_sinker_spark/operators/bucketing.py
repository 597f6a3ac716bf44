"""Bucketed landing tables — shuffle-free co-located joins at scale.

The reference co-locates duplicate rows by routing them to the same
ClickHouse shard via the sorting-key hash (R4, output/clickhouse.go:724-799)
so the MergeTree engine can dedup locally.  The Spark-native equivalent of
"rows with the same key live together" is a BUCKETED table: the write
hash-partitions rows into a fixed number of buckets on the key, and any
later join/aggregation on that key reads the buckets co-located — no
Exchange in the plan.  At 100 TB this turns every recurring fact⋈fact join
on the bucket key from a full shuffle of both sides into a local merge.

Bucket count is a layout decision: pick ``n_buckets`` so one bucket of the
LARGEST table fits an executor's memory (same sizing rule as
``spark.sql.shuffle.partitions``), and reuse the same count across tables
that join together — equal counts are required for the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready"]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Land ``df`` as a bucketed (and optionally sort-within-bucket) table.

    ``sort_keys`` additionally sorts rows inside each bucket file, which
    lets a later merge join skip its sort — use the join key itself.
    ``path`` makes the table external (tests point it at a temp dir).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_keys:
        w = w.sortBy(*sort_keys)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.  With both
    sides bucketed the physical plan contains NO Exchange — verify with
    ``.explain("formatted")`` (tests/test_plans.py pins this shape)."""
    return spark.table(left).join(spark.table(right), key)
