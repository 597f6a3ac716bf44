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

import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ClickHouseConfig


def _epochize(col, dt):
    """Rewrite ``col`` so every timestamp anywhere in ``dt`` — top level or
    nested inside arrays/maps — becomes exact epoch microseconds, computed
    on the JVM (session-timeZone-aware).  Returns (column, changed)."""
    from pyspark.sql import types as T

    def has_ts(d) -> bool:
        if d.typeName() in ("timestamp", "timestamp_ntz"):
            return True
        if isinstance(d, T.ArrayType):
            return has_ts(d.elementType)
        if isinstance(d, T.MapType):
            return has_ts(d.keyType) or has_ts(d.valueType)
        return False

    if dt.typeName() in ("timestamp", "timestamp_ntz"):
        # NTZ → instant under the session timeZone (pipelines pin UTC)
        return F.unix_micros(col.cast("timestamp")), True
    if isinstance(dt, T.ArrayType) and has_ts(dt.elementType):
        return F.transform(col, lambda x: _epochize(x, dt.elementType)[0]), True
    if isinstance(dt, T.MapType) and (has_ts(dt.keyType) or has_ts(dt.valueType)):
        out = col
        if has_ts(dt.keyType):
            out = F.transform_keys(out, lambda k, _v: _epochize(k, dt.keyType)[0])
        if has_ts(dt.valueType):
            out = F.transform_values(out, lambda _k, v: _epochize(v, dt.valueType)[0])
        return out, True
    return col, False

__all__ = [
    "ParquetSink",
    "ManifestParquetSink",
    "JdbcSink",
    "ShardReplicas",
    "with_retry",
]


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
    # r14 (guide §6): codec measured on the 1M-row ETL bench write —
    # zstd 2.23 s / 18 MB vs snappy (Spark default) 3.25 s / 22 MB vs
    # lz4 2.52 s / 21 MB: zstd is both the fastest wall and the smallest
    # output here, and its decode side is also cheap for downstream
    # readers.  Row-group / maxRecordsPerFile tuning measured as no-ops
    # at these per-task file sizes (well under one 128 MB row group).
    compression: str = "zstd"

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
        writer.option("compression", self.compression).parquet(self.path)


@dataclass
class ManifestParquetSink:
    """Exactly-once-per-epoch parquet landing via an epoch-keyed commit
    manifest — the upgrade from the engine's at-least-once contract (S7)
    to effective exactly-once on files, the standard transactional
    foreachBatch pattern.

    Each epoch writes to its own directory ``<path>/epoch=<id>`` and then
    atomically records a manifest ``<path>/_manifests/<id>.json``.  A
    replayed epoch (same id — exactly what Structured Streaming re-delivers
    after a crash between sink-write and checkpoint-commit) is SKIPPED when
    its manifest already exists, so re-delivery cannot duplicate rows.
    Readers take only manifested epochs: ``read_committed``.

    At 100 TB the manifest write is a single tiny driver-side file per
    epoch (no file listing, no rename of data files), and data writes keep
    full executor parallelism — the same layout ``ParquetSink`` uses.

    Manifest I/O goes through the Hadoop ``FileSystem`` API resolved from
    ``self.path`` itself, so the manifest lives on the SAME filesystem as
    the data (local, HDFS, S3A, ...) — a driver-local check against an
    HDFS/S3 data path would silently degrade exactly-once back to
    at-least-once on replay.  Commit is create-tmp + rename: atomic on
    HDFS; on S3A the rename completes as a single object PUT, which is
    atomic per object (no reader ever sees a partial manifest).
    """

    path: str
    shard_col: str = "__shard"
    compression: str = "zstd"  # same measured choice as ParquetSink (r14 §6)

    def _manifest_dir(self) -> str:
        return f"{self.path}/_manifests"

    def _manifest_file(self, epoch_id: int) -> str:
        return f"{self._manifest_dir()}/{epoch_id}.json"

    def _fs(self, spark):
        """(jvm, FileSystem) for whatever scheme ``self.path`` carries."""
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return jvm, fs

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        import json

        spark = batch.sparkSession
        jvm, fs = self._fs(spark)
        mf = jvm.org.apache.hadoop.fs.Path(self._manifest_file(epoch_id))
        if fs.exists(mf):  # replayed epoch: already committed, no-op
            return
        epoch_dir = f"{self.path}/epoch={epoch_id}"
        out = batch
        writer = out.write.mode("overwrite")  # overwrite: partial retry debris
        if self.shard_col in out.columns:
            out = out.sortWithinPartitions(self.shard_col)
            writer = out.write.mode("overwrite").partitionBy(self.shard_col)
        writer.option("compression", self.compression).parquet(epoch_dir)
        payload = json.dumps(
            {"epoch": epoch_id, "dir": epoch_dir, "schema": batch.schema.json()}
        ).encode()
        tmp = jvm.org.apache.hadoop.fs.Path(f"{self._manifest_file(epoch_id)}.tmp")
        stream = fs.create(tmp, True)
        try:
            stream.write(bytearray(payload))
        finally:
            stream.close()
        # rename is the commit point (atomic on HDFS / a single PUT on S3A)
        if not fs.rename(tmp, mf):
            fs.delete(tmp, False)
            raise IOError(f"manifest commit failed for epoch {epoch_id}: {mf}")

    def _read_manifests(self, spark) -> list[dict]:
        import json

        jvm, fs = self._fs(spark)
        mdir = jvm.org.apache.hadoop.fs.Path(self._manifest_dir())
        if not fs.exists(mdir):
            return []
        out = []
        for st in sorted(fs.listStatus(mdir), key=lambda s: s.getPath().getName()):
            name = st.getPath().getName()
            if not name.endswith(".json"):
                continue
            stream = fs.open(st.getPath())
            try:
                raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
            finally:
                stream.close()
            out.append(json.loads(raw))
        return out

    def read_committed(self, spark) -> DataFrame:
        """Read only epochs whose manifest exists (uncommitted epoch dirs —
        crash debris — are invisible).  With zero committed epochs the
        empty frame still carries the sink's real schema (recorded in each
        manifest); with no manifests at all there is nothing to read and
        nothing to know the schema from — that is an error, not a fake
        ``id long`` frame."""
        import json

        from pyspark.sql.types import StructType

        manifests = self._read_manifests(spark)
        if not manifests:
            raise FileNotFoundError(
                f"no committed epochs under {self.path!r}; nothing has been "
                "landed yet (read_committed has no schema to return)"
            )
        dirs = [m["dir"] for m in manifests]
        df = spark.read.option("basePath", self.path).parquet(*dirs)
        if "schema" in manifests[-1]:
            # the recorded schema must still parse — catches manifest
            # corruption early, on the reader side
            StructType.fromJson(json.loads(manifests[-1]["schema"]))
        return df


class ShardReplicas:
    """Per-shard replica selection with failure-version fencing
    (≙ ShardConn.NextGoodReplica, pool/conn.go:83-136).

    Each shard has a sticky current replica and a monotonically increasing
    ``version``.  A writer that fails reports the version it saw; the
    replica advances only if no other writer already advanced past that
    version — the reference's fencing rule (recording failure *versions*
    rather than timestamps so a stale failure can't kill a fresh, good
    connection).
    """

    def __init__(self, ch: ClickHouseConfig):
        self._ch = ch
        self._lock = threading.Lock()
        self._idx: dict[int, int] = {}
        self._ver: dict[int, int] = {}

    def current(self, shard: int) -> tuple[str, int]:
        """(replica URL, version) for the shard's current replica."""
        urls = self._ch.replica_urls(shard)
        with self._lock:
            i = self._idx.get(shard, 0)
            return urls[i % len(urls)], self._ver.get(shard, 0)

    def next_good_replica(self, shard: int, failed_ver: int) -> tuple[str, int]:
        """Advance past a failed replica — unless another writer already
        did (version fencing).  Returns the new (URL, version)."""
        urls = self._ch.replica_urls(shard)
        with self._lock:
            ver = self._ver.get(shard, 0)
            if ver > failed_ver:  # someone else already moved on
                return urls[self._idx.get(shard, 0) % len(urls)], ver
            self._idx[shard] = (self._idx.get(shard, 0) + 1) % len(urls)
            self._ver[shard] = ver + 1
            return urls[self._idx[shard]], self._ver[shard]


@dataclass
class JdbcSink:
    """ClickHouse JDBC bulk-insert sink (S3).

    Exactly-once-effective under replays when the destination is a
    ReplacingMergeTree and the shard column derives from the sorting key
    (W8/R4): re-delivered rows land on the same shard and collapse on
    merge — the same contract the reference documents
    (docs/dev/design.md:5-12).

    Per-shard writes run concurrently on driver threads (≙ the per-shard
    worker pool, output/clickhouse.go:139-161) — each submit is a Spark
    job over that shard's cached partitions, and Spark schedules jobs from
    distinct driver threads in parallel.  A failed write fails over to the
    shard's next replica with version fencing (S5, pool/conn.go:83-136)
    and retries with backoff (W4, output/clickhouse.go:264-295).  The
    batch commits (checkpoint advances) only after EVERY shard landed —
    the reference's WaitGroup barrier, here the foreachBatch return.
    """

    ch: ClickHouseConfig
    table: str
    shards: int = 1
    shard_col: str = "__shard"
    batch_size: int = 1 << 16
    async_insert: bool = False  # S4: session settings passthrough
    max_parallel: int = 8  # concurrent shard writers (worker-pool width)
    replicas: ShardReplicas = field(init=False)

    def __post_init__(self) -> None:
        self.replicas = ShardReplicas(self.ch)

    def prepare_sql(self, columns: list[str], protocol: str = "http") -> str:
        """The externally observable insert statement for this sink's table
        — same template the reference logs as ``Prepare sql=>``
        (output/clickhouse.go:493-526); golden-tested in
        tests/test_chsql.py.  The JDBC connector generates an equivalent
        statement internally; this is the contract string."""
        from ..chsql import insert_sql

        return insert_sql(self.ch.database, self.table, columns, protocol)

    def jdbc_options(self, url: str) -> dict[str, str]:
        opts = {
            "url": url,
            "dbtable": self.table,
            "user": self.ch.username,
            "password": self.ch.password,
            "batchsize": str(self.batch_size),
            "isolationLevel": "NONE",
            "numPartitions": "1",
        }
        if self.ch.driver:
            opts["driver"] = self.ch.driver
        if self.async_insert:  # S4 (config/config.go:422-441)
            opts["sessionInitStatement"] = (
                "SET async_insert=1, wait_for_async_insert=1"
            )
        return opts

    def _write_one(self, part: DataFrame, url: str) -> None:
        """One bulk INSERT of one shard's rows to one replica endpoint."""
        part.write.format("jdbc").options(**self.jdbc_options(url)).mode("append").save()

    def _write_shard(self, part: DataFrame, shard: int) -> None:
        """Write a shard's rows: retry w/ backoff, advancing to the next
        good replica on each failure (loopWrite + NextGoodReplica)."""

        def attempt():
            url, ver = self.replicas.current(shard)
            try:
                self._write_one(part, url)
            except Exception:
                self.replicas.next_good_replica(shard, ver)
                raise

        with_retry(attempt, self.ch.retry_times)

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        cols = [c for c in batch.columns if c != self.shard_col]
        if self.shard_col in batch.columns and self.shards > 1:
            # R5 fan-out: one shuffle clusters rows by shard; the persisted
            # batch is scanned once into cache, then each shard's filter
            # job reads only cached partitions.
            routed = batch.repartition(self.shards, F.col(self.shard_col)).persist()
            try:
                parts = [
                    routed.filter(F.col(self.shard_col) % self.shards == s).select(*cols)
                    for s in range(self.shards)
                ]
                with ThreadPoolExecutor(max_workers=min(self.shards, self.max_parallel)) as ex:
                    futures = [
                        ex.submit(self._write_shard, p, s) for s, p in enumerate(parts)
                    ]
                    for f in futures:
                        f.result()  # re-raise: all-or-nothing commit barrier
            finally:
                routed.unpersist()
        else:
            self._write_shard(batch.select(*cols), 0)


@dataclass
class NativeHttpSink(JdbcSink):
    """ClickHouse bulk-insert over the HTTP interface with Native-format
    blocks (S3, transport #2) — the closest server-optional stand-in for
    the reference's pooled native-protocol batch writer
    (pool/ck_cli.go:126-247): the same column-oriented block layout
    (chproto.py, golden-byte-tested) POSTed as ``INSERT INTO t FORMAT
    Native``.

    Inherits JdbcSink's entire shard fan-out / retry / replica-failover
    machinery (R5, W4, S5) and swaps only the per-replica transport:
    ``foreachPartition`` on the EXECUTORS — each partition frames its own
    rows into ≤ ``batch_size``-row blocks and streams them out, so at
    1000 executors there are 1000 concurrent framers and zero
    driver-side row movement (the reference's per-shard goroutine
    equivalent, scaled out instead of up).

    ``ch.url_format`` must yield http(s) endpoints, e.g.
    ``"http://{host}"`` — asserted loudly per write.
    """

    def _write_one(self, part: DataFrame, url: str) -> None:
        if not url.startswith(("http://", "https://")):
            raise ValueError(
                f"NativeHttpSink needs an http(s) url_format, got {url!r} — "
                'set ClickHouseConfig(url_format="http://{host}")'
            )
        from ..sources.systemviews import spark_to_ch_type

        # Timestamps cross to Python as NAIVE datetimes in the EXECUTOR
        # OS timezone (not the session timeZone) — converting them
        # Python-side would shift every value by the host's UTC offset.
        # Convert JVM-side to exact epoch microseconds instead — including
        # timestamps NESTED in arrays/maps (transform/transform_*), which
        # otherwise arrive as naive element datetimes with the same
        # executor-TZ skew; the encoder's DateTime64 int path passes the
        # integers through unscaled.
        exprs = []
        fields = []
        for f in part.schema.fields:
            ch_t = spark_to_ch_type(f.dataType, f.nullable, "DateTime64(6)")
            conv, _ = _epochize(F.col(f.name), f.dataType)
            exprs.append(conv.alias(f.name))
            fields.append((f.name, ch_t))
        part = part.select(*exprs)
        table = f"{self.ch.database}.{self.table}"
        user, password, max_rows = self.ch.username, self.ch.password, self.batch_size

        def send_batches(batches):
            # runs on the executor: local imports only, no driver state.
            # Arrow batches frame COLUMN-WISE (encode_block_arrow: numpy
            # tobytes for fixed-width columns) instead of a per-row Python
            # append loop — the rows never materialize as Python objects
            # except for variable-width columns' own value framing.
            import pyarrow as pa

            from clickhouse_sinker_spark.chproto import (
                encode_block_arrow,
                insert_native_http,
            )

            buf: list = []
            buffered = 0

            def flush() -> int:
                nonlocal buffered
                if not buf:
                    return 0
                tbl = pa.Table.from_batches(buf)
                buf.clear()
                buffered = 0
                sent = 0
                for off in range(0, tbl.num_rows, max_rows):
                    chunk = tbl.slice(off, max_rows).combine_chunks()
                    insert_native_http(
                        url,
                        table,
                        encode_block_arrow(fields, chunk),
                        user=user,
                        password=password,
                    )
                    sent += chunk.num_rows
                return sent

            total = 0
            for b in batches:
                if b.num_rows == 0:
                    continue
                buf.append(b)
                buffered += b.num_rows
                if buffered >= max_rows:
                    total += flush()
            total += flush()
            yield pa.RecordBatch.from_pydict(
                {"sent": [total]}, schema=pa.schema([("sent", pa.int64())])
            )

        # count() drives the plan; the tiny per-partition "sent" batches
        # are the only thing that crosses back to the driver
        part.mapInArrow(send_batches, "sent long").count()
