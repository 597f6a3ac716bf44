"""Test-data generators (S12 ≙ cmd/kafka_gen_metric, cmd/kafka_gen_log,
cmd/kafka_gen_prom).

The reference ships three Kafka feeders producing its canonical message
families: anomaly-metric JSON (kafka_gen_metric/main.go Metric struct),
Apache access-log JSON (kafka_gen_log/main.go), and Prometheus-style
series (kafka_gen_prom/main.go).  Here the same families are generated as
DataFrames — pure column expressions over ``spark.range``, so generation
is distributed, pipelined into any sink, and scales to any row count
without a driver loop.

Determinism replaces ``rand.Intn``: every "random" field derives from
``xxhash64(id, seed)``, so the same (n, seed) always produces the same
rows — reproducible fixtures for tests/bench, and identical output across
retries/partition splits (a property the reference's generators lack).

Outputs can be shaped like the Kafka source (``to_kafka_shape``) to feed
``parse_stream`` directly, or written as JSONL for ``file_source``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "gen_metrics",
    "gen_access_logs",
    "gen_prom_series",
    "to_kafka_shape",
    "write_jsonl",
]


def _h(seed: int, tag: str, *cols):
    """Deterministic 'random' 64-bit stream per (row, field)."""
    return F.abs(F.xxhash64(F.lit(seed), F.lit(tag), *cols))


def gen_metrics(spark: SparkSession, n: int, seed: int = 42, start_epoch: int = 1704067200) -> DataFrame:
    """Anomaly-metric family (cmd/kafka_gen_metric/main.go:106-165): the
    Metric struct's field surface with the reference's value ranges."""
    df = spark.range(n)
    i = F.col("id")

    def mod(tag, m):
        return (_h(seed, tag, i) % m).cast("int")

    return df.select(
        F.timestamp_seconds(F.lit(start_epoch) + i % 86400).alias("@time"),
        F.format_string(
            "bus%03d_ins%03d", mod("bus", 8), mod("ins", 100)
        ).alias("@item_guid"),
        F.concat(F.lit("metric"), (_h(seed, "m", i) % 10)).alias("@metric_name"),
        F.lit("ema").alias("@alg_name"),
        (mod("value", 100)).cast("double").alias("value"),
        (mod("value", 100) + 10).cast("double").alias("upper"),
        (mod("value", 100) - 10).cast("double").alias("lower"),
        (mod("yu", 100)).cast("double").alias("yhat_upper"),
        (mod("yl", 100)).cast("double").alias("yhat_lower"),
        (mod("yf", 65535)).alias("yhat_flag"),
        (_h(seed, "ta", i) % 65535).alias("total_anomaly"),
        (mod("an", 100).cast("double") / 100.0).alias("anomaly"),
        (mod("at", 1000)).cast("smallint").alias("abnormal_type"),
        (mod("ab", 1000)).cast("smallint").alias("abnormality"),
        (_h(seed, "ci", i) % 65535).alias("container_id"),
        (mod("hu", 100)).cast("double").alias("hard_upper"),
        (mod("hl", 100)).cast("double").alias("hard_lower"),
        (_h(seed, "ha", i) % 65535).alias("hard_anomaly"),
        (mod("st", 65535)).alias("shift_tag"),
        (mod("se", 65535)).alias("season_tag"),
        (mod("sp", 65535)).alias("spike_tag"),
        (mod("im", 2)).alias("is_missing"),
    )


_VERBS = ["GET", "POST", "PUT", "DELETE", "HEAD"]
_PATHS = ["/index.html", "/api/v1/items", "/static/app.js", "/login", "/health"]
_RESPONSES = ["200", "200", "200", "304", "404", "500"]  # skewed like real logs


def gen_access_logs(spark: SparkSession, n: int, seed: int = 42, start_epoch: int = 1704067200) -> DataFrame:
    """Apache access-log family (cmd/kafka_gen_log/main.go table schema):
    the high-traffic columns of the apache_access_log shape."""
    df = spark.range(n)
    i = F.col("id")

    def pick(tag, values):
        arr = F.array(*[F.lit(v) for v in values])
        return F.get(arr, (_h(seed, tag, i) % len(values)).cast("int"))

    return df.select(
        F.timestamp_seconds(F.lit(start_epoch) + i % 86400).alias("@collectiontime"),
        F.format_string("host%03d", (_h(seed, "h", i) % 50).cast("int")).alias("@hostname"),
        F.format_string(
            "10.%d.%d.%d",
            (_h(seed, "ip1", i) % 256).cast("int"),
            (_h(seed, "ip2", i) % 256).cast("int"),
            (_h(seed, "ip3", i) % 256).cast("int"),
        ).alias("@ip"),
        pick("path", _PATHS).alias("@path"),
        i.alias("@lineno"),
        pick("verb", _VERBS).alias("verb"),
        pick("resp", _RESPONSES).alias("response"),
        (_h(seed, "bytes", i) % 100000).alias("bytes"),
        ((_h(seed, "rt", i) % 5000).cast("double") / 1000.0).alias("requesttime"),
        F.lit("HTTP/1.1").alias("httpversion"),
        F.format_string("Mozilla/5.0 (agent%d)", (_h(seed, "ua", i) % 20).cast("int")).alias("agent"),
        F.timestamp_seconds(
            (F.lit(start_epoch) + i % 86400).cast("double")
            + (_h(seed, "ms", i) % 1000).cast("double") / 1000.0
        ).alias("timestamp"),
    )


def gen_prom_series(
    spark: SparkSession,
    n: int,
    n_series: int = 100,
    seed: int = 42,
    start_epoch: int = 1704067200,
) -> DataFrame:
    """Prometheus family (cmd/kafka_gen_prom/main.go): __name__ + label
    map + (timestamp, value) samples over ``n_series`` distinct series —
    the input shape of the series-dedup/labels operators (D1/D3)."""
    df = spark.range(n)
    i = F.col("id")
    sid = _h(seed, "sid", i) % n_series
    return df.select(
        F.concat(F.lit("metric_"), sid % 10).alias("__name__"),
        F.create_map(
            F.lit("instance"),
            F.format_string("inst%03d", (sid % 50).cast("int")),
            F.lit("job"),
            F.concat(F.lit("job"), sid % 5),
            F.lit("le"),
            F.concat(F.lit(""), (_h(seed, "le", i) % 10)),
        ).alias("labels"),
        F.timestamp_seconds(F.lit(start_epoch) + i).alias("timestamp"),
        ((_h(seed, "v", i) % 10000).cast("double") / 100.0).alias("value"),
        sid.alias("__series_id"),
    )


def to_kafka_shape(df: DataFrame, topic: str = "gen") -> DataFrame:
    """Serialize generated rows into the Kafka-source column shape
    (model/message.go:10-17) so ``parse_stream`` consumes them directly —
    the in-process stand-in for the reference's send-to-Kafka step."""
    cols = df.columns
    return df.select(
        F.lit(topic).alias("topic"),
        F.spark_partition_id().alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.lit(None).cast("binary").alias("key"),
        F.to_json(F.struct(*cols)).cast("binary").alias("value"),
        F.current_timestamp().alias("timestamp"),
    )


def write_jsonl(df: DataFrame, path: str, files: int = 1) -> None:
    """Land generated rows as JSONL for ``file_source`` (text-stream)."""
    df.select(F.to_json(F.struct(*df.columns)).alias("value")).coalesce(files).write.mode(
        "overwrite"
    ).text(path)
