"""S12 test-data generators (cmd/kafka_gen_{metric,log,prom}) — shape,
determinism, and end-to-end feed into the parse/project pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_sinker_spark.operators.project import ColumnSpec, apply_projection
from clickhouse_sinker_spark.operators.series import split_metric_series
from clickhouse_sinker_spark.sources.schema import json_parse_schema
from clickhouse_sinker_spark.sources.testgen import (
    gen_access_logs,
    gen_metrics,
    gen_prom_series,
    to_kafka_shape,
    write_jsonl,
)
from clickhouse_sinker_spark.streaming.pipeline import parse_stream


def test_metrics_shape_and_determinism(spark):
    df = gen_metrics(spark, 1000, seed=7)
    assert df.count() == 1000
    # Metric struct surface (kafka_gen_metric/main.go)
    for col in ("@time", "@item_guid", "@metric_name", "value", "yhat_flag",
                "abnormal_type", "container_id", "is_missing"):
        assert col in df.columns
    stats = df.agg(
        F.min("value"), F.max("value"), F.min("anomaly"), F.max("anomaly"),
        F.countDistinct("@item_guid"),
    ).first()
    assert 0 <= stats[0] and stats[1] <= 99  # rand.Intn(100) range
    assert 0.0 <= stats[2] and stats[3] < 1.0
    assert stats[4] > 100  # bus%03d_ins%03d spread
    # same seed → identical content; different seed → different content
    h = lambda d: d.select(F.bit_xor(F.xxhash64(*d.columns)).alias("h")).first()[0]
    assert h(gen_metrics(spark, 1000, seed=7)) == h(df)
    assert h(gen_metrics(spark, 1000, seed=8)) != h(df)


def test_access_logs_shape(spark):
    df = gen_access_logs(spark, 500, seed=1)
    assert df.count() == 500
    verbs = {r[0] for r in df.select("verb").distinct().collect()}
    assert verbs <= {"GET", "POST", "PUT", "DELETE", "HEAD"}
    resp = df.groupBy("response").count().collect()
    assert {r[0] for r in resp} <= {"200", "304", "404", "500"}
    # 200s dominate (skewed pick list, like real logs)
    counts = {r[0]: r[1] for r in resp}
    assert counts.get("200", 0) > counts.get("500", 1)


def test_prom_series_feeds_series_operators(spark):
    """Generated prom samples drive the D1/D3 operators: metric/series
    split keeps one series row per series id, labels JSON excludes
    __name__/le (task/task.go:262-270)."""
    df = gen_prom_series(spark, 2000, n_series=40, seed=3)
    n_series = df.select("__series_id").distinct().count()
    assert n_series <= 40
    flat = df.select(
        F.col("__series_id").alias("__series_id__"),
        F.col("__series_id").alias("__mgmt_id__"),
        F.col("timestamp"),
        F.col("value"),
        F.col("__name__"),
        F.col("labels")["instance"].alias("instance"),
        F.col("labels")["job"].alias("job"),
        F.col("labels")["le"].alias("le"),
    )
    metric, series = split_metric_series(
        flat, metric_cols=["timestamp", "value"], label_cols=["__name__", "instance", "job", "le"]
    )
    assert metric.count() == 2000
    assert series.count() == n_series  # one row per series
    one = series.first()
    assert '"instance":"' in one["labels"] and '"job":"' in one["labels"]
    assert "__name__" not in one["labels"] and '"le"' not in one["labels"]


def test_kafka_shape_roundtrip_through_pipeline(spark, tmp_path):
    """to_kafka_shape → parse_stream → apply_projection: the generated
    messages run the reference hot path without Kafka."""
    gen = gen_metrics(spark, 300, seed=5)
    raw = to_kafka_shape(gen, topic="metrics")
    assert raw.columns == ["topic", "partition", "offset", "key", "value", "timestamp"]
    specs = [
        ColumnSpec("item", "String", source="@item_guid", not_nullable=True),
        ColumnSpec("metric", "String", source="@metric_name"),
        ColumnSpec("value", "Nullable(Float64)", source="value"),
        ColumnSpec("anomaly", "Nullable(Float64)", source="anomaly"),
    ]
    schema = json_parse_schema(specs)
    parsed = parse_stream(raw, schema)
    out = apply_projection(parsed, specs)
    assert out.count() == 300
    assert out.filter(F.col("item").rlike(r"^bus\d{3}_ins\d{3}$")).count() == 300

    # JSONL landing for file_source consumers
    write_jsonl(gen_access_logs(spark, 100), str(tmp_path / "logs"))
    lines = spark.read.text(str(tmp_path / "logs"))
    assert lines.count() == 100
    assert lines.filter(F.col("value").startswith("{")).count() == 100
