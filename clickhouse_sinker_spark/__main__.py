"""CLI runner (C1 ≙ cmd/clickhouse_sinker/main.go:145-284, Spark-style):

    python -m clickhouse_sinker_spark --config task.hjson \
        [--source-path dir_of_jsonl] [--sink-path out_dir] [--once]

Loads a reference-compatible config (hjson/json), builds one pipeline per
task, and runs them.  Without ClickHouse/Kafka endpoints reachable (the
usual test setup), ``--source-path``/``--sink-path`` swap in the file
source and shard-partitioned parquet sink — the same pipeline graph with
the transport exchanged, which is the Spark-idiomatic seam the tests use.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from .config_io import load_config
from .sources.schema import json_parse_schema, specs_from_task
from .streaming.pipeline import build_pipeline, file_source, kafka_source
from .streaming.sink import JdbcSink, ParquetSink


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="clickhouse_sinker_spark")
    ap.add_argument("--config", required=True, help="hjson/json task config (reference-compatible)")
    ap.add_argument("--source-path", help="read JSONL files from this dir instead of Kafka")
    ap.add_argument("--sink-path", help="write shard-partitioned parquet here instead of JDBC")
    ap.add_argument("--checkpoint", default="/tmp/sinker_ckpt", help="checkpoint root")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--once", action="store_true", help="drain available input, then exit")
    ap.add_argument(
        "--watch",
        action="store_true",
        help="poll --config for changes and hot-apply the diff (C2)",
    )
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    spark = (
        SparkSession.builder.master(args.master)
        .appName("clickhouse_sinker_spark")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    def source_factory(sp, task, c):
        return (
            file_source(sp, args.source_path)
            if args.source_path
            else kafka_source(
                sp,
                c.kafka,
                task.topic,
                earliest=task.earliest,
                max_offsets_per_trigger=task.buffer_size,
            )
        )

    def sink_factory(task, c):
        return (
            ParquetSink(f"{args.sink_path}/{task.table_name}", shards=c.clickhouse.shards)
            if args.sink_path
            else JdbcSink(c.clickhouse, task.table_name, shards=c.clickhouse.shards)
        )

    if args.once:
        for task in cfg.tasks:
            specs = specs_from_task(task)
            schema = json_parse_schema(specs, parser=task.parser)
            pipe = build_pipeline(
                source_factory(spark, task, cfg), task, specs, schema,
                shards=cfg.clickhouse.shards,
            )
            pipe.run_available(sink_factory(task, cfg), f"{args.checkpoint}/{task.name}")
        return

    from .control import SinkerApp

    app = SinkerApp(
        spark=spark,
        checkpoint_root=args.checkpoint,
        source_factory=source_factory,
        sink_factory=sink_factory,
    )
    app.apply_config(cfg)
    if args.watch:  # C2 hot reload (task/sinker.go:340-519)
        app.watch(args.config)
    for q in list(app.queries.values()):
        q.awaitTermination()


if __name__ == "__main__":
    main()
