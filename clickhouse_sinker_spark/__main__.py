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
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    spark = (
        SparkSession.builder.master(args.master)
        .appName("clickhouse_sinker_spark")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    queries = []
    for task in cfg.tasks:
        specs = specs_from_task(task)
        schema = json_parse_schema(specs, parser=task.parser)
        raw = (
            file_source(spark, args.source_path)
            if args.source_path
            else kafka_source(
                spark,
                cfg.kafka,
                task.topic,
                earliest=task.earliest,
                max_offsets_per_trigger=task.buffer_size,
            )
        )
        pipe = build_pipeline(raw, task, specs, schema, shards=cfg.clickhouse.shards)
        sink = (
            ParquetSink(f"{args.sink_path}/{task.table_name}", shards=cfg.clickhouse.shards)
            if args.sink_path
            else JdbcSink(cfg.clickhouse, task.table_name, shards=cfg.clickhouse.shards)
        )
        ckpt = f"{args.checkpoint}/{task.name}"
        if args.once:
            pipe.run_available(sink, ckpt)
        else:
            queries.append(pipe.start(sink, ckpt, query_name=task.name))

    for q in queries:
        q.awaitTermination()


if __name__ == "__main__":
    main()
