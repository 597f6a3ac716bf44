#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

value = total wall-clock of the headline query set (lower is better).
Each query is fully materialized via count() on the result (no collect of
payload — mirrors the reference's sink-side accounting, where throughput
is rows landed per second, docs/dev/introduction.md:59-94).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

HEADLINE = [
    "tpch_q1_pricing",
    "tpch_q3_topk",
    "tpch_q5_region_revenue",
    "window_topk_per_customer",
    "window_tumbling_1h",
    "etl_parse_project",
    "etl_dedup_offsets",
    "series_latest_per_key",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "text_langid",
    "knn_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("clickhouse_sinker_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from clickhouse_sinker_spark.plans.queries import QUERIES

    # warm the JVM + file listing once (outside per-query timing, like the
    # reference's steady-state rows/s measurement)
    QUERIES["tpch_q1_pricing"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
