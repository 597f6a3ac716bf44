"""Round-13 optimization profiler (guide §1: measure first).

For each headline query (or --only name,name):
  - time DataFrame construction (plan build, includes parquet footer reads)
  - save .explain('formatted') to plans/r14/<name>_<tag>.txt
  - count Exchange / BroadcastExchange / *EvalPython nodes
  - time N runs of .count() (the bench methodology) and of the noop sink
    (guide §1.4 — computes every column, isolates computation from action
    pruning), cache cleared between runs.

Usage: python -m tools.profile_r14 [--tag before|after] [--only a,b] [--runs 3]
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

from pyspark.sql import SparkSession


def main() -> int:
    tag = "before"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r14-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    import bench
    from clickhouse_sinker_spark.plans.queries import QUERIES

    names = list(bench.HEADLINE)
    if "--only" in sys.argv:
        names = sys.argv[sys.argv.index("--only") + 1].split(",")

    os.makedirs("/root/repo/plans/r14", exist_ok=True)
    # warm-up at sf0.001 (same as bench.py)
    warm = "/root/testdata/sf0.001"
    for n in names:
        QUERIES[n](spark, warm).count()

    out = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"profile:{n}")
        t0 = time.monotonic()
        df = QUERIES[n](spark, sf_dir)
        t_build = time.monotonic() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(f"/root/repo/plans/r14/{n}_{tag}.txt", "w") as f:
            f.write(plan)
        nodes = {
            "Exchange": len(re.findall(r"\bExchange\b", plan)),
            "BroadcastExchange": len(re.findall(r"BroadcastExchange", plan)),
            "SortMergeJoin": len(re.findall(r"SortMergeJoin", plan)),
            "BroadcastHashJoin": len(re.findall(r"BroadcastHashJoin", plan)),
            "ShuffledHashJoin": len(re.findall(r"ShuffledHashJoin", plan)),
            "BatchEvalPython": len(re.findall(r"BatchEvalPython", plan)),
            "ArrowEvalPython": len(re.findall(r"ArrowEvalPython", plan)),
            "CartesianProduct": len(re.findall(r"CartesianProduct", plan)),
        }
        counts, noops = [], []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            QUERIES[n](spark, sf_dir).count()
            counts.append(round(time.monotonic() - t0, 3))
        for _ in range(runs):
            spark.catalog.clearCache()
            df2 = QUERIES[n](spark, sf_dir)
            t0 = time.monotonic()
            df2.write.format("noop").mode("overwrite").save()
            noops.append(round(time.monotonic() - t0, 3))
        out[n] = {
            "build_s": round(t_build, 3),
            "count_runs": counts,
            "count_min": min(counts),
            "noop_runs": noops,
            "noop_min": min(noops),
            "nodes": nodes,
        }
        print(json.dumps({n: out[n]}), flush=True)
    with open(f"/root/repo/plans/r14/profile_{tag}.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("TOTAL count_min:", round(sum(v["count_min"] for v in out.values()), 3))
    print("TOTAL noop_min:", round(sum(v["noop_min"] for v in out.values()), 3))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
