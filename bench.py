#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

value = total wall-clock of the headline query set (lower is better).
Each query is fully materialized via count() on the result (no collect of
payload — mirrors the reference's sink-side accounting, where throughput
is rows landed per second, docs/dev/introduction.md:59-94).

Cross-ROUND comparisons need the ``env`` block: the sandbox host's
absolute speed drifts between rounds.  Measured r6: the UNCHANGED round-4
checkout re-benched on the round-6 host scored 14.375 s against its
recorded 9.321 s (+54% on identical code and data, idle host both times)
— so only same-host same-day numbers are comparable, and the honest
cross-round signal is A/B of two checkouts on one host, which
``tools/driver_sim.py`` and a ``git worktree`` of the prior round give.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# The honest cross-round signal (see module docstring): bench a PRIOR
# checkout back-to-back on the same host and report the ratio.  Updated
# each round to the previous round's final commit.  Disable with
# SPARK_GRAFT_AB=0 or --no-ab; override the ref with --ab <git-ref>.
AB_BASELINE_REF = "e71e497"  # round-13 final code commit

HEADLINE = [
    "tpch_q1_pricing",
    "tpch_q3_topk",
    "tpch_q5_region_revenue",
    "tpch_q9_profit",
    "agg_cube_orders",
    "window_topk_per_customer",
    "window_tumbling_1h",
    "range_join_recent_events",
    "etl_parse_project",
    "etl_dedup_offsets",
    "series_latest_per_key",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "text_langid",
    "knn_cosine_topk",
    # r11 flagship: the fused end-to-end curation plan (gate → exact dedup
    # → MinHash near-dedup → quality → split → chunk stats in one pass)
    "pipeline_full_curation",
]


def _etl_pipeline_bench(spark: SparkSession, sf_dir: str, copies: int = 10) -> float:
    """Full sinker hot path (SURVEY §3.2 steps 2-7) over sf events × copies:
    serialize to JSON bytes (the Kafka payload), then parse → project with
    clamping/default casts → hash-shard → shard-partitioned parquet write.
    Returns wall seconds; rows/s = (n_events × copies) / value."""
    from clickhouse_sinker_spark.operators.project import ColumnSpec, apply_projection
    from clickhouse_sinker_spark.operators.sharding import ShardingPolicy, add_shard_column
    from clickhouse_sinker_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    payload = (
        events.withColumn("__copy", F.explode(F.array(*[F.lit(i) for i in range(copies)])))
        .select(F.to_json(F.struct("event_id", "ts", "user_id", "event_type", "value", "props")).alias("value"))
    )
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    specs = [
        ColumnSpec("event_id", "Int64", not_nullable=True),
        ColumnSpec("time", "DateTime", source="ts"),
        ColumnSpec("name", "String", source="event_type"),
        ColumnSpec("value", "Nullable(Float32)", source="value"),
        ColumnSpec("v8", "UInt8", source="value"),
        ColumnSpec("k", "Nullable(Int64)", source="k_raw"),
        ColumnSpec("env", "String", constant="bench"),
    ]
    work = tempfile.mkdtemp(prefix="bench_etl_")
    try:
        # stage the JSON payloads first — the reference benchmark measures
        # steady-state sink throughput with messages already in Kafka; stage
        # one file per core (≙ Kafka partitions sized to consumer parallelism)
        # so the timed parse isn't throttled by input file count
        payload.repartition(spark.sparkContext.defaultParallelism).write.mode(
            "overwrite"
        ).parquet(f"{work}/in")
        staged = spark.read.parquet(f"{work}/in")
        t0 = time.monotonic()
        parsed = staged.select(F.from_json("value", schema).alias("m")).select("m.*")
        parsed = parsed.withColumn("k_raw", F.get_json_object("props", "$.k"))
        projected = apply_projection(parsed, specs)
        sharded = add_shard_column(projected, ShardingPolicy(key="name", policy="hash"), 8)
        # local sort by shard → dynamic-partition writer streams one shard
        # dir per task (no shuffle, no concurrent-writer fallback): 4× vs
        # writing unsorted, measured at sf0.1
        sharded.sortWithinPartitions("__shard").write.mode("overwrite").partitionBy(
            "__shard"
        ).parquet(f"{work}/out")
        return time.monotonic() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _host_cpu_snapshot() -> tuple[float, float]:
    """(host_busy_jiffies, self+children_jiffies) from /proc — the delta
    across the bench separates our own CPU use from other load on a shared
    host (the r5→r4 +8% question was exactly this ambiguity)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    # fields: user nice system idle iowait irq softirq steal [guest ...];
    # guest/guest_nice are ALREADY counted inside user/nice — summing them
    # again would double-count VM time, so only the first 8 fields count
    vals = [float(x) for x in parts[:8]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0.0)  # idle + iowait
    busy = sum(vals) - idle
    t = os.times()
    self_j = (t.user + t.system + t.children_user + t.children_system) * float(
        os.sysconf("SC_CLK_TCK")
    )
    return busy, self_j


def _env_stats(start_loadavg, start_snap, start_wall) -> dict:
    """Environment block for the bench JSON: load averages at start/end and
    the average count of busy host cores over the whole bench window.  If
    host_cores_busy_avg materially exceeds what this bench itself can use
    (bounded by SPARK_GRAFT_CPUS), other load shared the host and the
    timings carry that noise — the r4→r5 +8% question made this
    distinction mandatory (VERDICT r5 item 3)."""
    busy0, _self0 = start_snap
    busy1, _self1 = _host_cpu_snapshot()
    wall = max(time.monotonic() - start_wall, 1e-9)
    tck = float(os.sysconf("SC_CLK_TCK"))
    return {
        "loadavg_start": [round(x, 2) for x in start_loadavg],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "host_cpus": os.cpu_count() or 1,
        "host_cores_busy_avg": round((busy1 - busy0) / tck / wall, 2),
        "bench_wall_s": round(wall, 1),
    }


def _run_ab_baseline(ref: str, sf_dir: str, cpus: str) -> dict:
    """Bench a prior checkout in a temporary git worktree, same host, same
    env, immediately after the HEAD measurements — the r6 host-drift
    analysis (an unchanged r4 checkout re-benching +54%) as a standing
    feature.  The child runs with SPARK_GRAFT_AB=0 so it never recurses."""
    repo = os.path.dirname(os.path.abspath(__file__))
    wt = tempfile.mkdtemp(prefix="bench_ab_")
    try:
        subprocess.run(
            ["git", "-C", repo, "worktree", "add", "--detach", wt, ref],
            check=True, capture_output=True, text=True,
        )
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_CPUS=cpus,
            SPARK_GRAFT_AB="0",
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(wt, "bench.py")],
            capture_output=True, text=True, env=env, cwd=wt, timeout=3600,
        )
        lines = [
            l for l in proc.stdout.splitlines()
            if l.startswith("{") and l.endswith("}")
        ]
        if proc.returncode != 0 or not lines:
            return {"ref": ref, "error": (proc.stderr or proc.stdout)[-300:]}
        payload = json.loads(lines[-1])
        return {
            "ref": ref,
            "ref_value": payload["value"],
            "ref_queries": payload.get("queries", {}),
        }
    finally:
        subprocess.run(
            ["git", "-C", repo, "worktree", "remove", "--force", wt],
            capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    ab_ref: str | None = AB_BASELINE_REF
    if os.environ.get("SPARK_GRAFT_AB", "1") == "0" or "--no-ab" in sys.argv:
        ab_ref = None
    if "--ab" in sys.argv:
        i = sys.argv.index("--ab")
        if i + 1 >= len(sys.argv):
            sys.exit("usage: bench.py [--ab <git-ref>] [--no-ab]")
        ab_ref = sys.argv[i + 1]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    start_loadavg = os.getloadavg()
    start_snap = _host_cpu_snapshot()
    start_wall = time.monotonic()
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

    # Warm-up (untimed): run every headline query once at sf0.001 so each
    # plan's codegen / higher-order-function machinery is compiled before
    # timing — the reference's numbers are steady-state rows/s after warm-up
    # (docs/dev/introduction.md:59-94), so timed runs measure execution, not
    # one-time Janino compilation.  The warm-up scale is 100× smaller than
    # the measured scale, so no data-level caching carries over.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        QUERIES[name](spark, warm_dir).count()
    QUERIES["tpch_q1_pricing"](spark, sf_dir).count()  # warm sf_dir file listing

    # Each query timed twice, min reported: the reference's numbers are
    # steady-state (docs/dev/introduction.md:59-94), and min-of-N removes
    # host-level noise without letting data caching help (clearCache between
    # runs; plan-identical persisted intermediates would otherwise survive).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).count()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)
    spark.catalog.clearCache()

    # The reference's headline metric is streaming-ETL rows/s (142K rows/s
    # on 11 cpu — BASELINE.md).  Reproduce the full hot path at 1M rows:
    # JSON bytes → parse → reference-semantics cast projection → shard
    # route → parquet write (the sink stand-in), timed end to end.
    # Report BOTH regimes honestly: run five times; run 1 is the cold
    # number (C2 JIT warms over ~3 full-size runs).  The headline is the
    # MIN of the warm runs (2-5): VERDICT r8 order #1 — the r8 data
    # falsified the old "runs 3-5 = steady state" median assumption (run
    # 2 at 3.1 s beat runs 3-5 at 9.0/9.2/6.0 s on untouched code: the
    # HOST throttles mid-array, so the median measures the host, not the
    # engine; min-of-warm is the capability number).  The full run array
    # and the old median ship alongside for drift visibility.
    etl_runs = [round(_etl_pipeline_bench(spark, sf_dir, copies=10), 3) for _ in range(5)]
    timings["etl_pipeline_1m"] = min(etl_runs[1:])

    total = round(sum(timings.values()), 3)
    # r14 (VERDICT r13 item 2): the printed stdout line must stay SMALL —
    # r12's stored bench tail was truncated before the line start because
    # the ~1.5 KB methodology string and run arrays pushed the JSON past
    # the capture bound, so the driver could not parse any prev-round
    # number (PERF_r13 n_common=0).  The stdout line now carries only the
    # contract keys (metric/value/unit/queries/sf + ab_ratio); everything
    # else — methodology prose, env block, etl run arrays, A/B detail —
    # ships as a second JSON line on STDERR ("BENCH_DETAIL ...").  Query
    # keys are unchanged (may be added, never removed).
    payload = {
        "metric": "headline_query_set_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    detail = {
        "etl_pipeline_1m_runs": etl_runs,
        "etl_pipeline_1m_cold": etl_runs[0],
        "etl_pipeline_1m_median35": sorted(etl_runs[2:])[len(etl_runs[2:]) // 2],
        "methodology": (
            "queries: min of 2 post-warmup runs (cache cleared between); "
            "etl_pipeline_1m: MIN of warm runs 2-5 of 5 (the capability "
            "number; the r8 run array falsified the median-of-3-5 "
            "steady-state assumption -- the host throttles mid-array), "
            "cold first run and the old median reported separately in "
            "etl_pipeline_1m_cold/_median35/_runs; ab_ratio: HEAD / baseline-ref "
            "wall over the query keys both checkouts share, A/B/A on "
            "this host (cross-round absolute numbers are not comparable "
            "— the host itself drifts): head leg 1 in-process, then a "
            "settle, the REF leg in a subprocess, another settle, and a "
            "SECOND head leg; ab_ratio is the time-ADJACENT pair "
            "head2/ref (the r8 idle-host experiment showed a leg "
            "launched right after sustained load runs 3x+ slower with "
            "no cgroup quota — VM-level — so the old two-leg design was "
            "systematically unfair to whichever leg ran second); "
            "ab.head_drift = head2/head1 exposes the drift magnitude — "
            "treat ratios <= 1.15 as parity and distrust any run whose "
            "head_drift is far from 1; a ratio WELL BELOW 1 with clean "
            "head_drift usually means the middle (ref) leg was "
            "throttled — read it as parity, never as a claimed speedup"
        ),
        "env": _env_stats(start_loadavg, start_snap, start_wall),
    }
    spark.stop()
    if ab_ref is not None:
        # A/B/A: the r8 idle-host experiment showed the host slows 3×+
        # for a leg launched right after sustained load (no cgroup quota
        # or throttle counters — VM-level) and recovers within minutes,
        # which made every two-leg ab_ratio garbage in r6-r8.  Bracket
        # the ref leg with a SECOND head leg: under monotone host drift
        # the time-ADJACENT pair (ref, head2) is the fair comparison,
        # and head2/head1 exposes the drift magnitude explicitly.
        settle = float(os.environ.get("SPARK_GRAFT_AB_SETTLE", "120"))
        try:
            time.sleep(settle)  # settle after the in-process measurement
            ab = _run_ab_baseline(ab_ref, sf_dir, cpus)
        except Exception as e:  # noqa: BLE001 — A/B must never kill the bench line
            ab = {"ref": ab_ref, "error": f"{type(e).__name__}: {e}"[:300]}
        # separate try: a head2 failure must not clobber a good ref leg
        # (ratio_pre still publishes as ab_ratio via the head2_sum==0 path)
        try:
            time.sleep(settle)
            head2 = _run_ab_baseline("HEAD", sf_dir, cpus)
        except Exception as e:  # noqa: BLE001
            head2 = {"error": f"{type(e).__name__}: {e}"[:300]}
        if "ref_queries" in ab:
            common = sorted(set(timings) & set(ab["ref_queries"]))
            head_sum = sum(timings[k] for k in common)
            ref_sum = sum(ab["ref_queries"][k] for k in common)
            h2q = head2.get("ref_queries") or {}
            head2_sum = sum(h2q.get(k, 0.0) for k in common)
            if ref_sum > 0:
                ab["common_queries"] = len(common)
                ab["ratio_pre"] = round(head_sum / ref_sum, 3)
                if head2_sum > 0:
                    ab["ratio_post"] = round(head2_sum / ref_sum, 3)
                    ab["head_drift"] = round(head2_sum / head_sum, 3)
                    # headline ratio = the adjacent-leg comparison
                    payload["ab_ratio"] = ab["ratio_post"]
                else:
                    payload["ab_ratio"] = ab["ratio_pre"]
            del ab["ref_queries"]
        detail["ab"] = ab
    # leading \n: Spark's stderr progress bar ends with a bare \r, which
    # would otherwise glue this onto its line and break startswith filters
    print("\nBENCH_DETAIL " + json.dumps(detail), file=sys.stderr)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
