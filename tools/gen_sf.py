#!/usr/bin/env python
"""Deterministic local scale-up of the driver's sf0.1 testdata for
PROFILING EVIDENCE ONLY (VERDICT r13 item 1: sf0.1 is overhead-bound —
16/17 headline queries run as fast on 8 cores as on 32 — so execution-
level optimizations cannot be demonstrated there).

The driver's own generator is not in this repo, so this tool scales the
committed sf0.1 by replicating every fact row N times with key OFFSETS
(copy i shifts each surrogate key by i × (max_key + 1)), which preserves
join fan-out, per-key group sizes and value distributions exactly while
multiplying row counts.  No RNG anywhere — byte-deterministic output.

Semantics per table (×N):
- region, nation: fixed dimensions, copied as-is.
- customer/supplier/part: surrogate key offset per copy.
- orders: o_orderkey and o_custkey offset (orders of copy i reference
  customers of copy i — join selectivity unchanged).
- lineitem: l_orderkey/l_partkey/l_suppkey offset likewise.
- events: event_id and user_id offset; timestamps unchanged (same time
  window at N× the event density — a higher-throughput stream).
- documents: doc_id offset; a short per-copy marker sentence is APPENDED
  to the text so cross-copy pairs are not EXACT duplicates.  They remain
  genuine near-duplicates (>95% shingle overlap), so near-dup density at
  the scaled SF is higher than organic — fine for same-data A/B of code
  variants, NOT for absolute selectivity claims.  Documented trade-off.
- embeddings: vec_id offset, vectors unchanged.

Output goes OUTSIDE the repo and OUTSIDE the read-only /root/testdata
(default /root/testdata_local/sf<sf0.1×N/10>).  The driver bench contract
is untouched: bench.py still reads $SPARK_GRAFT_SF_DIR.

Usage: python tools/gen_sf.py [N] [out_dir]   (default N=10 → "sf1")
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"

# table -> (columns to offset by max_key+1 of the NAMED base table)
OFFSETS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY_AS_IS = ("region", "nation")
# target rows per output file, keeping files ≳16 MB so scans parallelize
# without a small-files problem at the profiling SF
FILES = {"lineitem": 16, "orders": 8, "events": 8, "documents": 4,
         "customer": 4, "part": 2, "supplier": 1, "embeddings": 1}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/testdata_local/sf{n / 10:g}"
    )
    os.makedirs(out, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("gen_sf")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from clickhouse_sinker_spark.sources.tables import load_table

    # max key per (table, col), +1 → stride
    strides: dict[tuple[str, str], int] = {}
    for tbl, cols in OFFSETS.items():
        for _c, (base_tbl, base_col) in cols.items():
            k = (base_tbl, base_col)
            if k not in strides:
                strides[k] = (
                    load_table(spark, SRC, base_tbl)
                    .agg(F.max(base_col)).first()[0] + 1
                )

    copies = F.explode(F.array(*[F.lit(i) for i in range(n)])).alias("__copy")
    for tbl in COPY_AS_IS:
        t0 = time.monotonic()
        load_table(spark, SRC, tbl).coalesce(1).write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
        print(f"{tbl}: copied ({time.monotonic() - t0:.1f}s)", flush=True)
    for tbl, cols in OFFSETS.items():
        t0 = time.monotonic()
        df = load_table(spark, SRC, tbl).select("*", copies)
        for c, key in cols.items():
            df = df.withColumn(c, (F.col(c) + F.col("__copy") * F.lit(strides[key])).cast("long"))
        if tbl == "documents":
            df = df.withColumn(
                "text",
                F.concat(
                    F.col("text"),
                    F.lit(" scale marker copy "),
                    F.col("__copy").cast("string"),
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        df = df.drop("__copy")
        df.repartition(FILES.get(tbl, 4)).write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
        cnt = spark.read.parquet(f"{out}/{tbl}.parquet").count()
        print(f"{tbl}: {cnt} rows ({time.monotonic() - t0:.1f}s)", flush=True)
    spark.stop()
    print(f"done: {out}")


if __name__ == "__main__":
    main()
