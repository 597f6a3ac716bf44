#!/usr/bin/env python
"""Driver-sample insurance: run EVERY oracle-paired query against its DuckDB
oracle at an arbitrary scale factor under a deliberately hostile session —
ANSI mode on (Spark 4 default) and a non-UTC session timezone — so whichever
subset the driver samples next round passes.

Usage:
    python tools/hostile_sweep.py [sf_dir] [--tz America/New_York] [--only substr]

Exit code 0 only if every checked pair matches (rows, columns, values).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

from clickhouse_sinker_spark.plans.queries import ORACLES, QUERIES
from tests.oracle_util import compare


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--tz", default="America/New_York")
    ap.add_argument("--only", default="", help="substring filter on query names")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hostile-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", args.tz)
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in QUERIES if n in ORACLES and args.only in n]
    skipped = sorted(n for n in QUERIES if n not in ORACLES)
    failures: list[tuple[str, str]] = []
    t0 = time.time()
    for i, name in enumerate(names, 1):
        t = time.time()
        try:
            ok, msg = compare(QUERIES[name](spark, args.sf_dir), ORACLES[name], args.sf_dir)
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            ok, msg = False, f"EXCEPTION {type(exc).__name__}: {exc}"
        stat = "ok" if ok else "FAIL"
        print(f"[{i:3}/{len(names)}] {name:<36} {stat}  {time.time() - t:5.1f}s", flush=True)
        if not ok:
            failures.append((name, msg))
        spark.catalog.clearCache()
    print(f"\n{len(names) - len(failures)}/{len(names)} green in {time.time() - t0:.0f}s "
          f"(sf_dir={args.sf_dir}, tz={args.tz}); rows-only (no oracle): {skipped}")
    for name, msg in failures:
        print(f"\nFAIL {name}:\n{msg[:2000]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
