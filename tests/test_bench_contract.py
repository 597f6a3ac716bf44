"""The driver consumes bench.py's output: exactly one parseable JSON line
with the agreed keys.  This test runs the real harness at sf0.001 in a
subprocess (fresh JVM, like the driver does) and validates the contract —
the round-2/3 failure mode was precisely a bench that crashed before
emitting its line."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_emits_one_json_line_and_contract():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        l for l in proc.stdout.splitlines() if l.startswith("{") and l.endswith("}")
    ]
    assert len(json_lines) == 1, proc.stdout[-2000:]
    payload = json.loads(json_lines[0])
    assert payload["metric"] == "headline_query_set_wall_seconds"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload["queries"]) >= {
        "tpch_q1_pricing",
        "range_join_recent_events",
        "dedup_minhash_lsh",
        "etl_pipeline_1m",
    }
    assert all(v >= 0 for v in payload["queries"].values())
    assert abs(sum(payload["queries"].values()) - payload["value"]) < 0.01
    # methodology transparency (ADVICE r4): cold + steady both reported,
    # steady = median of runs 3-5, never the overall min
    runs = payload["etl_pipeline_1m_runs"]
    assert len(runs) == 5 and payload["etl_pipeline_1m_cold"] == runs[0]
    assert payload["queries"]["etl_pipeline_1m"] == sorted(runs[2:])[1]
    assert "median of runs 3-5" in payload["methodology"]
