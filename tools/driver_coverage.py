#!/usr/bin/env python
"""Dev tool: which registered queries have ever received a driver hash?

Reads the CORRECTNESS_r*.json artifacts and prints per-query coverage so
the NEXT round's ``DRIVER_ORDER`` slots (plans/queries.py) can be chosen
by hand — the runtime ordering itself is a static constant and never
reads these artifacts (ADVICE r4).  Usage: python tools/driver_coverage.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, ROOT)
    os.environ.setdefault("SPARK_GRAFT_SKIP_SPARK", "1")
    from clickhouse_sinker_spark.plans.queries import QUERIES, ordered_query_names

    seen: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_") : -len(".json")]
        with open(path) as f:
            for name, res in json.load(f).items():
                ok = res.get("hash_match") or (
                    res.get("hash_match") is None and res.get("rows_match")
                )
                seen.setdefault(name, []).append(f"{rnd}{'✓' if ok else '✗'}")

    order = ordered_query_names()
    never = [n for n in order if n not in seen]
    print(f"registered: {len(QUERIES)}  ever-driver-checked: {len(seen)}  "
          f"never: {len(never)}")

    # current-window audit: how many of the 50 slots are first-time hashes
    from clickhouse_sinker_spark.plans.queries import DRIVER_WINDOW

    window = order[:DRIVER_WINDOW]  # the driver's real selection
    fresh = [n for n in window if n not in seen]
    print(f"window: {len(window)} slots, {len(fresh)} first-time hashes, "
          f"{len(window) - len(fresh)} anchors/re-hashes; "
          f"never after this round's run: {len(never) - len(fresh)}")
    print("\n-- never checked (in current order; front-load these next round) --")
    for n in never:
        print(f"  {n}")
    print("\n-- checked --")
    for n in order:
        if n in seen:
            print(f"  {n}: {' '.join(seen[n])}")


if __name__ == "__main__":
    main()
