"""Dynamic schema evolution (≙ D4/D5/D6: parser/fastjson.go:512-536,623-658;
output/clickhouse.go:550-659; task/task.go:142-159,198-219).

The reference restarts the consumer when a message carries unknown keys,
issues ``ALTER TABLE ADD COLUMN IF NOT EXISTS`` with an inferred type, and
re-projects.  In Spark we detect new keys *inside the batch* (no restart):
``json_object_keys`` diff against the known column set, white/black regex
filters, MaxDims guard, then the caller widens the destination (DDL via JDBC
or parquet mergeSchema) and rebuilds the projection for the same batch.

Type inference mirrors fjDetectType (parser/fastjson.go:623-658): Bool,
Int64, Float64, DateTime (string that parses as datetime), String; arrays
deeper than 1 level and objects are ignored (depth guard) — FIXTURES.md F2.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["detect_new_keys", "infer_key_types", "evolve_specs"]

from .project import ColumnSpec


def detect_new_keys(
    df: DataFrame,
    json_col: str,
    known: set[str],
    white_regex: str | None = None,
    black_regex: str | None = None,
    max_dims: int = 0,
) -> list[str]:
    """Distinct keys present in the JSON column but not in ``known``.

    One distinct-aggregate over exploded key sets (map-side partial agg —
    the shuffle carries only distinct key strings, tiny at any scale).
    White/black regex and MaxDims guard per config/config.go:169-181 and
    task/task.go:142-159 (dirty-data attack guard).
    """
    keys = (
        df.select(F.explode(F.json_object_keys(F.col(json_col))).alias("k"))
        .filter(~F.col("k").isin(list(known)))
        .distinct()
    )
    out = [r.k for r in keys.collect()]
    if white_regex:
        out = [k for k in out if re.search(white_regex, k)]
    if black_regex:
        out = [k for k in out if not re.search(black_regex, k)]
    out.sort()
    if max_dims > 0:
        room = max_dims - len(known)
        out = out[: max(room, 0)]
    return out


_INT_RE = re.compile(r"^-?\d+$")
_FLOAT_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def infer_key_types(df: DataFrame, json_col: str, new_keys: list[str], sample: int = 100) -> dict[str, str]:
    """Infer a ClickHouse type string per new key from observed values
    (≙ fjDetectType, parser/fastjson.go:623-658).

    Uses json_tuple-style extraction on a driver-side sample (typing needs
    only a handful of rows; the sample is bounded so this never scales with
    data size).  Objects/arrays → excluded (depth guard).
    """
    if not new_keys:
        return {}
    exprs = [F.get_json_object(F.col(json_col), f"$.{k}").alias(k) for k in new_keys]
    raw_exprs = [F.get_json_object(F.col(json_col), f"$.{k}").alias(f"__raw_{k}") for k in new_keys]
    rows = df.select(*exprs, *raw_exprs).limit(sample).collect()
    out: dict[str, str] = {}
    for k in new_keys:
        vals = [r[k] for r in rows if r[k] is not None]
        if not vals:
            continue
        v = vals[0]
        if v.startswith("[") or v.startswith("{"):
            continue  # arrays/objects ignored (FIXTURES.md F2 phases 3-4)
        if v in ("true", "false"):
            out[k] = "Nullable(Bool)"
        elif _INT_RE.match(v):
            out[k] = "Nullable(Int64)"
        elif _FLOAT_RE.match(v):
            out[k] = "Nullable(Float64)"
        elif _looks_datetime(v):
            out[k] = "Nullable(DateTime64(3))"
        else:
            out[k] = "Nullable(String)"
    return out


_DT_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2}(\.\d+)?([+-]\d{2}:?\d{2}|Z)?)?$"
)


def _looks_datetime(v: str) -> bool:
    return bool(_DT_RE.match(v))


def evolve_specs(
    specs: list[ColumnSpec],
    df: DataFrame,
    json_col: str,
    white_regex: str | None = None,
    black_regex: str | None = None,
    max_dims: int = 0,
) -> tuple[list[ColumnSpec], dict[str, str]]:
    """Full evolution step: detect → infer → widened spec list.

    Returns (new_specs, added {name: ch_type}).  The caller applies DDL to
    the destination (ALTER ... ADD COLUMN IF NOT EXISTS — idempotent like
    output/clickhouse.go:550-659) and re-projects the SAME batch with the
    widened specs — cleaner than the reference's consumer restart because
    nothing was committed yet.
    """
    known = {s.name for s in specs} | {s.source for s in specs if s.source}
    new_keys = detect_new_keys(df, json_col, known, white_regex, black_regex, max_dims)
    inferred = infer_key_types(df, json_col, new_keys)
    new_specs = list(specs) + [ColumnSpec(k, t, source=k) for k, t in sorted(inferred.items())]
    return new_specs, inferred
