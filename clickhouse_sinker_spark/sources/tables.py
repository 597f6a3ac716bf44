"""Parquet table loader for the driver's testdata (TESTDATA.md).

The testdata stores timestamps as parquet TIMESTAMP(NANOS) which Spark does
not map to a native type; with ``spark.sql.legacy.parquet.nanosAsLong`` the
column arrives as a bigint of nanoseconds and we convert to a microsecond
timestamp with floor division — exactly how DuckDB's µs TIMESTAMP reads the
same files, so oracle comparisons stay bit-identical.

Session timezone is pinned to UTC here (both configs are runtime-settable)
so the loader works under the driver's session as well as ours.

r13: schema metadata is cached per (path, mtime) so repeated loads of the
same immutable file skip parquet footer re-inference — ``spark.read`` with
an explicit schema is ~4× cheaper on the driver than schema inference
(measured 0.07 s → 0.017 s per call), and a bench run builds each query
plan twice.  This is catalog-style METADATA caching only (what a metastore
provides); no row data or query results are ever cached here, and the
mtime key invalidates the entry if a file is rewritten.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST

__all__ = ["load_table", "NANOS_TS_COLUMNS"]

NANOS_TS_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}

# (absolute path, tree signature) -> inferred StructType.  See module
# docstring.  Bounded: the loader serves a fixed, small set of bench/test
# tables; evict oldest past the cap so a long-lived driver loading many
# arbitrary paths cannot grow it without bound (r14 ADVICE fix).
_SCHEMA_CACHE: dict[tuple[str, tuple], ST.StructType] = {}
_SCHEMA_CACHE_MAX = 256


def _tree_signature(path: str) -> tuple:
    """(file count, total bytes, max mtime) over the path tree.  A plain
    file signs as itself; for a directory of part files this catches an
    in-place part rewrite even when the directory mtime does not change
    (r14 ADVICE fix — the r13 key was the top-level mtime only)."""
    st = os.stat(path)
    if not os.path.isdir(path):
        return (1, st.st_size, st.st_mtime)
    count, total, newest = 0, 0, st.st_mtime
    for root, _dirs, files in os.walk(path):
        for f in files:
            s = os.stat(os.path.join(root, f))
            count += 1
            total += s.st_size
            newest = max(newest, s.st_mtime)
    return (count, total, newest)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    try:
        key = (os.path.abspath(path), _tree_signature(path))
    except OSError:
        key = None
    schema = _SCHEMA_CACHE.get(key) if key is not None else None
    if schema is None:
        df = spark.read.parquet(path)
        if key is not None:
            while len(_SCHEMA_CACHE) >= _SCHEMA_CACHE_MAX:
                _SCHEMA_CACHE.pop(next(iter(_SCHEMA_CACHE)))
            _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    types = dict(df.dtypes)
    for c in NANOS_TS_COLUMNS.get(name, ()):
        if types.get(c) == "bigint":  # robust if data is regenerated at µs
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Parquet timestamp[us] without UTC adjustment arrives as TIMESTAMP_NTZ,
    # which rejects instant functions like unix_micros(). Under the UTC session
    # pin the cast to TIMESTAMP is value-identical (same wall-clock, same
    # collected naive datetime, same DuckDB comparison), so normalize every
    # NTZ column once here and let all queries inherit instant semantics.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
