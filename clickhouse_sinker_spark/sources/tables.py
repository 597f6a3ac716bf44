"""Parquet table loader for the driver's testdata (TESTDATA.md).

The testdata stores timestamps as parquet TIMESTAMP(NANOS) which Spark does
not map to a native type; with ``spark.sql.legacy.parquet.nanosAsLong`` the
column arrives as a bigint of nanoseconds and we convert to a microsecond
timestamp with floor division — exactly how DuckDB's µs TIMESTAMP reads the
same files, so oracle comparisons stay bit-identical.

Session timezone is pinned to UTC here (both configs are runtime-settable)
so the loader works under the driver's session as well as ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["load_table", "NANOS_TS_COLUMNS"]

NANOS_TS_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
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
