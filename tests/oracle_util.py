"""Local mirror of the driver's DuckDB-oracle comparison: run a Spark query
and its oracle SQL, sort columns by name, compare row multisets."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0):
    """Returns (ok, message).  Column-name-sorted, order-insensitive."""
    sdf = spark_df.toPandas()
    con = duck_con(sf_dir)
    odf = con.sql(oracle_sql).df()
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        return False, f"columns differ: spark={s_cols} oracle={o_cols}"
    if len(sdf) != len(odf):
        return False, f"row count differs: spark={len(sdf)} oracle={len(odf)}"
    s_rows = sorted(
        (tuple(_norm(v) for v in row) for row in sdf[s_cols].itertuples(index=False)),
        key=repr,
    )
    o_rows = sorted(
        (tuple(_norm(v) for v in row) for row in odf[o_cols].itertuples(index=False)),
        key=repr,
    )
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            if float_tol > 0 and _rows_close(a, b, float_tol):
                continue
            return False, f"row {i} differs:\n  spark : {a}\n  oracle: {b}"
    return True, "ok"


def _rows_close(a, b, tol):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=tol, abs_tol=tol):
                return False
        elif x != y:
            return False
    return True
