"""ClickHouse ``system.*`` table emulation over the Spark catalog.

The reference's schema machinery is driven entirely by three system
tables: ``system.columns`` for dims discovery and sorting keys
(output/clickhouse.go:41-58,742), ``system.tables`` for engine /
Distributed-table discovery (output/clickhouse.go:661-696,732), and
``system.clusters`` for topology (discovery/discovery.go:15).  A
reference user's ad-hoc schema SQL uses the same tables.

``register_system_views`` materializes those as temp views
(``system_columns`` etc. — Spark temp views cannot live in a ``system``
database, so the dialect translator rewrites the dotted names) built
from the session catalog's real schemas, with ClickHouse TYPE NAMES
reconstructed from the Spark types (the reverse of typemap.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

__all__ = ["spark_to_ch_type", "register_system_views", "SYSTEM_VIEWS"]

SYSTEM_VIEWS = ("system_columns", "system_tables", "system_clusters")

_SIMPLE = {
    "byte": "Int8",
    "short": "Int16",
    "integer": "Int32",
    "long": "Int64",
    "float": "Float32",
    "double": "Float64",
    "string": "String",
    "binary": "String",
    "boolean": "Bool",
    "date": "Date",
    "timestamp": "DateTime",
    "timestamp_ntz": "DateTime",
}


def spark_to_ch_type(
    dt: T.DataType, nullable: bool = False, timestamp_as: str = "DateTime"
) -> str:
    """Spark DataType → ClickHouse type string — THE single source for
    this direction (inverse of typemap.parse_ch_type; lossy where Spark
    lacks the distinction — unsigned widths come back signed,
    Enum/UUID/IP come back String).  Shared by the system.columns
    emulation (``timestamp_as='DateTime'``, the reference's table
    convention) and NativeHttpSink (``'DateTime64(6)'`` — Spark
    timestamps are µs)."""
    if isinstance(dt, T.DecimalType):
        base = f"Decimal({dt.precision}, {dt.scale})"
    elif isinstance(dt, T.ArrayType):
        # CH arrays are never Nullable at the outer level
        return (
            "Array("
            + spark_to_ch_type(dt.elementType, dt.containsNull, timestamp_as)
            + ")"
        )
    elif isinstance(dt, T.MapType):
        # like arrays, CH maps are never Nullable at the outer level
        return (
            f"Map({spark_to_ch_type(dt.keyType, timestamp_as=timestamp_as)}, "
            f"{spark_to_ch_type(dt.valueType, dt.valueContainsNull, timestamp_as)})"
        )
    elif dt.typeName() in ("timestamp", "timestamp_ntz"):
        base = timestamp_as
    else:
        base = _SIMPLE.get(dt.typeName(), "String")
    return f"Nullable({base})" if nullable else base


def register_system_views(
    spark: SparkSession,
    tables: list[str],
    database: str = "default",
    sorting_keys: dict[str, list[str]] | None = None,
    cluster: str = "default",
    hosts: list[str] | None = None,
) -> None:
    """Create ``system_columns`` / ``system_tables`` / ``system_clusters``
    temp views describing the given registered views/tables.

    ``sorting_keys`` marks ``is_in_sorting_key`` (the reference reads it
    to build the dedup key, output/clickhouse.go:742); ``hosts`` feeds
    the topology rows (one shard per entry, replicas comma-separated —
    the reference's hosts layout)."""
    sorting_keys = sorting_keys or {}
    col_rows = []
    tbl_rows = []
    for t in tables:
        schema = spark.table(t).schema
        keyset = {c.lower() for c in sorting_keys.get(t, [])}
        for pos, f in enumerate(schema.fields, start=1):
            col_rows.append(
                (
                    database,
                    t,
                    f.name,
                    spark_to_ch_type(f.dataType, f.nullable),
                    pos,
                    "",  # default_kind: none for parquet-backed views
                    "",  # default_expression
                    1 if f.name.lower() in keyset else 0,
                )
            )
        order_by = ", ".join(sorting_keys.get(t, [])) or "tuple()"
        tbl_rows.append(
            (database, t, "MergeTree", f"MergeTree ORDER BY ({order_by})")
        )
    spark.createDataFrame(
        col_rows,
        "database string, table string, name string, type string, "
        "position int, default_kind string, default_expression string, "
        "is_in_sorting_key int",
    ).createOrReplaceTempView("system_columns")
    spark.createDataFrame(
        tbl_rows, "database string, name string, engine string, engine_full string"
    ).createOrReplaceTempView("system_tables")
    cluster_rows = []
    for shard, entry in enumerate(hosts or ["localhost"], start=1):
        for rep, host in enumerate(str(entry).split(","), start=1):
            cluster_rows.append((cluster, shard, rep, host.strip().split(":")[0]))
    spark.createDataFrame(
        cluster_rows,
        "cluster string, shard_num int, replica_num int, host_name string",
    ).createOrReplaceTempView("system_clusters")
