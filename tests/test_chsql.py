"""Golden tests for generated ClickHouse SQL (VERDICT r4 item 6).

No ClickHouse exists in the sandbox, so the INSERT prepare statement and
the schema-evolution ALTER DDL are pinned against the exact templates the
reference builds (output/clickhouse.go:493-526 for INSERT,
:545-560,635-652 + :76 for ALTER) — if either engine changes shape, the
byte-for-byte goldens break.
"""

from __future__ import annotations

import pytest

from clickhouse_sinker_spark.chsql import alter_add_columns_sql, insert_sql, quote_ident


def test_quote_ident_escapes_backticks():
    assert quote_ident("plain") == "`plain`"
    assert quote_ident("we`ird") == "`we``ird`"


def test_insert_http_golden():
    # output/clickhouse.go:508-509: unquoted db.table, quoted columns,
    # one '?' per column
    got = insert_sql("default", "sensor_dt_result_online", ["timestamp", "name", "value"])
    assert got == (
        "INSERT INTO default.sensor_dt_result_online "
        "(`timestamp`,`name`,`value`) VALUES (?,?,?)"
    )


def test_insert_native_golden():
    # output/clickhouse.go:521-525: quoted db/table, no VALUES clause
    got = insert_sql("default", "metrics", ["__series_id__", "value"], protocol="native")
    assert got == 'INSERT INTO `default`.`metrics` (`__series_id__`,`value`)'


def test_insert_unknown_protocol_raises():
    with pytest.raises(ValueError):
        insert_sql("d", "t", ["a"], protocol="tcp")


def test_alter_golden_no_cluster():
    # output/clickhouse.go:552: ADD COLUMN IF NOT EXISTS `k` Nullable(T),
    # clauses joined by "," (:635), assembled per :76
    got = alter_add_columns_sql(
        "default",
        "events",
        {"new_key": "Nullable(Float64)", "tag": "Nullable(String)"},
    )
    assert got == (
        "ALTER TABLE `default`.`events` "
        "ADD COLUMN IF NOT EXISTS `new_key` Nullable(Float64),"
        "ADD COLUMN IF NOT EXISTS `tag` Nullable(String)"
    )


def test_alter_golden_on_cluster():
    # output/clickhouse.go:550-551: ON CLUSTER `c` between table and clauses
    got = alter_add_columns_sql(
        "default", "events", {"k": "Nullable(Int64)"}, cluster="abc"
    )
    assert got == (
        "ALTER TABLE `default`.`events` ON CLUSTER `abc` "
        "ADD COLUMN IF NOT EXISTS `k` Nullable(Int64)"
    )


def test_alter_empty_is_none():
    assert alter_add_columns_sql("d", "t", {}) is None


def test_evolve_feeds_alter_directly(spark):
    """End-to-end: dynamic-schema inference output plugs straight into the
    ALTER generator — the D4→D5 seam (operators/evolve.py →
    output/clickhouse.go:550-659)."""
    from clickhouse_sinker_spark.operators.evolve import evolve_specs
    from clickhouse_sinker_spark.operators.project import ColumnSpec

    df = spark.createDataFrame(
        [('{"known": 1, "fresh_num": 2.5, "fresh_str": "x"}',)], "j string"
    )
    specs = [ColumnSpec("known", "Int64", source="known")]
    _, added = evolve_specs(specs, df, "j")
    ddl = alter_add_columns_sql("default", "events", added)
    assert ddl is not None
    assert "ADD COLUMN IF NOT EXISTS `fresh_num` Nullable(Float64)" in ddl
    assert "ADD COLUMN IF NOT EXISTS `fresh_str` Nullable(String)" in ddl


def test_jdbc_sink_prepare_sql(spark):
    from clickhouse_sinker_spark.config import ClickHouseConfig
    from clickhouse_sinker_spark.streaming.sink import JdbcSink

    cfg = ClickHouseConfig(hosts=("h1",), database="default", username="", password="")
    sink = JdbcSink(cfg, table="events", shards=1)
    assert sink.prepare_sql(["a", "b"]) == "INSERT INTO default.events (`a`,`b`) VALUES (?,?)"
    assert sink.prepare_sql(["a"], protocol="native") == "INSERT INTO `default`.`events` (`a`)"
