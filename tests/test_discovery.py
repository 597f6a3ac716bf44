"""S9/S10 discovery against an embedded-Derby stand-in for the ClickHouse
system tables (discovery/discovery.go, output/clickhouse.go:661-696)."""

from __future__ import annotations

from clickhouse_sinker_spark.config_io import load_config
from clickhouse_sinker_spark.control import diff_tasks
from clickhouse_sinker_spark.sources.discovery import (
    cluster_sql,
    diff_shards,
    discover_cluster_shards,
    discover_dist_tables,
    refresh_hosts,
    shards_to_hosts,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _seed(spark, url, table, df):
    # VARCHAR instead of the Derby dialect's CLOB default — CLOB columns
    # can't be compared to string literals in WHERE clauses
    col_types = ", ".join(
        f"{f.name} VARCHAR(256)" for f in df.schema.fields if f.dataType.simpleString() == "string"
    )
    (df.write.format("jdbc").option("url", url).option("dbtable", table)
     .option("createTableColumnTypes", col_types)
     .option("driver", DERBY_DRIVER).mode("overwrite").save())


def test_cluster_discovery_groups_shards(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/sys;create=true"
    rows = [
        # cluster, shard_num, replica_num, host_name — deliberately shuffled
        ("main", 2, 1, "h3"),
        ("main", 1, 2, "h2"),
        ("main", 1, 1, "h1"),
        ("main", 2, 2, "h4"),
        ("other", 1, 1, "zz"),
    ]
    # uppercase column names: Spark's JDBC writer quotes identifiers, and
    # Derby resolves the query's unquoted names case-insensitively upward
    df = spark.createDataFrame(
        rows, "CLUSTER string, SHARD_NUM int, REPLICA_NUM int, HOST_NAME string"
    )
    _seed(spark, url, "clusters", df)

    shards = discover_cluster_shards(
        spark, url, "main", driver=DERBY_DRIVER, system_table="clusters"
    )
    assert shards == [["h1", "h2"], ["h3", "h4"]]  # grouped + ordered
    assert shards_to_hosts(shards, port=8123) == ("h1:8123,h2:8123", "h3:8123,h4:8123")
    assert not diff_shards(shards, [["h2", "h1"], ["h4", "h3"]])  # order-insensitive
    assert diff_shards(shards, [["h1", "h2"]])
    # the SQL matches the reference's template shape
    assert "ORDER BY shard_num, replica_num" in cluster_sql("main")


def test_dist_table_discovery_and_ordering(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/sys2;create=true"
    rows = [
        ("dist_metrics", "Distributed('main', 'db1', 'metrics', rand())", "Distributed", "db1"),
        ("logic_metrics", "Distributed('backup', 'db1', 'metrics', rand())", "Distributed", "db1"),
        ("dist_events", "Distributed('main', 'db1', 'events', rand())", "Distributed", "db1"),
        ("not_ours", "Distributed('main', 'db2', 'metrics', rand())", "Distributed", "db1"),
        ("plain", "MergeTree() ORDER BY id", "MergeTree", "db1"),
    ]
    df = spark.createDataFrame(
        rows, "NAME string, ENGINE_FULL string, ENGINE string, DATABASE string"
    )
    _seed(spark, url, "tables", df)

    got = discover_dist_tables(
        spark, url, "db1", "metrics", "main",
        driver=DERBY_DRIVER, system_table="tables",
    )
    # logic tables first, own-cluster dist table LAST (getDistTbls ordering)
    assert got == [("logic_metrics", "backup"), ("dist_metrics", "main")]


def test_refresh_hosts_feeds_hot_reload():
    """Discovery → config refresh → the hot-reload diff sees a transport
    change and schedules a full restart (Publish→applyConfig loop)."""
    cfg = load_config(
        {
            "clickhouse": {"hosts": [["h1", "h2"]], "port": 8123},
            "kafka": {"brokers": "b:9092"},
            "task": {"name": "t1", "topic": "tp"},
        }
    )
    assert cfg.clickhouse.hosts == ("h1:8123,h2:8123",)
    # same topology → no change
    same, changed = refresh_hosts(cfg, [["h1", "h2"]], port=8123)
    assert not changed and same is cfg
    # grown topology → new config with 2 shards
    new_cfg, changed = refresh_hosts(cfg, [["h1", "h2"], ["h3", "h4"]], port=8123)
    assert changed
    assert new_cfg.clickhouse.hosts == ("h1:8123,h2:8123", "h3:8123,h4:8123")
    assert new_cfg.clickhouse.shards == 2
    d = diff_tasks(cfg, new_cfg)
    assert d["full_restart"] == ["t1"]  # clickhouse section changed
