"""Cluster-topology and distributed-table discovery (S9/S10).

≙ discovery/discovery.go:15,72-117 (shard/replica topology from
``system.clusters``) and output/clickhouse.go:661-696 (distributed tables
pointing at a local table, from ``system.tables``).

The reference polls ClickHouse system tables, regroups rows into a
shard→replicas topology, and — when the topology differs from the running
config — publishes an updated config, which the hot-reload loop then
applies (full restart, since the clickhouse section changed).  Here the
same flow: ``discover_cluster_shards`` → ``refresh_hosts`` → feed the new
``SinkerConfig`` to ``SinkerApp.apply_config`` (control.py).

The system-table names are parameters so the discovery queries run
against any JDBC engine (the tests seed look-alike tables in embedded
Derby); deployments keep the ClickHouse defaults.  The reference's
``extractAllGroups`` engine_full parsing (a ClickHouse-only function) is
done engine-side in Go; we pull ``engine_full`` and parse it in Python —
portable, and the driver-side row count is the number of Distributed
tables in one database (tiny).
"""

from __future__ import annotations

import re
from itertools import groupby

from pyspark.sql import SparkSession

__all__ = [
    "cluster_sql",
    "dist_tables_sql",
    "discover_cluster_shards",
    "discover_dist_tables",
    "shards_to_hosts",
    "diff_shards",
    "refresh_hosts",
]


def cluster_sql(cluster: str, system_table: str = "system.clusters") -> str:
    """≙ getClusterSQL (discovery/discovery.go:15)."""
    return (
        "SELECT shard_num, replica_num, host_name "
        f"FROM {system_table} WHERE cluster = '{cluster}' "
        "ORDER BY shard_num, replica_num"
    )


def dist_tables_sql(database: str, system_table: str = "system.tables") -> str:
    """Distributed-table scan (output/clickhouse.go:668-671), portable
    form: the engine_full target filter happens in Python."""
    return (
        "SELECT name, engine_full "
        f"FROM {system_table} "
        f"WHERE engine = 'Distributed' AND database = '{database}'"
    )


def _jdbc(spark: SparkSession, url: str, query: str, driver: str = "",
          user: str = "", password: str = ""):
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .option("user", user)
        .option("password", password)
    )
    if driver:
        reader = reader.option("driver", driver)
    return reader.load()


def discover_cluster_shards(
    spark: SparkSession,
    url: str,
    cluster: str,
    driver: str = "",
    user: str = "",
    password: str = "",
    system_table: str = "system.clusters",
) -> list[list[str]]:
    """Shard topology: ``[[replica host, ...], ...]`` grouped by shard_num
    (Dispatcher's regroup loop, discovery/discovery.go:73-106)."""
    df = _jdbc(spark, url, cluster_sql(cluster, system_table), driver, user, password)
    rows = sorted(
        ((int(r[0]), int(r[1]), str(r[2])) for r in df.collect()),
        key=lambda t: (t[0], t[1]),
    )
    return [
        [host for _, _, host in grp]
        for _, grp in groupby(rows, key=lambda t: t[0])
    ]


_DIST_RE = re.compile(
    r"Distributed\('(?P<cluster>[^']*)',\s*'(?P<db>[^']*)',\s*'(?P<table>[^']*)'"
)


def discover_dist_tables(
    spark: SparkSession,
    url: str,
    database: str,
    table: str,
    cluster: str,
    driver: str = "",
    user: str = "",
    password: str = "",
    system_table: str = "system.tables",
) -> list[tuple[str, str]]:
    """Distributed tables whose target is (database, table), as
    ``(name, cluster)`` pairs — "logic" tables (other clusters) first, the
    own-cluster distributed table last (getDistTbls ordering,
    output/clickhouse.go:678-695)."""
    df = _jdbc(spark, url, dist_tables_sql(database, system_table), driver, user, password)
    own: tuple[str, str] | None = None
    out: list[tuple[str, str]] = []
    for name, engine_full in ((str(r[0]), str(r[1])) for r in df.collect()):
        m = _DIST_RE.search(engine_full or "")
        if not m or m.group("db") != database or m.group("table") != table:
            continue
        if m.group("cluster") == cluster:
            own = (name, m.group("cluster"))
        else:
            out.append((name, m.group("cluster")))
    if own is not None:
        out.append(own)  # "dist table always in the end"
    return out


def shards_to_hosts(shards: list[list[str]], port: int | None = None) -> tuple[str, ...]:
    """Topology → our config's hosts tuple (one comma-joined replica list
    per shard; ≙ shards2hosts, discovery/discovery.go)."""
    suffix = f":{port}" if port else ""
    return tuple(",".join(f"{h}{suffix}" for h in replicas) for replicas in shards)


def diff_shards(a: list[list[str]], b: list[list[str]]) -> bool:
    """True when topologies differ (≙ diffShards)."""
    return [sorted(r) for r in a] != [sorted(r) for r in b]


def refresh_hosts(cfg, shards: list[list[str]], port: int | None = None):
    """Apply a discovered topology to a SinkerConfig: returns
    ``(new_cfg, changed)``.  When changed, feeding ``new_cfg`` to
    ``SinkerApp.apply_config`` full-restarts every task — the reference's
    Publish→reload loop (discovery/discovery.go:108-117)."""
    from copy import deepcopy

    current = [h.split(",") for h in cfg.clickhouse.hosts]
    stripped = [[h.rsplit(":", 1)[0] for h in reps] for reps in current]
    if not diff_shards(shards, stripped):
        return cfg, False
    new_cfg = deepcopy(cfg)
    new_cfg.clickhouse.hosts = shards_to_hosts(shards, port)
    new_cfg.clickhouse.shards = len(shards)
    return new_cfg, True
