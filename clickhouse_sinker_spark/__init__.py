"""clickhouse_sinker_spark — a PySpark-native analytics/ETL engine with the
capabilities of housepower/clickhouse_sinker (reference: /root/reference).

The reference is a Go daemon that consumes Kafka, parses JSON/CSV, casts
fields to a ClickHouse table schema, routes rows to shards, batches, and
bulk-inserts (at-least-once).  This package re-expresses that surface as an
idiomatic PySpark library:

- ``typemap``     — ClickHouse type-string parsing → Spark ``DataType``
                    (reference: model/value.go:161-220 ``WhichType``).
- ``functions``   — column-expression library: saturating casts,
                    default-on-bad-data, multi-layout datetime parsing,
                    IP validation, hashing/sharding, text analysis.
- ``operators``   — projection builder (the per-row "SELECT list"),
                    sharding policies, dedup (exact/minhash/simhash/ngram),
                    similarity search, schema evolution, series split.
- ``sources``     — Kafka readStream builder + file-stream stand-in,
                    schema discovery.
- ``streaming``   — pipeline assembly: source → transform → foreachBatch
                    sink with checkpointed commit semantics.
- ``plans``       — batch query layer over landed tables (joins, windows,
                    aggregations) designed for 100 TB scale.

Everything is declarative DataFrame API so Catalyst handles pushdown,
pruning, join strategy and AQE; Python UDFs only where semantics require
(Arrow-batched pandas UDFs, never row-at-a-time).
"""

__version__ = "0.1.0"
