"""ClickHouse SQL statement generation (S3/D5 surface).

Mirrors the reference's statement templates so the strings this engine
would send to ClickHouse are byte-comparable with the reference's:

- ``insert_sql``: the bulk-insert prepare statement
  (output/clickhouse.go:493-526 — HTTP protocol builds
  ``INSERT INTO db.table (`c`,...) VALUES (?,...)``, native protocol
  builds ``INSERT INTO `db`.`table` (`c`,...)`` with no VALUES clause).
- ``alter_add_columns_sql``: idempotent schema-evolution DDL
  (output/clickhouse.go:550-659 — ``ADD COLUMN IF NOT EXISTS `k` T``
  clauses joined by ",", with ``ON CLUSTER `c``` between the table name
  and the column list when a cluster is configured).

The JDBC writer itself generates its own INSERT internally; these strings
are the engine's externally observable contract (logged exactly like the
reference's ``Prepare sql=>`` line) and what a native-protocol client
would execute — golden-tested in tests/test_chsql.py.
"""

from __future__ import annotations

__all__ = ["quote_ident", "insert_sql", "alter_add_columns_sql"]


def quote_ident(name: str) -> str:
    """Backtick-quote an identifier, escaping embedded backticks."""
    return "`" + name.replace("`", "``") + "`"


def insert_sql(db: str, table: str, columns: list[str], protocol: str = "http") -> str:
    """The prepare statement for a bulk insert.

    ``protocol='http'`` follows output/clickhouse.go:508-509 (unquoted
    db.table, ``VALUES`` with one ``?`` per column); ``protocol='native'``
    follows :521-525 (quoted db/table, column list only — the native
    client appends block data without a VALUES clause).
    """
    quoted = ",".join(quote_ident(c) for c in columns)
    if protocol == "http":
        params = ",".join("?" for _ in columns)
        return f"INSERT INTO {db}.{table} ({quoted}) VALUES ({params})"
    if protocol == "native":
        return f"INSERT INTO {quote_ident(db)}.{quote_ident(table)} ({quoted})"
    raise ValueError(f"unknown protocol {protocol!r} (expected 'http' or 'native')")


def alter_add_columns_sql(
    db: str,
    table: str,
    adds: dict[str, str],
    cluster: str | None = None,
) -> str | None:
    """One ``ALTER TABLE`` adding every new column idempotently.

    ``adds`` maps column name → ClickHouse type (already ``Nullable(...)``
    wrapped by the inference step, matching output/clickhouse.go:545-552).
    Clause shape follows output/clickhouse.go:552,635-652 and the
    ``ALTER TABLE `db`.`tbl` [ON CLUSTER `c`] <clauses>`` assembly at
    :76; returns None when there is nothing to add.
    """
    if not adds:
        return None
    clauses = ",".join(
        f"ADD COLUMN IF NOT EXISTS {quote_ident(k)} {t}" for k, t in adds.items()
    )
    on_cluster = f" ON CLUSTER {quote_ident(cluster)}" if cluster else ""
    return f"ALTER TABLE {quote_ident(db)}.{quote_ident(table)}{on_cluster} {clauses}"
