"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline
surface); ``oracle_sql()`` gives the DuckDB-equivalent SQL for each
(omitted for engine-specific hashing / approximate operators — those are
covered by pytest golden/recall tests instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_sinker_spark.plans.queries import ORACLES, QUERIES, ordered_query_names


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return QUERIES["tpch_q1_pricing"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Deliberate, STATIC ordering (plans/queries.py:DRIVER_ORDER, layout
    # comment there): a fixed prefix — the two round-11 additions
    # receiving their first driver hash (ch_dialect_hash_closures: the
    # KS-'exact'/wyHash64/convex-hull refusal-tail closures;
    # pipeline_full_curation: the fused end-to-end curation flagship),
    # then the ENTIRE 48-query r07-latest block (the max-hash-age set,
    # exactly 3 rounds stale — the r10-verdict rotation order) filling
    # the window exactly.  Followed by every remaining registered query
    # in source order.  Deterministic; no runtime state feeds the
    # ordering.
    return {n: QUERIES[n] for n in ordered_query_names()}


def oracle_sql() -> dict[str, str]:
    names = ordered_query_names()
    return {n: ORACLES[n] for n in names if n in ORACLES}
