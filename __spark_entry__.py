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
    # Deliberate, STATIC ordering (plans/queries.py:DRIVER_ORDER — the
    # layout comment there is authoritative and current).  Round 13: a
    # fixed prefix of the two r12-staged queries receiving their first
    # driver hash (ivfpq_topk, pipeline_pack_bpe), then the ENTIRE
    # 48-query r09-latest block (the max-hash-age set, exactly 3 rounds
    # stale — the r12-verdict rotation order) filling the window
    # exactly.  Followed by every remaining registered query in source
    # order.  Deterministic; no runtime state feeds the ordering.
    return {n: QUERIES[n] for n in ordered_query_names()}


def oracle_sql() -> dict[str, str]:
    names = ordered_query_names()
    return {n: ORACLES[n] for n in names if n in ORACLES}
