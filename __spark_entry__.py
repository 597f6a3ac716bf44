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
    # Deliberate ordering: a fixed 40-query core window covering every
    # SURVEY §2 operator family, then the tail rotated 10 slots per round so
    # each registered query re-enters the driver's 50-query check window
    # every ~7 rounds (see plans/queries.py:ordered_query_names).
    return {n: QUERIES[n] for n in ordered_query_names()}


def oracle_sql() -> dict[str, str]:
    names = ordered_query_names()
    return {n: ORACLES[n] for n in names if n in ORACLES}
