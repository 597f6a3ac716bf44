"""Skew-mitigation operators.

The reference never aggregates, so it has no skew problem; our query layer
does (hot sharding keys, power-law user_ids, duplicate-heavy fingerprints).
Two standard Spark treatments, exposed as reusable operators:

- ``salted_agg``: two-phase aggregation — add a random-free deterministic
  salt (hash of a high-cardinality tiebreak column, mod ``salt``), partially
  aggregate on (key, salt), then re-aggregate on key.  The first shuffle
  spreads a hot key over ``salt`` reducers; the second moves only
  ``groups × salt`` rows.  Results are identical to a direct groupBy for
  any commutative re-aggregable function (sum/count/min/max) because
  addition is associative — this is checked against the unsalted oracle.
- ``broadcast_salted_join``: for skewed join keys, replicate the small side
  per salt value.  (AQE's skewedJoin covers most cases at runtime; this is
  the explicit form for when the planner must be forced.)

At 100 TB: AQE skew-join handles *detected* skew post-shuffle; salting
handles *known* skew before the first shuffle even forms (no 2 GB-partition
failure mode, no stragglers to re-plan around).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "broadcast_salted_join"]

# re-aggregation rule per partial aggregate
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts re-combine by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    aggs: dict[str, tuple[str, Column | str]],
    salt: int = 16,
    salt_on: Column | str | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs`` maps output name → (fn, column) with fn in sum/count/min/max.
    ``salt_on`` is the expression hashed into the salt (default: the whole
    row via spark_partition_id + a per-row offset is NOT used — we hash the
    aggregated column so identical inputs salt identically and the op stays
    deterministic).
    """
    keys = [key] if isinstance(key, str) else list(key)
    first_col = next(iter(aggs.values()))[1]
    basis = salt_on if salt_on is not None else first_col
    basis = F.col(basis) if isinstance(basis, str) else basis
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(basis), F.lit(int(salt))))

    # F.count(c) for the partial keeps null-skipping semantics identical to
    # an unsalted groupBy().agg(count(c)); count(*) would silently count
    # nulls of the requested column.
    partial = salted.groupBy(*keys, "__salt").agg(
        *[getattr(F, fn)(c).alias(name) for name, (fn, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def broadcast_salted_join(
    big: DataFrame, small: DataFrame, key: str, salt: int = 16
) -> DataFrame:
    """Skewed equi-join: explode the (broadcast) small side across ``salt``
    replicas and salt the big side deterministically, so one hot key spreads
    over ``salt`` tasks instead of one straggler."""
    replicas = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    # Salt from the row's own payload columns — deterministic across
    # retries/repartitionings (monotonically_increasing_id is not: a retried
    # or re-planned task renumbers rows, so any downstream use of the salt —
    # or a speculative re-execution with side effects — would diverge).
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    out = salted_big.join(F.broadcast(replicas), [key, "__salt"])
    return out.drop("__salt")
