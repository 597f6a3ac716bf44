"""Hashing, sharding, and sketch primitives.

Sharding policies re-express task/sharding.go:61-118 and the
ReplacingMergeTree sorting-key policy (output/clickhouse.go:724-799):

- stripe:   numeric key → ``(value / stripe) % shards``
- hash:     string key  → ``xxhash64(value) % shards`` (Spark has native
            xxhash64 — same family the reference uses via cespare/xxhash)
- sortingkey: ``xxhash64(concat_ws('.', keys...)) % shards`` persisted in a
  ``__shardingkey`` column so duplicates co-locate (dedup stays shuffle-local).

Sketches (beyond-reference, LLM-data-pipeline surface):

- ``minhash_signature``: k permutation-hashes over a shingle set, built on
  xxhash64 with per-permutation seeds — all JVM-side (no UDF).
- ``simhash64``: 64-bit SimHash over token hashes via bit-vote aggregation
  expressed with higher-order array functions.
- ``fingerprint_md5``: deterministic document fingerprint (md5 exists in
  both Spark and ANSI-SQL engines, so it is oracle-checkable).

At 100 TB scale these matter because they are pure column expressions:
map-side, codegen'd, no shuffle until the explicit groupBy/join that
consumes them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "shard_stripe",
    "shard_hash",
    "shard_knuth",
    "sorting_key_shard",
    "minhash_signature",
    "minhash_signature_sql",
    "simhash64",
    "simhash60_md5",
    "md5_hash60",
    "fingerprint_md5",
]

_MERSENNE = (1 << 61) - 1  # prime modulus for permutation hashing


def shard_stripe(col: Column | str, stripe: int, shards: int) -> Column:
    """Stripe policy (task/sharding.go:61-103): ``(uint64(v)/stripe)%shards``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod((c.cast("bigint") / F.lit(int(stripe))).cast("bigint"), F.lit(int(shards))).cast("int")


def shard_hash(col: Column | str, shards: int) -> Column:
    """Hash policy (task/sharding.go:104-117): ``xxhash64(v) % shards``.
    Same hash FAMILY as the reference (XXH64) but Spark's builtin seeds
    with 42 where cespare/xxhash seeds 0, so shard PLACEMENT differs from
    a reference deployment — the contract here is deterministic balanced
    routing within this engine (JVM-side, codegen'd), not bit parity.
    CH-exact seed-0 values exist in the dialect layer
    (functions/chudfs.py ch_xxhash64_ch) for queries that need them."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(int(shards))).cast("int")


def shard_knuth(col: Column | str, shards: int) -> Column:
    """Multiplicative (Knuth) hash shard for numeric keys — used where an
    external ANSI-SQL oracle must reproduce the routing exactly (xxhash64 is
    Spark/ClickHouse-specific).  ``(((v % 2^31) * 2654435761) % 2^31) %
    shards``.  The key is reduced mod 2^31 BEFORE the multiply so the
    product stays within signed 64-bit for EVERY bigint key: without the
    reduction, v ≥ ~3.47e9 overflows — Spark wraps silently (a different
    bucket than true integer math) while an ANSI engine raises, so the
    routing would diverge between engines exactly at the id ranges a
    100 TB corpus reaches.  The reduction here is ``pmod`` (always
    nonnegative); the paired SQL oracles spell it
    ``(v % 2^31 + 2^31) % 2^31`` because ANSI ``%`` keeps the sign —
    a bare ``v % 2^31`` would diverge for NEGATIVE keys (DuckDB -5 →
    bucket -17 while pmod gives 2^31-5 → bucket 31; found in the r12
    self-review, pinned incl. negatives in
    tests/test_operators.py::test_shard_knuth_large_id_no_overflow).
    The Knuth mix only ever keeps the low 31 bits, so pre-reducing
    loses nothing for ids below 2^31 (bit-identical buckets) and stays
    a well-mixed deterministic hash everywhere else."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.pmod(c.cast("bigint"), F.lit(2**31))
    return F.pmod(F.pmod(low * F.lit(2654435761), F.lit(2**31)), F.lit(int(shards))).cast("int")


def sorting_key_shard(cols: list[Column | str], shards: int) -> Column:
    """ReplacingMergeTree sorting-key sharding (output/clickhouse.go:724-799,
    task/task.go:274-282): hash the concatenated sorting-key values so that
    duplicate logical rows land on the same shard.  The result is the
    ``__shardingkey`` column the reference persists."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.xxhash64(F.concat_ws(".", *[c.cast("string") for c in cs])), F.lit(int(shards))).cast("int")


def minhash_signature(shingles: Column | str, num_perm: int = 64) -> Column:
    """MinHash signature (array<bigint> of length ``num_perm``) over an
    ``array<string>`` shingle column.

    Carter-Wegman construction: two base hashes per shingle
    (``h1 = xxhash64(s)``, ``h2 = xxhash64(s, 1)``), permutation i is
    ``(h1' + i·h2') mod M`` with M = 2^31-1 (h' = h mod M, so the widest
    intermediate is < 2^38 — no overflow even under ANSI).  One
    ``aggregate`` pass keeps the running 64-slot minimum via ``zip_with
    least`` — 2 hashes + 64 cheap ops per shingle instead of 64 hashes
    and 64 array traversals.  Map-side only; zero shuffle at any scale.
    Empty shingle sets yield M sentinels (never match anything).
    """
    c = F.col(shingles) if isinstance(shingles, str) else shingles
    m = (1 << 31) - 1

    # Spark performs NO common-subexpression elimination inside
    # higher-order-function lambdas, so the base hashes must be
    # materialized in their own transform() pass — inlining h1/h2 into the
    # 64-entry permutation array would recompute xxhash64 per entry
    # (128 hashes per shingle instead of 2; measured ~2× on the LSH bench).
    hashed = F.transform(
        c,
        lambda s: F.struct(
            F.pmod(F.xxhash64(s), F.lit(m)).alias("h1"),
            (F.pmod(F.xxhash64(s, F.lit(1)), F.lit(m)) + F.lit(1)).alias("h2"),  # h2≠0
        ),
    )

    def candidates(p: Column) -> Column:
        return F.array(
            *[F.pmod(p["h1"] + F.lit(i) * p["h2"], F.lit(m)) for i in range(num_perm)]
        )

    return F.aggregate(
        hashed,
        F.array_repeat(F.lit(m).cast("long"), num_perm),
        lambda acc, p: F.zip_with(acc, candidates(p), lambda a, b: F.least(a, b)),
    )


def minhash_signature_sql(shingles_sql: str, num_perm: int = 64) -> str:
    """Spark-SQL text form of :func:`minhash_signature` — the identical
    Carter-Wegman construction emitted as ONE expression string, so building
    the plan costs a single py4j round trip instead of ~300 (r13:
    Python-side construction was ~half the bench wall; parity pinned by
    tests/test_operators.py::test_sql_expr_builders_match_column_forms)."""
    m = (1 << 31) - 1
    cands = ", ".join(f"pmod(p.h1 + {i} * p.h2, {m})" for i in range(num_perm))
    return (
        f"aggregate("
        f"transform({shingles_sql}, s -> named_struct("
        f"'h1', pmod(xxhash64(s), {m}), 'h2', pmod(xxhash64(s, 1), {m}) + 1)), "
        f"array_repeat(CAST({m} AS BIGINT), {num_perm}), "
        f"(acc, p) -> zip_with(acc, array({cands}), (a, b) -> least(a, b)))"
    )


def simhash64(tokens: Column | str) -> Column:
    """64-bit SimHash over an ``array<string>`` token column.

    Classic Charikar construction: each token votes ±1 on each of 64 bit
    positions according to its 64-bit hash; the final hash sets bit j iff
    the vote sum is positive.  Expressed entirely with ``transform`` /
    ``aggregate`` over a 64-slot vote array — JVM-side, no UDF.
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    hashes = F.transform(c, lambda t: F.xxhash64(t))
    # votes[j] = sum over tokens of (bit j set ? +1 : -1); bit positions are
    # unrolled in Python so shift amounts are literals (codegen-friendly).
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                    .otherwise(F.lit(-1))
                    .cast("long")
                    for j in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    # fold votes into one long: OR of 2^j where votes[j] > 0 (bit 63 is the
    # sign bit — OR-fold avoids ANSI overflow that a sum would hit).
    powers = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]
    bits = F.zip_with(
        votes,
        F.array(*[F.lit(p).cast("long") for p in powers]),
        lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a.bitwiseOR(b))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def md5_hash60(col: Column) -> Column:
    """60-bit token hash from the first 15 hex chars of md5 — the one hash
    construction that is bit-identical in Spark, DuckDB and ClickHouse
    (``conv(substr(md5(x),1,15),16,10)`` ≡ ``('0x'||substr(md5(x),1,15))::
    BIGINT``), so sketches built on it are cross-engine oracle-checkable.
    15 hex chars keep the value < 2^60: always positive in a signed int64,
    no overflow under ANSI.  Use xxhash64 variants for production speed;
    use this where an external SQL engine must reproduce the bits."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def simhash60_md5(tokens: Column | str) -> Column:
    """60-bit SimHash over an ``array<string>`` token column, built on
    ``md5_hash60`` so an ANSI-SQL oracle can recompute the exact sketch
    (unlike ``simhash64``, whose xxhash64 exists only engine-side).

    Same Charikar bit-vote construction as ``simhash64``; 60 bits means all
    powers are positive, so the fold is a plain sum — no sign-bit OR trick
    needed.  Banding pairs with 4 × 15-bit chunks."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    hashes = F.transform(c, md5_hash60)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 60),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                    .otherwise(F.lit(-1))
                    .cast("long")
                    for j in range(60)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    bits = F.zip_with(
        votes,
        F.array(*[F.lit(1 << j).cast("long") for j in range(60)]),
        lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a.bitwiseOR(b))


def fingerprint_md5(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 hex of the column value.
    md5() is available in Spark, DuckDB, ClickHouse — oracle-checkable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))
