"""In-engine BPE merge training (functions/text.py:bpe_train_merges) —
hand-model pins: known merge sequence on a crafted corpus, the
canonical left-to-right run handling ('aaaa' → [aa, aa]), the
(count DESC, pair ASC) tiebreak, and U+001F stripping."""

from clickhouse_sinker_spark.functions.text import bpe_train_merges


def _corpus(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "text string")


def test_bpe_known_merges(spark):
    # 'abab' x3, 'ab' x2  →  merge 1: (a,b) count 3*2+2 = 8;
    # then words are [ab,ab]x3 + [ab]x2 → merge 2: (ab,ab) count 3
    df = _corpus(spark, ["abab abab abab ab ab"])
    got = [(r["rank"], r["l"], r["r"], r["c"])
           for r in bpe_train_merges(df, "text", 2).collect()]
    assert got == [(1, "a", "b", 8), (2, "ab", "ab", 3)]


def test_bpe_run_handling_left_to_right():
    # covered via Spark in test_bpe_known_merges; the run semantics pin:
    # 'aaaa' has 3 (a,a) pairs; after merging (a,a) left-to-right the
    # word is [aa, aa] so the next pair is (aa, aa) — NOT (a, aa)
    pass


def test_bpe_runs_and_tiebreak(spark):
    # 'aaaa': pairs (a,a) x3 → merge 1 (a,a); left-to-right merge gives
    # [aa, aa] → merge 2 is (aa, aa) with count 1
    df = _corpus(spark, ["aaaa"])
    got = [(r["rank"], r["l"], r["r"], r["c"])
           for r in bpe_train_merges(df, "text", 2).collect()]
    assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]
    # tie: 'xy' and 'pq' both count 2 → lexicographically smaller pair
    # ('p','q') wins
    df2 = _corpus(spark, ["xy pq xy pq"])
    got2 = [(r["l"], r["r"], r["c"])
            for r in bpe_train_merges(df2, "text", 1).collect()]
    assert got2 == [("p", "q", 2)]


def test_bpe_sample_fraction(spark):
    """sample_fraction trains on a deterministic content-hash Bernoulli
    sample: the same fraction selects the same documents on every run
    (no RNG), 1.0/None is exact full-corpus training, and out-of-range
    fractions refuse.  The 100 TB practice note lives in the docstring:
    exact BPE pays a full-corpus tokenize — web-scale training uses a
    sample."""
    import pytest

    from pyspark.sql import functions as F

    docs = [f"w{i} common common" for i in range(40)]
    df = _corpus(spark, docs)
    full = [(r["l"], r["r"]) for r in bpe_train_merges(df, "text", 1).collect()]
    assert full == [("c", "o")]  # 'common' dominates every sample
    s1 = bpe_train_merges(df, "text", 1, sample_fraction=0.5).collect()
    s2 = bpe_train_merges(df, "text", 1, sample_fraction=0.5).collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]  # deterministic
    # the sampled count is strictly below the full count (some docs
    # hashed out) but the dominant merge is unchanged
    assert s1[0]["l"] == "c" and s1[0]["r"] == "o"
    # (c,o) appears once per 'common' = 2 per document: 80 in full,
    # strictly fewer in the 0.5 hash-sample (deterministically so)
    assert s1[0]["c"] < 80 and s1[0]["c"] % 2 == 0 and s1[0]["c"] > 0
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            bpe_train_merges(df, "text", 1, sample_fraction=bad)


def test_bpe_separator_stripped(spark):
    # U+001F inside input words is stripped before wrapping (documented)
    df = _corpus(spark, ["a\x1fb a\x1fb"])
    got = [(r["l"], r["r"], r["c"])
           for r in bpe_train_merges(df, "text", 1).collect()]
    assert got == [("a", "b", 2)]


def _ref_bpe_encode(text: str, merges) -> list:
    """Independent classic BPE encoder (dict/list model, Sennrich §3.2):
    per word, start from characters and replay each merge in rank order
    as a left-to-right non-overlapping scan."""
    out = []
    for word in text.split():
        toks = list(word.replace("\x1f", ""))
        if not toks:
            continue
        for left, right in merges:
            i, new = 0, []
            while i < len(toks):
                if (i + 1 < len(toks) and toks[i] == left
                        and toks[i + 1] == right):
                    new.append(left + right)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            toks = new
        out.extend(toks)
    return out


def test_bpe_encode_matches_reference_model(spark):
    """bpe_encode_tokens (r11): the replace-chain encoder matches an
    independent per-word scan model on crafted cases — runs ('aaaa' →
    [aa, aa]), cross-word isolation (no merge straddles a space),
    merge-order sensitivity, and untouched characters."""
    from pyspark.sql import functions as F

    from clickhouse_sinker_spark.functions.text import bpe_encode_tokens

    merges = [("a", "b"), ("ab", "ab"), ("a", "a")]
    texts = [
        "abab abab ab",
        "aaaa baab",
        "xyz",
        "a b ab ba abab",
        "",
        "   ",
        "aaab abaa",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["t"] for r in
           df.select(bpe_encode_tokens("text", merges).alias("t")).collect()]
    for text, g in zip(texts, got):
        assert g == _ref_bpe_encode(text, merges), (text, g)


def test_bpe_encode_roundtrip_with_training(spark):
    """Encode with the merges the engine itself trained: every trained
    merge's concatenation appears as a token, and token counts shrink
    monotonically as merges apply (the packing-stage contract)."""
    from pyspark.sql import functions as F

    from clickhouse_sinker_spark.functions.text import (
        bpe_encode_tokens,
        bpe_train_merges,
    )

    corpus = ["abab abab abab ab ab", "abba baba", "aaaa"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    trained = [(r["l"], r["r"])
               for r in bpe_train_merges(df, "text", 3).collect()]
    assert trained[0] == ("a", "b")
    enc = df.select(
        F.size(bpe_encode_tokens("text", trained)).alias("n_bpe"),
        F.size(bpe_encode_tokens("text", [])).alias("n_chars"),
    ).collect()
    for r in enc:
        assert 0 < r["n_bpe"] <= r["n_chars"]
    # reference-model agreement on the engine-trained merges too
    got = [r["t"] for r in df.select(
        bpe_encode_tokens("text", trained).alias("t")).collect()]
    for text, g in zip(corpus, got):
        assert g == _ref_bpe_encode(text, trained), (text, trained, g)


def test_bpe_encode_is_pure_jvm(spark):
    """The encode plan carries no Python and no shuffle — one codegen'd
    projection stage."""
    from clickhouse_sinker_spark.functions.text import bpe_encode_tokens

    df = spark.createDataFrame([("abab ab",)], "text string")
    out = df.select(bpe_encode_tokens("text", [("a", "b")]).alias("t"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
