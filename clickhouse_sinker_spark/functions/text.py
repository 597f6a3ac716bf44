"""Text-analysis expression library (beyond-reference, LLM-data-pipeline
surface — BASELINE.json north star).

All pure column expressions (JVM-side, codegen'd): language-ID by stopword
evidence, quality features (length / punctuation / stopword ratios), token
counting, shingling for dedup.  Designed so that an ANSI-SQL oracle can
reproduce every output bit-exactly (integer counts, and doubles derived from
identical integer arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "char_ngrams",
    "word_shingles",
    "shingles_from_tokens",
    "token_count",
    "quality_features",
    "langid_expr",
    "STOPWORDS",
]

# Minimal per-language stopword evidence sets (public knowledge).  Matching is
# whole-word; scores are plain counts so any SQL engine reproduces them.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "los", "las", "una", "es"],
}


def token_count(col: Column | str) -> Column:
    """Whitespace token count. Empty/blank → 0."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+"))).cast("int")


def shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles from a pre-materialized ``array<string>`` token
    column.  IMPORTANT for scale: pass a real column, not a ``split(...)``
    expression — Spark does no common-subexpression elimination inside
    higher-order-function lambdas, so an inline split would be re-evaluated
    for every element_at (observed ~10× slowdown at sf0.1)."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    k = F.size(toks) - F.lit(n - 1)
    return F.when(
        k <= 0, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]),
            )
        )
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (for MinHash / Jaccard dedup).
    Convenience wrapper over :func:`shingles_from_tokens`; hot paths should
    materialize the token array first (see that function's scale note)."""
    c = F.col(col) if isinstance(col, str) else col
    return shingles_from_tokens(F.split(F.trim(c), r"\s+"), n)


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Character n-gram set as array<string> (SimHash / langid features)."""
    c = F.col(col) if isinstance(col, str) else col
    ln = F.length(c) - F.lit(n - 1)
    return F.when(ln <= 0, F.array(c)).otherwise(
        F.array_distinct(F.transform(F.sequence(F.lit(1), ln), lambda i: c.substr(i, F.lit(n))))
    )


def _word_occurrences(c: Column, word: str) -> Column:
    """Count whole-word occurrences of ``word`` as token-equality over a
    whitespace split — exact integer semantics any SQL engine mirrors with
    ``list_filter(split(text), t = word)``."""
    toks = F.split(F.trim(c), r"\s+")
    return F.size(F.filter(toks, lambda x: x == F.lit(word))).cast("int")


def langid_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-evidence counts (integer, oracle-exact)."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    return {
        lang: sum((_word_occurrences(lowered, w) for w in words), F.lit(0)).cast("int")
        for lang, words in STOPWORDS.items()
    }


def langid_expr(col: Column | str) -> Column:
    """Predicted language = argmax of stopword evidence, 'und' when no
    evidence.  Ties break by language-code order (deterministic, and
    reproducible in SQL with the same CASE chain)."""
    scores = langid_scores(col)
    langs = sorted(scores)  # de, en, es, fr — deterministic tie-break
    max_score = scores[langs[0]]
    for lang in langs[1:]:
        max_score = F.greatest(max_score, scores[lang])
    expr = F.lit("und")
    for lang in reversed(langs):
        expr = F.when(scores[lang] == max_score, F.lit(lang)).otherwise(expr)
    return F.when(max_score <= 0, F.lit("und")).otherwise(expr)


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring features over a text column — integer counts plus
    ratios computed as double divisions of those integers (bit-exact in any
    engine).  Keys: n_chars, n_tokens, n_punct, stopword_hits, punct_ratio,
    stopword_ratio, mean_token_len."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("bigint")
    n_tokens = token_count(c).cast("bigint")
    n_punct = (F.length(c) - F.length(F.regexp_replace(c, r"[\.,;:!\?]", ""))).cast("bigint")
    lowered = F.lower(c)
    stop_hits = sum(
        (_word_occurrences(lowered, w) for words in STOPWORDS.values() for w in words), F.lit(0)
    ).cast("bigint")
    nz = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    nzt = F.when(n_tokens > 0, n_tokens.cast("double")).otherwise(F.lit(1.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "stopword_hits": stop_hits,
        "punct_ratio": (n_punct.cast("double") / nz),
        "stopword_ratio": (stop_hits.cast("double") / nzt),
        "mean_token_len": (n_chars.cast("double") / nzt),
    }
