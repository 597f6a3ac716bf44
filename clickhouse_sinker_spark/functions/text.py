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
    "shingles_from_tokens_sql",
    "langid_scores_sql",
    "script_counts_sql",
    "langid_pred_sql",
    "positional_ngrams",
    "pii_patterns",
    "pii_scrub",
    "token_count",
    "chunk_spans",
    "quality_features",
    "langid_expr",
    "langid_scores",
    "langid_scores_from_tokens",
    "script_counts",
    "script_char_count",
    "bpe_pretokens",
    "bpe_train_merges",
    "textrank_keywords",
    "winnow_fingerprints",
    "winnow_fingerprints_tokens",
    "STOPWORDS",
    "SCRIPT_RANGES",
    "SCRIPT_LANGS",
    "BPE_PRETOKEN_RE",
]

# Per-language stopword evidence sets (public knowledge: high-frequency
# function words).  Matching is whole-word on lowered text; scores are plain
# integer counts so any SQL engine reproduces them.  This is heuristic
# "langid-lite" — calibrated for pipeline filtering, not a trained model.
STOPWORDS = {
    "ca": ["i", "de", "la", "el", "que", "en", "un", "per", "amb", "una",
           "és", "no", "els", "al", "les", "dels", "com", "més", "seu", "ha"],
    "cs": ["a", "se", "na", "je", "že", "o", "s", "z", "do", "i",
           "to", "k", "ve", "by", "ale", "jako", "za", "po", "co", "jsem"],
    "da": ["og", "i", "det", "at", "en", "den", "til", "er", "som", "på",
           "de", "med", "han", "af", "ikke", "der", "var", "om", "et", "men"],
    "de": ["der", "die", "und", "das", "ist", "den", "von", "zu", "mit", "sich",
           "des", "auf", "für", "nicht", "ein", "eine", "als", "auch", "es", "an"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "on", "are", "with", "as", "be", "at", "this", "have", "from", "not"],
    "es": ["el", "los", "las", "una", "es", "de", "que", "y", "en", "un",
           "del", "se", "no", "por", "con", "para", "su", "al", "lo", "como"],
    "fi": ["ja", "on", "ei", "se", "että", "hän", "oli", "mutta", "kun", "ne",
           "niin", "myös", "jos", "mitä", "tai", "hänen", "siitä", "joka",
           "kuin", "nyt"],
    "fr": ["le", "la", "et", "les", "des", "de", "du", "en", "un", "une",
           "est", "que", "qui", "dans", "pour", "sur", "pas", "au", "ce", "il"],
    "hu": ["a", "az", "és", "hogy", "nem", "is", "egy", "van", "de", "ha",
           "meg", "mint", "csak", "már", "el", "volt", "vagy", "ki", "még",
           "mert"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari",
           "dalam", "akan", "pada", "juga", "saya", "ke", "karena", "ada",
           "mereka", "sudah", "atau"],
    "it": ["il", "la", "di", "che", "e", "in", "un", "una", "per", "con",
           "del", "non", "si", "da", "come", "anche", "ma", "le", "dei", "nel"],
    "nl": ["de", "het", "een", "en", "van", "in", "is", "dat", "op", "te",
           "zijn", "met", "voor", "niet", "aan", "er", "om", "ook", "als", "bij"],
    "no": ["og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er",
           "som", "på", "de", "med", "han", "av", "ikke", "der", "så", "å"],
    "pl": ["i", "w", "nie", "na", "się", "z", "do", "to", "że", "jest",
           "po", "co", "jak", "ale", "za", "od", "przez", "tak", "czy", "być"],
    "pt": ["o", "a", "os", "as", "de", "que", "e", "em", "um", "uma",
           "do", "da", "não", "para", "com", "por", "se", "no", "na", "mais"],
    "ro": ["și", "de", "la", "a", "în", "o", "pe", "un", "cu", "ce",
           "este", "nu", "mai", "se", "din", "care", "sau", "dar", "sunt",
           "fost"],
    "sv": ["och", "att", "det", "som", "en", "på", "är", "av", "för", "med",
           "den", "till", "inte", "om", "han", "de", "ett", "har", "var", "vi"],
    "tr": ["bir", "ve", "bu", "da", "de", "için", "ile", "mi", "ne", "o",
           "ama", "gibi", "daha", "çok", "en", "ki", "ya", "olan", "olarak",
           "sonra"],
    "vi": ["của", "và", "là", "có", "được", "trong", "đã", "cho", "không",
           "người", "này", "những", "với", "các", "để", "một", "khi", "cũng",
           "như", "từ"],
}

# Unicode script blocks (BMP only — identical code-point semantics in Java
# regex and RE2) for charset-based language evidence on non-Latin scripts.
SCRIPT_RANGES: dict[str, list[tuple[int, int]]] = {
    "han": [(0x4E00, 0x9FFF)],
    "kana": [(0x3040, 0x309F), (0x30A0, 0x30FF)],
    "hangul": [(0xAC00, 0xD7AF)],
    "cyrillic": [(0x0400, 0x04FF)],
    "arabic": [(0x0600, 0x06FF)],
    "devanagari": [(0x0900, 0x097F)],
    "greek": [(0x0370, 0x03FF)],
    "hebrew": [(0x0590, 0x05FF)],
    "thai": [(0x0E00, 0x0E7F)],
}

# script → language, in DECISION ORDER: kana first (kana occurs only in
# Japanese, so any kana beats han dominance), then a fixed cascade — the
# same order must be mirrored in SQL oracles.
SCRIPT_LANGS: list[tuple[str, str]] = [
    ("kana", "ja"),
    ("han", "zh"),
    ("hangul", "ko"),
    ("cyrillic", "ru"),
    ("arabic", "ar"),
    ("devanagari", "hi"),
    ("greek", "el"),
    ("hebrew", "he"),
    ("thai", "th"),
]


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


def shingles_from_tokens_sql(toks_sql: str, n: int = 3) -> str:
    """Spark-SQL text form of :func:`shingles_from_tokens` — semantically
    identical expression, built as ONE string so the caller pays a single
    py4j round trip instead of ~20 (r13: Python-side query construction was
    ~half the bench wall; parity pinned by
    tests/test_operators.py::test_sql_expr_builders_match_column_forms).
    ``toks_sql`` must reference a MATERIALIZED token array column (same
    no-CSE-in-lambdas caveat as the Column form)."""
    elems = ", ".join(
        f"element_at({toks_sql}, CAST(i + {j + 1} AS INT))" for j in range(n)
    )
    return (
        f"CASE WHEN size({toks_sql}) - {n - 1} <= 0 "
        f"THEN array(concat_ws(' ', {toks_sql})) "
        f"ELSE array_distinct(transform(sequence(0, size({toks_sql}) - {n}), "
        f"i -> concat_ws(' ', {elems}))) END"
    )


def langid_scores_sql(toks_sql: str) -> dict[str, str]:
    """Spark-SQL text form of :func:`langid_scores_from_tokens` (one string
    per language; same stopword tables, parity test-pinned)."""
    out = {}
    for lang, words in STOPWORDS.items():
        lst = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
        out[lang] = f"CAST(size(filter({toks_sql}, t -> t IN ({lst}))) AS INT)"
    return out


def script_counts_sql(text_sql: str) -> dict[str, str]:
    """Spark-SQL text form of :func:`script_counts` — the regex classes embed
    the same literal BMP code points as the Column form."""
    out = {}
    for s, ranges in SCRIPT_RANGES.items():
        cls = "".join(f"{chr(lo)}-{chr(hi)}" for lo, hi in ranges)
        out[s] = (
            f"CAST(length({text_sql}) - "
            f"length(regexp_replace({text_sql}, '[{cls}]', '')) AS INT)"
        )
    return out


def langid_pred_sql(
    scores: dict[str, str], sc: dict[str, str], n_chars_sql: str
) -> str:
    """Spark-SQL text form of :func:`langid_pred` — the same two-stage
    decision tree generated as one CASE expression (first-match-wins CASE ≡
    the Column form's reversed when/otherwise fold)."""
    langs = sorted(scores)
    mx = "GREATEST(" + ", ".join(scores[l] for l in langs) + ")"
    stop_whens = " ".join(f"WHEN {scores[l]} = {mx} THEN '{l}'" for l in langs)
    stop_pred = (
        f"CASE WHEN {mx} <= 0 THEN 'und' "
        f"ELSE CASE {stop_whens} ELSE 'und' END END"
    )
    total = "(" + " + ".join(sc[s] for s in SCRIPT_RANGES) + ")"
    cascade = [(s, l) for s, l in SCRIPT_LANGS if s != "kana"]
    whens = []
    for i, (s, lang) in enumerate(cascade):
        rest = [sc[s2] for s2, _ in cascade[i + 1 :]]
        if not rest:
            cond = f"{sc[s]} > -1"
        elif len(rest) == 1:
            cond = f"{sc[s]} >= {rest[0]}"
        else:
            cond = f"{sc[s]} >= GREATEST({', '.join(rest)})"
        whens.append(f"WHEN {cond} THEN '{lang}'")
    script_pred = (
        f"CASE WHEN {sc['kana']} > 0 THEN 'ja' "
        f"ELSE CASE {' '.join(whens)} ELSE 'und' END END"
    )
    return (
        f"CASE WHEN {total} > 0 AND {total} * 5 >= {n_chars_sql} "
        f"THEN {script_pred} ELSE {stop_pred} END"
    )


def positional_ngrams(toks: Column | str, n: int = 2) -> Column:
    """Word n-grams WITH repeats (positional, not the distinct shingle set)
    — the unit for repetition-quality stats (Gopher-style "fraction of
    characters in the most common n-gram" rules count every occurrence).
    Fewer than ``n`` tokens → empty array.  Same no-CSE-in-lambdas caveat
    as :func:`shingles_from_tokens`: pass a materialized token column."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    k = F.size(toks) - F.lit(n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


# PII patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, and \b word boundaries
# only — no lookaround, no backreferences.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "longnum": r"\b\d{9,}\b",  # id/phone/account-shaped digit runs
}


def pii_patterns() -> dict[str, str]:
    """The engine-portable PII regex set (email / IPv4 / long digit run)."""
    return dict(PII_PATTERNS)


def pii_scrub(col: Column | str) -> dict[str, Column]:
    """PII detection + redaction as pure column expressions: per-category
    match counts on the original text plus a ``scrubbed`` column with each
    match replaced by its ``[CATEGORY]`` tag.  Redaction order is fixed
    (email → ipv4 → longnum) so nested-ish matches resolve identically on
    every engine.  Map-side only — no shuffle, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    scrubbed = c
    for name, pat in PII_PATTERNS.items():
        out[f"n_{name}"] = F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("bigint")
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{name.upper()}]")
    out["scrubbed"] = scrubbed
    return out


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


def langid_scores_from_tokens(toks: Column | str) -> dict[str, Column]:
    """Per-language stopword-evidence counts from a PRE-MATERIALIZED
    lowered token array column.  At 19 languages this matters a lot: Spark
    does no CSE across higher-order-function lambdas, so the inline-split
    form re-tokenizes the text once per language (19 full splits per row,
    measured 0.57 s → 1.6 s at sf0.1 when the language set grew); a
    materialized token column is split once and filtered 19 times."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(words))).cast("int")
        for lang, words in STOPWORDS.items()
    }


def langid_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-evidence counts (integer, oracle-exact):
    number of tokens (with multiplicity) that are in the language's
    stopword set.  Convenience inline-split form — hot paths should
    materialize the token array and use
    :func:`langid_scores_from_tokens` (see its scale note)."""
    c = F.col(col) if isinstance(col, str) else col
    return langid_scores_from_tokens(F.split(F.trim(F.lower(c)), r"\s+"))


def script_char_count(col: Column | str, script: str) -> Column:
    """Characters of a Unicode script block in the text (integer): length
    minus length-after-removing-the-block — mirrored in SQL with
    ``length(t) - length(regexp_replace(t, '[\\x{LO}-\\x{HI}]', '', 'g'))``."""
    c = F.col(col) if isinstance(col, str) else col
    cls = "".join(f"{chr(lo)}-{chr(hi)}" for lo, hi in SCRIPT_RANGES[script])
    return (F.length(c) - F.length(F.regexp_replace(c, f"[{cls}]", ""))).cast("int")


def script_counts(col: Column | str) -> dict[str, Column]:
    """Per-script character counts for every block in SCRIPT_RANGES."""
    return {s: script_char_count(col, s) for s in SCRIPT_RANGES}


def langid_pred(
    scores: dict[str, Column], sc: dict[str, Column], n_chars: Column
) -> Column:
    """Predicted language from PRECOMPUTED evidence columns, two-stage
    heuristic (integer-only decisions so a SQL oracle reproduces every
    branch bit-exactly):

    1. Script stage: if non-Latin script chars are ≥20% of the text
       (``5 * total_script >= n_chars``), assign by the SCRIPT_LANGS
       cascade — kana→ja first (kana is Japanese-only evidence), then
       each script claims the doc when its count beats the remaining
       scripts' maximum.
    2. Stopword stage: argmax of per-language stopword token counts,
       lexicographic language-code tie-break, 'und' on zero evidence.

    SCALE NOTE: pass evidence as materialized COLUMNS (a first select
    computing scores/counts, a second computing the pred from those
    columns) — Spark performs no common-subexpression elimination across
    expressions containing higher-order functions, so inlining the
    evidence into this CASE tree re-evaluates every tokens pass
    repeatedly (measured 1.1-1.5s → 0.75s at sf0.1).  Catalyst keeps the
    two selects separate because the aliases are multiply-referenced.
    """
    langs = sorted(scores)
    max_score = scores[langs[0]]
    for lang in langs[1:]:
        max_score = F.greatest(max_score, scores[lang])
    stop_pred = F.lit("und")
    for lang in reversed(langs):
        stop_pred = F.when(scores[lang] == max_score, F.lit(lang)).otherwise(stop_pred)
    stop_pred = F.when(max_score <= 0, F.lit("und")).otherwise(stop_pred)

    total_script = sum((sc[s] for s in SCRIPT_RANGES), F.lit(0))
    # cascade: kana>0 → ja; else each script wins when it beats the max of
    # the scripts after it in the fixed order
    script_pred = F.lit("und")
    cascade = [(s, l) for s, l in SCRIPT_LANGS if s != "kana"]
    for i in range(len(cascade) - 1, -1, -1):
        s, lang = cascade[i]
        rest = [sc[s2] for s2, _ in cascade[i + 1 :]]
        if not rest:
            cond = sc[s] > F.lit(-1)  # last in cascade: always true
        elif len(rest) == 1:
            cond = sc[s] >= rest[0]
        else:
            cond = sc[s] >= F.greatest(*rest)
        script_pred = F.when(cond, F.lit(lang)).otherwise(script_pred)
    script_pred = F.when(sc["kana"] > 0, F.lit("ja")).otherwise(script_pred)

    return F.when(
        (total_script > 0) & (total_script * 5 >= n_chars), script_pred
    ).otherwise(stop_pred)


def langid_expr(col: Column | str) -> Column:
    """One-expression convenience form of :func:`langid_pred` (evidence
    inlined — fine for ad-hoc use; hot paths should materialize the
    evidence columns first, see langid_pred's scale note)."""
    c = F.col(col) if isinstance(col, str) else col
    return langid_pred(langid_scores(c), script_counts(c), F.length(c))


# GPT-2-style pre-tokenizer split pattern, restricted to the syntax subset
# shared by Java regex (Spark) and RE2 (DuckDB/ClickHouse): no lookahead, so
# the original pattern's `\s+(?!\S)` trailing-space rule is dropped — a
# space run before a word attaches to the word (` ?\p{L}+`), other space
# runs become their own tokens.  Both engines use leftmost-FIRST alternation
# (RE2's default mode), so alternative order is semantic: contractions
# before letter runs.  Known (accepted) engine delta: Java's `\s` includes
# \x0B, RE2's does not — vertical tabs don't occur in the corpus.
BPE_PRETOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_pretokens(col: Column | str) -> Column:
    """BPE-ish sub-word pre-tokenization (the merge-free first stage every
    BPE tokenizer runs): split text into contraction / letter-run /
    digit-run / punctuation-run / whitespace pieces with one
    ``regexp_extract_all`` pass.  Pure column expression — JVM-side, no
    UDF; the pattern is RE2-compatible so a SQL oracle reproduces the
    exact token sequence."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.coalesce(c, F.lit("")), F.lit(BPE_PRETOKEN_RE), F.lit(0))


def bind_once(expr: Column, fn) -> Column:
    """Let-binding for column expressions: evaluate ``expr`` ONCE and hand
    it to ``fn`` as a higher-order-function lambda variable.  Spark does no
    common-subexpression elimination inside HOF lambdas, so an expensive
    expression referenced in a lambda body is re-evaluated per element —
    wrapping it in a one-element array and accessing it through a
    ``transform`` variable forces single evaluation (the same fix class as
    the minhash base-hash hoist in ``hashing.minhash_signature``)."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def _window_minima(hashes: Column, w: int) -> Column:
    """Distinct sliding-window-of-``w`` minima over a positional hash
    array, with the hash array LET-BOUND so it is computed once per row —
    inlining it into the per-window lambda re-hashed every gram at every
    window position (O(len²) instead of O(len·w); measured minutes-vs-
    seconds on the sf0.1 corpus)."""

    def wins(hs: Column) -> Column:
        m = F.size(hs) - F.lit(w - 1)
        return F.when(m <= 0, F.array(F.array_min(hs))).otherwise(
            F.transform(
                F.sequence(F.lit(1), m), lambda j: F.array_min(F.slice(hs, j, w))
            )
        )

    return F.array_distinct(bind_once(hashes, wins))


def winnow_fingerprints(col: Column | str, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    local fingerprinting algorithm — public, SIGMOD'03): hash every char
    ``k``-gram, slide a window of ``w`` consecutive hashes, keep the
    minimum of each window, return the DISTINCT selected hashes as
    ``array<bigint>``.  Guarantees: any shared substring of length
    ``k + w - 1`` between two documents yields at least one shared
    fingerprint, so matching on fingerprint overlap finds local (partial)
    duplication that whole-document hashing misses.

    Built on :func:`~..functions.hashing.md5_hash60` so DuckDB recomputes
    identical hashes.  All array ops are codegen'd higher-order functions —
    map-side only, O(len·w) per row, no shuffle.  Texts shorter than ``k``
    hash as a single gram; fewer than ``w`` grams collapse to one window.
    """
    from .hashing import md5_hash60

    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    n = F.length(c) - F.lit(k - 1)
    grams = F.when(n <= 0, F.array(c)).otherwise(
        F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k)))
    )
    return _window_minima(F.transform(grams, md5_hash60), w)


def winnow_fingerprints_tokens(toks: Column, n: int = 4, w: int = 4) -> Column:
    """Word-level winnowing: positional ``n``-word shingle hashes (NOT
    distinct — winnowing needs the positional sequence), window-of-``w``
    minima, distinct selection.  Far more selective than char-gram
    winnowing on natural text (shingle collisions across unrelated docs
    are rare), which is what makes the fingerprint-bucket join small:
    measured on the sf0.01 corpus, char-5-grams put the average
    fingerprint in 45 docs; word-4-grams in 1.06.  Guarantee: any shared
    run of ``n + w - 1`` consecutive words yields a shared fingerprint.

    ``toks`` must be a materialized ``array<string>`` column (see
    :func:`shingles_from_tokens` for the no-CSE-in-lambdas scale note).
    """
    from .hashing import md5_hash60

    k = F.size(toks) - F.lit(n - 1)
    grams = F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
            ),
        )
    )
    return _window_minima(F.transform(grams, md5_hash60), w)


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring features over a text column — integer counts plus
    ratios computed as double divisions of those integers (bit-exact in any
    engine).  Keys: n_chars, n_tokens, n_punct, stopword_hits, punct_ratio,
    stopword_ratio, mean_token_len."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("bigint")
    n_tokens = token_count(c).cast("bigint")
    n_punct = (F.length(c) - F.length(F.regexp_replace(c, r"[\.,;:!\?]", ""))).cast("bigint")
    union = sorted({w for ws in STOPWORDS.values() for w in ws})
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(union))).cast("bigint")
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


def chunk_spans(toks: Column | str, chunk: int = 128, overlap: int = 16) -> Column:
    """Fixed-size token-window chunking with overlap — the standard
    pretraining-data segmentation (long document → ``chunk``-token windows
    advancing by ``chunk - overlap``).  Returns
    ``array<struct<start int, text string, n_tokens int>>`` (``start`` is
    the 0-based token offset; empty/blank input → empty array).

    Pass a MATERIALIZED token-array column (the ``shingles_from_tokens``
    no-CSE rule): each window slices the same array, so an inline
    ``split()`` would re-tokenize per window.  Pure column expressions —
    per row O(n_tokens), no shuffle, no Python; at 100 TB the downstream
    ``posexplode`` is a Generate inside the same stage."""
    if overlap >= chunk:
        raise ValueError(f"overlap {overlap} must be < chunk {chunk}")
    toks = F.col(toks) if isinstance(toks, str) else toks
    stride = chunk - overlap
    # coalesce: size(NULL) is NULL, which would fall past the <= 0 guard
    # and fabricate one phantom chunk for NULL-text rows
    n = F.coalesce(F.size(toks), F.lit(0))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return F.when(n <= 0, F.array().cast(
        "array<struct<start:int,text:string,n_tokens:int>>"
    )).otherwise(
        F.transform(
            starts,
            lambda s: F.struct(
                s.cast("int").alias("start"),
                F.concat_ws(" ", F.slice(toks, s + 1, chunk)).alias("text"),
                F.least(F.lit(chunk), n - s).cast("int").alias("n_tokens"),
            ),
        )
    )


def bpe_encode_tokens(col: Column | str, merges: list[tuple[str, str]],
                      ) -> Column:
    """APPLY a trained BPE merge list (r11 — the encode half of the
    ``bpe_train_merges`` pair; Sennrich et al. 2016 §3.2: replay the
    merges in TRAINING ORDER, each as a left-to-right non-overlapping
    replacement of every occurrence).  Returns ``array<string>`` of the
    document's BPE tokens — the real token count a packing/chunking
    stage needs (whitespace counts under-estimate code and non-Latin
    text badly).

    Same representation trick as training: every word's characters are
    wrapped ``\\x1F c \\x1F``, so one merge is one plain ``replace()``
    of ``\\x1F l \\x1F\\x1F r \\x1F`` → ``\\x1F lr \\x1F`` — and because
    words are joined with a bare space (never wrapped), a pattern can
    never straddle a word boundary, so the whole DOCUMENT encodes with
    a single replace chain instead of a per-word loop.  Pure JVM column
    expressions end-to-end (zero Python, no shuffle): per row
    O(n_merges · doc_len).  The expression tree grows linearly with the
    merge count — the right shape for the few-hundred-merge tokenizers
    this engine trains in-engine; a production 32k-merge vocabulary
    would ride one Arrow-batched UDF with the merge table broadcast
    instead (same semantics, different carrier), which is deliberately
    NOT built here: a 32k-deep replace chain is the wrong plan and a
    silent fallback would hide that.

    ``merges`` is [(l, r), …] in rank order — collect it from
    ``bpe_train_merges`` (k×2 control-plane strings, like the k-means
    centroid collects)."""
    sep = "\x1f"
    c = F.col(col) if isinstance(col, str) else col
    words = F.filter(F.split(c, r"\s+"), lambda w: F.length(w) > 0)
    wrapped_words = F.transform(
        words,
        lambda w: F.regexp_replace(
            F.regexp_replace(w, sep, ""), "(.)", sep + "$1" + sep),
    )
    doc = F.concat_ws(" ", wrapped_words)
    for left, right in merges:
        pat = sep + left + sep + sep + right + sep
        rep = sep + left + right + sep
        doc = F.replace(doc, F.lit(pat), F.lit(rep))
    toks = F.flatten(
        F.transform(
            F.split(doc, " "),
            lambda w: F.filter(
                F.split(F.regexp_replace(w, sep + sep, sep), sep),
                lambda t: F.length(t) > 0,
            ),
        )
    )
    return F.when(F.coalesce(F.length(F.trim(c)), F.lit(0)) == 0,
                  F.array().cast("array<string>")).otherwise(toks)


def bpe_train_merges(df, text_col: str = "text", n_merges: int = 5,
                     sample_fraction: float | None = None):
    """Learn the top-N byte-pair-encoding merges from a corpus IN-ENGINE
    (Sennrich et al. 2016: repeatedly merge the most frequent adjacent
    token pair) — the tokenizer-training step of an LLM data pipeline,
    run as N pair-count aggregations over the word-frequency table.

    Representation: each word is wrapped as ``\\x1F t \\x1F`` per token
    (``\\x1Fa\\x1F\\x1Fb\\x1F…``), so applying a merge is a plain
    left-to-right non-overlapping string ``replace()`` — the SAME
    primitive DuckDB's replace() implements, giving the unrolled
    relational oracle bit parity, including the canonical BPE handling
    of runs ('aaa' merges to [aa, a]).  U+001F cannot collide: it is
    stripped from input words first (documented).  Ties break
    deterministically by (count DESC, left ASC, right ASC).

    Scale: the word-frequency table (one shuffle over the corpus,
    cached) is tiny relative to the corpus — Zipf's law — and each
    merge iteration is one pair-count aggregation over it plus a 1-ROW
    argmax collect (control plane, like kmeans_lloyd's seeds).  At
    100 TB the corpus is touched ONCE; iterations run on the vocabulary.

    **BPE at 100 TB trains on a SAMPLE.**  Even with the vocabulary-
    table optimization above, exact BPE still pays one full-corpus
    tokenize+shuffle to build that table, and the distinct-word
    vocabulary of a web-scale corpus (typos, URLs, numbers) itself
    grows with Heaps' law into the billions — while merge statistics
    converge after a tiny fraction of the data (this is how practical
    tokenizers — GPT-2's BPE, SentencePiece — are trained: on corpus
    samples of a few GB).  Pass ``sample_fraction`` to train on a
    DETERMINISTIC content-hash Bernoulli sample of the documents
    (xxhash64(text) bucket < fraction — reproducible across runs and
    cluster sizes, no RNG): the scan prunes before the tokenize
    explode, so cost scales with the fraction.  None/1.0 = exact
    full-corpus training (fine at test scale; deliberate at 100 TB).

    Returns a DataFrame (rank, l, r, c) of the merges in order.
    """
    if sample_fraction is not None and not 0.0 < sample_fraction <= 1.0:
        raise ValueError("sample_fraction must be in (0, 1]")
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.filter(
            F.pmod(F.xxhash64(F.col(text_col)), F.lit(1_000_000))
            < int(sample_fraction * 1_000_000)
        )
    sep = "\x1f"
    words = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .select(F.regexp_replace("w", sep, "").alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    base = words.select(
        F.regexp_replace(F.col("w"), "(.)", sep + "$1" + sep).alias("s"),
        "cnt",
    ).persist()
    cur = base
    spark = df.sparkSession
    merges = []
    try:
        for k in range(n_merges):
            toks = F.split(
                F.expr("substr(s, 2, length(s) - 2)"), sep + sep
            )
            pairs = (
                cur.select("cnt", toks.alias("t"))
                .filter(F.size("t") > 1)  # guards sequence() auto-descent
                .select(
                    "cnt",
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(t) - 1), __i ->"
                            " struct(element_at(t, __i) AS l,"
                            " element_at(t, __i + 1) AS r))"
                        )
                    ).alias("p"),
                )
            )
            best = (
                pairs.groupBy("p.l", "p.r")
                .agg(F.sum("cnt").alias("c"))
                .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(1)
                .collect()
            )
            if not best:
                break
            b = best[0]
            merges.append((k + 1, b["l"], b["r"], int(b["c"])))
            pat = sep + b["l"] + sep + sep + b["r"] + sep
            rep = sep + b["l"] + b["r"] + sep
            cur = cur.select(
                F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s"),
                "cnt",
            )
    finally:
        base.unpersist()
    return spark.createDataFrame(
        merges, "rank int, l string, r string, c bigint"
    )


def textrank_keywords(df, text_col: str = "text", iterations: int = 3, top_k: int = 20):
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — PageRank
    over the word co-occurrence graph (adjacent-token edges, both
    directions, weighted by corpus count), the classic unsupervised
    corpus-keyword scorer for a training-data pipeline.

    EXACT fixed-point arithmetic: ranks live in integer micro-units
    (1.0 = 1_000_000) and each contribution is the integer floor
    division ``(pr·w·85) DIV (wdeg·100)`` — the TextRank damping 0.85
    with NO floating point anywhere, so the unrolled relational oracle
    reproduces every score bit-exactly (floor truncation of the tail is
    the documented fixed-point semantics; all quantities positive, so
    Spark's truncating DIV == DuckDB's flooring //).  TextRank's
    original un-normalized form: pr' = (1−d) + d·Σ pr(u)·w(u,v)/wdeg(u),
    dangling words keep the base 150_000.

    Scale: pairs come from per-document array transforms (ZERO shuffle
    before the edge groupBy); each of the K iterations is one join +
    one aggregation on (src/dst) keys — the standard relational
    PageRank; edges/degrees are cached once.  No driver-side collect.
    """
    arr = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: F.length(x) > 0
    )
    pairs = (
        df.select(arr.alias("t"))
        .filter(F.size("t") > 1)  # guards sequence() auto-descent
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), __i ->"
                    " struct(element_at(t, __i) AS src,"
                    " element_at(t, __i + 1) AS dst))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .filter(F.col("src") != F.col("dst"))
    )
    edges = (
        pairs.union(pairs.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .persist()
    )
    nodes = (
        df.select(F.explode(arr).alias("word")).distinct().persist()
    )
    deg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    pr = nodes.select("word", F.lit(1000000).cast("bigint").alias("pr"))
    for _ in range(iterations):
        contrib = (
            edges.join(pr, edges["src"] == pr["word"])
            .join(deg, "src")
            .select(
                F.col("dst"),
                F.expr("(pr * w * 85) DIV (wdeg * 100)").alias("c"),
            )
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        pr = (
            nodes.join(summed, nodes["word"] == summed["dst"], "left")
            .select(
                "word",
                (F.lit(150000) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("bigint")
                .alias("pr"),
            )
        )
    out = (
        pr.orderBy(F.col("pr").desc(), F.col("word").asc())
        .limit(top_k)
        .select("word", F.col("pr").alias("score"))
    )
    return out
