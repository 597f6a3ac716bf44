"""Arrow-UDF scalar tier (functions/chudfs.py): known-vector pins,
round-trip properties, DuckDB cross-checks (an INDEPENDENT C++
implementation of the same published algorithms), and Spark-side
registration / NULL-propagation behavior."""
import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_sinker_spark.functions.chudfs import (
    _b32_decode,
    _b32_encode,
    _b58_decode,
    _b58_encode,
    _damerau,
    _jaro,
    _jaro_winkler,
    _levenshtein_seq,
    _puny_decode,
    _puny_encode,
)

ASCII = st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=24)


def test_base58_known_vectors():
    # draft-msporny-base58 test vectors (public IETF draft)
    assert _b58_encode("Hello World!") == "2NEpo7TZRRrLZSi2U"
    assert (
        _b58_encode("The quick brown fox jumps over the lazy dog.")
        == "USm3fpXnKG5EUBx2ndxBDMPVciP5hGey2Jh4NDv6gmeo1LkMeiKrLJUUBk6Z"
    )
    # leading zero BYTES map to '1' each (Bitcoin convention)
    assert _b58_encode("\x00\x00abc") == "11ZiCa"
    assert _b58_decode("11ZiCa") == "\x00\x00abc"
    with pytest.raises(ValueError, match="invalid base58"):
        _b58_decode("0OIl")  # the four excluded characters


def test_base32_punycode_pins():
    assert _b32_encode("hi") == "NBUQ===="
    assert _b32_decode("NBUQ====") == "hi"
    # RFC 3492: the CH docs example, and pure-ASCII gains the delimiter
    assert _puny_encode("München") == "Mnchen-3ya"
    assert _puny_decode("Mnchen-3ya") == "München"
    assert _puny_encode("abc") == "abc-"


def test_distance_pins():
    # CH docs examples (string-functions / distance functions pages)
    assert _jaro(b"clickhouse", b"click") == pytest.approx(
        0.8333333333333334, abs=0
    )
    assert _jaro_winkler(b"clickhouse", b"click") == pytest.approx(0.9, abs=0)
    assert _damerau(b"clickhouse", b"mouse") == 6
    # unrestricted DL (the 'da'-table algorithm): CA→ABC is 2, not OSA's 3
    assert _damerau(b"CA", b"ABC") == 2
    assert _damerau(b"ab", b"ba") == 1
    # empty operands: 0 similarity (DuckDB-verified convention)
    assert _jaro(b"", b"") == 0.0 and _jaro(b"a", b"") == 0.0
    # Winkler boost only above the classic 0.7 threshold
    low = _jaro(b"abcdxxxxxx", b"abcdyyyyyyyyyy")
    assert low < 0.7 and _jaro_winkler(b"abcdxxxxxx", b"abcdyyyyyyyyyy") == low


@settings(max_examples=200, deadline=None)
@given(ASCII, ASCII)
def test_jaro_family_matches_duckdb(a, b):
    """DuckDB ships an independent C++ implementation of Jaro /
    Jaro-Winkler (strcmp95 conventions) and unrestricted
    Damerau-Levenshtein — bit-for-bit agreement on arbitrary ASCII is
    strong evidence both follow the published algorithms."""
    got = duckdb.sql(
        "SELECT jaro_similarity(?, ?), jaro_winkler_similarity(?, ?),"
        " damerau_levenshtein(?, ?)",
        params=[a, b, a, b, a, b],
    ).fetchone()
    assert _jaro(a.encode(), b.encode()) == got[0]
    assert _jaro_winkler(a.encode(), b.encode()) == got[1]
    assert _damerau(a.encode(), b.encode()) == got[2]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=32))
def test_codec_round_trips(s):
    assert _b58_decode(_b58_encode(s)) == s
    assert _b32_decode(_b32_encode(s)) == s
    assert _puny_decode(_puny_encode(s)) == s


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 5), max_size=12),
    st.lists(st.integers(0, 5), max_size=12),
)
def test_array_levenshtein_matches_string_form(a, b):
    """Levenshtein over int lists == levenshtein over an injective
    char encoding of the same lists (DuckDB's string implementation)."""
    ea = "".join(chr(65 + x) for x in a)
    eb = "".join(chr(65 + x) for x in b)
    want = duckdb.sql(
        "SELECT levenshtein(?, ?)", params=[ea, eb]
    ).fetchone()[0]
    assert _levenshtein_seq(a, b) == want


def test_spark_registration_and_null_propagation(spark):
    from clickhouse_sinker_spark.functions.chudfs import register_ch_udfs

    register_ch_udfs(spark)
    row = spark.sql(
        "SELECT ch_base58_encode(CAST(NULL AS STRING)) AS a,"
        "       ch_jaro(CAST(NULL AS STRING), 'x') AS b,"
        "       ch_damerau_levenshtein('x', CAST(NULL AS STRING)) AS c,"
        "       ch_try_base58_decode('!!') AS d,"
        "       ch_array_levenshtein(array(1, 2, 3), array(2, 3)) AS e"
    ).collect()[0]
    assert row["a"] is None and row["b"] is None and row["c"] is None
    assert row["d"] == "" and row["e"] == 1


def test_hash_trio_official_vectors():
    """SipHash-2-4 reference-implementation vectors (key 00..0f), the
    xxHash spec's empty-input values, the published quick-brown-fox
    XXH64, and the ClickHouse docs example xxHash32('Hello, world!')."""
    from clickhouse_sinker_spark.functions.chudfs import (
        _siphash24, _xxh32, _xxh64,
    )

    k0 = int.from_bytes(bytes(range(8)), "little")
    k1 = int.from_bytes(bytes(range(8, 16)), "little")
    assert _siphash24(b"", k0, k1) == 0x726FDB47DD0E0E31
    assert _siphash24(bytes(range(1)), k0, k1) == 0x74F839C593DC67FD
    assert _siphash24(bytes(range(7)), k0, k1) == 0xAB0200F58B01D137
    assert _xxh64(b"") == 0xEF46DB3751D8E999
    assert (
        _xxh64(b"The quick brown fox jumps over the lazy dog")
        == 0x0B242D361FDA71BC
    )
    assert _xxh32(b"") == 0x02CC5D05
    # ClickHouse docs (sql-reference/functions/hash-functions): seed-0
    # parity with the server's own example output
    assert _xxh32(b"Hello, world!") == 834093149


def test_xxh64_seed42_bit_equal_to_spark_jvm(spark):
    """Spark's builtin xxhash64 IS XXH64 with seed 42 over the UTF-8
    bytes — an independent JVM implementation of the identical spec.
    Bit-equality across lengths 0..70 exercises every code path (1-7-byte
    tail, 4-byte lane, 8-byte lane, 32-byte stripes)."""
    from clickhouse_sinker_spark.functions.chudfs import _xxh64

    rows = [(("abc" * 30)[:n] + chr(33 + n),) for n in range(70)] + [("",)]
    df = spark.createDataFrame(rows, "v string")
    for row in df.selectExpr("v", "xxhash64(v) AS h").collect():
        assert _xxh64(row["v"].encode(), seed=42) == row["h"] % (1 << 64)


def test_hash_trio_spark_udfs(spark):
    from clickhouse_sinker_spark.functions.chudfs import (
        _siphash24, _xxh32, _xxh64, register_ch_udfs,
    )

    register_ch_udfs(spark)
    r = spark.sql(
        "SELECT ch_siphash64('data') AS s,"
        "       ch_xxhash64_ch('Hello, world!') AS x64,"
        "       ch_xxhash32_ch('Hello, world!') AS x32,"
        "       ch_siphash64_u64(CAST(7 AS DECIMAL(20,0))) AS su,"
        "       ch_xxhash32_u32(CAST(-1 AS BIGINT)) AS xu,"
        "       ch_siphash64(CAST(NULL AS STRING)) AS nn"
    ).collect()[0]
    assert int(r["s"]) == _siphash24(b"data")
    assert int(r["x64"]) == _xxh64(b"Hello, world!")
    assert r["x32"] == 834093149
    assert int(r["su"]) == _siphash24((7).to_bytes(8, "little"))
    assert r["xu"] == _xxh32(b"\xff\xff\xff\xff")  # two's-complement bytes
    assert r["nn"] is None


def test_student_p_t_table_pins():
    """Two-sided p(t, df) against classic published t-table critical
    values (α = 0.05 / 0.01) across df 1…1e9, plus edges."""
    from math import isnan

    from clickhouse_sinker_spark.functions.chudfs import _student_p

    for t, df, want in [
        (12.706, 1, 0.05), (2.571, 5, 0.05), (2.228, 10, 0.05),
        (2.042, 30, 0.05), (4.032, 5, 0.01), (2.750, 30, 0.01),
        (1.960, 1e9, 0.05),
    ]:
        assert abs(_student_p(t, df) - want) < 2e-4, (t, df)
    assert _student_p(0.0, 10) == 1.0
    assert _student_p(100.0, 10) < 1e-10
    assert isnan(_student_p(1.0, 0))


def test_ttests_match_statistics_module(spark):
    """welchTTest/studentTTest end-to-end: t and df re-derived with the
    stdlib statistics module (independent of the emitted SQL), p through
    the pinned CDF."""
    import math
    import statistics as stat

    from clickhouse_sinker_spark.functions.chdialect import translate_ch_sql
    from clickhouse_sinker_spark.functions.chudfs import (
        _student_p, register_ch_udfs,
    )

    register_ch_udfs(spark)
    a = [2.0, 4.1, 3.3, 5.2, 4.4, 3.9]
    b = [1.0, 2.2, 1.8, 2.9, 3.5]
    spark.createDataFrame(
        [(x, 0) for x in a] + [(x, 1) for x in b], "v double, g int"
    ).createOrReplaceTempView("tt_m")
    got, _ = translate_ch_sql(
        "SELECT welchTTest(v, g) AS w, studentTTest(v, g) AS s FROM tt_m"
    )
    r = spark.sql(got).collect()[0]
    n0, n1 = len(a), len(b)
    m0, m1 = stat.mean(a), stat.mean(b)
    s0, s1 = stat.variance(a), stat.variance(b)
    se2 = s0 / n0 + s1 / n1
    tw = (m0 - m1) / math.sqrt(se2)
    dfw = se2 * se2 / ((s0 / n0) ** 2 / (n0 - 1) + (s1 / n1) ** 2 / (n1 - 1))
    sp2 = ((n0 - 1) * s0 + (n1 - 1) * s1) / (n0 + n1 - 2)
    ts = (m0 - m1) / math.sqrt(sp2 * (1 / n0 + 1 / n1))
    assert abs(r["w"]["_1"] - tw) < 1e-12
    assert abs(r["w"]["_2"] - _student_p(tw, dfw)) < 1e-12
    assert abs(r["s"]["_1"] - ts) < 1e-12
    assert abs(r["s"]["_2"] - _student_p(ts, n0 + n1 - 2)) < 1e-12
    # degenerate group (n=1): NULL, never an ANSI division error
    spark.createDataFrame(
        [(1.0, 0), (2.0, 1)], "v double, g int"
    ).createOrReplaceTempView("tt_d")
    got, _ = translate_ch_sql("SELECT welchTTest(v, g) AS w FROM tt_d")
    assert spark.sql(got).collect()[0]["w"]["_1"] is None


def test_libm_special_functions(spark):
    """erf/erfc/lgamma/tgamma ride the same libm Python's math module
    wraps; C99 pole behavior, with nan surfacing as NULL (pandas/Arrow
    null sentinel)."""
    import math

    from clickhouse_sinker_spark.functions.chdialect import translate_ch_sql
    from clickhouse_sinker_spark.functions.chudfs import register_ch_udfs

    register_ch_udfs(spark)
    got, _ = translate_ch_sql(
        "SELECT erf(1.0) AS a, erfc(2.0) AS b, lgamma(5.5) AS c,"
        " tgamma(5.0) AS d, lgamma(0.0) AS e, tgamma(-2.0) AS f"
    )
    r = spark.sql(got).collect()[0]
    assert r["a"] == math.erf(1.0) and r["b"] == math.erfc(2.0)
    assert r["c"] == math.lgamma(5.5) and r["d"] == 24.0
    assert r["e"] == float("inf")
    assert r["f"] is None  # C99 nan -> NULL through the Arrow transfer


def test_digest_wrapping_and_halfmd5(spark):
    """CH MD5/SHA* return raw bytes (Spark builtins return hex strings):
    the unhex() wrap restores byte semantics so hex(MD5(s)) matches CH;
    halfMD5 = first 8 MD5 bytes big-endian (CH docs contract)."""
    import hashlib

    from clickhouse_sinker_spark.functions.chdialect import translate_ch_sql
    from clickhouse_sinker_spark.functions.chudfs import register_ch_udfs

    register_ch_udfs(spark)
    got, _ = translate_ch_sql(
        "SELECT hex(MD5('abc')) AS m, hex(SHA1('abc')) AS s1,"
        " hex(SHA256('abc')) AS s2, hex(SHA512('abc')) AS s5,"
        " halfMD5('abc') AS hm, halfMD5(toUInt64(7)) AS hmu"
    )
    r = spark.sql(got).collect()[0]
    assert r["m"] == hashlib.md5(b"abc").hexdigest().upper()
    assert r["s1"] == hashlib.sha1(b"abc").hexdigest().upper()
    assert r["s2"] == hashlib.sha256(b"abc").hexdigest().upper()
    assert r["s5"] == hashlib.sha512(b"abc").hexdigest().upper()
    assert int(r["hm"]) == int.from_bytes(
        hashlib.md5(b"abc").digest()[:8], "big"
    )
    assert int(r["hmu"]) == int.from_bytes(
        hashlib.md5((7).to_bytes(8, "little")).digest()[:8], "big"
    )


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=16, max_size=16))
def test_ipv6_text_round_trip(b):
    """Any 16 bytes → RFC 5952 text → parse restores the same bytes
    (including the IPv4-mapped display special case)."""
    from clickhouse_sinker_spark.functions.chudfs import (
        _ipv6_bytes, _ipv6_str,
    )

    assert _ipv6_bytes(_ipv6_str(b)) == b


def test_ipv6_family_pins(spark):
    """CH docs shapes: IPv4-in-IPv6 parse, mapped display, cutIPv6 byte
    zeroing with the mapped count, CIDR range bounds, Or* fallbacks."""
    from clickhouse_sinker_spark.functions.chdialect import translate_ch_sql
    from clickhouse_sinker_spark.functions.chudfs import register_ch_udfs

    register_ch_udfs(spark)
    got, _ = translate_ch_sql(
        "SELECT hex(IPv6StringToNum('2001:db8::1')) AS h,"
        " IPv6NumToString(toIPv6('2001:0DB8:0:0:0:0:0:1')) AS canon,"
        " IPv6NumToString(IPv6StringToNum('1.2.3.4')) AS v4,"
        " cutIPv6(IPv6StringToNum('::ffff:1.2.3.4'), 8, 2) AS cutm,"
        " hex(tupleElement(IPv6CIDRToRange(toIPv6('2001:db8::'), 32), 1)) AS lo,"
        " toIPv6OrNull('zzz') AS bad, hex(toIPv6OrZero('zzz')) AS zed"
    )
    r = spark.sql(got).collect()[0]
    assert r["h"] == "20010DB8000000000000000000000001"
    assert r["canon"] == "2001:db8::1" and r["v4"] == "::ffff:1.2.3.4"
    # mapped address uses the IPv4 cut count (2 bytes) → ::ffff:1.2.0.0
    assert r["cutm"] == "::ffff:1.2.0.0"
    assert r["lo"] == "20010DB8" + "0" * 24
    assert r["bad"] is None and r["zed"] == "00" * 16


@given(st.text(max_size=24), st.text(max_size=24),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=150, deadline=None)
def test_ngram_distance_vs_quadratic_reference(a, b, mode):
    """_ch_ngram_distance/_ch_ngram_search against an independent
    quadratic pair-count model built straight from the definition
    (symmetric difference = a+b − 2·multiset-intersection)."""
    from clickhouse_sinker_spark.functions.chudfs import (
        _ch_ngram_distance, _ch_ngram_search, _ngram_counts)

    ca, cb = _ngram_counts(a, mode), _ngram_counts(b, mode)
    inter = sum((ca & cb).values())
    ta, tb = sum(ca.values()), sum(cb.values())
    exp_d = (ta + tb - 2 * inter) / max(ta + tb, 1)
    assert abs(_ch_ngram_distance(a, b, mode) - exp_d) < 1e-12
    exp_s = 1.0 - (tb - sum((cb & ca).values())) / max(tb, 1)
    assert abs(_ch_ngram_search(a, b, mode) - exp_s) < 1e-12
    # metric properties
    assert _ch_ngram_distance(a, a, mode) == 0.0
    assert 0.0 <= _ch_ngram_distance(a, b, mode) <= 1.0
    assert abs(_ch_ngram_distance(a, b, mode)
               - _ch_ngram_distance(b, a, mode)) < 1e-15


@given(st.binary(max_size=12),
       st.integers(min_value=-120, max_value=120),
       st.one_of(st.none(), st.integers(min_value=-120, max_value=120)))
@settings(max_examples=200, deadline=None)
def test_bit_slice_vs_per_bit_reference(b, off, ln):
    """_ch_bit_slice against a per-bit string-of-'01' reference: slice
    the bit string with the same CH substring conventions, then pack."""
    from clickhouse_sinker_spark.functions.chudfs import _ch_bit_slice

    bits = "".join(f"{byte:08b}" for byte in b)
    total = len(bits)
    start = (off - 1) if off > 0 else (total + off if off < 0 else 0)
    start = max(0, min(start, total))
    if ln is None:
        end = total
    elif ln >= 0:
        end = start + ln
    else:
        end = total + ln
    end = max(start, min(end, total))
    sl = bits[start:end]
    pad = (8 - len(sl) % 8) % 8 if sl else 0
    expected = bytes(
        int(sl.ljust(len(sl) + pad, "0")[i : i + 8], 2)
        for i in range(0, len(sl) + pad, 8)
    ) if sl else b""
    assert _ch_bit_slice(b, off, ln) == expected


@given(st.from_regex(r"[a-z0-9]([a-z0-9-]{0,10}[a-z0-9])?"
                     r"(\.[a-z0-9]([a-z0-9-]{0,10}[a-z0-9])?){0,3}",
                     fullmatch=True))
@settings(max_examples=100, deadline=None)
def test_idna_ascii_fixpoint_and_roundtrip(domain):
    """Valid lowercase-ASCII LDH domains are UTS#46 fixpoints, and
    encode∘decode round-trips them."""
    import pytest as _pytest

    _pytest.importorskip("idna")
    from clickhouse_sinker_spark.functions.chudfs import (
        _ch_idna_decode, _ch_idna_encode)

    try:
        enc = _ch_idna_encode(domain, True)
    except ValueError:
        return  # idna2008 rejects some LDH labels (e.g. xn-- lookalikes)
    assert enc == domain
    assert _ch_idna_decode(enc) == domain


def test_stem_ch_docs_example_and_contracts():
    """stem() rides the SAME Snowball libstemmer ClickHouse links
    (contrib/libstemmer_c).  Pins: the CH docs example sentence, a
    French/German sample, unknown-language raises like CH
    BAD_ARGUMENTS, empty passes through."""
    import ctypes.util

    import pytest as _pytest

    if ctypes.util.find_library("stemmer") is None:
        _pytest.skip("libstemmer not found")
    from clickhouse_sinker_spark.functions.chudfs import _sb_stem

    # CH docs sql-reference/functions/nlp-functions#stem example
    words = ["I", "think", "it", "is", "a", "blessing", "in", "disguise"]
    assert [_sb_stem("en", w) for w in words] == [
        "I", "think", "it", "is", "a", "bless", "in", "disguis"]
    assert _sb_stem("fr", "mangeaient") == "mang"
    assert _sb_stem("de", "häusern") == "haus"
    assert _sb_stem("en", "") == ""
    with _pytest.raises(ValueError):
        _sb_stem("xx", "foo")


def test_format_readable_time_delta_ch_docs_examples():
    """Both CH docs example tables reproduce exactly — six outputs
    covering the 365/30.5 decomposition constants, the ', '/' and '
    joiners, pluralization, and the maximum_unit clamp."""
    from clickhouse_sinker_spark.functions.chudfs import _fmt_time_delta

    assert _fmt_time_delta(100, "years") == "1 minute and 40 seconds"
    assert _fmt_time_delta(12345, "years") == \
        "3 hours, 25 minutes and 45 seconds"
    assert _fmt_time_delta(432546534, "years") == \
        "13 years, 8 months, 17 days, 7 hours, 48 minutes and 54 seconds"
    assert _fmt_time_delta(100, "minutes") == "1 minute and 40 seconds"
    assert _fmt_time_delta(12345, "minutes") == "205 minutes and 45 seconds"
    assert _fmt_time_delta(432546534, "minutes") == \
        "7209108 minutes and 54 seconds"
    assert _fmt_time_delta(0, "years") == "0 seconds"
    assert _fmt_time_delta(1, "years") == "1 second"
    assert _fmt_time_delta(3600, "years") == "1 hour"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _fmt_time_delta(1, "fortnights")


def test_format_readable_time_delta_round_trip_property():
    """Property: for random non-negative integer deltas, parsing the
    formatted string back through the unit widths reproduces the input
    exactly (the decomposition is exact integer arithmetic)."""
    import random as _random

    from clickhouse_sinker_spark.functions.chudfs import _fmt_time_delta

    widths = {"year": 31536000, "month": 2635200, "day": 86400,
              "hour": 3600, "minute": 60, "second": 1}
    rng = _random.Random(0x7D)
    for _ in range(300):
        sec = rng.randrange(0, 10**10)
        out = _fmt_time_delta(sec, "years")
        total = 0
        for part in out.replace(" and ", ", ").split(", "):
            qty, unit = part.split(" ", 1)
            total += int(qty) * widths[unit.rstrip("s") if unit != "seconds"
                                       else "second"]
        assert total == sec, (sec, out)
