"""Arrow-vectorized scalar extensions for ClickHouse functions with no
Spark JVM expression form.

A small tier of CH scalar functions is deterministic and well-specified
but inexpressible as Catalyst expressions (bignum base conversions,
RFC 3492 punycode, Unicode normalization, byte-string edit distances).
Refusing them forever is unnecessarily lossy: Spark's documented escape
hatch for exactly this case is the Arrow-batched pandas UDF (vectorized
transfer, per-batch Python execution) — the same tier this repo already
uses for multimodal decoding.  These are *dialect scalar functions*, not
hot-path relational operators: they appear in user SELECT lists, never
inside join/aggregation machinery, so the Python surface is bounded by
the projected column, exactly like the reference's own per-row Go parse
hot loop (``parser/fastjson.go``).

``register_ch_udfs(spark)`` registers every function under a ``ch_``
prefix; ``functions/chdialect.py`` rewrites the CH names onto them and
``ch_sql()`` performs the registration automatically (standalone users
of ``translate_ch_sql`` must call ``register_ch_udfs`` once per session
— the translator's notes say so whenever one is emitted).

Semantics contracts (each pinned by unit/property tests):

- ``base58Encode/Decode`` — Bitcoin alphabet, leading-zero bytes map to
  '1' (CH docs: sql-reference/functions/string-functions#base58encode).
  Decode raises on invalid characters like CH; ``tryBase58Decode``
  returns '' instead.  Decoded bytes must be valid UTF-8 (Spark strings
  are Unicode; CH strings are raw bytes — a documented delta).
- ``base32Encode/Decode`` — RFC 4648 with padding, strict uppercase
  decode; ``tryBase32Decode`` returns '' on any error.
- ``punycodeEncode/Decode`` — RFC 3492 via Python's punycode codec
  (pure-ASCII inputs gain the trailing '-' delimiter exactly as the RFC
  prescribes); ``tryPunycodeDecode`` returns '' on invalid input.
- ``normalizeUTF8NFC/NFD/NFKC/NFKD`` — ``unicodedata.normalize`` (the
  Unicode-standard forms; CH uses ICU — identical on assigned
  codepoints).
- ``jaroSimilarity`` / ``jaroWinklerSimilarity`` — classic Jaro over the
  UTF-8 *bytes* (CH computes byte-wise), match window
  ``max(n1,n2)/2 - 1``, transpositions as half-mismatches of the matched
  sequences; Winkler boost ``j + l*0.1*(1-j)`` with prefix cap 4 applied
  only above the classic 0.7 threshold (DuckDB's implementation, used as
  the oracle, behaves identically on all probed cases).  Either operand
  empty → 0.0 (DuckDB-verified; CH returns 0 for empty operands).
- ``damerauLevenshteinDistance`` — the UNRESTRICTED Damerau-Levenshtein
  (Wikipedia's distance-with-adjacent-transpositions, ``da`` table), over
  UTF-8 bytes: dl('CA','ABC') = 2, matching DuckDB and the CH docs
  example dl('clickhouse','mouse') = 6.
- ``arrayLevenshteinDistance`` — plain Levenshtein DP over array
  elements compared by equality.
- ``sipHash64`` / ``xxHash64`` / ``xxHash32`` — the CH sharding/sampling
  hash trio with SEED-0/zero-key CH semantics.  SipHash-2-4 is pinned to
  the reference implementation's official vectors (CH SipHash.h defaults
  ``key0 = key1 = 0``); XXH64 is additionally proven bit-equal to
  Spark's own JVM implementation at seed 42 across every code path, and
  XXH32 reproduces the CH docs example ``xxHash32('Hello, world!') =
  834093149``.  Spark's builtin ``xxhash64`` seeds with 42 and therefore
  CANNOT stand in for CH's ``xxHash64`` — the old plain rename silently
  produced non-CH values and is gone.  Results are decimal(20,0)
  (UInt64 doesn't fit a signed bigint).  The translator admits only
  typed arguments (string evidence or an explicit ``to[U]Int64``/
  ``to[U]Int32`` wrapper of the matching width) because CH hashes the
  argument's binary representation.

Reference parity: model/value.go has no equivalents (these are
query-side CH server functions); they exist here because sinker-landed
tables are queried with them downstream.
"""
from __future__ import annotations

import base64
import unicodedata

import pandas as pd

__all__ = ["register_ch_udfs", "CH_UDF_NAMES"]

_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_IDX = {c: i for i, c in enumerate(_B58)}


def _b58_encode(s: str) -> str:
    b = s.encode("utf-8")
    n = int.from_bytes(b, "big")
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(_B58[r])
    pad = len(b) - len(b.lstrip(b"\x00"))
    return "1" * pad + "".join(reversed(out))


def _b58_decode(s: str) -> str:
    n = 0
    for c in s:
        if c not in _B58_IDX:
            raise ValueError(f"invalid base58 character {c!r}")
        n = n * 58 + _B58_IDX[c]
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = len(s) - len(s.lstrip("1"))
    return (b"\x00" * pad + raw).decode("utf-8")


def _b32_encode(s: str) -> str:
    return base64.b32encode(s.encode("utf-8")).decode("ascii")


def _b32_decode(s: str) -> str:
    return base64.b32decode(s.encode("ascii")).decode("utf-8")


def _puny_encode(s: str) -> str:
    return s.encode("punycode").decode("ascii")


def _puny_decode(s: str) -> str:
    return s.encode("ascii").decode("punycode")


def _jaro(b1: bytes, b2: bytes) -> float:
    n1, n2 = len(b1), len(b2)
    if n1 == 0 or n2 == 0:
        return 0.0
    w = max(max(n1, n2) // 2 - 1, 0)
    m2 = [False] * n2
    a1 = []
    for i in range(n1):
        c = b1[i]
        for j in range(max(0, i - w), min(n2 - 1, i + w) + 1):
            if not m2[j] and b2[j] == c:
                m2[j] = True
                a1.append(c)
                break
    m = len(a1)
    if m == 0:
        return 0.0
    b2m = [b2[j] for j in range(n2) if m2[j]]
    # classic strcmp95 convention (shared by the C++ ports incl. DuckDB's,
    # verified against it on real data): transpositions = mismatched
    # matched-pairs halved with INTEGER division, not the /2.0 fraction
    t = sum(1 for x, y in zip(a1, b2m) if x != y) // 2
    return (m / n1 + m / n2 + (m - t) / m) / 3.0


def _jaro_winkler(b1: bytes, b2: bytes) -> float:
    j = _jaro(b1, b2)
    if j <= 0.7:
        return j
    l = 0
    for x, y in zip(b1[:4], b2[:4]):
        if x != y:
            break
        l += 1
    return j + l * 0.1 * (1.0 - j)


def _damerau(a: bytes, b: bytes) -> int:
    la, lb = len(a), len(b)
    maxdist = la + lb
    da: dict[int, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _levenshtein_seq(a, b) -> int:
    """Two-row Levenshtein over arbitrary equatable sequences."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (0 if _eq(x, y) else 1)))
        prev = cur
    return prev[-1]


def _eq(x, y) -> bool:
    # numpy array elements inside Spark-to-pandas lists compare fine with
    # ==, but NaN != NaN must hold (CH NULL-vs-NULL inside arrays is a
    # non-match only for NaN; None == None matches, like CH NULLs in
    # arrayLevenshtein's element comparison)
    try:
        return bool(x == y)
    except ValueError:  # ambiguous array comparison
        return False


_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1


def _rotl64(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & _M64


def _rotl32(x: int, b: int) -> int:
    return ((x << b) | (x >> (32 - b))) & _M32


def _sipround(v0, v1, v2, v3):
    v0 = (v0 + v1) & _M64; v1 = _rotl64(v1, 13); v1 ^= v0; v0 = _rotl64(v0, 32)
    v2 = (v2 + v3) & _M64; v3 = _rotl64(v3, 16); v3 ^= v2
    v0 = (v0 + v3) & _M64; v3 = _rotl64(v3, 21); v3 ^= v0
    v2 = (v2 + v1) & _M64; v1 = _rotl64(v1, 17); v1 ^= v2; v2 = _rotl64(v2, 32)
    return v0, v1, v2, v3


def _siphash24(data: bytes, k0: int = 0, k1: int = 0) -> int:
    """SipHash-2-4 (Aumasson & Bernstein, published reference algorithm),
    pinned against the reference implementation's official test vectors.
    ClickHouse's sipHash64 for a single String argument is exactly this
    with the default zero key (SipHash.h: ``SipHash(UInt64 key0 = 0,
    UInt64 key1 = 0)``)."""
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573
    off = 0
    while off + 8 <= len(data):
        m = int.from_bytes(data[off:off + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0 ^= m
        off += 8
    tail = data[off:]
    m = ((len(data) & 0xFF) << 56) | int.from_bytes(
        tail + b"\x00" * (7 - len(tail)), "little"
    )
    v3 ^= m
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0 ^= m
    v2 ^= 0xFF
    for _ in range(4):
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    return v0 ^ v1 ^ v2 ^ v3


_XXH64_P1 = 0x9E3779B185EBCA87
_XXH64_P2 = 0xC2B2AE3D27D4EB4F
_XXH64_P3 = 0x165667B19E3779F9
_XXH64_P4 = 0x85EBCA77C2B2AE63
_XXH64_P5 = 0x27D4EB2F165667C5


def _xxh64_round(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _XXH64_P2) & _M64, 31) * _XXH64_P1) & _M64


def _xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (Collet's published xxHash spec).  ClickHouse's xxHash64 is
    XXH64 with seed 0; Spark's builtin ``xxhash64`` is XXH64 with seed 42
    — which doubles as an INDEPENDENT full-algorithm cross-check (the
    property test asserts this function at seed 42 equals Spark's JVM
    implementation on arbitrary inputs)."""
    n = len(data)
    off = 0
    if n >= 32:
        a1 = (seed + _XXH64_P1 + _XXH64_P2) & _M64
        a2 = (seed + _XXH64_P2) & _M64
        a3 = seed & _M64
        a4 = (seed - _XXH64_P1) & _M64
        while off + 32 <= n:
            a1 = _xxh64_round(a1, int.from_bytes(data[off:off + 8], "little"))
            a2 = _xxh64_round(a2, int.from_bytes(data[off + 8:off + 16], "little"))
            a3 = _xxh64_round(a3, int.from_bytes(data[off + 16:off + 24], "little"))
            a4 = _xxh64_round(a4, int.from_bytes(data[off + 24:off + 32], "little"))
            off += 32
        h = (_rotl64(a1, 1) + _rotl64(a2, 7) + _rotl64(a3, 12) + _rotl64(a4, 18)) & _M64
        for a in (a1, a2, a3, a4):
            h = ((h ^ _xxh64_round(0, a)) * _XXH64_P1 + _XXH64_P4) & _M64
    else:
        h = (seed + _XXH64_P5) & _M64
    h = (h + n) & _M64
    while off + 8 <= n:
        h ^= _xxh64_round(0, int.from_bytes(data[off:off + 8], "little"))
        h = (_rotl64(h, 27) * _XXH64_P1 + _XXH64_P4) & _M64
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(data[off:off + 4], "little") * _XXH64_P1) & _M64
        h = (_rotl64(h, 23) * _XXH64_P2 + _XXH64_P3) & _M64
        off += 4
    while off < n:
        h ^= (data[off] * _XXH64_P5) & _M64
        h = (_rotl64(h, 11) * _XXH64_P1) & _M64
        off += 1
    h ^= h >> 33
    h = (h * _XXH64_P2) & _M64
    h ^= h >> 29
    h = (h * _XXH64_P3) & _M64
    h ^= h >> 32
    return h


_XXH32_P1 = 0x9E3779B1
_XXH32_P2 = 0x85EBCA77
_XXH32_P3 = 0xC2B2AE3D
_XXH32_P4 = 0x27D4EB2F
_XXH32_P5 = 0x165667B1


def _xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 per the published spec (CH's xxHash32 = seed 0), pinned
    against the spec's empty-input vector and the CH docs example."""
    n = len(data)
    off = 0
    if n >= 16:
        a1 = (seed + _XXH32_P1 + _XXH32_P2) & _M32
        a2 = (seed + _XXH32_P2) & _M32
        a3 = seed & _M32
        a4 = (seed - _XXH32_P1) & _M32
        while off + 16 <= n:
            for idx in range(4):
                lane = int.from_bytes(data[off + 4 * idx:off + 4 * idx + 4], "little")
                acc = (a1, a2, a3, a4)[idx]
                acc = (_rotl32((acc + lane * _XXH32_P2) & _M32, 13) * _XXH32_P1) & _M32
                if idx == 0: a1 = acc
                elif idx == 1: a2 = acc
                elif idx == 2: a3 = acc
                else: a4 = acc
            off += 16
        h = (_rotl32(a1, 1) + _rotl32(a2, 7) + _rotl32(a3, 12) + _rotl32(a4, 18)) & _M32
    else:
        h = (seed + _XXH32_P5) & _M32
    h = (h + n) & _M32
    while off + 4 <= n:
        h = (h + int.from_bytes(data[off:off + 4], "little") * _XXH32_P3) & _M32
        h = (_rotl32(h, 17) * _XXH32_P4) & _M32
        off += 4
    while off < n:
        h = (h + data[off] * _XXH32_P5) & _M32
        h = (_rotl32(h, 11) * _XXH32_P1) & _M32
        off += 1
    h ^= h >> 15
    h = (h * _XXH32_P2) & _M32
    h ^= h >> 13
    h = (h * _XXH32_P3) & _M32
    h ^= h >> 16
    return h


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz method,
    the standard published algorithm — e.g. Numerical Recipes §6.4)."""
    MAXIT, EPS, FPMIN = 300, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def _ibeta(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    from math import exp, lgamma, log

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    front = exp(
        lgamma(a + b) - lgamma(a) - lgamma(b)
        + a * log(x) + b * log(1.0 - x)
    )
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _student_p(t: float, df: float) -> float:
    """Two-sided Student-t p-value via the identity
    P(|T| > t) = I_{df/(df+t²)}(df/2, 1/2) — pinned against classic
    t-table critical values (e.g. p(2.228, 10) = 0.05) across df 1…1e9."""
    if df <= 0:
        return float("nan")
    return _ibeta(df / 2.0, 0.5, df / (df + t * t))


def _u64_bytes(v) -> bytes:
    """8-byte little-endian of an integer-valued argument (CH hashes the
    binary width of UInt64/Int64; two's complement = the same bytes)."""
    return (int(v) & _M64).to_bytes(8, "little")


def _ipv6_str(b: bytes) -> str:
    """RFC 5952 canonical text, with CH's IPv4-mapped display
    (``::ffff:1.2.3.4`` — Python's ipaddress prints hex groups)."""
    import ipaddress

    a = ipaddress.IPv6Address(bytes(b))
    m = a.ipv4_mapped
    return f"::ffff:{m}" if m is not None else str(a)


def _ipv6_bytes(s: str) -> bytes:
    """Parse an IPv6 (or, per CH, a plain IPv4 → mapped) string to its
    16-byte big-endian form; raises on invalid input like CH."""
    import ipaddress

    try:
        return ipaddress.IPv6Address(s).packed
    except (ipaddress.AddressValueError, ValueError):
        try:
            return b"\x00" * 10 + b"\xff\xff" + ipaddress.IPv4Address(s).packed
        except (ipaddress.AddressValueError, ValueError):
            raise ValueError(f"invalid IPv6 string {s!r}") from None


def _cut_ipv6(b: bytes, n6, n4) -> str:
    """cutIPv6: zero the LAST n bytes (the IPv4-mapped count applies to
    mapped addresses) and return the TEXT form (CH returns String)."""
    import ipaddress

    bb = bytes(b)
    mapped = ipaddress.IPv6Address(bb).ipv4_mapped is not None
    n = max(0, min(16, int(n4 if mapped else n6)))
    return _ipv6_str(bb[: 16 - n] + b"\x00" * n)


def _ipv6_cidr_range(b: bytes, cidr) -> tuple[bytes, bytes]:
    import ipaddress

    net = ipaddress.IPv6Network(
        (bytes(b), max(0, min(128, int(cidr)))), strict=False
    )
    return net.network_address.packed, net.broadcast_address.packed


def _try_or(fn, v, default):
    try:
        return fn(v)
    except Exception:  # noqa: BLE001 — CH OrNull/OrZero contract
        return default


def _map1(fn):
    def run(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else fn(v))
    return run


def _map1_try(fn):
    def run(s: pd.Series) -> pd.Series:
        def safe(v):
            if v is None:
                return None
            try:
                return fn(v)
            except Exception:  # noqa: BLE001 — CH try* contract: '' on error
                return ""
        return s.map(safe)
    return run


def _map2(fn, null=None):
    def run(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [
                null if a is None or b is None else fn(a, b)
                for a, b in zip(s1, s2)
            ]
        )
    return run


def _bytes2(fn):
    return _map2(lambda a, b: fn(a.encode("utf-8"), b.encode("utf-8")))


def _dec(fn):
    """Wrap an int-producing fn to emit Decimal — CH UInt64 results don't
    fit Spark's signed bigint; decimal(20,0) renders them unsigned."""
    from decimal import Decimal

    return lambda v: Decimal(fn(v))


# name → (vectorized fn, Spark return type)
_UDF_SPECS = {
    "ch_base58_encode": (_map1(_b58_encode), "string"),
    "ch_base58_decode": (_map1(_b58_decode), "string"),
    "ch_try_base58_decode": (_map1_try(_b58_decode), "string"),
    "ch_base32_encode": (_map1(_b32_encode), "string"),
    "ch_base32_decode": (_map1(_b32_decode), "string"),
    "ch_try_base32_decode": (_map1_try(_b32_decode), "string"),
    "ch_punycode_encode": (_map1(_puny_encode), "string"),
    "ch_punycode_decode": (_map1(_puny_decode), "string"),
    "ch_try_punycode_decode": (_map1_try(_puny_decode), "string"),
    "ch_nfc": (_map1(lambda s: unicodedata.normalize("NFC", s)), "string"),
    "ch_nfd": (_map1(lambda s: unicodedata.normalize("NFD", s)), "string"),
    "ch_nfkc": (_map1(lambda s: unicodedata.normalize("NFKC", s)), "string"),
    "ch_nfkd": (_map1(lambda s: unicodedata.normalize("NFKD", s)), "string"),
    "ch_jaro": (_bytes2(_jaro), "double"),
    "ch_jaro_winkler": (_bytes2(_jaro_winkler), "double"),
    "ch_damerau_levenshtein": (_bytes2(_damerau), "bigint"),
    "ch_array_levenshtein": (
        _map2(lambda a, b: _levenshtein_seq(list(a), list(b))),
        "bigint",
    ),
    # CH hash trio (SAMPLE BY / sharding idioms) — UInt64 as decimal(20,0)
    "ch_siphash64": (
        _map1(_dec(lambda s: _siphash24(s.encode("utf-8")))),
        "decimal(20,0)",
    ),
    "ch_siphash64_u64": (
        _map1(_dec(lambda v: _siphash24(_u64_bytes(v)))),
        "decimal(20,0)",
    ),
    "ch_xxhash64_ch": (
        _map1(_dec(lambda s: _xxh64(s.encode("utf-8")))),
        "decimal(20,0)",
    ),
    "ch_xxhash64_u64": (
        _map1(_dec(lambda v: _xxh64(_u64_bytes(v)))),
        "decimal(20,0)",
    ),
    "ch_xxhash32_ch": (
        _map1(lambda s: _xxh32(s.encode("utf-8"))),
        "bigint",
    ),
    "ch_xxhash32_u32": (
        # CH hashes a UInt32/Int32 argument as its 4-byte LE binary
        _map1(lambda v: _xxh32((int(v) & _M32).to_bytes(4, "little"))),
        "bigint",
    ),
    # two-sided Student-t p-value — the only non-moment piece of
    # welchTTest/studentTTest (the t statistic and df are JVM-side
    # aggregate expressions emitted by the translator)
    "ch_student_p": (
        _map2(lambda t, d: _student_p(float(t), float(d))),
        "double",
    ),
    # IPv6 family — values are 16-byte BINARY (big-endian), so Spark's
    # lexicographic binary comparisons reproduce CH's 128-bit numeric
    # order for sorts/joins/grouping; text forms via the RFC 5952
    # canonicalizer with CH's ::ffff:a.b.c.d mapped display
    "ch_ipv6_ston": (_map1(_ipv6_bytes), "binary"),
    "ch_ipv6_ston_or_null": (
        lambda s: s.map(
            lambda v: None if v is None else _try_or(_ipv6_bytes, v, None)
        ),
        "binary",
    ),
    "ch_ipv6_ston_or_zero": (
        lambda s: s.map(
            lambda v: None if v is None
            else _try_or(_ipv6_bytes, v, b"\x00" * 16)
        ),
        "binary",
    ),
    "ch_ipv6_ntos": (_map1(_ipv6_str), "string"),
    "ch_ipv4_to_ipv6": (
        _map1(lambda v: b"\x00" * 10 + b"\xff\xff"
              + (int(v) & _M32).to_bytes(4, "big")),
        "binary",
    ),
    "ch_cut_ipv6": (
        lambda s1, s2, s3: pd.Series([
            None if a is None or b is None or c is None
            else _cut_ipv6(a, b, c)
            for a, b, c in zip(s1, s2, s3)
        ]),
        "string",
    ),
    "ch_ipv6_cidr_range": (
        lambda s1, s2: pd.DataFrame({
            "_1": [None if a is None or b is None
                   else _ipv6_cidr_range(a, b)[0] for a, b in zip(s1, s2)],
            "_2": [None if a is None or b is None
                   else _ipv6_cidr_range(a, b)[1] for a, b in zip(s1, s2)],
        }),
        "struct<_1: binary, _2: binary>",
    ),
    # libm special functions (CH calls std::erf etc.; Python's math module
    # is the same C implementations) — poles follow C99: lgamma(0 and
    # negative integers) = +inf, tgamma(±0) = ±inf, tgamma(-n) = nan.
    # NaN results surface as NULL (pandas/Arrow use NaN as the null
    # sentinel in float64 transfer) — a documented delta at poles only
    # halfMD5 (CH docs): first 8 bytes of MD5 read as BIG-endian UInt64
    "ch_halfmd5": (
        _map1(_dec(lambda s: int.from_bytes(
            __import__("hashlib").md5(s.encode("utf-8")).digest()[:8], "big"
        ))),
        "decimal(20,0)",
    ),
    "ch_halfmd5_u64": (
        _map1(_dec(lambda v: int.from_bytes(
            __import__("hashlib").md5(_u64_bytes(v)).digest()[:8], "big"
        ))),
        "decimal(20,0)",
    ),
    "ch_erf": (_map1(lambda x: __import__("math").erf(float(x))), "double"),
    "ch_erfc": (_map1(lambda x: __import__("math").erfc(float(x))), "double"),
    "ch_lgamma": (_map1(lambda x: _lgamma_c(float(x))), "double"),
    "ch_tgamma": (_map1(lambda x: _tgamma_c(float(x))), "double"),
}


def _lgamma_c(x: float) -> float:
    import math

    try:
        return math.lgamma(x)
    except ValueError:  # Python raises at the poles; C99 returns +inf
        return float("inf")


def _tgamma_c(x: float) -> float:
    import math

    if x == 0.0:
        return math.copysign(float("inf"), x)  # tgamma(±0) = ±inf (C99)
    try:
        return math.gamma(x)
    except ValueError:  # negative integers: C99 nan
        return float("nan")

CH_UDF_NAMES = frozenset(_UDF_SPECS)


def register_ch_udfs(spark) -> None:
    """Register every ``ch_*`` scalar as an Arrow pandas UDF in the given
    session.  Idempotent (re-registration replaces with an identical
    function); called automatically by ``ch_sql()`` and the CLI."""
    from pyspark.sql.functions import pandas_udf

    for name, (fn, typ) in _UDF_SPECS.items():
        spark.udf.register(name, pandas_udf(fn, typ))
