"""Cast expression library — the semantic core of the engine.

The reference parses each message field into a destination column type with
*saturating* (clamping) semantics, defaults on bad data, multi-layout
datetime detection, epoch scaling and IP validation
(parser/fastjson.go:129-188,582-621,739-785; parser/parser.go:31-65,160-226).

Every function here returns a Spark ``Column`` built from JVM-side built-in
functions only — no Python UDFs — so the whole projection stays inside
whole-stage codegen and scales linearly on a cluster.

Semantics preserved exactly (verified by tests/test_casts.py against the
reference's parser_test matrix):

- out-of-range numeric → clamp to type min/max, NOT null/error/wraparound
  (parser/fastjson.go:129-173): ``saturating_cast``.
- invalid/missing field → NULL if nullable else type default 0/""/false/Epoch
  (parser/fastjson.go:582-621, docs/dev/introduction.md:46-57):
  ``cast_with_default``.
- datetime strings matched against many layouts, first hit wins; epoch
  numbers scaled by a time unit; out-of-range → Epoch
  (parser/parser.go:31-65,204-226): ``parse_datetime_any``,
  ``epoch_to_timestamp``.
- IP strings validated, invalid → 0.0.0.0 / :: (parser/fastjson.go:739-785):
  ``valid_ip_or_default``.

Works under ANSI mode (Spark 4 default): clamping happens *before* the cast
so no overflow is possible, and error paths use ``try_*`` variants.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..typemap import INT_BOUNDS

__all__ = [
    "saturating_cast",
    "cast_with_default",
    "default_literal",
    "parse_datetime_any",
    "epoch_to_timestamp",
    "valid_ip_or_default",
    "parse_datetime_adaptive",
    "detect_datetime_layout",
    "parse_datetime_bound",
    "DATETIME_LAYOUTS",
]

_EPOCH = _dt.datetime(1970, 1, 1)

# Spark SQL type name for each CH integer flavor
_SPARK_INT_TYPE = {
    "Int8": "tinyint",
    "Int16": "smallint",
    "Int32": "int",
    "Int64": "bigint",
    "UInt8": "smallint",
    "UInt16": "int",
    "UInt32": "bigint",
    "UInt64": "decimal(20,0)",
}

_FLOAT_MAX32 = 3.4028234663852886e38

# value range of each Spark integral type, for the integral-source fast path
_SPARK_INTEGRAL_RANGE = {
    "tinyint": (-(2**7), 2**7 - 1),
    "smallint": (-(2**15), 2**15 - 1),
    "int": (-(2**31), 2**31 - 1),
    "bigint": (-(2**63), 2**63 - 1),
}


def saturating_cast(col: Column | str, ch_int: str, src_type: str | None = None) -> Column:
    """Clamp-then-cast a numeric column to an integer type.

    Reference semantics (parser/fastjson.go:129-173): values outside the
    destination range clamp to the type min/max — unlike Spark's CAST which
    wraps (legacy) or errors (ANSI) — and fractional values truncate toward
    zero (Go ``int64(float64)``), not round.  ±inf and magnitudes beyond
    decimal(38) range clamp by sign; NaN → null.  Expressed as
    ``least(greatest(trunc(x), min), max)`` which Catalyst folds into
    codegen.  Non-numeric input should be pre-converted (``try_cast``
    upstream).

    ``src_type`` (optional, a Spark type name: tinyint/smallint/int/bigint/
    float/double) enables a bit-identical FAST PATH: the general expression
    widens every value through decimal(38,0) so that UInt64 and
    beyond-long decimals clamp exactly, but when the source is a known
    integral or binary-float column those branches are unreachable and the
    whole clamp stays in long/double arithmetic (the decimal ops dominated
    the projection stage of the ETL bench; see OPTIMIZATION_r13.md).
    Equivalence is pinned by tests/test_casts.py::test_fast_paths_match_general.
    """
    c = F.col(col) if isinstance(col, str) else col
    lo, hi = INT_BOUNDS[ch_int]

    if src_type in _SPARK_INTEGRAL_RANGE:
        # Integral source: values are exact; truncation is a no-op.
        slo, shi = _SPARK_INTEGRAL_RANGE[src_type]
        out_t = _SPARK_INT_TYPE[ch_int]
        lng = c.cast("bigint")
        if ch_int == "UInt64":
            # only the low clamp can apply (long max < UInt64 max); gate
            # NULL explicitly — greatest/least SKIP nulls in Spark
            return F.when(lng.isNotNull(), F.greatest(lng, F.lit(0))).cast(out_t)
        if slo >= lo and shi <= hi:
            return c.cast(out_t)  # source range fits: plain widening cast
        return F.when(
            lng.isNotNull(), F.least(F.greatest(lng, F.lit(lo)), F.lit(hi))
        ).cast(out_t)

    if src_type in ("float", "double") and ch_int != "UInt64":
        # Binary-float source, long-representable bounds: ANSI double→long
        # truncates toward zero and try_cast nulls only beyond long range
        # (with the documented 2^63 saturation edge, handled below), so the
        # clamp never needs decimals.
        d = c.cast("double")
        lng = d.try_cast("long")
        return (
            F.when(F.isnan(d), F.lit(None).cast("long"))
            # d < 2^63 gate: double(2^63) saturates try_cast to Long.MAX
            # instead of nulling (same edge as the general path); route it
            # to the sign clamp, which yields the identical hi bound.
            .when(
                lng.isNotNull() & (d < F.lit(float(1 << 63))),
                F.least(F.greatest(lng, F.lit(lo)), F.lit(hi)),
            )
            .when(d > 0, F.lit(hi))
            .when(d < 0, F.lit(lo))
            .cast(_SPARK_INT_TYPE[ch_int])
        )
    # bounds as string literals: UInt64's max exceeds the JVM long that a
    # plain python-int literal would be marshalled into
    lo_d = F.lit(str(lo)).cast("decimal(38,0)")
    hi_d = F.lit(str(hi)).cast("decimal(38,0)")
    # truncate toward zero (x % 1 keeps the dividend's sign in Spark), then
    # widen EXACTLY into decimal(38,0).  The naive double→decimal(38,0)
    # cast goes through the double's shortest decimal repr (17 significant
    # digits) and silently loses low bits for |x| in [2^53, 2^63) — e.g.
    # int64(double(2^58)) must be 288230376151711744 (Go truncation,
    # parser/fastjson.go:129-151) not ...740.  So:
    #   |t| < 2^63      → try_cast("long"): exact binary truncation for
    #                     doubles (Java (long)(double)) AND exact for
    #                     decimal/integer sources.
    #   t ∈ [2^63,2^64) → offset trick: t - 2^63 is computed in the
    #                     SOURCE type (double subtraction is exact there —
    #                     aligned exponents; decimal subtraction is always
    #                     exact), lands in long range, widen the long and
    #                     add 2^63 back as decimal.
    #   beyond          → decimal try_cast (exact for decimal sources;
    #                     doubles of that magnitude clamp for every target
    #                     type anyway, so shortest-repr wobble is harmless).
    # try_cast always applies ANSI semantics (null on overflow/NaN/±inf)
    # regardless of session mode.
    t = c - (c % F.lit(1))
    off = F.lit(str(1 << 63)).cast("decimal(38,0)")
    lng = t.try_cast("long")
    lng_hi = (t - off).try_cast("long")
    dbl = c.try_cast("double")
    # dbl < 2^63 gate: Spark's try_cast(double→long) range check compares
    # against Long.MAX.toDouble == 2^63 exactly, so double(2^63) SATURATES
    # to Long.MAX instead of nulling — route every value whose double view
    # reaches 2^63 through the offset branch (still exact: the subtraction
    # happens in the source type, and e.g. long(2^63-1) whose double view
    # rounds UP to 2^63 yields lng_hi = -1 → 2^63-1).  NaN compares greater
    # than everything in Spark, so it skips both guarded branches.
    wide = (
        F.when(
            lng.isNotNull() & (dbl < F.lit(float(1 << 63))),
            lng.cast("decimal(38,0)"),
        )
        .when((dbl >= 0) & lng_hi.isNotNull(), lng_hi.cast("decimal(38,0)") + off)
        .otherwise(t.try_cast("decimal(38,0)"))
    )
    # greatest/least SKIP nulls in Spark — gate explicitly so NULL stays
    # NULL instead of clamping to the type minimum.  When the wide path
    # nulls out but the double view is a non-NaN number, the magnitude
    # exceeds decimal(38) entirely — clamp by sign (NaN > 0 is TRUE in
    # Spark's ordering, so it must be excluded explicitly).
    clamped = (
        F.when(wide.isNotNull(), F.least(F.greatest(wide, lo_d), hi_d))
        .when(F.isnan(dbl), F.lit(None).cast("decimal(38,0)"))
        .when(dbl > 0, hi_d)
        .when(dbl < 0, lo_d)
    )
    return clamped.cast(_SPARK_INT_TYPE[ch_int])


def saturating_cast_float32(col: Column | str) -> Column:
    """Float64 → Float32 with clamp at ±max-float32 (parser/fastjson.go:175-188)."""
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast("double")
    return (
        F.when(d > F.lit(_FLOAT_MAX32), F.lit(_FLOAT_MAX32))
        .when(d < F.lit(-_FLOAT_MAX32), F.lit(-_FLOAT_MAX32))
        .otherwise(d)
        .cast("float")
    )


def default_literal(spark_type: str) -> Column:
    """Type default used for non-nullable columns on bad/missing data
    (parser/fastjson.go:582-621): 0 for numbers, "" for strings, false for
    bool, Epoch for timestamps, [] for arrays."""
    t = spark_type.lower()
    if t.startswith("decimal"):
        return F.lit(0).cast(spark_type)
    if t in ("tinyint", "smallint", "int", "bigint", "byte", "short", "long", "integer"):
        return F.lit(0).cast(spark_type)
    if t in ("float", "double"):
        return F.lit(0.0).cast(spark_type)
    if t == "boolean":
        return F.lit(False)
    if t == "timestamp":
        return F.lit(_EPOCH).cast("timestamp")
    if t == "date":
        return F.lit(_EPOCH.date())
    if t.startswith("array"):
        return F.array().cast(spark_type)
    return F.lit("")


def cast_with_default(col: Column | str, spark_type: str, nullable: bool) -> Column:
    """``try_cast`` + default-on-error: NULL if nullable else type default.

    Reference behavior table docs/dev/introduction.md:46-57 and
    parser/fastjson.go:582-621.
    """
    c = F.col(col) if isinstance(col, str) else col
    tried = c.try_cast(spark_type)
    if nullable:
        return tried
    return F.coalesce(tried, default_literal(spark_type))


# The reference tries 25 Go layouts (parser/parser.go:31-65).  Expressed as
# Spark datetime patterns, deduplicated where Spark's parser already accepts
# variants (e.g. optional fractional seconds via [.SSSSSSSSS]).
DATETIME_LAYOUTS = [
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]XXX",   # RFC3339 with offset
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]X",
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]",
    "yyyy-MM-dd HH:mm:ss[.SSSSSSSSS]XXX",
    "yyyy-MM-dd HH:mm:ss[.SSSSSSSSS]",
    "yyyy-MM-dd",
    "dd/MM/yyyy",
    "dd MMM yy HH:mm XXX",                    # RFC822Z-ish
    "MM/dd/yyyy HH:mm:ss",
    "yyyyMMdd HH:mm:ss",
    # ANSIC/RFC1123-family day-name layouts (parser/parser.go:31-44 tries
    # "Mon Jan 2 15:04:05 2006" etc).  Spark cannot parse EEE day-names, so
    # ``_prenormalize`` strips the day-name prefix, collapses runs of
    # spaces (ANSIC pads the day: "Jan  2"), and maps the named zones
    # GMT/UTC/UT to +00:00 before the chain runs; these layouts then match
    # the stripped remainder.
    "dd MMM yyyy HH:mm:ss XXX",               # RFC1123  (after strip)
    "dd MMM yyyy HH:mm:ss X",                 # RFC1123Z (after strip)
    "MMM d HH:mm:ss yyyy",                    # ANSIC    (after strip)
    "MMM d HH:mm:ss zzz yyyy",                # UnixDate (after strip)
    "dd-MMM-yy HH:mm:ss XXX",                 # RFC850   (after strip)
]

_DAYNAME_RE = r"^(Mon|Tue|Wed|Thu|Fri|Sat|Sun)[a-z]*,?\s+"


def _prenormalize(c: Column) -> Column:
    """Normalize day-name-family strings so the layout chain can parse them:
    drop the (redundant) leading day name, collapse space runs, rewrite the
    fixed named zones to an offset.  Strictly widening — strings that
    already parse are untouched by every rule (\\bZ\\b cannot match the 'Z'
    glued to a digit in ISO strings: no word boundary inside '0Z')."""
    out = F.regexp_replace(c, _DAYNAME_RE, "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.regexp_replace(out, r"\b(GMT|UTC|UT)\b", "+00:00")


def parse_datetime_any(col: Column | str, layouts: list[str] | None = None) -> Column:
    """Try each layout in order; first parse wins (≙ parser/parser.go:160-202).

    The reference memoizes the first successful layout per *field*; a
    ``coalesce`` of ``try_to_timestamp`` gives the same result on homogeneous
    fields (documented delta: heterogeneous fields parse per-value here).
    Catalyst codegens the chain — no Python in the loop.
    """
    c = F.col(col) if isinstance(col, str) else col
    layouts = layouts or DATETIME_LAYOUTS
    # Fast path: try the raw string first.  ``_prenormalize`` is strictly
    # widening (strings that parse raw are untouched by every rule), so a
    # raw success is always the same result the normalized chain would give
    # — but the common case (well-formed RFC3339, the ETL hot path) now
    # costs one try_to_timestamp instead of three regexp_replaces plus one.
    # Day-name/GMT/padded strings fail every raw attempt (no layout admits
    # an EEE prefix) and fall through to the normalized chain unchanged.
    raw = [F.try_to_timestamp(c, F.lit(fmt)) for fmt in layouts]
    pre = _prenormalize(c)
    normalized = [F.try_to_timestamp(pre, F.lit(fmt)) for fmt in layouts]
    return F.coalesce(*raw, *normalized)


def epoch_to_timestamp(col: Column | str, time_unit: float = 1.0) -> Column:
    """Numeric epoch → timestamp scaled by ``time_unit`` seconds
    (≙ UnixFloat, parser/parser.go:204-226).  Out-of-range (before 1970 or
    after 9999-12-31) → Epoch, matching the reference's guard.

    The scaling is done in exact decimal arithmetic (time_unit rendered as
    a 9-dp decimal literal) so results are bit-stable — double rounding at
    the microsecond boundary would otherwise make replays non-idempotent.
    """
    c = F.col(col) if isinstance(col, str) else col
    unit = F.lit(format(float(time_unit), ".9f")).cast("decimal(12,9)")
    secs = c.cast("decimal(20,6)") * unit  # exact: decimal(33,15)
    ts = F.timestamp_seconds(secs)
    max_ok = F.lit(253402300799)  # 9999-12-31T23:59:59Z
    return F.when((secs >= F.lit(0)) & (secs <= max_ok), ts).otherwise(
        F.lit(_EPOCH).cast("timestamp")
    )


_IPV4_RE = r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
# pragmatic IPv6 matcher: hex groups with optional :: compression, plus
# the IPv4-embedded tail forms (::ffff:1.2.3.4 — the most common IPv6
# strings in dual-stack logs; Go's net.ParseIP accepts them all)
_IPV4_TAIL = r"((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_IPV6_RE = (
    r"^(([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|:((:[0-9a-fA-F]{1,4}){1,7}|:)"
    r"|([0-9a-fA-F]{1,4}:){6}" + _IPV4_TAIL
    + r"|::(ffff(:0{1,4})?:)?" + _IPV4_TAIL
    + r"|([0-9a-fA-F]{1,4}:){1,4}:" + _IPV4_TAIL
    + r")$"
)


def valid_ip_or_default(col: Column | str, v6: bool = False) -> Column:
    """Validated IP string; invalid → zero IP (parser/fastjson.go:739-785)."""
    c = F.col(col) if isinstance(col, str) else col
    if v6:
        return F.when(c.rlike(_IPV6_RE), c).otherwise(F.lit("::"))
    return F.when(c.rlike(_IPV4_RE), c).otherwise(F.lit("0.0.0.0"))


def detect_datetime_layout(
    df, col: str, layouts: list[str] | None = None
) -> str | None:
    """Phase 1 of the two-phase strict P9 mode: find the layout the
    reference would memoize for this field — the FIRST layout (in list
    order) that parses the field's first non-null value
    (parser/parser.go:160-189 walks the layout table once and caches the
    winner per field forever).

    Driver-side control-plane sampling (two one-row jobs, like schema
    inference) — the detected layout is then BOUND into the plan by
    ``parse_datetime_bound``, keeping the hot path fully JVM-side and the
    commitment deterministic across executors (unlike a per-worker
    cache).  Returns None when the field has no non-null values or none
    of the layouts match."""
    layouts = layouts or DATETIME_LAYOUTS
    first = (
        df.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .limit(1)
        .collect()
    )
    if not first:
        return None
    probe = df.sparkSession.createDataFrame([(str(first[0][0]),)], "v string")
    hits = probe.select(
        *[
            parse_datetime_bound("v", fmt).isNotNull().alias(f"f{i}")
            for i, fmt in enumerate(layouts)
        ]
    ).first()
    for i, fmt in enumerate(layouts):
        if hits[f"f{i}"]:
            return fmt
    return None


def parse_datetime_bound(col: Column | str, fmt: str) -> Column:
    """Phase 2 of the strict P9 mode: parse with ONE committed layout —
    values in any other layout return NULL, exactly the reference's
    post-memoization behavior.  Raw try first, then the day-name
    pre-normalized form (same widening as parse_datetime_any)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit(fmt)),
        F.try_to_timestamp(_prenormalize(c), F.lit(fmt)),
    )


def parse_datetime_adaptive(col: Column | str, layouts: list[str] | None = None) -> Column:
    """Strict reference-mode P9: commit to the FIRST layout that matches a
    field and use only it from then on (parser/parser.go:160-189 caches the
    layout per field forever).

    On heterogeneous fields this differs from ``parse_datetime_any`` (which
    retries all layouts per value): once a batch has seen a layout, later
    values in other layouts return NULL — exactly the reference's behavior.

    Implementation: Arrow-batched pandas UDF with closure state (the one
    place the semantics genuinely need per-field mutable state).  The cache
    is per-executor-python-worker; workers converge after one batch each.
    Use ``parse_datetime_any`` unless reference-exact heterogeneous
    behavior is required — the coalesce chain stays JVM-side and faster.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    fmts = list(layouts or DATETIME_LAYOUTS)
    # Java layout → Python strptime equivalents for the fixed list above
    py_fmts = {
        "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]XXX": "%Y-%m-%dT%H:%M:%S%z",
        "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]X": "%Y-%m-%dT%H:%M:%S%z",
        "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]": "%Y-%m-%dT%H:%M:%S",
        "yyyy-MM-dd HH:mm:ss[.SSSSSSSSS]XXX": "%Y-%m-%d %H:%M:%S%z",
        "yyyy-MM-dd HH:mm:ss[.SSSSSSSSS]": "%Y-%m-%d %H:%M:%S",
        "yyyy-MM-dd": "%Y-%m-%d",
        "dd/MM/yyyy": "%d/%m/%Y",
        "dd MMM yy HH:mm XXX": "%d %b %y %H:%M %z",
        "MM/dd/yyyy HH:mm:ss": "%m/%d/%Y %H:%M:%S",
        "yyyyMMdd HH:mm:ss": "%Y%m%d %H:%M:%S",
        # day-name family — parsed after the same pre-normalization the
        # JVM path applies (strip day name / collapse spaces / zone→offset).
        # UnixDate's named zones (MST…) have no strptime equivalent: JVM
        # path only.
        "dd MMM yyyy HH:mm:ss XXX": "%d %b %Y %H:%M:%S %z",
        "dd MMM yyyy HH:mm:ss X": "%d %b %Y %H:%M:%S %z",
        "MMM d HH:mm:ss yyyy": "%b %d %H:%M:%S %Y",
        "dd-MMM-yy HH:mm:ss XXX": "%d-%b-%y %H:%M:%S %z",
    }
    ordered = []
    for f in fmts:
        pf = py_fmts.get(f)
        if pf is not None and pf not in ordered:
            ordered.append(pf)

    _cache: dict[str, str] = {}

    def _py_prenorm(s):
        s = s.str.replace(r"^(Mon|Tue|Wed|Thu|Fri|Sat|Sun)[a-z]*,?\s+", "", regex=True)
        s = s.str.replace(r"\s+", " ", regex=True)
        return s.str.replace(r"\b(GMT|UTC|UT)\b", "+0000", regex=True)

    def _parse_fn(s):
        s = _py_prenorm(s)
        state = _cache
        committed = state.get("fmt")
        if committed is None:
            for fmt in ordered:
                probe = s.dropna()
                if probe.empty:
                    break
                try:
                    pd.to_datetime(probe.iloc[0], format=fmt)
                    committed = fmt
                    state["fmt"] = fmt
                    break
                except (ValueError, TypeError):
                    continue
        if committed is None:
            return pd.to_datetime(pd.Series([None] * len(s)))
        return pd.to_datetime(s, format=committed, errors="coerce", utc=True).dt.tz_localize(None)

    _parse = pandas_udf(_parse_fn, "timestamp")
    c = F.col(col) if isinstance(col, str) else col
    return _parse(c)
