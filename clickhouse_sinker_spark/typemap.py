"""ClickHouse type-string parsing → Spark ``DataType``.

Re-expresses the reference's ``WhichType`` (model/value.go:161-220) and the
type enum (model/value.go:27-47) on Spark's type system.  Differences that
matter and how we map them:

- Unsigned ints don't exist in Spark: UInt8→short, UInt16→int, UInt32→long,
  UInt64→decimal(20,0) (full 0..2^64-1 range)  (model/value.go:232-237,
  parser/fastjson.go:153-173 clamping ranges).
- LowCardinality(T) unwraps to T (model/value.go:60,162).
- DateTime / DateTime64(p) → timestamp; precision is kept as metadata for
  epoch scaling (model/value.go:177-190).
- Decimal* → decimal(38,9) default, Decimal(P,S)/Decimal32/64/128 honored.
- Enum8/16, UUID, FixedString(n), IPv4, IPv6 → string
  (model/value.go:191-213; IP columns are validated strings, §functions.casts).
- Object('json') → map<string,string> (loose object, parser/fastjson.go:681-710).
- Map(K,V) recursive (model/value.go:202-213); Array(T) recursive
  (model/value.go:222-238); Nullable(T) → nullable field.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

__all__ = ["CHType", "parse_ch_type", "to_spark_type", "to_spark_field", "spark_schema"]

# integer bounds used by the saturating casts (parser/fastjson.go:129-173)
INT_BOUNDS = {
    "Int8": (-(2**7), 2**7 - 1),
    "Int16": (-(2**15), 2**15 - 1),
    "Int32": (-(2**31), 2**31 - 1),
    "Int64": (-(2**63), 2**63 - 1),
    "UInt8": (0, 2**8 - 1),
    "UInt16": (0, 2**16 - 1),
    "UInt32": (0, 2**32 - 1),
    "UInt64": (0, 2**64 - 1),
}


@dataclass
class CHType:
    """Parsed ClickHouse type descriptor (≙ model/value.go:49-56 TypeInfo)."""

    name: str  # canonical base name: Int64, String, DateTime, Map, ...
    nullable: bool = False
    array: bool = False  # Array(T) with T described by the rest of the fields
    map_key: "CHType | None" = None
    map_value: "CHType | None" = None
    datetime_precision: int = 0  # DateTime64(p)
    decimal_precision: int = 38
    decimal_scale: int = 9
    params: tuple = field(default_factory=tuple)

    def spark_type(self) -> T.DataType:
        return to_spark_type(self)


_SIMPLE = {
    "Bool": T.BooleanType(),
    "Int8": T.ByteType(),
    "Int16": T.ShortType(),
    "Int32": T.IntegerType(),
    "Int64": T.LongType(),
    # unsigned: widen one level; UInt64 needs decimal(20,0) for the top half
    "UInt8": T.ShortType(),
    "UInt16": T.IntegerType(),
    "UInt32": T.LongType(),
    "UInt64": T.DecimalType(20, 0),
    "Float32": T.FloatType(),
    "Float64": T.DoubleType(),
    "String": T.StringType(),
    "UUID": T.StringType(),
    "IPv4": T.StringType(),
    "IPv6": T.StringType(),
    "Date": T.DateType(),
    "Date32": T.DateType(),
    "DateTime": T.TimestampType(),
    "Object": T.MapType(T.StringType(), T.StringType()),
}

_PAREN = re.compile(r"^(\w+)\s*\((.*)\)$", re.S)


def _split_args(s: str) -> list[str]:
    """Split a CH type argument list on top-level commas."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def parse_ch_type(s: str) -> CHType:
    """Parse a ClickHouse type string (≙ WhichType, model/value.go:161-220)."""
    s = s.strip()
    m = _PAREN.match(s)
    base, args = (m.group(1), _split_args(m.group(2))) if m else (s, [])

    if base == "Nullable":
        inner = parse_ch_type(args[0])
        inner.nullable = True
        return inner
    if base == "LowCardinality":  # unwrap (model/value.go:60,162)
        return parse_ch_type(args[0])
    if base == "Array":
        inner = parse_ch_type(args[0])
        inner.array = True
        return inner
    if base == "Map":
        return CHType("Map", map_key=parse_ch_type(args[0]), map_value=parse_ch_type(args[1]))
    if base == "DateTime64":
        prec = int(args[0]) if args else 3
        return CHType("DateTime", datetime_precision=prec)
    if base == "DateTime":
        return CHType("DateTime")
    if base in ("Decimal", "Decimal32", "Decimal64", "Decimal128", "Decimal256"):
        if base == "Decimal" and len(args) == 2:
            return CHType("Decimal", decimal_precision=int(args[0]), decimal_scale=int(args[1]))
        scale = int(args[0]) if args else 9
        prec = {"Decimal32": 9, "Decimal64": 18, "Decimal128": 38, "Decimal256": 38}.get(base, 38)
        return CHType("Decimal", decimal_precision=prec, decimal_scale=scale)
    if base in ("FixedString", "Enum8", "Enum16"):
        return CHType("String", params=tuple(args))
    if base == "Object":  # Object('json')
        return CHType("Object")
    if base in _SIMPLE or base in ("Bool", "Date", "Date32"):
        return CHType(base)
    # Unknown → String (reference stringifies unknowns, parser/fastjson.go:712-728)
    return CHType("String", params=(s,))


def to_spark_type(t: CHType) -> T.DataType:
    if t.array:
        elem = CHType(**{**t.__dict__, "array": False, "nullable": False})
        return T.ArrayType(to_spark_type(elem), containsNull=t.nullable or True)
    if t.name == "Map":
        return T.MapType(to_spark_type(t.map_key), to_spark_type(t.map_value))
    if t.name == "Decimal":
        return T.DecimalType(t.decimal_precision, t.decimal_scale)
    return _SIMPLE.get(t.name, T.StringType())


def to_spark_field(name: str, ch_type: str, nullable: bool | None = None) -> T.StructField:
    t = parse_ch_type(ch_type)
    n = t.nullable if nullable is None else nullable
    return T.StructField(name, to_spark_type(t), n)


def spark_schema(columns: list[tuple[str, str]]) -> T.StructType:
    """Build a StructType from [(name, ch_type_string), ...] — the Spark
    equivalent of the reference's ``[]ColumnWithType`` (model/metric.go:57-62)."""
    return T.StructType([to_spark_field(n, t) for n, t in columns])
