"""ClickHouse Native-format block codec + HTTP bulk-insert transport.

The reference's hot write path frames each batch as native-protocol blocks
(`pool/ck_cli.go:126-247` sends column-oriented blocks per shard;
`output/clickhouse.go:139-295` builds them column-by-column and retries
with bad rows dropped).  This module re-creates the byte-exact BLOCK
layout from the PUBLIC Native format specification (the ClickHouse
``FORMAT Native`` interchange format, produced/consumed by
``clickhouse-client`` and every community driver):

    block     := varint(n_columns) varint(n_rows) column*
    column    := string(name) string(type) data
    string    := varint(len) bytes
    data      := per-type column-oriented values, little-endian

Per-type data layout (all little-endian):

    (U)Int8/16/32/64, Float32/64   fixed-width values, one per row
    String                         per value: varint(len) + bytes
    FixedString(n)                 n bytes per value (zero padded)
    Date                           UInt16 days since 1970-01-01
    DateTime                       UInt32 unix seconds
    DateTime64(p)                  Int64 unix time scaled by 10^p
    Nullable(T)                    UInt8 null mask (1 = NULL) for every
                                   row FIRST, then T data with a default
                                   at null positions
    Array(T)                       UInt64 cumulative end-offsets, one per
                                   row, then the flattened T data (works
                                   recursively: Array(Nullable(T)) puts the
                                   flattened-size null mask after offsets)
    Tuple(T1, ..., Tn)             element columns back to back
    UUID                           two UInt64 halves per value, high
                                   half first, each little-endian
    IPv4                           UInt32 per value (integer form of the
                                   dotted quad)
    IPv6                           16 network-order bytes per value
    Map(K, V)                      like Array(Tuple(K, V)): UInt64
                                   cumulative end-offsets, then all keys,
                                   then all values
    Enum8/Enum16('a' = 1, ...)     Int8/Int16 codes per row
    LowCardinality(T)              dictionary encoding ("additional keys"
                                   serialization): UInt64 keys-version (1),
                                   then UInt64 serialization flags
                                   (HasAdditionalKeys | index width),
                                   UInt64 dict size, dictionary values as
                                   plain T (slot 0 = default when T is
                                   Nullable), UInt64 row count, and the
                                   per-row indexes in the smallest UInt
                                   width that fits the dictionary

The wire protocol wraps the same block in a BlockInfo envelope after the
hello/query handshake; the HTTP interface accepts the bare format via
``INSERT INTO t FORMAT Native`` with this module's bytes as the POST body
— that is ``insert_native_http``, the server-optional stand-in for the
reference's pooled native connection (pool/ck_cli.go).  Like the
reference, encoding is per batch partition: call from foreachPartition so
each executor frames its own shard's rows (no driver collect).
"""

from __future__ import annotations

import struct
import urllib.parse
import urllib.request
from datetime import date, datetime, timedelta, timezone

__all__ = [
    "encode_block",
    "encode_block_arrow",
    "decode_block",
    "insert_native_http",
]

_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_DT = datetime(1970, 1, 1, tzinfo=timezone.utc)

# fixed-width numeric types: struct format char (little-endian applied at
# pack time) and a zero default for null backfill.  Bool is wire-identical
# to UInt8 (the server serializes it as one byte).
_FIXED = {
    "Int8": ("b", 0),
    "Int16": ("h", 0),
    "Int32": ("i", 0),
    "Int64": ("q", 0),
    "UInt8": ("B", 0),
    "UInt16": ("H", 0),
    "UInt32": ("I", 0),
    "UInt64": ("Q", 0),
    "Float32": ("f", 0.0),
    "Float64": ("d", 0.0),
    "Bool": ("B", 0),
}


def _varint(n: int) -> bytes:
    """ULEB128 — the Native format's length encoding."""
    if n < 0:
        raise ValueError("varint is unsigned")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _enc_str(s: str | bytes) -> bytes:
    b = s.encode("utf-8") if isinstance(s, str) else s
    return _varint(len(b)) + b


def _to_epoch_micros(v) -> int:
    """Exact integer µs since epoch via timedelta arithmetic — no float
    round-trip, sign-correct for pre-epoch values (``int(ts.timestamp())``
    truncates toward zero and flips sub-second fractions before 1970).
    A NAIVE datetime is read as UTC — callers on hosts with another OS
    timezone must convert first (NativeHttpSink ships epoch integers from
    the JVM for exactly this reason)."""
    if v.tzinfo is None:
        v = v.replace(tzinfo=timezone.utc)
    return (v - _EPOCH_DT) // timedelta(microseconds=1)


def _to_epoch_seconds(v) -> int:
    if isinstance(v, datetime):
        return _to_epoch_micros(v) // 1_000_000
    return int(v)


def _strip_lc(ch_type: str) -> str:
    t = ch_type.strip()
    if t.startswith("LowCardinality(") and t.endswith(")"):
        return t[len("LowCardinality(") : -1].strip()
    return t


def _split_args(args: str) -> list[str]:
    """Split a type-argument list on top-level commas, respecting nested
    parens and quoted Enum names (``Map(String, Array(Int32))``,
    ``Enum8('a,b' = 1)``)."""
    out, depth, start, i, n = [], 0, 0, 0, len(args)
    while i < n:
        ch = args[i]
        if ch == "'":
            i += 1
            while i < n:
                if args[i] == "\\":
                    i += 2
                    continue
                if args[i] == "'":
                    break
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(args[start:i].strip())
            start = i + 1
        i += 1
    out.append(args[start:].strip())
    return out


def _enum_map(t: str) -> tuple[str, dict[str, int]]:
    """``Enum8('a' = 1, 'b' = 2)`` → ('Int8', {'a': 1, 'b': 2}).
    Escaped quotes inside names (``\\'``) are unescaped."""
    width = "Int8" if t.startswith("Enum8(") else "Int16"
    body = t[t.index("(") + 1 : -1]
    mapping: dict[str, int] = {}
    for entry in _split_args(body):
        if not entry:
            continue
        name_part, _, num = entry.rpartition("=")
        name_part = name_part.strip()
        if not (name_part.startswith("'") and name_part.endswith("'")):
            raise ValueError(f"malformed Enum entry: {entry!r}")
        name = name_part[1:-1].replace("\\'", "'").replace("\\\\", "\\")
        mapping[name] = int(num.strip())
    return width, mapping


# LowCardinality "additional keys" serialization flags
# (ClickHouse SerializationLowCardinality, public source/docs)
_LC_VERSION = 1  # SharedDictionariesWithAdditionalKeys
_LC_HAS_ADDITIONAL_KEYS = 1 << 9
_LC_INDEX_FMT = ["B", "H", "I", "Q"]  # UInt8/16/32/64 row-index widths


def _lc_index_type(dict_size: int) -> int:
    if dict_size <= 0xFF:
        return 0
    if dict_size <= 0xFFFF:
        return 1
    if dict_size <= 0xFFFFFFFF:
        return 2
    return 3


def _encode_lowcardinality(inner: str, values: list) -> bytes:
    """Dictionary-encode one LC column: distinct values in first-seen
    order become the dictionary (slot 0 reserved for the inner default
    when the inner type is Nullable), rows become fixed-width indexes."""
    nullable = inner.startswith("Nullable(")
    base = inner[len("Nullable(") : -1].strip() if nullable else inner
    out = bytearray(struct.pack("<Q", _LC_VERSION))
    if not values:
        return bytes(out)
    dict_vals: list = []
    slot: dict = {}
    if nullable:
        dict_vals.append(_default_for(base))  # slot 0 ≡ NULL
    indexes = []
    for v in values:
        if nullable and v is None:
            indexes.append(0)
            continue
        key = v
        if key not in slot:
            slot[key] = len(dict_vals)
            dict_vals.append(v)
        indexes.append(slot[key])
    ix = _lc_index_type(len(dict_vals))
    out += struct.pack("<Q", _LC_HAS_ADDITIONAL_KEYS | ix)
    out += struct.pack("<Q", len(dict_vals))
    out += _encode_data(base, dict_vals)  # dictionary: plain inner, no mask
    out += struct.pack("<Q", len(values))
    out += struct.pack(f"<{len(values)}{_LC_INDEX_FMT[ix]}", *indexes)
    return bytes(out)


def _decode_lowcardinality(inner: str, buf: bytes, pos: int, n: int) -> tuple[list, int]:
    nullable = inner.startswith("Nullable(")
    base = inner[len("Nullable(") : -1].strip() if nullable else inner
    (version,) = struct.unpack_from("<Q", buf, pos)
    pos += 8
    if version != _LC_VERSION:
        raise ValueError(f"unsupported LowCardinality keys version {version}")
    if n == 0:
        return [], pos
    (flags,) = struct.unpack_from("<Q", buf, pos)
    pos += 8
    if not flags & _LC_HAS_ADDITIONAL_KEYS:
        raise ValueError("LowCardinality without additional keys not supported")
    ix = flags & 0xFF
    (dict_size,) = struct.unpack_from("<Q", buf, pos)
    pos += 8
    dict_vals, pos = _decode_data(base, buf, pos, dict_size)
    (n_rows,) = struct.unpack_from("<Q", buf, pos)
    pos += 8
    if n_rows != n:
        raise ValueError(f"LowCardinality row count {n_rows} != block rows {n}")
    fmt = _LC_INDEX_FMT[ix]
    idx = struct.unpack_from(f"<{n}{fmt}", buf, pos)
    pos += n * struct.calcsize(fmt)
    return [None if (nullable and i == 0) else dict_vals[i] for i in idx], pos


def _encode_data(ch_type: str, values: list) -> bytes:
    t = ch_type.strip()
    if t.startswith("LowCardinality(") and t.endswith(")"):
        return _encode_lowcardinality(_strip_lc(t), values)
    if t.startswith("Nullable(") and t.endswith(")"):
        inner = t[len("Nullable(") : -1].strip()
        mask = bytes(1 if v is None else 0 for v in values)
        default = _default_for(inner)
        filled = [default if v is None else v for v in values]
        return mask + _encode_data(inner, filled)
    if t in _FIXED:
        fmt, _ = _FIXED[t]
        return struct.pack(f"<{len(values)}{fmt}", *[
            (int(v) if fmt not in "fd" else float(v)) for v in values
        ])
    if t == "String":
        return b"".join(_enc_str(v if v is not None else "") for v in values)
    if t.startswith("FixedString(") and t.endswith(")"):
        n = int(t[len("FixedString(") : -1])
        out = bytearray()
        for v in values:
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v or b"")
            if len(b) > n:
                raise ValueError(f"value longer than FixedString({n})")
            out += b + b"\x00" * (n - len(b))
        return bytes(out)
    if t == "Date":
        return struct.pack(
            f"<{len(values)}H",
            *[
                (v - _EPOCH_DATE).days if isinstance(v, date) else int(v)
                for v in values
            ],
        )
    if t == "DateTime":
        return struct.pack(f"<{len(values)}I", *[_to_epoch_seconds(v) for v in values])
    if t.startswith("DateTime64(") and t.endswith(")"):
        p = int(t[len("DateTime64(") : -1].split(",")[0])
        scale = 10**p
        out = [
            _to_epoch_micros(v) * scale // 1_000_000
            if isinstance(v, datetime)
            else int(v)  # raw ints are pre-scaled per the type's contract
            for v in values
        ]
        return struct.pack(f"<{len(values)}q", *out)
    if t.startswith("Decimal(") and t.endswith(")"):
        p, s = _decimal_args(t)
        if p > 38:
            raise ValueError(
                f"Decimal precision {p} > 38 needs the 32-byte Int256 "
                "column layout — not supported by this encoder"
            )
        from decimal import Context, Decimal

        # default context is 28 significant digits — a Decimal(38, 9)
        # value would silently round during scaling; use 50
        ctx = Context(prec=50)
        scale = Decimal(10) ** s
        ints = [
            int(ctx.to_integral_value(ctx.multiply(Decimal(str(v)), scale)))
            for v in values
        ]
        if p <= 18:  # Decimal64 column layout
            return struct.pack(f"<{len(values)}q", *ints)
        # Decimal128: 16-byte little-endian two's-complement per value
        return b"".join(v.to_bytes(16, "little", signed=True) for v in ints)
    if t == "Date32":
        return struct.pack(
            f"<{len(values)}i",
            *[
                (v - _EPOCH_DATE).days if isinstance(v, date) else int(v)
                for v in values
            ],
        )
    if t.startswith("Array(") and t.endswith(")"):
        inner = t[len("Array(") : -1].strip()
        offsets, flat, total = [], [], 0
        for v in values:
            v = list(v) if v is not None else []
            total += len(v)
            offsets.append(total)
            flat.extend(v)
        return struct.pack(f"<{len(offsets)}Q", *offsets) + _encode_data(inner, flat)
    if t == "UUID":
        # two UInt64 halves, high first, each little-endian
        # (the reference maps UUID columns from string metrics,
        # model/value.go:232-234)
        import uuid as _uuid

        out = bytearray()
        for v in values:
            u = v if isinstance(v, _uuid.UUID) else _uuid.UUID(str(v) if v else "00000000-0000-0000-0000-000000000000")
            out += struct.pack("<QQ", u.int >> 64, u.int & 0xFFFFFFFFFFFFFFFF)
        return bytes(out)
    if t == "IPv4":
        # UInt32 host-order int of the dotted quad (parser/fastjson.go:739)
        import ipaddress as _ip

        return struct.pack(
            f"<{len(values)}I",
            *[
                int(_ip.IPv4Address(v)) if not isinstance(v, int) else v
                for v in values
            ],
        )
    if t == "IPv6":
        # 16 raw network-order bytes (FixedString(16) layout)
        import ipaddress as _ip

        out = bytearray()
        for v in values:
            out += (
                v if isinstance(v, (bytes, bytearray)) else _ip.IPv6Address(v).packed
            )
        return bytes(out)
    if t.startswith("Tuple(") and t.endswith(")"):
        elems = _split_args(t[len("Tuple(") : -1])
        out = bytearray()
        for i, et in enumerate(elems):
            out += _encode_data(et, [v[i] for v in values])
        return bytes(out)
    if t.startswith("Map(") and t.endswith(")"):
        kt, vt = _split_args(t[len("Map(") : -1])
        offsets, keys, vals, total = [], [], [], 0
        for v in values:
            items = list(v.items()) if isinstance(v, dict) else list(v or [])
            total += len(items)
            offsets.append(total)
            keys.extend(k for k, _ in items)
            vals.extend(x for _, x in items)
        return (
            struct.pack(f"<{len(offsets)}Q", *offsets)
            + _encode_data(kt, keys)
            + _encode_data(vt, vals)
        )
    if t.startswith(("Enum8(", "Enum16(")) and t.endswith(")"):
        width, mapping = _enum_map(t)
        valid = set(mapping.values())
        codes = [mapping[v] if isinstance(v, str) else int(v) for v in values]
        bad = [c for c in codes if c not in valid]
        if bad:
            raise ValueError(f"value(s) {bad!r} not in {t}")
        return _encode_data(width, codes)
    raise ValueError(f"unsupported ClickHouse type for Native encoding: {ch_type!r}")


def _decimal_args(t: str) -> tuple[int, int]:
    p, s = (x.strip() for x in t[len("Decimal(") : -1].split(","))
    return int(p), int(s)


def _default_for(ch_type: str):
    t = _strip_lc(ch_type)
    if t in _FIXED:
        return _FIXED[t][1]
    if t == "String" or t.startswith("FixedString("):
        return ""
    if t == "Date":
        return 0
    if t == "DateTime" or t.startswith("DateTime64("):
        return 0
    if t.startswith("Array("):
        return []
    if t.startswith("Tuple("):
        return tuple(
            _default_for(et) for et in _split_args(t[len("Tuple(") : -1])
        )
    if t.startswith("Map("):
        return {}
    if t.startswith(("Enum8(", "Enum16(")):
        # CH's Enum default is the first listed name
        _, mapping = _enum_map(t)
        return next(iter(mapping)) if mapping else 0
    if t == "UUID":
        return "00000000-0000-0000-0000-000000000000"
    if t == "IPv4":
        return 0
    if t == "IPv6":
        return "::"
    return 0


def encode_block(columns: list[tuple[str, str, list]]) -> bytes:
    """``[(name, ch_type, values)] → Native block bytes``.  All columns
    must have the same row count; column order is preserved exactly as
    given — the reference writes columns in table DDL order
    (output/clickhouse.go:139-170), and so must callers."""
    if not columns:
        return _varint(0) + _varint(0)
    n_rows = len(columns[0][2])
    for name, _t, vals in columns:
        if len(vals) != n_rows:
            raise ValueError(f"column {name!r}: {len(vals)} rows, expected {n_rows}")
    out = bytearray(_varint(len(columns)) + _varint(n_rows))
    for name, ch_type, vals in columns:
        out += _enc_str(name) + _enc_str(ch_type) + _encode_data(ch_type, vals)
    return bytes(out)


# struct format char → little-endian numpy dtype for the vectorized path
_NP_DTYPE = {
    "b": "<i1", "h": "<i2", "i": "<i4", "q": "<i8",
    "B": "<u1", "H": "<u2", "I": "<u4", "Q": "<u8",
    "f": "<f4", "d": "<f8",
}


def _encode_arrow_data(ch_type: str, col) -> bytes:
    """Columnar encoder for one pyarrow Array/ChunkedArray: fixed-width
    numerics (and the sink's pre-epochized DateTime64(6) int64 columns)
    serialize as one numpy ``astype(...).tobytes()`` instead of a per-row
    Python loop; variable-width and nested types fall back to the
    row-wise encoder (their framing is inherently per-value — the
    reference's Go writer loops those too, pool/ck_cli.go:190-236)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = ch_type.strip()
    if t.startswith("Nullable(") and t.endswith(")"):
        inner = t[len("Nullable(") : -1].strip()
        mask = pc.is_null(col).to_numpy(zero_copy_only=False).astype("<u1").tobytes()
        if col.null_count:
            default = _default_for(inner)
            try:
                col = col.fill_null(default)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                return mask + _encode_data(inner, [
                    default if v is None else v for v in col.to_pylist()
                ])
        return mask + _encode_arrow_data(inner, col)
    fixed = _FIXED.get(t)
    if fixed is None and t.startswith("DateTime64(") and pa.types.is_integer(col.type):
        fixed = ("q", 0)  # sink ships pre-scaled epoch integers
    numeric = (
        pa.types.is_integer(col.type)
        or pa.types.is_floating(col.type)
        or pa.types.is_boolean(col.type)
    )
    if fixed is not None and numeric:
        np_col = col.to_numpy(zero_copy_only=False)
        dt_s = _NP_DTYPE[fixed[0]]
        # astype would WRAP out-of-range integers where the row-wise
        # struct.pack path raises — keep the byte-identical contract by
        # checking bounds first
        if fixed[0] not in ("f", "d") and np_col.size and np_col.dtype.kind in "iu":
            info = np.iinfo(dt_s)
            lo, hi = int(np_col.min()), int(np_col.max())
            if lo < info.min or hi > info.max:
                raise ValueError(
                    f"value out of range for {t}: [{lo}, {hi}] exceeds "
                    f"[{info.min}, {info.max}]"
                )
        return np.ascontiguousarray(np_col.astype(dt_s)).tobytes()
    if t == "String" and (
        pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
    ):
        out = _encode_arrow_strings(col, np, pa)
        if out is not None:
            return out
    return _encode_data(t, col.to_pylist())


def _encode_arrow_strings(arr, np, pa) -> bytes | None:
    """Vectorized String column framing straight off the Arrow buffers:
    per value ``varint(len) + utf8 bytes``.  The utf-8 data buffer is
    already the exact byte payload; lengths come from the offsets buffer;
    interleaving is one numpy scatter (each data byte of value i shifts
    right by the i+1 one-byte varints before it).  Values ≥ 128 bytes
    need multi-byte varints — that path returns None and the caller
    falls back to the row-wise loop."""
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    if bufs[1] is None or len(arr) == 0:
        return b""
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    lens = np.diff(offs)
    if lens.size and int(lens.max()) >= 128:
        return None
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
    n = lens.size
    out = np.empty(n + data.size, np.uint8)
    starts = np.empty(n, np.int64)
    starts[0] = 0
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    out[starts] = lens
    if data.size:
        pos = np.arange(data.size, dtype=np.int64) + np.repeat(
            np.arange(1, n + 1, dtype=np.int64), lens
        )
        out[pos] = data
    return out.tobytes()


def encode_block_arrow(fields: list[tuple[str, str]], batch) -> bytes:
    """``encode_block`` from a pyarrow RecordBatch/Table — byte-identical
    output, vectorized column framing (the sink's hot path)."""
    out = bytearray(_varint(batch.num_columns) + _varint(batch.num_rows))
    for (name, ch_type), col in zip(fields, batch.columns):
        out += _enc_str(name) + _enc_str(ch_type)
        out += _encode_arrow_data(ch_type, col)
    return bytes(out)


def _decode_data(ch_type: str, buf: bytes, pos: int, n: int) -> tuple[list, int]:
    t = ch_type.strip()
    if t.startswith("LowCardinality(") and t.endswith(")"):
        return _decode_lowcardinality(_strip_lc(t), buf, pos, n)
    if t.startswith("Nullable(") and t.endswith(")"):
        inner = t[len("Nullable(") : -1].strip()
        mask = buf[pos : pos + n]
        pos += n
        vals, pos = _decode_data(inner, buf, pos, n)
        return [None if m else v for m, v in zip(mask, vals)], pos
    if t in _FIXED:
        fmt, _ = _FIXED[t]
        size = struct.calcsize(fmt)
        vals = list(struct.unpack_from(f"<{n}{fmt}", buf, pos))
        return vals, pos + n * size
    if t == "String":
        vals = []
        for _ in range(n):
            ln, pos = _read_varint(buf, pos)
            vals.append(buf[pos : pos + ln].decode("utf-8"))
            pos += ln
        return vals, pos
    if t.startswith("FixedString(") and t.endswith(")"):
        w = int(t[len("FixedString(") : -1])
        vals = [
            buf[pos + i * w : pos + (i + 1) * w].rstrip(b"\x00").decode("utf-8")
            for i in range(n)
        ]
        return vals, pos + n * w
    if t == "Date":
        vals = list(struct.unpack_from(f"<{n}H", buf, pos))
        return vals, pos + 2 * n
    if t == "DateTime":
        vals = list(struct.unpack_from(f"<{n}I", buf, pos))
        return vals, pos + 4 * n
    if t.startswith("DateTime64("):
        vals = list(struct.unpack_from(f"<{n}q", buf, pos))
        return vals, pos + 8 * n
    if t.startswith("Decimal(") and t.endswith(")"):
        from decimal import Context, Decimal

        p, s = _decimal_args(t)
        if p > 38:
            raise ValueError(
                f"Decimal precision {p} > 38 needs the 32-byte Int256 "
                "column layout — not supported by this decoder"
            )
        ctx = Context(prec=50)  # default 28 digits would round Decimal128
        if p <= 18:
            raw = struct.unpack_from(f"<{n}q", buf, pos)
            return [Decimal(v).scaleb(-s, context=ctx) for v in raw], pos + 8 * n
        vals = [
            Decimal(int.from_bytes(buf[pos + i * 16 : pos + (i + 1) * 16],
                                   "little", signed=True)).scaleb(-s, context=ctx)
            for i in range(n)
        ]
        return vals, pos + 16 * n
    if t == "Date32":
        vals = list(struct.unpack_from(f"<{n}i", buf, pos))
        return vals, pos + 4 * n
    if t.startswith("Array(") and t.endswith(")"):
        inner = t[len("Array(") : -1].strip()
        offsets = list(struct.unpack_from(f"<{n}Q", buf, pos))
        pos += 8 * n
        flat, pos = _decode_data(inner, buf, pos, offsets[-1] if offsets else 0)
        vals, prev = [], 0
        for off in offsets:
            vals.append(flat[prev:off])
            prev = off
        return vals, pos
    if t == "UUID":
        import uuid as _uuid

        vals = []
        for i in range(n):
            hi, lo = struct.unpack_from("<QQ", buf, pos + 16 * i)
            vals.append(str(_uuid.UUID(int=(hi << 64) | lo)))
        return vals, pos + 16 * n
    if t == "IPv4":
        import ipaddress as _ip

        raw = struct.unpack_from(f"<{n}I", buf, pos)
        return [str(_ip.IPv4Address(v)) for v in raw], pos + 4 * n
    if t == "IPv6":
        import ipaddress as _ip

        vals = [
            str(_ip.IPv6Address(bytes(buf[pos + 16 * i : pos + 16 * (i + 1)])))
            for i in range(n)
        ]
        return vals, pos + 16 * n
    if t.startswith("Tuple(") and t.endswith(")"):
        elems = _split_args(t[len("Tuple(") : -1])
        cols = []
        for et in elems:
            col, pos = _decode_data(et, buf, pos, n)
            cols.append(col)
        return [tuple(row) for row in zip(*cols)] if cols else [()] * n, pos
    if t.startswith("Map(") and t.endswith(")"):
        kt, vt = _split_args(t[len("Map(") : -1])
        offsets = list(struct.unpack_from(f"<{n}Q", buf, pos))
        pos += 8 * n
        total = offsets[-1] if offsets else 0
        keys, pos = _decode_data(kt, buf, pos, total)
        vals, pos = _decode_data(vt, buf, pos, total)
        out, prev = [], 0
        for off in offsets:
            out.append(dict(zip(keys[prev:off], vals[prev:off])))
            prev = off
        return out, pos
    if t.startswith(("Enum8(", "Enum16(")) and t.endswith(")"):
        width, mapping = _enum_map(t)
        rev = {c: name for name, c in mapping.items()}
        codes, pos = _decode_data(width, buf, pos, n)
        return [rev[c] for c in codes], pos
    raise ValueError(f"unsupported ClickHouse type for Native decoding: {ch_type!r}")


def decode_block(buf: bytes) -> list[tuple[str, str, list]]:
    """Inverse of ``encode_block`` — used by the round-trip tests and as a
    byte-level assertion harness (there is no ClickHouse server in the
    sandbox, so the decoder is this repo's second, independent reading of
    the format spec)."""
    pos = 0
    n_cols, pos = _read_varint(buf, pos)
    n_rows, pos = _read_varint(buf, pos)
    cols = []
    for _ in range(n_cols):
        ln, pos = _read_varint(buf, pos)
        name = buf[pos : pos + ln].decode("utf-8")
        pos += ln
        ln, pos = _read_varint(buf, pos)
        ch_type = buf[pos : pos + ln].decode("utf-8")
        pos += ln
        vals, pos = _decode_data(ch_type, buf, pos, n_rows)
        cols.append((name, ch_type, vals))
    if pos != len(buf):
        raise ValueError(f"trailing bytes after block: {len(buf) - pos}")
    return cols


# NOTE: the Spark-type → ClickHouse-type mapping lives in ONE place —
# sources/systemviews.spark_to_ch_type — shared by the system.columns
# emulation and NativeHttpSink (timestamp_as='DateTime64(6)' on the
# insert path).  This module only consumes the resulting type strings.


def insert_native_http(
    base_url: str,
    table: str,
    block: bytes,
    user: str | None = None,
    password: str | None = None,
    timeout: float = 30.0,
) -> None:
    """POST one Native block to ClickHouse's HTTP interface:
    ``POST {base_url}/?query=INSERT INTO {table} FORMAT Native`` with the
    block bytes as body — the batched-bulk-insert seam of the reference
    (pool/ck_cli.go:126-247) over the server's public HTTP protocol.
    Raises urllib.error.HTTPError on a non-2xx reply (the caller's retry
    loop — streaming/sink.py:51 — owns backoff and replica failover)."""
    q = urllib.parse.urlencode({"query": f"INSERT INTO {table} FORMAT Native"})
    req = urllib.request.Request(
        f"{base_url.rstrip('/')}/?{q}", data=block, method="POST"
    )
    req.add_header("Content-Type", "application/octet-stream")
    if user is not None:
        req.add_header("X-ClickHouse-User", user)
    if password is not None:
        req.add_header("X-ClickHouse-Key", password)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        resp.read()
