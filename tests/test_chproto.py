"""Native-format block codec: golden byte pins (hand-derived from the
public FORMAT Native spec), round-trip properties, and the HTTP insert
transport against a local capture server."""

from __future__ import annotations

import threading
from datetime import date, datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_sinker_spark.chproto import (
    decode_block,
    encode_block,
    insert_native_http,
)


def test_golden_block_bytes():
    """Byte-exact pin: column order, varint lengths, LE values, null-mask
    placement BEFORE Nullable inner data — the exact layout the reference
    ships per batch (output/clickhouse.go:139-295 column build order)."""
    block = encode_block([
        ("id", "Int32", [1, 2]),
        ("name", "String", ["ab", ""]),
        ("v", "Nullable(Float64)", [1.5, None]),
    ])
    want = (
        b"\x03"            # 3 columns
        b"\x02"            # 2 rows
        b"\x02id" b"\x05Int32"
        b"\x01\x00\x00\x00" b"\x02\x00\x00\x00"          # 1, 2 LE
        b"\x04name" b"\x06String"
        b"\x02ab" b"\x00"                                # "ab", ""
        b"\x01v" b"\x11Nullable(Float64)"
        b"\x00\x01"                                      # null mask: row2 NULL
        b"\x00\x00\x00\x00\x00\x00\xf8\x3f"              # 1.5 LE double
        b"\x00\x00\x00\x00\x00\x00\x00\x00"              # null backfill 0.0
    )
    assert block == want


def test_golden_array_offsets():
    """Array(T): cumulative UInt64 end-offsets then flattened inner."""
    block = encode_block([("xs", "Array(Int8)", [[1, 2], [], [3]])])
    want = (
        b"\x01\x03"
        b"\x02xs" b"\x0bArray(Int8)"
        b"\x02\x00\x00\x00\x00\x00\x00\x00"  # end of row 1 = 2
        b"\x02\x00\x00\x00\x00\x00\x00\x00"  # end of row 2 = 2
        b"\x03\x00\x00\x00\x00\x00\x00\x00"  # end of row 3 = 3
        b"\x01\x02\x03"
    )
    assert block == want


def test_golden_temporal_and_fixed():
    d = date(1970, 1, 11)           # 10 days
    dt = datetime(1970, 1, 1, 0, 2, 5, tzinfo=timezone.utc)  # 125 s
    block = encode_block([
        ("d", "Date", [d]),
        ("t", "DateTime", [dt]),
        ("t6", "DateTime64(6)", [dt]),
        ("f", "FixedString(4)", ["ab"]),
    ])
    want = (
        b"\x04\x01"
        b"\x01d" b"\x04Date" b"\x0a\x00"
        b"\x01t" b"\x08DateTime" b"\x7d\x00\x00\x00"
        b"\x02t6" b"\x0dDateTime64(6)"
        + (125 * 10**6).to_bytes(8, "little")
        + b"\x01f" b"\x0eFixedString(4)" b"ab\x00\x00"
    )
    assert block == want


def test_varint_multibyte():
    """200 rows → 0xC8 0x01 (ULEB128 continuation)."""
    block = encode_block([("x", "UInt8", [0] * 200)])
    assert block[:3] == b"\x01\xc8\x01"
    assert decode_block(block)[0][2] == [0] * 200


_SCALARS = {
    "Int8": st.integers(-128, 127),
    "Int64": st.integers(-(2**63), 2**63 - 1),
    "UInt32": st.integers(0, 2**32 - 1),
    "Float64": st.floats(allow_nan=False, allow_infinity=False),
    "String": st.text(max_size=20),
    "Bool": st.integers(0, 1),
    "Date32": st.integers(-(2**31), 2**31 - 1),
    "Decimal(38, 9)": st.decimals(
        min_value=-(10**28), max_value=10**28, places=9, allow_nan=False
    ),
}


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_round_trip_property(data):
    """encode→decode is identity for every supported scalar, Nullable of
    it, and Array of it (the decoder is an independent second reading of
    the spec — agreement pins both)."""
    t = data.draw(st.sampled_from(sorted(_SCALARS)))
    base = _SCALARS[t]
    n = data.draw(st.integers(0, 12))
    plain = data.draw(st.lists(base, min_size=n, max_size=n))
    nullable = data.draw(
        st.lists(st.one_of(st.none(), base), min_size=n, max_size=n)
    )
    arrays = data.draw(
        st.lists(st.lists(base, max_size=4), min_size=n, max_size=n)
    )
    lc = data.draw(
        st.lists(st.one_of(st.none(), base), min_size=n, max_size=n)
    )
    maps = data.draw(
        st.lists(
            st.dictionaries(st.text(max_size=6), base, max_size=4),
            min_size=n,
            max_size=n,
        )
    )
    cols = [
        ("a", t, plain),
        ("b", f"Nullable({t})", nullable),
        ("c", f"Array({t})", arrays),
        ("d", f"Array(Nullable({t}))", [
            [None if i % 2 else x for i, x in enumerate(xs)] for xs in arrays
        ]),
        ("e", f"LowCardinality(Nullable({t}))", lc),
        ("f", f"Map(String, {t})", maps),
        ("g", f"Tuple({t}, String)", [(x, "s") for x in plain]),
    ]
    out = decode_block(encode_block(cols))
    assert out == cols


def test_golden_lowcardinality_dictionary():
    """Real LC "additional keys" serialization (SerializationLowCardinality,
    public CH source): UInt64 keys-version 1, UInt64 flags
    (HasAdditionalKeys=1<<9 | UInt8 index width), UInt64 dict size, the
    dictionary as plain inner values, UInt64 row count, per-row indexes."""
    block = encode_block([("s", "LowCardinality(String)", ["x", "y", "x"])])
    want = (
        b"\x01\x03"
        b"\x01s" + bytes([22]) + b"LowCardinality(String)"
        + (1).to_bytes(8, "little")          # keys serialization version
        + (512).to_bytes(8, "little")        # HasAdditionalKeys | UInt8 idx
        + (2).to_bytes(8, "little")          # dictionary size
        + b"\x01x\x01y"                      # dict values as plain String
        + (3).to_bytes(8, "little")          # row count
        + b"\x00\x01\x00"                    # indexes
    )
    assert block == want
    assert decode_block(block) == [("s", "LowCardinality(String)", ["x", "y", "x"])]


def test_golden_lowcardinality_nullable_slot_zero():
    """LC(Nullable(T)): dictionary slot 0 is the inner default and means
    NULL; real values start at slot 1."""
    col = ("s", "LowCardinality(Nullable(String))", [None, "x", None, "x"])
    block = encode_block([col])
    body = block[2 + 2 + 1 + 32:]  # header, name, type-len prefix, type str
    assert body == (
        (1).to_bytes(8, "little")
        + (512).to_bytes(8, "little")
        + (2).to_bytes(8, "little")          # dict: [default "", "x"]
        + b"\x00\x01x"                       # "" then "x"
        + (4).to_bytes(8, "little")
        + b"\x00\x01\x00\x01"
    )
    assert decode_block(block) == [col]


def test_golden_map_layout():
    """Map(K,V) serializes like Array(Tuple(K,V)): cumulative UInt64
    end-offsets, then ALL keys, then ALL values (model/value.go:202-213
    lists Map as first-class in the reference's type surface)."""
    block = encode_block(
        [("m", "Map(String, Int32)", [{"a": 1}, {}, {"b": 2, "c": 3}])]
    )
    want = (
        b"\x01\x03"
        b"\x01m" + bytes([18]) + b"Map(String, Int32)"
        + (1).to_bytes(8, "little")
        + (1).to_bytes(8, "little")
        + (3).to_bytes(8, "little")
        + b"\x01a\x01b\x01c"
        + (1).to_bytes(4, "little")
        + (2).to_bytes(4, "little")
        + (3).to_bytes(4, "little")
    )
    assert block == want
    assert decode_block(block) == [
        ("m", "Map(String, Int32)", [{"a": 1}, {}, {"b": 2, "c": 3}])
    ]


def test_golden_enum_and_array_nullable():
    block = encode_block([("e", "Enum8('a' = 1, 'b' = 2)", ["a", "b"])])
    assert block.endswith(b"\x01\x02")
    assert decode_block(block)[0][2] == ["a", "b"]
    e16 = encode_block([("e", "Enum16('lo' = -300, 'hi' = 300)", ["hi", "lo"])])
    assert e16.endswith((300).to_bytes(2, "little", signed=True)
                        + (-300).to_bytes(2, "little", signed=True))
    # Array(Nullable(T)): offsets first, then the FLATTENED null mask,
    # then inner data with defaults at null slots
    arr = encode_block([("xs", "Array(Nullable(Int8))", [[1, None], [2]])])
    want = (
        b"\x01\x02"
        b"\x02xs" + bytes([21]) + b"Array(Nullable(Int8))"
        + (2).to_bytes(8, "little") + (3).to_bytes(8, "little")
        + b"\x00\x01\x00"            # flattened mask
        + b"\x01\x00\x02"            # data, null backfilled with 0
    )
    assert arr == want
    assert decode_block(arr)[0][2] == [[1, None], [2]]


def test_golden_uuid_ip_layouts():
    """UUID = two LE UInt64 halves (high first); IPv4 = LE UInt32 of the
    dotted quad; IPv6 = 16 network-order bytes.  The reference treats all
    three as first-class column types fed from string metrics
    (model/value.go:45-46,232-234)."""
    u = "12345678-9abc-def0-1122-334455667788"
    blk = encode_block([("u", "UUID", [u])])
    assert blk.endswith(
        (0x123456789ABCDEF0).to_bytes(8, "little")
        + (0x1122334455667788).to_bytes(8, "little")
    )
    assert decode_block(blk)[0][2] == [u]

    ip4 = encode_block([("a", "IPv4", ["1.2.3.4"])])
    assert ip4.endswith((0x01020304).to_bytes(4, "little"))
    assert decode_block(ip4)[0][2] == ["1.2.3.4"]

    ip6 = encode_block([("a", "IPv6", ["2001:db8::1"])])
    assert ip6.endswith(
        bytes.fromhex("20010db8000000000000000000000001")
    )
    assert decode_block(ip6)[0][2] == ["2001:db8::1"]

    # Nullable backfills: zero-uuid / 0.0.0.0 / ::
    cols = [
        ("u", "Nullable(UUID)", [None, u]),
        ("a4", "Nullable(IPv4)", ["5.6.7.8", None]),
        ("a6", "Nullable(IPv6)", [None, "::1"]),
    ]
    out = decode_block(encode_block(cols))
    assert out[0][2] == [None, u]
    assert out[1][2] == ["5.6.7.8", None]
    assert out[2][2] == [None, "::1"]


def test_encode_block_arrow_byte_identical():
    """The sink's Arrow-columnar framing must produce byte-identical
    blocks to the row-wise encoder — including nullable columns, empty
    strings, non-ASCII utf-8, ≥128-byte strings (multi-byte varint
    fallback), pre-epochized DateTime64 ints, and sliced batches."""
    import pyarrow as pa

    from clickhouse_sinker_spark.chproto import encode_block_arrow

    fields = [
        ("id", "Int64"),
        ("v", "Nullable(Float64)"),
        ("s", "Nullable(String)"),
        ("ts", "Nullable(DateTime64(6))"),
    ]
    strs = ["", "héllo", "x" * 200, None, "plain", "日本語", "y" * 127]
    ids = list(range(7))
    vals = [1.5, None, -2.25, 0.0, None, 3.5, 4.5]
    tss = [1_700_000_000_000_000 + i for i in range(6)] + [None]
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(vals, pa.float64()),
            pa.array(strs),
            pa.array(tss, pa.int64()),
        ],
        names=[f[0] for f in fields],
    )
    rowwise = encode_block(
        [
            ("id", "Int64", ids),
            ("v", "Nullable(Float64)", vals),
            ("s", "Nullable(String)", strs),
            ("ts", "Nullable(DateTime64(6))", tss),
        ]
    )
    assert encode_block_arrow(fields, batch) == rowwise
    # sliced batch (non-zero arrow offset) frames its own rows only
    sl = batch.slice(2, 3)
    want = encode_block(
        [
            ("id", "Int64", ids[2:5]),
            ("v", "Nullable(Float64)", vals[2:5]),
            ("s", "Nullable(String)", strs[2:5]),
            ("ts", "Nullable(DateTime64(6))", tss[2:5]),
        ]
    )
    assert encode_block_arrow(fields, sl) == want


def test_tuple_roundtrip_and_enum_rejects_unknown():
    col = ("t", "Tuple(Int32, String, Nullable(Float64))",
           [(1, "a", 1.5), (2, "", None)])
    assert decode_block(encode_block([col])) == [col]
    with pytest.raises(ValueError, match="not in"):
        encode_block([("e", "Enum8('a' = 1)", [9])])


def test_mismatched_row_counts_raise():
    with pytest.raises(ValueError, match="rows"):
        encode_block([("a", "Int8", [1]), ("b", "Int8", [1, 2])])


def test_spark_to_ch_type_single_source():
    """ONE Spark→CH type map (sources/systemviews.spark_to_ch_type) serves
    both system.columns and the Native insert path."""
    from pyspark.sql import types as T

    from clickhouse_sinker_spark.sources.systemviews import spark_to_ch_type

    assert spark_to_ch_type(T.LongType()) == "Int64"
    assert spark_to_ch_type(T.StringType(), nullable=True) == "Nullable(String)"
    assert spark_to_ch_type(T.TimestampType()) == "DateTime"
    assert (
        spark_to_ch_type(T.TimestampType(), timestamp_as="DateTime64(6)")
        == "DateTime64(6)"
    )
    assert spark_to_ch_type(T.ArrayType(T.FloatType(), False)) == "Array(Float32)"
    assert spark_to_ch_type(T.BooleanType()) == "Bool"
    assert spark_to_ch_type(T.DecimalType(12, 4)) == "Decimal(12, 4)"


def test_bool_decimal_and_pre_epoch_datetime():
    from decimal import Decimal

    cols = [
        ("b", "Bool", [1, 0, 1]),
        ("d", "Decimal(12, 4)", [Decimal("1.5"), Decimal("-0.0001"), Decimal("0")]),
    ]
    out = decode_block(encode_block(cols))
    assert out[0][2] == [1, 0, 1]
    assert out[1][2] == [Decimal("1.5"), Decimal("-0.0001"), Decimal("0")]
    # Decimal128 (the typemap default Decimal(38,9)): 16-byte LE layout
    big = [Decimal("123456789012345678901.123456789"), Decimal("-1.000000001")]
    out128 = decode_block(encode_block([("x", "Decimal(38, 9)", big)]))
    assert out128[0][2] == big
    # Date32: signed Int32 days (pre-1970 representable)
    d32 = decode_block(encode_block([("d", "Date32", [date(1969, 12, 31)])]))
    assert d32[0][2] == [-1]

    # pre-epoch sub-second timestamps: sign-correct scaled integer
    dt_neg = datetime(1969, 12, 31, 23, 59, 59, 500000, tzinfo=timezone.utc)
    blk = encode_block([("t", "DateTime64(6)", [dt_neg])])
    (_, _, vals), = decode_block(blk)
    assert vals == [-500000]  # -0.5 s in µs, NOT +0.5


class _Capture(BaseHTTPRequestHandler):
    body = None
    bodies: list = []
    path_seen = None
    headers_seen = None
    status = 200

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        _Capture.body = self.rfile.read(n)
        _Capture.bodies.append(_Capture.body)
        _Capture.path_seen = self.path
        _Capture.headers_seen = dict(self.headers)
        self.send_response(_Capture.status)
        self.end_headers()
        self.wfile.write(b"")

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def capture_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Capture)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_insert_native_http(capture_server):
    block = encode_block([("id", "Int32", [7])])
    insert_native_http(capture_server, "db.t", block, user="u", password="p")
    assert _Capture.body == block
    assert "INSERT+INTO+db.t+FORMAT+Native" in _Capture.path_seen
    hdrs = {k.lower(): v for k, v in _Capture.headers_seen.items()}
    assert hdrs["x-clickhouse-user"] == "u"
    assert hdrs["x-clickhouse-key"] == "p"


def test_insert_native_http_error_raises(capture_server):
    import urllib.error

    _Capture.status = 500
    try:
        with pytest.raises(urllib.error.HTTPError):
            insert_native_http(capture_server, "t", b"\x00\x00")
    finally:
        _Capture.status = 200


def test_native_http_sink_end_to_end(capture_server, spark):
    """NativeHttpSink: a real DataFrame lands as decodable Native blocks
    on the HTTP endpoint — executor-side framing, driver-side failover
    config reused from JdbcSink."""
    from clickhouse_sinker_spark.config import ClickHouseConfig
    from clickhouse_sinker_spark.streaming.sink import NativeHttpSink

    host = capture_server.removeprefix("http://")
    ch = ClickHouseConfig(
        hosts=(host,), database="db", url_format="http://{host}"
    )
    sink = NativeHttpSink(ch=ch, table="t", shards=1)
    from datetime import datetime

    ts = datetime(2024, 3, 1, 10, 0, 0)  # UTC under the session pin
    df = spark.createDataFrame(
        [(1, "a", 1.5, ts), (2, "b", None, ts)],
        "id bigint, s string, v double, ts timestamp",
    ).coalesce(1)
    sink(df, epoch_id=0)
    assert _Capture.body is not None
    cols = decode_block(_Capture.body)
    assert [(n, t) for n, t, _ in cols] == [
        ("id", "Nullable(Int64)"),
        ("s", "Nullable(String)"),
        ("v", "Nullable(Float64)"),
        ("ts", "Nullable(DateTime64(6))"),
    ]
    landed = sorted(zip(cols[0][2], cols[1][2], cols[2][2]))
    assert landed == [(1, "a", 1.5), (2, "b", None)]
    # timestamps are converted to epoch µs ON THE JVM (session-timeZone
    # aware) — never through Python's OS-local naive datetimes, which
    # would shift by the executor host's UTC offset
    from datetime import timezone as _tz

    want_us = int(ts.replace(tzinfo=_tz.utc).timestamp() * 1_000_000)
    assert cols[3][2] == [want_us, want_us]
    assert "INSERT+INTO+db.t+FORMAT+Native" in _Capture.path_seen


def test_native_http_sink_nested_types_and_timestamps(capture_server, spark):
    """One frame carrying every codec family the reference's type surface
    lists first-class (model/value.go:202-213): arrays of nullable ints,
    a map, and — the executor-TZ trap — timestamps NESTED inside an
    array, which must be epochized on the JVM like top-level ones."""
    from datetime import datetime, timezone as _tz

    from clickhouse_sinker_spark.config import ClickHouseConfig
    from clickhouse_sinker_spark.streaming.sink import NativeHttpSink

    host = capture_server.removeprefix("http://")
    ch = ClickHouseConfig(hosts=(host,), database="db", url_format="http://{host}")
    sink = NativeHttpSink(ch=ch, table="t", shards=1)
    ts = datetime(2024, 3, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [(1, [1, None], {"a": 2}, [ts, ts]), (2, [], {}, [])],
        "id bigint, xs array<int>, m map<string,int>, tss array<timestamp>",
    ).coalesce(1)
    sink(df, epoch_id=0)
    cols = decode_block(_Capture.body)
    assert [(n, t) for n, t, _ in cols] == [
        ("id", "Nullable(Int64)"),
        ("xs", "Array(Nullable(Int32))"),
        ("m", "Map(String, Nullable(Int32))"),
        ("tss", "Array(Nullable(DateTime64(6)))"),
    ]
    rows = sorted(zip(*[c[2] for c in cols]))
    want_us = int(ts.replace(tzinfo=_tz.utc).timestamp() * 1_000_000)
    assert rows[0] == (1, [1, None], {"a": 2}, [want_us, want_us])
    assert rows[1] == (2, [], {}, [])


def test_native_http_sink_many_partitions_and_blocks(capture_server, spark):
    """Concurrent executor-side framing: 4 partitions × batch_size 25 over
    200 rows → ≥8 independent POSTs, every block ≤ 25 rows, and the union
    of decoded rows equals the input exactly (no loss, no duplication)."""
    from clickhouse_sinker_spark.config import ClickHouseConfig
    from clickhouse_sinker_spark.streaming.sink import NativeHttpSink

    host = capture_server.removeprefix("http://")
    ch = ClickHouseConfig(hosts=(host,), database="db", url_format="http://{host}")
    sink = NativeHttpSink(ch=ch, table="t", shards=1, batch_size=25)
    _Capture.bodies.clear()
    df = spark.range(200).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS s"
    ).repartition(4)
    sink(df, epoch_id=0)
    assert len(_Capture.bodies) >= 8
    landed = []
    for body in _Capture.bodies:
        cols = decode_block(body)
        assert len(cols[0][2]) <= 25
        landed.extend(zip(cols[0][2], cols[1][2]))
    assert sorted(landed) == [(i, str(i % 7)) for i in range(200)]


def test_native_http_sink_rejects_jdbc_url(spark):
    from clickhouse_sinker_spark.config import ClickHouseConfig
    from clickhouse_sinker_spark.streaming.sink import NativeHttpSink

    ch = ClickHouseConfig(hosts=("h:8123",), retry_times=1)
    sink = NativeHttpSink(ch=ch, table="t")
    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(Exception, match="http"):
        sink(df, epoch_id=0)


def test_golden_bool_decimal64_bytes():
    """Byte pins for the r6 type additions: Bool as one byte, Decimal64
    as scaled LE Int64, Date32 as signed LE Int32."""
    from decimal import Decimal

    blk = encode_block([("b", "Bool", [1, 0])])
    assert blk == b"\x01\x02" b"\x01b" b"\x04Bool" b"\x01\x00"
    blk2 = encode_block([("d", "Decimal(10, 2)", [Decimal("1.50")])])
    assert blk2 == (
        b"\x01\x01" b"\x01d" b"\x0eDecimal(10, 2)"
        + (150).to_bytes(8, "little", signed=True)
    )
    blk3 = encode_block([("d3", "Date32", [-1])])
    assert blk3 == (
        b"\x01\x01" b"\x02d3" b"\x06Date32" + (-1).to_bytes(4, "little", signed=True)
    )
