"""Verification suite for the CRC family (``CRC32IEEE``/``CRC64``).

Proof chain (chudfs module note has the summary):

- The 32-bit table/fold machinery with init = xorout = 0xFFFFFFFF must
  bit-equal **system zlib** (``binascii.crc32``) over arbitrary inputs —
  an independent C implementation of the same reflected 802.3 CRC.
- The 64-bit machinery with init = xorout = all-ones must bit-equal
  **system liblzma** (``lzma_crc64`` via ctypes) over arbitrary inputs,
  and reproduce the PUBLISHED CRC-64/XZ check value
  ``0x995DC9BBDF1939FA`` for ``b'123456789'`` (RevEng catalogue).
- ClickHouse's CRC32IEEE/CRC64 run the SAME proven fold with init 0 and
  no final xor (CH docs: "without the initial value"; CRC.cpp CRCImpl
  starts from 0) — that 0/0 parameterization is the documented
  residual-recall surface, regression-pinned here.

Also pins the r9 FIX: ``crc32IEEE`` used to rename onto Spark's
``crc32`` (the zlib variant = CH's plain CRC32), silently producing
wrong values; plain ``CRC32`` still passes through to Spark because the
variants genuinely coincide there.
"""
from __future__ import annotations

import binascii
import ctypes
import ctypes.util
import os
import random

import pytest

from clickhouse_sinker_spark.functions.chudfs import (
    _CRC32_TAB,
    _CRC64_TAB,
    _M32,
    _M64,
    _crc32_ieee,
    _crc64_ecma,
    _crc_fold,
)

_LZMA_PATH = ctypes.util.find_library("lzma")


def _lzma_crc64(data: bytes) -> int:
    lz = ctypes.CDLL(_LZMA_PATH)
    lz.lzma_crc64.restype = ctypes.c_uint64
    lz.lzma_crc64.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.c_uint64]
    return lz.lzma_crc64(data, len(data), 0)


def test_crc64_fold_machinery_bit_equals_system_liblzma():
    if _LZMA_PATH is None:  # pragma: no cover - lib is present in CI
        pytest.skip("liblzma not found")
    rng = random.Random(0xC4C)
    cases = [b"", b"\x00", b"123456789", b"a" * 300]
    cases += [bytes(rng.randrange(256) for _ in range(rng.randrange(200)))
              for _ in range(300)]
    for d in cases:
        assert _crc_fold(_CRC64_TAB, d, _M64, _M64, _M64) == _lzma_crc64(d)


def test_crc64_xz_published_check_value():
    # RevEng catalogue CRC-64/XZ: check("123456789") = 0x995DC9BBDF1939FA
    assert _crc_fold(_CRC64_TAB, b"123456789", _M64, _M64, _M64) == \
        0x995DC9BBDF1939FA


def test_crc32_fold_machinery_bit_equals_system_zlib():
    rng = random.Random(0xC3C)
    cases = [b"", b"\x00", b"123456789", b"a" * 300]
    cases += [bytes(rng.randrange(256) for _ in range(rng.randrange(200)))
              for _ in range(300)]
    for d in cases:
        assert _crc_fold(_CRC32_TAB, d, _M32, _M32, _M32) == \
            (binascii.crc32(d) & _M32)


def test_crc32_iso_hdlc_published_check_value():
    # RevEng catalogue CRC-32/ISO-HDLC: check("123456789") = 0xCBF43926
    assert _crc_fold(_CRC32_TAB, b"123456789", _M32, _M32, _M32) == \
        0xCBF43926


def test_ch_variant_empty_input_is_zero():
    # init 0, no final xor: the empty string folds to exactly 0 (zlib's
    # variant gives 0 too, but via ~(~0) — different path, same value)
    assert _crc32_ieee(b"") == 0
    assert _crc64_ecma(b"") == 0


def test_ch_variant_differs_from_all_ones_variant():
    # the r9 fix exists because these variants DIFFER on real inputs
    d = b"clickhouse"
    assert _crc32_ieee(d) != (binascii.crc32(d) & _M32)
    if _LZMA_PATH is not None:
        assert _crc64_ecma(d) != _lzma_crc64(d)


def test_crc_translation_and_refusals():
    from clickhouse_sinker_spark.functions.chdialect import (
        ChTranslationError,
        translate_ch_sql,
    )

    out, _ = translate_ch_sql(
        "SELECT CRC32IEEE('a') AS a, crc32IEEE('b') AS b, CRC64('c') AS c,"
        " crc64(toString(x)) AS d, CRC32('e') AS e FROM t"
    )
    assert "ch_crc32_ieee('a')" in out
    assert "ch_crc32_ieee('b')" in out
    assert "ch_crc64('c')" in out
    assert "ch_crc64(CAST(x AS STRING))" in out
    # plain CRC32 passes through: Spark's crc32 IS CH's zlib variant
    assert "CRC32('e')" in out
    # non-string arguments refuse (CH throws Illegal type)
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT CRC64(x) FROM t")
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT CRC32IEEE(1, 2) FROM t")


def test_crc_udfs_end_to_end(spark):
    from clickhouse_sinker_spark.functions.chudfs import register_ch_udfs

    register_ch_udfs(spark)
    row = spark.sql(
        "SELECT ch_crc32_ieee('CRC32IEEE') AS a, ch_crc64('CRC64') AS b,"
        " ch_crc32_ieee('') AS z32, ch_crc64('') AS z64"
    ).collect()[0]
    assert row.a == _crc32_ieee(b"CRC32IEEE")
    assert int(row.b) == _crc64_ecma(b"CRC64")
    assert row.z32 == 0 and int(row.z64) == 0
