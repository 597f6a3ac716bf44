"""Multimodal plumbing tests: binary metadata, Arrow-batched decode stub,
frame sampling fan-out."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from clickhouse_sinker_spark.operators.multimodal import (
    attach_binary_metadata,
    decode_image_features,
    sample_video_frames,
)


@pytest.fixture()
def blobs(spark):
    rows = [
        (1, b"\xff\xd8\xff\xe0JPEGDATA" * 10),
        (2, b"\x89PNG\r\n\x1a\nPNGDATA" * 5),
        (3, b"plain bytes payload"),
        (4, b""),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_binary_metadata(spark, blobs):
    out = {r.doc_id: r for r in attach_binary_metadata(blobs, "payload", "doc_id").collect()}
    assert out[1].sniffed_type == "image/jpeg"
    assert out[2].sniffed_type == "image/png"
    assert out[3].sniffed_type == "application/octet-stream"
    assert out[1].byte_len == 120
    assert out[3].content_hash == hashlib.md5(b"plain bytes payload").hexdigest()


def test_decode_stub_deterministic(spark, blobs):
    feats = {r.doc_id: r for r in decode_image_features(blobs, "payload", "doc_id").collect()}
    assert set(feats) == {1, 2, 3, 4}
    h = hashlib.sha256(b"plain bytes payload").digest()
    assert feats[3].width == 64 + h[0] % 192
    assert feats[3].phash == h[:8].hex()
    assert 0.0 <= feats[3].mean_luma <= 1.0
    # repartitioned run yields identical features (partition-independent)
    feats2 = {r.doc_id: r for r in decode_image_features(blobs.repartition(4), "payload", "doc_id").collect()}
    assert {k: (v.width, v.phash) for k, v in feats.items()} == {
        k: (v.width, v.phash) for k, v in feats2.items()
    }


def test_decode_missing_codec_raises(spark, blobs):
    with pytest.raises(NotImplementedError):
        decode_image_features(blobs, "payload", "doc_id", decoder="librosa")


def test_frame_sampling_fanout(spark, blobs):
    frames = sample_video_frames(blobs, "payload", "doc_id", every_n=10, max_frames=3).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3  # 120 bytes / 10 per frame, capped at 3
    assert bytes(by_doc[1][0].frame) == (b"\xff\xd8\xff\xe0JPEGDATA" * 10)[:10]
    assert len(by_doc[4]) == 1  # empty payload still yields one (empty) frame


def test_resize_stub_shape_and_determinism(spark, blobs):
    from clickhouse_sinker_spark.operators.multimodal import resize_images

    out = resize_images(blobs, "payload", "doc_id", width=32, height=32)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == blobs.count()
    again = {r["doc_id"]: r for r in resize_images(blobs, "payload", "doc_id", 32, 32).collect()}
    for k in rows:
        assert rows[k]["resized"] == again[k]["resized"]  # deterministic
        assert rows[k]["width"] == 32 and len(rows[k]["resized"]) == 32 * 32 // 64


def test_audio_features_stub(spark, blobs):
    from clickhouse_sinker_spark.operators.multimodal import extract_audio_features

    out = extract_audio_features(blobs, "payload", "doc_id").collect()
    assert len(out) == blobs.count()
    for r in out:
        assert r["sample_rate"] == 16000 and 0.0 <= r["rms"] <= 1.0
        assert r["n_windows"] >= 1


def test_audio_missing_codec_raises(spark, blobs):
    from clickhouse_sinker_spark.operators.multimodal import extract_audio_features

    import importlib.util
    if importlib.util.find_spec("librosa") is not None:
        pytest.skip("librosa present")
    with pytest.raises(NotImplementedError):
        extract_audio_features(blobs, "payload", "doc_id", decoder="librosa")


# ---------------------------------------------------------------------------
# Real-codec tier: uncompressed BMP (struct+numpy) and PCM WAV (stdlib wave)
# ---------------------------------------------------------------------------


def _gradient_rgb(h, w):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 255 // max(w - 1, 1)), (y * 255 // max(h - 1, 1)), ((x + y) % 256)],
        axis=-1,
    ).astype(np.uint8)


def _wav_bytes(freq_sr=(440, 8000), seconds=0.5, amp=0.5):
    import io
    import math
    import struct as st
    import wave

    freq, sr = freq_sr
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        n = int(sr * seconds)
        frames = b"".join(
            st.pack("<h", int(amp * 32767 * math.sin(2 * math.pi * freq * i / sr)))
            for i in range(n)
        )
        wf.writeframes(frames)
    return buf.getvalue()


def test_bmp_roundtrip_exact():
    import numpy as np

    from clickhouse_sinker_spark.operators.multimodal import decode_bmp, encode_bmp

    for h, w in [(4, 6), (3, 3), (5, 7)]:  # odd widths exercise row padding
        img = _gradient_rgb(h, w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_decode_image_features_real(spark):
    import numpy as np

    from clickhouse_sinker_spark.operators.multimodal import decode_image_features

    img = _gradient_rgb(16, 24)
    from clickhouse_sinker_spark.operators.multimodal import encode_bmp

    df = spark.createDataFrame([(1, bytearray(encode_bmp(img)))], "doc_id long, payload binary")
    row = decode_image_features(df, "payload", "doc_id", decoder="bmp").collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (24, 16, 3)
    luma = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    assert abs(row["mean_luma"] - luma.mean() / 255.0) < 1e-9
    assert len(row["phash"]) == 16  # 64-bit hex

    # near-dup stability: +1 brightness barely moves the average hash
    img2 = np.clip(img.astype(np.int16) + 1, 0, 255).astype(np.uint8)
    df2 = spark.createDataFrame([(2, bytearray(encode_bmp(img2)))], "doc_id long, payload binary")
    row2 = decode_image_features(df2, "payload", "doc_id", decoder="bmp").collect()[0]
    ham = bin(int(row["phash"], 16) ^ int(row2["phash"], 16)).count("1")
    assert ham <= 4


def test_bmp_resize_real_nearest_neighbor(spark):
    import numpy as np

    from clickhouse_sinker_spark.operators.multimodal import (
        _nearest_resize,
        decode_bmp,
        encode_bmp,
        resize_images,
    )

    img = _gradient_rgb(8, 12)
    df = spark.createDataFrame([(7, bytearray(encode_bmp(img)))], "doc_id long, payload binary")
    row = resize_images(df, "payload", "doc_id", width=6, height=4, decoder="bmp").collect()[0]
    assert (row["width"], row["height"]) == (6, 4)
    out = decode_bmp(bytes(row["resized"]))
    assert np.array_equal(out, _nearest_resize(img, 6, 4))


def test_wav_audio_features_real(spark):
    from clickhouse_sinker_spark.operators.multimodal import extract_audio_features

    payload = _wav_bytes(freq_sr=(440, 8000), seconds=0.5, amp=0.5)
    df = spark.createDataFrame([(3, bytearray(payload))], "doc_id long, payload binary")
    row = extract_audio_features(df, "payload", "doc_id", decoder="wav").collect()[0]
    assert row["sample_rate"] == 8000
    assert abs(row["duration_s"] - 0.5) < 1e-3
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ≈ 0.3536
    assert abs(row["rms"] - 0.35355) < 0.01
    assert row["n_windows"] == 2  # 0.5s / 0.5s windows + 1


class TestPngCodec:
    """Real PNG codec (RFC 2083 subset): round-trip across shapes and all
    five scanline filters, CRC/truncation/unsupported-form rejection."""

    def test_round_trip_all_filters(self):
        import numpy as np

        from clickhouse_sinker_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.default_rng(7)
        for shape in [(8, 8, 3), (5, 7, 3), (16, 3, 3), (1, 1, 3), (11, 13, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            for varied in (True, False):
                assert np.array_equal(img, decode_png(encode_png(img, varied)))

    def test_varied_filters_actually_vary(self):
        import zlib

        import numpy as np

        from clickhouse_sinker_spark.operators.multimodal import encode_png

        img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        enc = encode_png(img, varied_filters=True)
        # pull the IDAT payload and check the per-row filter bytes 0..4
        pos = 8
        raw = b""
        while pos + 8 <= len(enc):
            import struct

            (length,) = struct.unpack_from(">I", enc, pos)
            if enc[pos + 4 : pos + 8] == b"IDAT":
                raw += enc[pos + 8 : pos + 8 + length]
            pos += 12 + length
        lines = zlib.decompress(raw)
        stride = 8 * 3 + 1
        fts = [lines[y * stride] for y in range(8)]
        assert fts == [0, 1, 2, 3, 4, 0, 1, 2]

    def test_corruption_rejected(self):
        import numpy as np
        import pytest

        from clickhouse_sinker_spark.operators.multimodal import decode_png, encode_png

        enc = encode_png(np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"BM123456")
        with pytest.raises(ValueError, match="truncated"):
            decode_png(enc[:20])
        bad = bytearray(enc)
        bad[40] ^= 1
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(bad))

    def test_decode_image_features_png_path(self, spark):
        import numpy as np

        from clickhouse_sinker_spark.operators.multimodal import (
            decode_image_features,
            encode_png,
        )

        img = np.full((4, 4, 3), (10, 20, 30), dtype=np.uint8)
        payload = encode_png(img)
        df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
        row = decode_image_features(df, "payload", "doc_id", decoder="png").first()
        assert (row["width"], row["height"], row["channels"]) == (4, 4, 3)
        expect = (0.299 * 10 + 0.587 * 20 + 0.114 * 30) / 255
        assert abs(row["mean_luma"] - expect) < 1e-12

    def test_resize_png_path(self, spark):
        import numpy as np

        from clickhouse_sinker_spark.operators.multimodal import (
            decode_png,
            encode_png,
            resize_images,
        )

        img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        df = spark.createDataFrame(
            [(1, bytearray(encode_png(img)))], "doc_id long, payload binary"
        )
        row = resize_images(df, "payload", "doc_id", width=4, height=4, decoder="png").first()
        out = decode_png(bytes(row["resized"]))
        assert out.shape == (4, 4, 3)
        # nearest-neighbor: every output pixel exists in the source
        src = {tuple(p) for p in img.reshape(-1, 3)}
        assert all(tuple(p) in src for p in out.reshape(-1, 3))
