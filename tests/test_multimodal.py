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
