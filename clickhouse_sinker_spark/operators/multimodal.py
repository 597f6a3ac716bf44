"""Multimodal column operators (beyond-reference north-star surface).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed through Arrow-batched ``mapInPandas`` pipelines.  The
container has no image/audio codecs, so the decode kernels are STUBS with
two modes:

- ``decoder="fake"`` (default): deterministic synthetic features derived
  from the payload bytes — real Spark plumbing (schema, batching,
  partitioning) with testable outputs.
- ``decoder="pil"`` / ``decoder="librosa"``: gated imports that raise
  ``NotImplementedError`` with a clear message when the library is absent;
  the call signature and output schema are the production contract.

Scale design: mapInPandas streams Arrow record batches — payload bytes
never materialize on the driver; ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds executor memory per batch; partitioning is
inherited from the scan, so a 100 TB blob table processes
embarrassingly-parallel with zero shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_binary_metadata",
    "decode_image_features",
    "sample_video_frames",
    "resize_images",
    "extract_audio_features",
    "IMAGE_FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "RESIZED_SCHEMA",
    "AUDIO_FEATURE_SCHEMA",
]

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def attach_binary_metadata(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Typed metadata over an opaque binary column — pure column exprs
    (byte length, content hash, magic-byte sniff).  This is the landing
    schema for any multimodal table: (id, payload, byte_len, content_hash,
    sniffed_type)."""
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 4))
    sniffed = (
        F.when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic.startswith("89504E47"), "image/png")
        .when(magic.startswith("52494646"), "audio/wav")
        .when(magic.startswith("00000018") | magic.startswith("00000020"), "video/mp4")
        .otherwise("application/octet-stream")
    )
    return df.select(
        F.col(id_col),
        p.alias("payload"),
        F.octet_length(p).cast("bigint").alias("byte_len"),
        F.md5(p).alias("content_hash"),
        sniffed.alias("sniffed_type"),
    )


def _fake_image_decode(doc_id: int, payload: bytes) -> tuple:
    """Deterministic synthetic decode: features are pure functions of the
    payload bytes (stable across runs/partitions — oracle-testable)."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3
    mean_luma = sum(h[2:10]) / (8 * 255.0)
    phash = h[:8].hex()
    return (doc_id, width, height, channels, mean_luma, phash)


def decode_image_features(
    df: DataFrame, payload_col: str, id_col: str, decoder: str = "fake"
) -> DataFrame:
    """Image decode + feature extraction via Arrow-batched mapInPandas.

    Batch shape contract: each pandas batch carries (id, payload) only —
    project before calling so Arrow doesn't ship unused columns.
    """
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without PIL
            raise NotImplementedError(
                "PIL decoder requires pillow; this container has no image "
                "codecs — use decoder='fake' for plumbing tests"
            ) from e
    elif decoder != "fake":
        raise NotImplementedError(f"unknown decoder {decoder!r}")

    slim = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fake_image_decode(i, p) for i, p in zip(pdf["doc_id"], pdf["payload"])]
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "mean_luma", "phash"]
            )

    return slim.mapInPandas(decode, IMAGE_FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame, payload_col: str, id_col: str, every_n: int = 10, max_frames: int = 4
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame, frame
    payload as binary.  The stub emits deterministic slices of the input
    payload; a real decoder would emit encoded frames.  Output explodes
    rows (fan-out operator) — still shuffle-free, fan-out happens within
    the partition."""
    slim = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                p = p or b""
                for k in range(min(max_frames, max(len(p) // max(every_n, 1), 1))):
                    sl = p[k * every_n : (k + 1) * every_n]
                    out.append((i, k, bytes(sl)))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame"])

    return slim.mapInPandas(sample, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_windows", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame, payload_col: str, id_col: str, width: int = 224, height: int = 224,
    decoder: str = "fake",
) -> DataFrame:
    """Resize plumbing: (id, payload) → (id, w, h, resized-bytes) through
    Arrow batches, partition-local.  The stub emits a deterministic
    byte-slice standing in for the re-encoded image; ``decoder='pil'`` is
    the gated production contract."""
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without PIL
            raise NotImplementedError(
                "PIL resize requires pillow; use decoder='fake' for plumbing tests"
            ) from e
    elif decoder != "fake":
        raise NotImplementedError(f"unknown decoder {decoder!r}")

    slim = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    target = width * height // 64 or 1

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                p = (p or b"\x00") * (target // max(len(p or b"\x00"), 1) + 1)
                rows.append((i, width, height, bytes(p[:target])))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "resized"])

    return slim.mapInPandas(resize, RESIZED_SCHEMA)


def extract_audio_features(
    df: DataFrame, payload_col: str, id_col: str, window_s: float = 0.5,
    decoder: str = "fake",
) -> DataFrame:
    """Audio feature plumbing: duration / sample-rate / RMS / window count
    per payload.  Stub derives deterministic pseudo-features from the
    bytes; ``decoder='librosa'`` is the gated production contract."""
    if decoder == "librosa":
        try:
            import librosa  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without librosa
            raise NotImplementedError(
                "librosa decoder not available in this container; "
                "use decoder='fake' for plumbing tests"
            ) from e
    elif decoder != "fake":
        raise NotImplementedError(f"unknown decoder {decoder!r}")

    slim = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                h = hashlib.sha256(p or b"").digest()
                sr = 16000
                duration = max(len(p or b""), 1) / 4096.0
                rms = sum(h[:16]) / (16 * 255.0)
                rows.append((i, duration, sr, rms, int(duration / window_s) + 1))
            yield pd.DataFrame(
                rows, columns=["doc_id", "duration_s", "sample_rate", "rms", "n_windows"]
            )

    return slim.mapInPandas(feats, AUDIO_FEATURE_SCHEMA)
