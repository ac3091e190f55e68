"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schemas, batch iteration, partition-preserving
mapInPandas, metadata propagation — is real and tested.  The actual
codec work (JPEG decode, resampling, frame extraction) requires image /
audio libraries that are NOT in this container, so the codec kernels are
deterministic fakes behind ``_HAVE_CODECS`` (clearly marked); swapping in
Pillow/torchaudio/pyav changes only the inner function body, not the
Spark plumbing.

Design for scale: binary payloads never pass through a shuffle — every
operator is mapInPandas over the scan partitioning; Arrow carries the
bytes zero-copy between JVM and Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_HAVE_CODECS = False  # real decoders (Pillow / torchaudio / pyav) not in container

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def _fake_decode_features(payload: bytes, dim: int) -> np.ndarray:
    """STUB: deterministic stand-in for decode + feature extraction.
    Real implementation decodes the payload (Pillow/pyav) and runs a
    feature extractor; this fake derives a stable vector from payload
    bytes so the pipeline shape (schema, batching, determinism) is fully
    exercised."""
    if _HAVE_CODECS:  # pragma: no cover
        raise NotImplementedError("real codecs not wired in this environment")
    h = np.frombuffer(payload[: dim * 4].ljust(dim * 4, b"\0"), dtype=np.uint8)
    return (h.reshape(dim, 4).sum(axis=1).astype(np.float32) / 1020.0)


def extract_features(media: DataFrame, *, dim: int = 16) -> DataFrame:
    """(media_id, n_bytes, features array<float>): Arrow-batched feature
    extraction over binary payloads; partition-preserving (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": pdf["payload"].map(lambda p: _fake_decode_features(p, dim).tolist()),
            }
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, schema=_FEATURES_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, *, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame.

    STUB codec: 'frames' are byte slices of the payload; a real
    implementation replaces the slicing with pyav keyframe extraction —
    the (media_id, frame_idx, binary) fan-out contract is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    rows.append((int(mid), i, bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes])))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.select("media_id", "payload").mapInPandas(run, schema=_FRAME_SCHEMA)


def resize_images(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Image resize plumbing (STUB codec).  Propagates metadata columns
    and rewrites width/height; payload transformation is the fake
    identity until real codecs are wired in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["width"] = np.int32(width)
            pdf["height"] = np.int32(height)
            yield pdf

    return media.mapInPandas(run, schema=media.schema)
