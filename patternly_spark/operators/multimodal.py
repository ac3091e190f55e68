"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schemas, batch iteration, partition-preserving
mapInPandas, metadata propagation — is real and tested.  Codec status:

- **PNG: REAL** — ``operators/imaging.py`` decodes/resizes/pools PNG
  payloads with stdlib zlib + numpy (no Pillow needed).  Pass
  ``codec="png"`` to ``extract_features`` / ``resize_images``.
- JPEG / audio / video: require Pillow/torchaudio/pyav, which are NOT
  in this container — those kernels remain deterministic fakes behind
  ``_HAVE_CODECS`` (clearly marked); swapping real libraries in changes
  only the inner function body, not the Spark plumbing.  The fake
  (``codec="stub"``, the default) stays the q95 oracle surface because
  it is SQL-replicable.

Design for scale: binary payloads never pass through a shuffle — every
operator is mapInPandas over the scan partitioning; Arrow carries the
bytes zero-copy between JVM and Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def extract_features(media: DataFrame, *, dim: int = 16, codec: str = "stub") -> DataFrame:
    """(media_id, n_bytes, features array<float>): Arrow-batched feature
    extraction over binary payloads; partition-preserving (no shuffle).

    ``codec="png"`` runs the REAL pipeline for PNG payloads — stdlib
    decode -> grid-pooled grayscale means (``dim`` must be a square,
    e.g. 16 -> 4x4 grid).  ``codec="wav"`` runs the REAL audio pipeline
    for PCM WAV payloads — stdlib decode -> ``dim`` windowed RMS
    energies.  Non-matching payloads in either mode raise.  The default
    ``codec="stub"`` keeps the deterministic byte-derived fake (the
    SQL-replicable q95 oracle surface)."""
    if codec not in ("stub", "png", "wav"):
        raise ValueError(f"unknown codec {codec!r}")
    if codec == "png":
        grid = int(dim ** 0.5)
        if grid * grid != dim:
            raise ValueError(f"png codec needs a square dim, got {dim}")

        def extract(p: bytes) -> list:
            from patternly_spark.operators.imaging import decode_png, grid_features

            return grid_features(decode_png(bytes(p)), grid).tolist()
    elif codec == "wav":
        def extract(p: bytes) -> list:
            from patternly_spark.operators.audio import decode_wav, rms_windows

            samples, _rate = decode_wav(bytes(p))
            return rms_windows(samples, dim).tolist()
    else:
        def extract(p: bytes) -> list:
            return _fake_decode_features(bytes(p), dim).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": pdf["payload"].map(extract),
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


def resize_images(media: DataFrame, *, width: int, height: int, codec: str = "stub") -> DataFrame:
    """Image resize over binary payloads, metadata rewritten to the new
    dimensions.  ``codec="png"``: REAL decode -> nearest-neighbor resize
    -> re-encode (stdlib PNG both ways).  ``codec="stub"`` (default):
    payload passes through untouched — the metadata-only placeholder for
    formats whose codecs aren't in this container."""
    if codec not in ("stub", "png"):
        raise ValueError(f"unknown codec {codec!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if codec == "png":
                from patternly_spark.operators.imaging import decode_png, resize_nearest
                from patternly_spark.pfsa.draw import encode_png

                pdf["payload"] = pdf["payload"].map(
                    lambda p: encode_png(
                        np.ascontiguousarray(resize_nearest(decode_png(bytes(p)), width, height))
                    )
                )
            pdf["width"] = np.int32(width)
            pdf["height"] = np.int32(height)
            yield pdf

    return media.mapInPandas(run, schema=media.schema)


def image_dhash(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_size: int = 8,
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image — the standard
    near-duplicate IMAGE fingerprint: decode, grayscale, nearest-resize
    to (hash_size+1) x hash_size, emit one bit per horizontal gradient
    sign.  Visually identical images (re-encodes, minor crops/noise)
    land within a few Hamming bits; unrelated images are ~hash_size²/2
    apart.  REAL for PNG payloads (the stdlib codec); other formats
    raise inside the worker and are reported as undecodable rows, not
    dropped silently.

    Shape: mapInPandas over the scan partitioning — payload bytes stay
    local to their task, zero shuffle; the output is one 64-bit long
    per image (hash_size=8), pairable with the existing xor+popcount
    Hamming machinery (`operators/quantized.hamming_topk` precedent).

    Output: (id, dhash long nullable, ok boolean, err string nullable).
    """
    from patternly_spark.operators.imaging import (
        UnsupportedImageError,
        decode_png,
        resize_nearest,
    )

    hs = int(hash_size)
    if not 2 <= hs <= 8:
        raise ValueError("hash_size in [2,8] (bits must fit a long)")

    schema = f"{id_col} long, dhash long, ok boolean, err string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, oks, errs = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                try:
                    img = decode_png(bytes(payload))
                    # integer luma (Rec.601 weights scaled by 1024) —
                    # deterministic, no float rounding ambiguity
                    g = (
                        299 * img[:, :, 0].astype(np.int64)
                        + 587 * img[:, :, 1].astype(np.int64)
                        + 114 * img[:, :, 2].astype(np.int64)
                    )
                    small = resize_nearest(g[:, :, None], hs + 1, hs)[:, :, 0]
                    bits = (small[:, 1:] > small[:, :-1]).astype(np.uint64)
                    h = 0
                    for b in bits.flatten():
                        h = (h << 1) | int(b)
                    # interpret the top bit as sign so 64-bit hashes fit
                    # Spark's LONG (the xxhash64 convention)
                    if h >= 1 << 63:
                        h -= 1 << 64
                    hashes.append(h)
                    oks.append(True)
                    errs.append(None)
                except Exception as ex:  # noqa: BLE001 — undecodable rows are DATA, reported not raised
                    hashes.append(None)
                    oks.append(False)
                    errs.append(f"{type(ex).__name__}: {ex}"[:200])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    # nullable Int64: a plain int column with Nones would
                    # silently become float64 and fail the Arrow cast
                    "dhash": pd.array(hashes, dtype="Int64"),
                    "ok": oks,
                    "err": errs,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)


def image_neardup_pairs(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_size: int = 8,
    max_hamming: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs: dHash + banded Hamming join.  Bands:
    split the hash into max_hamming+1 equal bit-blocks — two hashes
    within ``max_hamming`` bits must agree on at least one whole block
    (pigeonhole), so blocking on (block_index, block_value) is COMPLETE;
    verify is one xor+popcount per candidate (the simhash/q136
    precedent).  Output: (id_a, id_b, hamming) with id_a < id_b.
    """
    hs = int(hash_size)
    nbits = hs * hs
    nb = int(max_hamming) + 1
    if nb > nbits:
        # width would floor to 0: every block value collapses to 0 and the
        # candidate join degenerates to a full cross product
        raise ValueError(
            f"max_hamming + 1 = {nb} exceeds the {nbits}-bit hash "
            f"(hash_size={hs}); raise hash_size or lower max_hamming"
        )
    width = nbits // nb

    hashes = image_dhash(
        media, id_col=id_col, payload_col=payload_col, hash_size=hs
    ).filter(F.col("ok")).select(F.col(id_col).alias("id"), "dhash")
    hashes = hashes.localCheckpoint(eager=True)
    blocks = hashes.select(
        "id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftright(F.col("dhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bv"),
                    )
                    for i in range(nb)
                ]
            )
        ).alias("__b"),
    ).select("id", "dhash", F.col("__b.bi").alias("bi"), F.col("__b.bv").alias("bv"))
    cand = (
        blocks.select(F.col("id").alias("id_a"), F.col("dhash").alias("ha"), "bi", "bv")
        .join(
            blocks.select(F.col("id").alias("id_b"), F.col("dhash").alias("hb"), "bi", "bv"),
            ["bi", "bv"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= int(max_hamming))
    )


def audio_energy_hash(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    frames: int = 32,
) -> DataFrame:
    """Audio fingerprint per clip — the WAV sibling of ``image_dhash``:
    decode (REAL stdlib codec), split samples into ``frames`` even
    frames, per-frame INTEGER energy (sum of squares, int64-exact),
    emit one bit per frame-to-frame energy increase.  Re-encoded or
    lightly-noised clips land within a few Hamming bits; the pairs step
    reuses the ``image_neardup_pairs`` banded machinery on the hash
    column.

    Exactness: energies never touch floats, comparisons are integer, so
    the whole hash replays from raw sample bytes in SQL.  frames-1
    bits (<= 63) pack MSB-first into a non-negative long.  Undecodable
    or too-short clips (< frames samples) report (ok=false, err), never
    vanish.

    Output: (id, ehash long nullable, n_samples long, ok, err).
    """
    from patternly_spark.operators.audio import UnsupportedAudioError, decode_wav

    nf = int(frames)
    if not 2 <= nf <= 64:
        raise ValueError("frames in [2,64]")

    schema = f"{id_col} long, ehash long, n_samples long, ok boolean, err string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, ns, oks, errs = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                try:
                    samples, _rate = decode_wav(bytes(payload))
                    n = len(samples)
                    if n < nf:
                        raise UnsupportedAudioError(
                            f"{n} samples < frames={nf}"
                        )
                    s = samples.astype(np.int64)
                    en = []
                    for i in range(nf):
                        lo = i * n // nf
                        hi = (i + 1) * n // nf if i < nf - 1 else n
                        en.append(int((s[lo:hi] ** 2).sum()))
                    h = 0
                    for a, b in zip(en, en[1:]):
                        h = (h << 1) | int(b > a)
                    hashes.append(h)
                    ns.append(n)
                    oks.append(True)
                    errs.append(None)
                except Exception as ex:  # noqa: BLE001 — bad payloads are data
                    hashes.append(None)
                    ns.append(0)
                    oks.append(False)
                    errs.append(f"{type(ex).__name__}: {ex}"[:200])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "ehash": pd.array(hashes, dtype="Int64"),
                    "n_samples": ns,
                    "ok": oks,
                    "err": errs,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(run, schema=schema)
