"""Pure-stdlib WAV codec + audio kernels for the multimodal operators.

The container has no torchaudio/soundfile, but PCM WAV needs only the
stdlib ``wave`` module — so WAV payloads get a REAL decode path (the
multimodal audio decode stops being a stub for this format; compressed
audio still needs external codecs and stays env-gated).

Supported: PCM WAV, 8/16/32-bit integer samples, any channel count
(averaged to mono for features).  Everything else raises
``UnsupportedAudioError``.

Feature kernels are integer-exact until one final double op (division /
sqrt — both correctly rounded IEEE), so an external SQL engine
reproduces them bit-for-bit (the q104 oracle does).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

__all__ = [
    "UnsupportedAudioError",
    "decode_wav",
    "encode_wav",
    "rms_windows",
    "zero_crossing_rate",
]


class UnsupportedAudioError(ValueError):
    """Payload is not a PCM WAV this decoder handles."""


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono int32 sample array, sample_rate).

    Multi-channel input is averaged to mono with integer floor division
    (deterministic, SQL-replicable)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as ex:
        raise UnsupportedAudioError(f"not a PCM WAV: {ex}") from ex
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int32)
    elif width == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128
    elif width == 4:
        samples = np.frombuffer(frames, dtype="<i4").astype(np.int32)
    else:
        raise UnsupportedAudioError(f"sample width {width} bytes")
    if n_ch > 1:
        samples = samples[: len(samples) - len(samples) % n_ch]
        samples = samples.reshape(-1, n_ch).sum(axis=1) // n_ch
    return samples, rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono int16 samples -> PCM WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def rms_windows(samples: np.ndarray, n_windows: int = 8) -> np.ndarray:
    """Per-window root-mean-square energy, float32.

    Windows split the clip evenly (last window takes the remainder);
    sum-of-squares is exact int64, then one double divide + sqrt + f32
    cast — both IEEE-correctly-rounded, hence engine-portable."""
    n = len(samples)
    feats = np.zeros(n_windows, dtype=np.float32)
    if n == 0:
        return feats
    s = samples.astype(np.int64)
    for i in range(n_windows):
        lo = i * n // n_windows
        hi = (i + 1) * n // n_windows if i < n_windows - 1 else n
        if hi > lo:
            feats[i] = np.float32(np.sqrt(float((s[lo:hi] ** 2).sum()) / (hi - lo)))
    return feats


def zero_crossing_rate(samples: np.ndarray) -> float:
    """Fraction of adjacent sample pairs with a strict sign change
    (zeros break runs, matching the sign() formulation SQL replays)."""
    if len(samples) < 2:
        return 0.0
    sg = np.sign(samples)
    return float(np.count_nonzero(sg[1:] * sg[:-1] < 0)) / (len(samples) - 1)
