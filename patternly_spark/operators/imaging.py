"""Pure-stdlib PNG codec + image kernels for the multimodal operators.

This container has no Pillow, but PNG needs only zlib (stdlib) plus the
filter reconstruction arithmetic — so PNG payloads get a REAL decode
path (the multimodal brief's decode step stops being a stub for this
format; JPEG/video still require external codecs and stay env-gated).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), filters 0-4, non-interlaced.  Everything else
raises ``UnsupportedImageError`` with the reason — callers route those
payloads to the env-gated path.

Scale note: decode runs inside mapInPandas workers against payload
bytes already local to the task — no shuffle; per-image cost is the
payload size.  Filter types 3/4 carry a left-neighbor dependency, so
reconstruction loops over pixels within a row (numpy across rows);
images written by ``pfsa.draw.encode_png`` (filter 0) reconstruct fully
vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "resize_nearest", "grid_features", "UnsupportedImageError"]

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


class UnsupportedImageError(ValueError):
    """Payload is not a PNG this decoder handles (route to external codecs)."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB array (alpha dropped, gray
    replicated, palette resolved)."""
    if payload[:8] != PNG_SIGNATURE:
        raise UnsupportedImageError("not a PNG signature")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise UnsupportedImageError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise UnsupportedImageError(f"bit depth {depth} (only 8 supported)")
    if interlace != 0:
        raise UnsupportedImageError("interlaced PNG not supported")
    if ctype not in (0, 2, 3, 4, 6):
        raise UnsupportedImageError(f"color type {ctype}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (1 + stride):
        raise UnsupportedImageError("IDAT size mismatch")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    for r in range(h):
        f = raw[r * (1 + stride)]
        line = np.frombuffer(
            raw[r * (1 + stride) + 1:(r + 1) * (1 + stride)], dtype=np.uint8
        ).astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 1:  # Sub (left dependency, per-pixel loop)
            rec = line.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif f == 3:  # Average
            rec = line.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise UnsupportedImageError(f"filter type {f}")
        out[r] = rec.astype(np.uint8)
        prev = rec

    px = out.reshape(h, w, channels)
    if ctype == 2:
        return px
    if ctype == 6:
        return px[:, :, :3]
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    # palette
    if plte is None:
        raise UnsupportedImageError("palette image without PLTE")
    return plte[px[:, :, 0]]


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — deterministic, no external deps."""
    h, w = img.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return img[rows][:, cols]


def grid_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Pooled-grayscale feature vector (grid x grid cell means / 255),
    float32 — a deterministic, content-sensitive embedding stand-in.

    Arithmetic is integer-sum then ONE double division then f32 cast, so
    an external SQL engine reproduces every feature bit-for-bit (no
    accumulation-order or intermediate-precision ambiguity)."""
    h, w = img.shape[:2]
    feats = np.empty(grid * grid, dtype=np.float32)
    px = img.astype(np.int64)
    for r in range(grid):
        for c in range(grid):
            cell = px[r * h // grid:(r + 1) * h // grid or 1,
                      c * w // grid:(c + 1) * w // grid or 1]
            feats[r * grid + c] = (
                np.float32(float(cell.sum()) / (cell.size * 255.0)) if cell.size else 0.0
            )
    return feats
