"""PFSA graph rasterization to PNG — parity with the reference's
``generate_PFSA_pngs`` (reference patternly/detection.py:257-269, which
shells out to zedsuite's DrawPFSA/graphviz).

This environment has neither graphviz nor PIL, so the renderer is
self-contained: numpy rasterization + a stdlib-zlib PNG encoder.  The
layout is the canonical circular automaton drawing — states on a circle,
directed edges as arrows (curved apart when both directions exist),
self-loops as small circles, edge labels "sym:prob" in a 5x7 bitmap
font.  Deterministic: same model -> byte-identical PNG.

``AnomalyDetection.generate_pfsa_pngs`` wraps this per library model,
mirroring the reference method name/shape.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from patternly_spark.pfsa.model import PFSA

__all__ = ["draw_pfsa_png", "encode_png"]

# 5x7 bitmap font for the characters edge/node labels need
_FONT = {
    "0": ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    "1": ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    "2": ["01110", "10001", "00001", "00010", "00100", "01000", "11111"],
    "3": ["11110", "00001", "00001", "01110", "00001", "00001", "11110"],
    "4": ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    "5": ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    "6": ["00110", "01000", "10000", "11110", "10001", "10001", "01110"],
    "7": ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    "8": ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    "9": ["01110", "10001", "10001", "01111", "00001", "00010", "01100"],
    ".": ["00000", "00000", "00000", "00000", "00000", "01100", "01100"],
    ":": ["00000", "01100", "01100", "00000", "01100", "01100", "00000"],
    "q": ["00000", "00000", "01111", "10001", "01111", "00001", "00001"],
}


def _blit_text(img: np.ndarray, text: str, x: int, y: int, color) -> None:
    for ch in text:
        glyph = _FONT.get(ch)
        if glyph is not None:
            for r, row in enumerate(glyph):
                for c, bit in enumerate(row):
                    if bit == "1":
                        yy, xx = y + r, x + c
                        if 0 <= yy < img.shape[0] and 0 <= xx < img.shape[1]:
                            img[yy, xx] = color
        x += 6


def _draw_line(img: np.ndarray, p0, p1, color, thickness: int = 1) -> None:
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1])) * 2) + 1
    xs = np.linspace(p0[0], p1[0], n).round().astype(int)
    ys = np.linspace(p0[1], p1[1], n).round().astype(int)
    for dx in range(-(thickness // 2), thickness // 2 + 1):
        for dy in range(-(thickness // 2), thickness // 2 + 1):
            xx = np.clip(xs + dx, 0, img.shape[1] - 1)
            yy = np.clip(ys + dy, 0, img.shape[0] - 1)
            img[yy, xx] = color


def _draw_circle(img: np.ndarray, cx: float, cy: float, r: float, color,
                 fill=None) -> None:
    y0, y1 = int(max(0, cy - r - 2)), int(min(img.shape[0], cy + r + 3))
    x0, x1 = int(max(0, cx - r - 2)), int(min(img.shape[1], cx + r + 3))
    yy, xx = np.mgrid[y0:y1, x0:x1]
    d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    if fill is not None:
        img[y0:y1, x0:x1][d <= r] = fill
    img[y0:y1, x0:x1][np.abs(d - r) <= 0.8] = color


def _arrow_head(img: np.ndarray, tip, direction, color, size: float = 6.0) -> None:
    d = np.asarray(direction, dtype=float)
    norm = np.hypot(*d)
    if norm == 0:
        return
    d /= norm
    perp = np.array([-d[1], d[0]])
    base = np.asarray(tip) - d * size
    _draw_line(img, tip, base + perp * size * 0.5, color)
    _draw_line(img, tip, base - perp * size * 0.5, color)


def encode_png(img: np.ndarray) -> bytes:
    """RGB uint8 (H, W, 3) -> PNG bytes (stdlib zlib, filter 0 rows)."""
    h, w, _ = img.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def draw_pfsa_png(model: PFSA, path: str, *, size: int = 480) -> str:
    """Render the PFSA transition graph to ``path`` as a PNG; returns the
    path.  States sit on a circle; edge labels read "sym:prob" (2
    decimals) at the one-third point of each edge; self-loops draw as a
    small circle outside the node."""
    img = np.full((size, size, 3), 255, dtype=np.uint8)
    ink = np.array([30, 30, 30], dtype=np.uint8)
    accent = np.array([0, 80, 160], dtype=np.uint8)
    n_states, n_sym = model.pitilde.shape
    cx = cy = size / 2.0
    ring = size * 0.36
    node_r = max(10.0, size * 0.035)
    pos = [
        (
            cx + ring * np.cos(2 * np.pi * q / n_states - np.pi / 2),
            cy + ring * np.sin(2 * np.pi * q / n_states - np.pi / 2),
        )
        for q in range(n_states)
    ]

    for q in range(n_states):
        for s in range(n_sym):
            p = float(model.pitilde[q, s])
            if p <= 0.0:
                continue
            dst = int(model.connx[q, s])
            label = f"{s}:{p:.2f}"
            if dst == q:
                lx = pos[q][0] + (pos[q][0] - cx) * (node_r * 2.0) / ring
                ly = pos[q][1] + (pos[q][1] - cy) * (node_r * 2.0) / ring
                _draw_circle(img, lx, ly, node_r * 0.6, accent)
                _blit_text(img, label, int(lx + node_r * 0.8), int(ly - 3), accent)
                continue
            a, b = np.asarray(pos[q]), np.asarray(pos[dst])
            d = b - a
            dn = d / np.hypot(*d)
            # bow edges sideways so q->r and r->q don't overlap
            perp = np.array([-dn[1], dn[0]]) * (8.0 + 6.0 * s)
            mid = (a + b) / 2 + perp
            start = a + dn * node_r
            end = b - dn * node_r
            _draw_line(img, start, mid, ink)
            _draw_line(img, mid, end, ink)
            _arrow_head(img, end, end - mid, ink)
            lab = a + (b - a) / 3 + perp
            _blit_text(img, label, int(lab[0]) + 2, int(lab[1]) - 8, accent)

    for q, (x, y) in enumerate(pos):
        _draw_circle(img, x, y, node_r, ink, fill=np.array([235, 240, 250], dtype=np.uint8))
        _blit_text(img, f"q{q}", int(x - 5), int(y - 3), ink)

    png = encode_png(img)
    with open(path, "wb") as f:
        f.write(png)
    return path
