"""Minimal pure-Python PNG codec (RGB8) over zlib + numpy.

The container has no image libraries (PIL/cv2), so the deterministic
synthetic payloads (input_hint: image+caption pairs) are real PNG files
produced and parsed by this module — the byte format follows the public
PNG specification (RFC 2083).  Only 8-bit RGB, non-interlaced — exactly
what the fixture generator emits.  The "jpeg" payload rows are modeled
as PNG-encoded pixels with seeded noise within the PSNR>=40dB budget
(FIXTURES.md §1); real JPEG decode is stubbed in
operators/multimodal.py behind NotImplementedError.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_rgb(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG byte string."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # filter byte 0 (None) per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_rgb(data: bytes) -> np.ndarray:
    """Decode an RGB8 non-interlaced PNG to an (h, w, 3) uint8 array.

    Supports all five scanline filter types even though encode_rgb only
    writes type 0 (robustness for externally produced fixtures).
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    out = np.empty((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub
            cur = line.astype(np.int32).copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
            out[y] = cur.astype(np.uint8)
        elif ftype == 2:  # Up
            prev = out[y - 1] if y else np.zeros(stride, np.uint8)
            out[y] = (line.astype(np.int32) + prev) & 0xFF
        elif ftype == 3:  # Average
            prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
            cur = line.astype(np.int32).copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
            out[y] = cur.astype(np.uint8)
        elif ftype == 4:  # Paeth
            prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
            cur = line.astype(np.int32).copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
            out[y] = cur.astype(np.uint8)
        else:
            raise ValueError(f"bad filter {ftype}")
    return out.reshape(h, w, 3)
