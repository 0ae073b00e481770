"""Image payload functions — vectorized pandas/Arrow UDFs (input_hint:
"no per-row Python"; each call receives an Arrow batch of thousands of
images, the numpy work per element is the decode itself).

Reference parity: the reference delegates payload handling to the
external ``hermes`` package and only reads back a sha224 + content type
(/root/reference/src/RessourceFactory.py:26-35).  The new engine makes
the payload path first-class per BASELINE.json input_hint: decode +
validate + phash + PSNR against the fixture pixels.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .png import decode_rgb

# ---------------------------------------------------------------------------
# plain-numpy primitives (shared with the fixture generator and tests)
# ---------------------------------------------------------------------------


def to_gray(pixels: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma, float64 (h, w)."""
    p = pixels.astype(np.float64)
    return 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]


def _split_offsets(n: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """np.array_split boundary offsets + block sizes for n items in k blocks."""
    sizes = np.full(k, n // k, dtype=np.int64)
    sizes[: n % k] += 1
    offsets = np.zeros(k, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])
    return offsets, sizes


def _block_mean(gray: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Deterministic area-mean resize to (rows, cols).

    Vectorized via np.add.reduceat over the array_split boundaries —
    identical block geometry to the naive per-block .mean() loop (the
    summation order differs only in float64 ulps, far below the >
    comparison granularity of dhash on uint8-derived luma).
    """
    h, w = gray.shape
    roff, rsz = _split_offsets(h, rows)
    coff, csz = _split_offsets(w, cols)
    s = np.add.reduceat(np.add.reduceat(gray, roff, axis=0), coff, axis=1)
    return s / np.outer(rsz, csz)


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash: 9x8 block-mean grayscale, bit = left<right,
    packed row-major, returned as a signed int64 (column type long).

    Raises for images smaller than the 8x9 grid: reduceat with zero-size
    blocks would produce duplicate offsets and divide by zero, yielding a
    silently-wrong hash instead of a failure the decode UDF can surface.
    """
    h, w = pixels.shape[:2]
    if h < 8 or w < 9:
        raise ValueError(f"image {h}x{w} smaller than 8x9 dhash grid")
    g = _block_mean(to_gray(pixels), 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return math.inf if mse == 0.0 else 10.0 * math.log10(255.0**2 / mse)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------------------
# pandas UDFs
# ---------------------------------------------------------------------------

DECODE_RESULT_TYPE = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("pixels_sha", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


@F.pandas_udf(DECODE_RESULT_TYPE)
def decode_validate_image(data: pd.Series) -> pd.DataFrame:
    """Decode a batch of PNG payloads; returns (ok, w, h, pixels_sha, phash).

    pixels_sha is sha224 over the raw decoded pixel buffer — the decoded
    analogue of the reference's content sha224
    (/root/reference/src/RessourceFactory.py:29).
    """
    ok, ws, hs, shas, phs = [], [], [], [], []
    for blob in data:
        if blob is None:
            # vectorized UDFs see the WHOLE batch even when the caller
            # wraps the call in when(cond, ...): non-fetched rows arrive
            # as NULL bytes and must not pay the exception path
            ok.append(False)
            ws.append(None)
            hs.append(None)
            shas.append(None)
            phs.append(None)
            continue
        try:
            px = decode_rgb(bytes(blob))
            ok.append(True)
            hs.append(int(px.shape[0]))
            ws.append(int(px.shape[1]))
            shas.append(hashlib.sha224(px.tobytes()).hexdigest())
            phs.append(dhash64(px))
        except Exception:
            ok.append(False)
            ws.append(None)
            hs.append(None)
            shas.append(None)
            phs.append(None)
    return pd.DataFrame(
        {
            "ok": ok,
            # nullable Int dtypes: plain lists with None infer float64 and
            # silently truncate int64 phashes
            "w": pd.array(ws, dtype="Int32"),
            "h": pd.array(hs, dtype="Int32"),
            "pixels_sha": shas,
            "phash": pd.array(phs, dtype="Int64"),
        }
    )


@F.pandas_udf(T.DoubleType())
def psnr_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """PSNR(dB) between two PNG payload columns; NaN on decode failure,
    999.0 for bit-identical pixels (inf is not representable)."""
    out = []
    for xa, xb in zip(a, b):
        try:
            v = psnr(decode_rgb(bytes(xa)), decode_rgb(bytes(xb)))
            out.append(999.0 if math.isinf(v) else v)
        except Exception:
            out.append(float("nan"))
    return pd.Series(out, dtype="float64")


@F.pandas_udf(T.LongType())
def phash64_udf(data: pd.Series) -> pd.Series:
    out = []
    for blob in data:
        try:
            out.append(dhash64(decode_rgb(bytes(blob))))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="Int64")
