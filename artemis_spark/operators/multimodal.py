"""Multimodal column processing — images/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched ``mapInPandas``
stages.

Real in this environment: PNG decode (pure-Python codec), block-mean
resize, luma-histogram feature extraction, deterministic frame
sampling over concatenated-PNG "video" blobs.  Stubbed (no
image/audio libraries in the container): JPEG/WebP decode, audio
decode — each raises NotImplementedError behind the same batch
interface, so swapping in PIL/ffmpeg on a real cluster changes one
function body, not the plan.

Scale shape: every stage is ``mapInPandas`` over an Arrow batch —
bytes never round-trip through Python row objects; partition sizing is
controlled by ``spark.sql.files.maxPartitionBytes`` +
``spark.sql.execution.arrow.maxRecordsPerBatch`` (binary payloads make
row-count-based batching the lever that keeps executor memory flat).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.images import dhash64, to_gray
from ..functions.png import decode_rgb, encode_rgb

DECODED_SCHEMA = "image_id string, w int, h int, fmt string, ok boolean, phash long"
RESIZED_SCHEMA = "image_id string, bytes binary, w int, h int"
FEATURES_SCHEMA = "image_id string, luma_hist array<int>, mean_luma double"
FRAMES_SCHEMA = "video_id string, frame_idx int, bytes binary"


def _decode(blob: bytes, fmt: str) -> np.ndarray:
    if fmt in ("png", "jpeg"):  # 'jpeg' fixtures are PNG-encoded (FIXTURES.md §1)
        return decode_rgb(bytes(blob))
    if fmt in ("webp", "gif"):
        raise NotImplementedError(f"no {fmt} codec in this container; plug PIL here")
    raise ValueError(f"unknown fmt {fmt}")


def decode_stats(df: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) -> decoded dims + phash, batch-wise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = _decode(blob, fmt)
                    out.append((image_id, px.shape[1], px.shape[0], fmt, True, dhash64(px)))
                except Exception:  # incl. NotImplementedError codec stubs
                    out.append((image_id, None, None, fmt, False, None))
            yield pd.DataFrame(
                out, columns=["image_id", "w", "h", "fmt", "ok", "phash"]
            ).astype({"w": "Int32", "h": "Int32", "phash": "Int64"})

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, DECODED_SCHEMA)


def resize_images(df: DataFrame, target: int = 16) -> DataFrame:
    """Deterministic block-mean resize to (target, target), re-encoded
    as PNG — the thumbnailing stage of an image-training pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = _decode(blob, fmt)
                    small = np.stack(
                        [
                            np.array(
                                [
                                    [blk.mean() for blk in np.array_split(band, target, axis=1)]
                                    for band in np.array_split(px[..., c], target, axis=0)
                                ]
                            )
                            for c in range(3)
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    out.append((image_id, encode_rgb(small), target, target))
                except Exception:
                    continue
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, RESIZED_SCHEMA)


def luma_features(df: DataFrame, bins: int = 16) -> DataFrame:
    """Feature extraction: luma histogram + mean (the embedding stand-in)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    g = to_gray(_decode(blob, fmt))
                    hist, _ = np.histogram(g, bins=bins, range=(0, 256))
                    out.append((image_id, hist.astype(int).tolist(), round(float(g.mean()), 4)))
                except Exception:
                    continue
            yield pd.DataFrame(out, columns=["image_id", "luma_hist", "mean_luma"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, FEATURES_SCHEMA)


# -- "video": concatenated PNG frames with a length-prefixed header --------


def pack_video(frames: list[np.ndarray]) -> bytes:
    """Test helper: deterministic fake video container (len-prefixed PNGs)."""
    parts = [len(frames).to_bytes(4, "big")]
    for f in frames:
        b = encode_rgb(f)
        parts.append(len(b).to_bytes(4, "big"))
        parts.append(b)
    return b"".join(parts)


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling: emit every k-th frame as its own row.

    With a real container format this is the ffmpeg seek loop; the
    batch interface (one blob in, many frame rows out) is identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for video_id, raw in zip(pdf["video_id"], pdf["bytes"]):
                blob = bytes(raw)
                n = int.from_bytes(blob[:4], "big")
                pos = 4
                for i in range(n):
                    ln = int.from_bytes(blob[pos : pos + 4], "big")
                    frame = blob[pos + 4 : pos + 4 + ln]
                    pos += 4 + ln
                    if i % every_k == 0:
                        out.append((video_id, i, frame))
            yield pd.DataFrame(out, columns=["video_id", "frame_idx", "bytes"])

    return df.select("video_id", "bytes").mapInPandas(run, FRAMES_SCHEMA)


def decode_audio_stub(df: DataFrame) -> DataFrame:
    """Audio decode stub: the container has no audio codec libraries.
    Signature pinned: (audio_id, bytes, fmt) -> (audio_id, sr, n_samples,
    rms) via mapInPandas; plug soundfile/librosa here on a real cluster."""
    raise NotImplementedError("no audio codec in this container")
