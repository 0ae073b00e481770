"""Multimodal plumbing: decode/resize/features/frame-sampling through
mapInPandas with real schemas and batch shapes; unsupported codecs fail
soft (stub contract)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from artemis_spark.functions.png import decode_rgb, encode_rgb
from artemis_spark.operators.multimodal import (
    decode_stats,
    luma_features,
    pack_video,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def images_df(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(6):
        px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        rows.append((f"im{i}", bytearray(encode_rgb(px)), "png"))
    rows.append(("bad", bytearray(b"junk"), "png"))
    rows.append(("webp0", bytearray(b"RIFF....WEBP"), "webp"))  # stubbed codec
    return spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")


def test_decode_stats(images_df):
    got = {r["image_id"]: r for r in decode_stats(images_df).collect()}
    assert got["im0"]["ok"] and got["im0"]["w"] == 32 and got["im0"]["phash"] is not None
    assert got["bad"]["ok"] is False
    assert got["webp0"]["ok"] is False  # stub: soft failure, not a crash


def test_resize(images_df):
    rows = resize_images(images_df, target=8).collect()
    assert len(rows) == 6  # bad/webp dropped
    px = decode_rgb(bytes(rows[0]["bytes"]))
    assert px.shape == (8, 8, 3)


def test_luma_features(images_df):
    rows = luma_features(images_df, bins=8).collect()
    assert len(rows) == 6
    for r in rows:
        assert len(r["luma_hist"]) == 8
        assert sum(r["luma_hist"]) == 32 * 32
        assert 0 <= r["mean_luma"] <= 255


def test_frame_sampling(spark):
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(7)]
    df = spark.createDataFrame(
        [("vid0", bytearray(pack_video(frames)))], "video_id string, bytes binary"
    )
    rows = sample_frames(df, every_k=2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6]
    got = decode_rgb(bytes(rows[1]["bytes"]))
    assert (got == frames[2]).all()
