"""Structured Streaming paths driven synchronously via the parquet
source + processAllAvailable (memory sink)."""

import pytest
from pyspark.sql import functions as F

from artemis_spark.streaming.events import frontier_stream_dedup, windowed_metrics


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # the streaming parquet source wants a directory of files
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_windowed_metrics_stream(spark, sf_dir, events_dir):
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> event-time
    )
    agg = windowed_metrics(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM win_out")
    # append mode emits only watermark-closed windows; compare against batch
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    g = {(r["window"]["start"], r["event_type"]): r["n"] for r in got.collect()}
    b = {(r["window"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert g, "stream produced no closed windows"
    for k, v in g.items():
        assert b[k] == v


def test_frontier_stream_dedup(spark, tmp_path):
    import datetime as dt

    rows = [
        ("http://a.test/1", dt.datetime(2026, 1, 1, 0, 0)),
        ("http://a.test/1", dt.datetime(2026, 1, 1, 0, 5)),
        ("http://a.test/2", dt.datetime(2026, 1, 1, 0, 6)),
    ]
    src = str(tmp_path / "frontier_src")
    spark.createDataFrame(rows, "url string, ts timestamp").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        frontier_stream_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    urls = sorted(r["url"] for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert urls == ["http://a.test/1", "http://a.test/2"]


def test_stateful_backoff_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-host state across micro-batches:
    rate = 1 + total bad fetches so far, capped at 20 (T7)."""
    from artemis_spark.streaming.events import stateful_backoff

    src = str(tmp_path / "fetch_results")
    batch1 = [("a.test", 200), ("a.test", 404), ("b.test", 200)]
    batch2 = [("a.test", 304), ("a.test", 500), ("b.test", 200)]
    spark.createDataFrame(batch1, "host string, status int").write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        stateful_backoff(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("backoff_out")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(batch2, "host string, status int").write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM backoff_out").collect()
    # last emitted rate per host wins
    last = {}
    for r in rows:
        last[r["host"]] = r["refresh_rate"]
    assert last["a.test"] == 4  # 1 + 404 + 304 + 500
    assert last["b.test"] == 1  # never backed off
