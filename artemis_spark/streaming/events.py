"""Structured Streaming ingestion — the continuous counterpart of the
batch round loop.

The reference's processes run forever on 1 s polls
(/root/reference/src/Slave.py:193, /root/reference/src/Monitor.py:600-608);
the rebuild is deliberately batch-iterative (SURVEY.md §1.2), but a
deployment that receives frontier updates or fetch-result streams can
run these as Structured Streaming queries:

  * ``windowed_metrics`` — watermarked tumbling-window counts, the
    streaming version of the lineage/metrics rollup (A4/A6);
  * ``frontier_stream_dedup`` — dropDuplicates over a watermark, the
    streaming first-tier of the URL-seen dedup (F1);
  * ``stateful_backoff`` — applyInPandasWithState skeleton of the
    per-host refresh-rate state machine (T7).

Tests drive them with the parquet source + ``processAllAvailable()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_metrics(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


def frontier_stream_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming first-tier dedup: drop duplicate URLs within the
    watermark horizon (exact dedup against url_seen still happens in
    the batch MERGE — same two-tier split as bloom -> anti-join)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(["url"])


def stateful_backoff(stream: DataFrame):
    """Skeleton: per-host stateful refresh-rate tracking with
    ``applyInPandasWithState`` (host -> (refresh_rate, last_status)).
    Not wired in-sandbox: the batch loop owns this state; kept as the
    documented streaming path."""
    import pandas as pd  # noqa: F401

    def update(key, pdf_iter, state):  # pragma: no cover - skeleton
        rate = state.get("rate", 1) if state.exists else 1
        for pdf in pdf_iter:
            bad = int((pdf["status"] >= 300).sum())
            rate = min(20, rate + bad)
        state.update((rate,))
        yield __import__("pandas").DataFrame({"host": [key[0]], "refresh_rate": [rate]})

    return stream.groupBy("host").applyInPandasWithState(
        update,
        outputStructType="host string, refresh_rate int",
        stateStructType="rate int",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
