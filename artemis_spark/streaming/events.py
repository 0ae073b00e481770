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
    """Per-host stateful refresh-rate tracking with
    ``applyInPandasWithState``: the streaming form of the T7 backoff
    state machine (incr() once per 3xx/4xx/unchanged fetch, capped at
    MAX_REFRESHRATE=20, /root/reference/src/Task.py:9,86-92).  State is
    one int per host; each micro-batch emits the host's updated rate.
    The batch round loop owns this state in url_seen; this is the
    continuous-deployment path for a live fetch-result stream."""
    import pandas as pd

    def update(key, pdf_iter, state):
        (rate,) = state.get if state.exists else (1,)
        n_bad = 0
        for pdf in pdf_iter:
            n_bad += int((pdf["status"].astype("int64") >= 300).sum())
        rate = min(20, rate + n_bad)
        state.update((rate,))
        yield pd.DataFrame({"host": [key[0]], "refresh_rate": [rate]})

    return stream.groupBy("host").applyInPandasWithState(
        update,
        outputStructType="host string, refresh_rate int",
        stateStructType="rate int",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
