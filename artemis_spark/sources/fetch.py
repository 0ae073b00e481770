"""The fetch wave — synthetic in-sandbox, pluggable for real HTTP.

Reference: each Crawler thread pops a task and runs the scheme handler's
conditional GET (/root/reference/src/handlers/HTTPDefaultHandler.py:104-126),
checking headers for redirect/304/4xx backoff (:34-49).

In-sandbox there is no network, so "fetching" the scheduled wave is a
deterministic join against the synthetic web:

  wave JOIN link_graph  ON url       -> status, location, outlinks, sha
       JOIN payloads    ON image_id  -> bytes, caption, fmt   (200s only)

The wave is salted-repartitioned by host first (north_rule skew
handling): each Spark task processes a bounded slice of one host — the
explicit analogue of one netarea's bounded deque + bundles of 20
(/root/reference/src/Slave.py:40,145-172).

A real-HTTP fetcher would replace the link_graph join with a
``mapInPandas`` batch fetch; the stub below pins the exact UDF
signature and batch shape so the swap is drop-in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import salted_host

FETCH_RESULT_COLS = [
    "status",
    "location",
    "outlinks",
    "content_sha224",
    "image_id",
]


def synthetic_fetch(
    wave: DataFrame,
    link_graph: DataFrame,
    num_partitions: int,
    salt: int = 0,
) -> DataFrame:
    """Join the scheduled wave against the synthetic web.

    URLs absent from link_graph come back status=404 (dead link), the
    same observable as a live 404 (/root/reference/src/handlers/HTTPDefaultHandler.py:46-49).

    ``salt > 0`` first repartitions the wave by salted host — the shape
    a *real* per-host HTTP fetcher needs (connection reuse + skew
    spreading, north_rule).  For the synthetic join path the default is
    salt=0: the join itself partitions by url, and an up-front host
    repartition would just add a full extra shuffle per round.  Pass the
    link_graph pre-partitioned by url (see CrawlEngine) and only the
    wave side exchanges.
    """
    if salt > 0:
        wave = wave.repartition(
            num_partitions, salted_host(F.col("host"), F.col("url"), salt)
        )
    lg = link_graph.select(
        F.col("url").alias("g_url"),
        *[F.col(c) for c in FETCH_RESULT_COLS],
    )
    j = wave.join(lg, wave["url"] == lg["g_url"], "left").drop("g_url")
    return j.withColumn("status", F.coalesce(F.col("status"), F.lit(404)))


def attach_payloads(fetched: DataFrame, payloads: DataFrame) -> DataFrame:
    """Join page content for 200s; non-200 rows pass through with NULL
    payload columns (no content to decode)."""
    p = payloads.select(
        F.col("image_id").alias("p_image_id"),
        F.col("bytes"),
        F.col("fmt"),
        F.col("caption"),
        F.col("phash").alias("expected_phash"),
        F.col("w").alias("expected_w"),
        F.col("h").alias("expected_h"),
    )
    return fetched.join(
        p,
        (fetched["status"] == 200) & (fetched["image_id"] == p["p_image_id"]),
        "left",
    ).drop("p_image_id")


def http_fetch_stub(wave: DataFrame) -> DataFrame:
    """Signature-pinning stub for a real HTTP fetcher.

    On a cluster with egress this becomes::

        def fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:           # one Arrow batch of one host-salt slice
                # issue conditional GETs (If-Modified-Since from last_visited,
                # HTTPDefaultHandler.py:24-32), 4KB streamed reads, 1MB spool
                yield pdf.assign(status=..., location=..., outlinks=...,
                                 content_sha224=..., bytes=...)

        wave.mapInPandas(fetch_batch, schema=WAVE_SCHEMA + FETCH_RESULT_COLS)

    Deliberately unimplemented in-sandbox (no network).
    """
    raise NotImplementedError("no network egress in this environment; use synthetic_fetch")
