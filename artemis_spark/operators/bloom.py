"""Partitioned bloom URL-seen shards — the cheap first dedup tier.

Reference analogue: the slave-side ``alreadySent`` ARC cache
(/root/reference/src/Slave.py:112,118-142) is a lossy membership test
that short-circuits most duplicate URLs before they reach the master's
exact check (/root/reference/src/Master.py:284-314).  Here the same
two-tier shape is: per-host-shard bloom filters (this module, built
distributed + OR-merged on the driver, broadcast to executors, rebuilt
*incrementally* per round per north_rule) followed by the exact
anti-join in operators/dedup.py.

Direction of the short-circuit: a bloom *negative* is definitely-new —
those rows skip the expensive shuffle anti-join entirely (in an
expanding crawl that is most of the wave).  Bloom positives (maybe-seen
plus ~1% false positives) go through the exact join, so results are
exact regardless of FP rate.

Scale notes (10^10 URLs): with S=4096 shards and ~10 bits/URL each
shard is ~3 GB total / S ≈ 3 MB — the full dict broadcast is ~12 GB,
too big for one executor; the scale path (documented here, same API) is
to repartition candidates by shard id first and have each task load
only its own shard from a side-stored file.  The sandbox uses the
broadcast dict.
"""

from __future__ import annotations

import io
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import host_partition_key

_KEY1 = "artemis-bloom-h1"  # 16 bytes each — pd.util.hash_pandas_object keys
_KEY2 = "artemis-bloom-h2"


def _h1h2(urls: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    s = urls.astype(str)
    h1 = pd.util.hash_pandas_object(s, index=False, hash_key=_KEY1).to_numpy()
    h2 = pd.util.hash_pandas_object(s, index=False, hash_key=_KEY2).to_numpy()
    return h1, h2 | np.uint64(1)  # odd h2 so strides cycle the whole table


class BloomShards:
    """num_shards independent bloom bitsets, shard = pmod(xxhash64(host), S)."""

    def __init__(self, num_shards: int, bits_per_shard: int = 1 << 20, n_hashes: int = 7):
        self.num_shards = num_shards
        self.m = int(bits_per_shard)
        self.k = int(n_hashes)
        self.bits = np.zeros((num_shards, self.m // 8), dtype=np.uint8)

    # -- pure-numpy core ----------------------------------------------------

    def _positions(self, urls: pd.Series) -> np.ndarray:
        h1, h2 = _h1h2(urls)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add(self, shard_id: int, urls: pd.Series) -> None:
        if len(urls) == 0:
            return
        pos = self._positions(urls).ravel()
        np.bitwise_or.at(self.bits[shard_id], pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, shard_ids: np.ndarray, urls: pd.Series) -> np.ndarray:
        if len(urls) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(urls)  # (k, n)
        byte = self.bits[shard_ids[None, :], pos >> 3]
        mask = (1 << (pos & 7)).astype(np.uint8)
        return ((byte & mask) == mask).all(axis=0)

    def merge_partial(self, shard_id: int, partial: bytes) -> None:
        self.bits[shard_id] |= np.frombuffer(partial, dtype=np.uint8)

    # -- persistence (resume support) ----------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, bits=self.bits, m=self.m, k=self.k)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "BloomShards":
        with open(path, "rb") as f:
            z = np.load(io.BytesIO(f.read()))
        obj = cls(z["bits"].shape[0], int(z["m"]), int(z["k"]))
        obj.bits = z["bits"]
        return obj

    # -- Spark integration ----------------------------------------------------

    def update_from_df(self, df: DataFrame, url_col: str = "url", host_col: str = "host") -> None:
        """Incrementally add a round's new URLs, built distributed.

        Each shard's partial bitset is built inside an ``applyInPandas``
        task (vectorized hashing), and only S small bitsets are collected
        and OR-merged — no raw URLs cross to the driver.
        """
        m = self.m
        k = self.k
        S = self.num_shards

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["_shard"].iloc[0])
            part = BloomShards(1, m, k)
            part.add(0, pdf[url_col])
            return pd.DataFrame({"shard": [shard], "bits": [part.bits[0].tobytes()]})

        partials = (
            df.select(url_col, host_partition_key(F.col(host_col), S).alias("_shard"))
            .groupBy("_shard")
            .applyInPandas(build, schema="shard int, bits binary")
            .collect()
        )
        for row in partials:
            self.merge_partial(row["shard"], row["bits"])


def with_bloom_maybe_seen(
    spark: SparkSession,
    candidates: DataFrame,
    shards: BloomShards,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Adds ``maybe_seen:boolean`` via a broadcast bloom probe.

    Rows with ``maybe_seen = false`` are guaranteed-new and can bypass
    the exact anti-join shuffle (dedup.py consumes this flag).
    """
    S = shards.num_shards
    bc = spark.sparkContext.broadcast({"bits": shards.bits, "m": shards.m, "k": shards.k})

    @F.pandas_udf(T.BooleanType())
    def probe(urls: pd.Series, shard_ids: pd.Series) -> pd.Series:
        state = bc.value
        obj = BloomShards(state["bits"].shape[0], state["m"], state["k"])
        obj.bits = state["bits"]
        res = obj.might_contain(shard_ids.to_numpy(dtype=np.int64), urls)
        return pd.Series(res)

    return candidates.withColumn(
        "maybe_seen",
        probe(F.col(url_col), host_partition_key(F.col(host_col), S)),
    )
