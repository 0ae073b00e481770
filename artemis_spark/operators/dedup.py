"""Exact URL-seen dedup + crawl-state merge — the master validator.

Reference semantics (``Validator.is_valid``,
/root/reference/src/Master.py:284-314):
  1. reject a candidate if it is in ``tasksMap`` AND recently controlled
     (``is_alive``: now - lastcontrolled < refreshrate*delay,
     /root/reference/src/Task.py:94-95);
  2. otherwise merge crawl state from the stored task — lastvisited /
     lasthash / refreshrate each kept if the candidate has a non-default
     value else inherited (/root/reference/src/Master.py:296-310) — and
     stamp lastcontrolled = now.

Spark shape: candidates LEFT JOIN url_seen ON url; the reject predicate
is a filter; the merge is per-column ``coalesce``.  Rows pre-flagged
``maybe_seen = false`` by the bloom tier skip the join entirely (they
cannot be in url_seen), cutting the shuffle to the maybe-seen slice.

The reference's dedup is *lossy* (ARC eviction) while url_seen is exact
— a deliberate semantic upgrade flagged in SURVEY.md §7: at reference
test scale the ARC never evicts, so fixtures agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rounds import EPOCH_SQL, ROUND_SECONDS
from ..schemas import MAX_REFRESH_RATE, NATURES

# Sorted so the int-code min agrees with min(string); derived from the
# single schemas.NATURES enum rather than re-hardcoded here.
_NATURES = sorted(NATURES)


def dedupe_within_batch(candidates: DataFrame) -> DataFrame:
    """Collapse duplicate candidate URLs inside one round's batch.

    Keeps min depth (BFS frontier semantics) and a deterministic nature;
    the reference gets this for free because tasksMap upsert is
    last-writer-wins within a shard — here it must be explicit since a
    URL can arrive from many extractor partitions in one round.

    The nature column is aggregated as a small int code (same ordering
    as the string min) so every agg buffer is fixed-width numeric and
    Catalyst plans a codegen HashAggregate — min(string) would fall back
    to SortAggregate and sort the whole multi-million-row batch.
    """
    # array_position yields 0 for not-found; nullif maps that to NULL so
    # an out-of-enum nature degrades to NULL instead of try_element_at
    # throwing INVALID_INDEX_OF_ZERO at runtime (possible when resuming a
    # state dir written before seed-nature normalization).
    code = F.nullif(
        F.array_position(F.array(*[F.lit(n) for n in _NATURES]), F.col("nature")),
        F.lit(0),
    )
    decode = F.array(*[F.lit(n) for n in _NATURES])
    return (
        candidates.withColumn("_nat", code)
        .groupBy("url", "host")
        .agg(
            F.min("depth").alias("depth"),
            F.min("_nat").alias("_nat"),
            F.min("round_added").alias("round_added"),
        )
        .withColumn("nature", F.try_element_at(decode, F.col("_nat").cast("int")))
        .drop("_nat")
    )


def split_by_bloom(candidates: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) by the bloom pre-filter column."""
    new = candidates.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = candidates.filter(F.col("maybe_seen")).drop("maybe_seen")
    return new, maybe


def validate_against_seen(
    maybe_seen: DataFrame,
    url_seen: DataFrame,
    current_round: int,
    revisit_delay_rounds: int,
) -> DataFrame:
    """Exact anti-join + state merge for the maybe-seen slice.

    Returns schedulable rows with columns:
    url, host, depth, nature, round_added, last_visited, last_hash,
    refresh_rate, was_seen.
    """
    seen = url_seen.select(
        F.col("url").alias("s_url"),
        F.col("last_visited").alias("s_last_visited"),
        F.col("last_controlled").alias("s_last_controlled"),
        F.col("last_hash").alias("s_last_hash"),
        F.col("refresh_rate").alias("s_refresh_rate"),
    )
    # url ALONE is the join key: it is url_seen's primary key (host is
    # derived from it, so a host equality adds zero selectivity), and a
    # single plain-equality key is the only shape under which the state
    # side reuses the delta-reconstruction's hash(url) partitioning —
    # the wide state never re-exchanges, only the narrow wave side
    # shuffles.  The earlier (host eqNullSafe) compound key looked free
    # but planned as (coalesce(host,''), isnull(host), url) exchanges on
    # BOTH sides (PLANS.md), re-shuffling the full state every round;
    # url-only also makes the NULL-host state-row concern moot.
    j = maybe_seen.join(seen, maybe_seen["url"] == seen["s_url"], "left")
    # is_alive: now - last_controlled < refresh_rate * delay  (in rounds)
    age_rounds = (
        F.lit(current_round)
        - (F.unix_timestamp("s_last_controlled") - F.unix_timestamp(F.lit(EPOCH_SQL)))
        / F.lit(ROUND_SECONDS)
    ).cast("long")
    alive = F.col("s_url").isNotNull() & (
        age_rounds < F.col("s_refresh_rate").cast("long") * F.lit(revisit_delay_rounds)
    )
    return (
        j.filter(~alive)
        .select(
            "url",
            "host",
            "depth",
            "nature",
            "round_added",
            F.col("s_last_visited").alias("last_visited"),
            F.coalesce(F.col("s_last_hash"), F.lit("")).alias("last_hash"),
            F.coalesce(F.col("s_refresh_rate"), F.lit(1)).alias("refresh_rate"),
            F.col("s_url").isNotNull().alias("was_seen"),
        )
    )


def as_new(definitely_new: DataFrame) -> DataFrame:
    """Give bloom-negative rows the same shape as validate_against_seen."""
    return definitely_new.select(
        "url",
        "host",
        "depth",
        "nature",
        "round_added",
        F.lit(None).cast("timestamp").alias("last_visited"),
        F.lit("").alias("last_hash"),
        F.lit(1).alias("refresh_rate"),
        F.lit(False).alias("was_seen"),
    )


def bump_refresh_rate(col):
    """incr(): backoff on 3xx/304/4xx/unchanged (/root/reference/src/Task.py:86-89),
    capped at MAX_REFRESHRATE=20 (/root/reference/src/Task.py:9)."""
    return F.least(F.lit(MAX_REFRESH_RATE), col + F.lit(1))
