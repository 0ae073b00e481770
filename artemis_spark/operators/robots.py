"""robots.txt permission filter as a broadcast join + longest-match.

Reference: ``RobotCache.get`` fetches/parses per-host robots with a
3600 s TTL and answers ``can_fetch`` (/root/reference/src/Robot.py:91-138);
the master consults it before validating a URL
(/root/reference/src/Master.py:290-294) and side-emits discovered
``Sitemap:`` URLs into the task stream (/root/reference/src/Robot.py:134-137).

Spark shape (north_rule names this explicitly): rules are pre-grouped
into one array per host (tiny, O(hosts)), broadcast, and the
longest-matching prefix is picked with higher-order array expressions —
the wave is never shuffled and no Python runs per row.  Hosts with no
rules are allowed (urllib.robotparser default the reference relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import path_of


def _rules_per_host(robots_rules: DataFrame, current_round_ts) -> DataFrame:
    """Collapse live (non-TTL-expired) rules to one array<struct> per host."""
    live = robots_rules.filter(
        F.unix_timestamp(F.lit(current_round_ts))
        <= F.unix_timestamp("fetched_at") + F.col("ttl_s")
    )
    return live.groupBy("host").agg(
        F.collect_list(F.struct("pattern", "allow")).alias("_rules")
    )


def apply_robots_flags(
    wave: DataFrame,
    robots_rules: DataFrame,
    current_round_ts,
) -> DataFrame:
    """Single-pass variant: the wave annotated with a ``robots_allowed``
    boolean instead of two filtered branches.  A caller that pins
    (materializes) the annotated wave evaluates the rules join ONCE and
    derives allowed/blocked as filter scans of the pin — splitting first
    would re-execute the whole upstream candidate chain per branch."""
    per_host = _rules_per_host(robots_rules, current_round_ts)
    j = (
        wave.withColumn("_path", path_of(F.col("url")))
        .join(F.broadcast(per_host), "host", "left")
    )
    hits = F.filter(
        F.coalesce(F.col("_rules"), F.array()),
        lambda r: F.col("_path").startswith(r["pattern"]),
    )
    best = F.array_max(
        F.transform(
            hits,
            lambda r: F.struct(
                F.length(r["pattern"]).alias("plen"), r["allow"].alias("allow")
            ),
        )
    )
    return j.withColumn(
        "robots_allowed", F.coalesce(best["allow"], F.lit(True))
    ).drop("_path", "_rules")


def apply_robots(
    wave: DataFrame,
    robots_rules: DataFrame,
    current_round_ts,
) -> tuple[DataFrame, DataFrame]:
    """(allowed, blocked) split of the wave by longest-match robots rules.

    Expired rules (now > fetched_at + ttl) are ignored — refresh is
    modeled as re-reading the table (a live deployment re-fetches,
    /root/reference/src/Robot.py:91-98).
    """
    decided = apply_robots_flags(wave, robots_rules, current_round_ts)
    allowed = decided.filter(F.col("robots_allowed")).drop("robots_allowed")
    blocked = decided.filter(~F.col("robots_allowed")).drop("robots_allowed")
    return allowed, blocked


def sitemap_candidates(robots_rules: DataFrame, hosts_in_wave: DataFrame) -> DataFrame:
    """Sitemap URLs declared by hosts touched this round — the side-emit
    of /root/reference/src/Robot.py:134-137, unioned into next round's
    candidates as nature=web_static_sitemap."""
    return (
        robots_rules.filter(F.col("sitemap_url").isNotNull())
        .join(hosts_in_wave.select("host").distinct(), "host", "left_semi")
        .select(F.col("sitemap_url").alias("url"))
        .distinct()
    )
