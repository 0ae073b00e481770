"""Priority score + per-host politeness budget as a window top-k.

The reference has no explicit priority queue — ordering emerges from
FIFO deques, bundles of 20 and load-sorted dispatch (SURVEY.md §2.6;
/root/reference/src/Slave.py:40,145-172, /root/reference/src/Master.py:376-395).
Its per-host budget is structural: one host lives in exactly one
netarea shard (Phi host-major keying, /root/reference/src/Netarea.py:7-11)
behind a bounded deque.  The north_rule makes both explicit:

  score = f(depth) + host-PageRank proxy
  scheduled = row_number() OVER (PARTITION BY host
              ORDER BY score DESC, url ASC) <= budget

Score is kept integer-valued in a double column
(-1000*depth + min(inlinks, 999)) so the engine and the pure-Python
fixture model order identically with zero float divergence.

Over-budget rows are *deferred*, not dropped: they re-enter the next
round's candidate batch (the reference's bounded deques implicitly
retry via re-extraction; an explicit deferral queue is deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def score_expr(depth, host_inlinks):
    """Integer-valued priority: shallower pages first, popular hosts
    break ties.  host_inlinks is the cumulative inbound-link count for
    the host observed in rounds < current (the PageRank proxy)."""
    return (
        F.lit(-1000.0) * depth.cast("double")
        + F.least(F.coalesce(host_inlinks, F.lit(0)).cast("double"), F.lit(999.0))
    )


def with_score(schedulable: DataFrame, host_stats: DataFrame) -> DataFrame:
    """Join the (small) per-host stats table and add ``score``.

    host_stats(host, inlinks) is bounded by the number of distinct
    hosts — broadcast-joined, no shuffle of the wave.
    """
    stats = F.broadcast(host_stats.select("host", "inlinks"))
    return (
        schedulable.join(stats, "host", "left")
        .withColumn("score", score_expr(F.col("depth"), F.col("inlinks")))
        .drop("inlinks")
    )


def politeness_ranked(scored: DataFrame) -> DataFrame:
    """The wave with its per-host politeness rank (``_rk``) attached.

    Deterministic total order inside a host: score desc, url asc —
    the tie-break mandated by SURVEY.md §5 fixture semantics.  Exposed
    separately from :func:`politeness_topk` so the crawl round can pin
    (materialize) the ranked wave once and derive scheduled/deferred as
    filter scans instead of evaluating the window per branch.
    """
    w = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("url"))
    return scored.withColumn("_rk", F.row_number().over(w))


def politeness_topk(scored: DataFrame, budget: int) -> tuple[DataFrame, DataFrame]:
    """(scheduled, deferred) by per-host window rank."""
    ranked = politeness_ranked(scored)
    scheduled = ranked.filter(F.col("_rk") <= budget).drop("_rk")
    deferred = ranked.filter(F.col("_rk") > budget).drop("_rk")
    return scheduled, deferred
