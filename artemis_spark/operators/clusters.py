"""Near-duplicate clustering: connected components over dedup pair
edges + canonical-document selection.

The dedup family (exact / n-gram Jaccard / MinHash-LSH / SimHash /
embedding near-dup) emits PAIRS; a training-data pipeline needs the
transitive closure — if A~B and B~C, {A,B,C} is one duplicate cluster
and exactly one canonical document survives.  No reference analogue
(the reference crawls, it does not dedup corpora); this is part of the
brief's training-data operator family.

Algorithm: iterative min-label propagation — comp(v) <- min(comp(v),
min over neighbors' comp) until fixpoint — expressed purely as
DataFrame joins/aggregations, one Spark job per iteration.  Near-dup
graphs are unions of near-cliques with tiny diameters, so convergence
takes a handful of rounds; for adversarial long-chain graphs at web
scale the drop-in upgrade is alternating large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce and
Beyond"), which uses the same primitives with O(log n) rounds.  Labels
are persisted per iteration and the previous iteration unpersisted, so
lineage stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp) with comp = min node id in the component.

    ``edges`` may list each undirected edge in either (or both)
    directions; ``nodes`` supplies the full vertex set so isolated
    nodes come back as their own singleton component.
    """
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(
            edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
        )
        .distinct()
        .persist()
    )
    # localCheckpoint (not persist): each iteration references the previous
    # labels twice (union + convergence join), so without lineage
    # truncation the logical plan doubles per round and Catalyst planning
    # itself OOMs after ~10 iterations.  On a cluster with a checkpoint
    # dir, reliable checkpoint() is the fault-tolerant equivalent.
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("comp")
    ).localCheckpoint()
    try:
        for _ in range(max_iter):
            neigh = sym.join(
                labels, sym["s"] == labels["id"]
            ).select(F.col("d").alias("id"), "comp")
            new_labels = (
                labels.unionByName(neigh)
                .groupBy("id")
                .agg(F.min("comp").alias("comp"))
                .localCheckpoint()
            )
            changed = (
                new_labels.join(
                    labels.withColumnRenamed("comp", "_old"), "id"
                )
                .where(F.col("comp") != F.col("_old"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        return labels
    finally:
        sym.unpersist()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc1",
    dst_col: str = "doc2",
) -> DataFrame:
    """(doc_id, cluster_id, keep): transitive near-dup clusters over the
    pair edges, with the min-id document of each cluster kept as the
    canonical survivor (keep=true) — the standard corpus-dedup policy.
    Documents in no pair are singleton clusters and always kept."""
    cc = connected_components(
        pairs, docs, src_col=src_col, dst_col=dst_col, id_col=id_col
    )
    return cc.select(
        F.col("id").alias(id_col),
        F.col("comp").alias("cluster_id"),
        (F.col("id") == F.col("comp")).alias("keep"),
    )
