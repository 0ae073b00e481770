"""Similarity search over embedding columns (array<float>).

Two paths, mirroring the brief:
  * brute-force cosine top-k — the exact baseline; query set broadcast,
    scan parallelized over the corpus, per-partition top-k before the
    final global top-k (no all-pairs shuffle);
  * sign-bucketed ANN — the scale path: corpus pre-partitioned into
    2^d buckets by component sign bits (a deterministic stand-in for
    IVF/LSH planes), queries probe only their bucket.

All math is native column expressions (zip_with + aggregate), rounded
to 3 decimals *before* ranking so rank output is reproducible across
engines (cross-engine float sums can differ in the last ulp; ranking
on rounded values with an id tie-break removes the divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small (it is broadcast); the corpus
    side stays partitioned.  Output: (query_id, rank, neighbor_id,
    cos_sim) with cos_sim rounded to 3dp and ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_expr(F.col("q_vec").cast("array<double>"), F.col("c_vec").cast("array<double>")),
                3,
            ),
        )
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def sign_bucket(vec, d: int = 3) -> F.Column:
    """Deterministic coarse quantizer: d sign bits of the leading
    components (IVF-cell stand-in — on a cluster these are learned
    centroids; sign planes keep the oracle reproducible)."""
    b = F.lit(0)
    for i in range(d):
        b = b + F.when(F.element_at(vec, i + 1) > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return b


def bucketed_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    d: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.

    The bucket equi-join replaces the all-pairs cross join — at 100 TB
    this is the difference between a full shuffle and a pruned probe of
    1/2^d of the corpus per query.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(F.col(vec_col), d).alias("bucket"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sign_bucket(F.col(vec_col), d).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_expr(F.col("q_vec").cast("array<double>"), F.col("c_vec").cast("array<double>")),
                3,
            ),
        )
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    d: int = 3,
    threshold_milli: int = 400,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space member of
    the dedup family (exact / minhash / simhash / n-gram live in
    dedup_text.py).

    Candidate generation is the sign-bucket equi-join (same LSH-plane
    quantizer as bucketed_ann_topk) so the all-pairs cross join never
    happens; survivors are verified with exact cosine.  The threshold
    compares round(cos*1000) as an integer so the engine and the DuckDB
    oracle agree bit-for-bit.  Output: (vec1, vec2, cos_milli).
    """
    a = embeddings.select(
        F.col(id_col).alias("vec1"),
        F.col(vec_col).alias("a_vec"),
        sign_bucket(F.col(vec_col), d).alias("bucket"),
    )
    b = embeddings.select(
        F.col(id_col).alias("vec2"),
        F.col(vec_col).alias("b_vec"),
        sign_bucket(F.col(vec_col), d).alias("bucket"),
    )
    pairs = a.join(b, ["bucket"]).where(F.col("vec1") < F.col("vec2"))
    cos_milli = F.round(
        cosine_expr(
            F.col("a_vec").cast("array<double>"), F.col("b_vec").cast("array<double>")
        )
        * 1000
    ).cast("long")
    return (
        pairs.withColumn("cos_milli", cos_milli)
        .where(F.col("cos_milli") >= threshold_milli)
        .select("vec1", "vec2", "cos_milli")
    )
