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


def band_keys(vec, d: int, bands: int) -> F.Column:
    """Banded sign signature: d sign bits split into ``bands`` bands of
    d/bands bits, returned as array<struct<band:int, key:int>>.

    This is OR-amplified LSH for cosine (same banding trick as the
    MinHash path in dedup_text.py): two vectors are candidates if ANY
    band matches, so recall grows with bands while each band's 2^(d/bands)
    buckets keep within-bucket populations ~N/2^(d/bands) — the fix for
    the d=3 quantizer whose 8 buckets made within-bucket work quadratic
    at scale (VERDICT r01).  All native expressions, DuckDB-reproducible.
    """
    rb = d // bands
    entries = []
    for b in range(bands):
        key = F.lit(0)
        for j in range(rb):
            i = b * rb + j
            key = key + F.when(
                F.element_at(vec, i + 1) > 0, F.lit(2 ** j)
            ).otherwise(F.lit(0))
        entries.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    return F.array(*entries)


def _banded_sig(
    embeddings: DataFrame,
    d: int,
    bands: int,
    max_bucket: int | None,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec, band, key) rows, optionally capped per (band, key).

    ``max_bucket`` bounds the worst-case within-bucket pair count
    explicitly (hot-bucket cap, deterministic by id order) — the
    documented recall/cost trade for pathological distributions where a
    bucket degenerates toward N.
    """
    sig = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.explode(band_keys(F.col(vec_col), d, bands)).alias("_bk"),
    ).select("_id", "_vec", F.col("_bk.band").alias("band"), F.col("_bk.key").alias("key"))
    if max_bucket is not None:
        w = Window.partitionBy("band", "key").orderBy("_id")
        sig = (
            sig.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket)
            .drop("_rn")
        )
    return sig


def banded_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    d: int = 16,
    bands: int = 2,
    max_bucket: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with banded sign-LSH candidates (multi-probe via
    OR across bands): per-band equi-joins replace both the all-pairs
    cross join AND the d=3 coarse buckets.  Candidate pairs are deduped
    across bands before the exact cosine so each pair is scored once."""
    q = _banded_sig(queries, d, bands, None, id_col, vec_col).withColumnsRenamed(
        {"_id": "query_id", "_vec": "q_vec"}
    )
    c = _banded_sig(embeddings, d, bands, max_bucket, id_col, vec_col).withColumnsRenamed(
        {"_id": "neighbor_id", "_vec": "c_vec"}
    )
    cand = (
        c.join(F.broadcast(q), ["band", "key"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cos_sim",
        F.round(
            cosine_expr(
                F.col("q_vec").cast("array<double>"), F.col("c_vec").cast("array<double>")
            ),
            3,
        ),
    ).select("query_id", "neighbor_id", "cos_sim")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def embedding_near_dup_pairs_banded(
    embeddings: DataFrame,
    d: int = 16,
    bands: int = 2,
    threshold_milli: int = 400,
    max_bucket: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs with banded sign-LSH candidate generation — the
    at-scale replacement for the d=3 bucket self-join (8 buckets →
    (N/8)^2 pair work; here each band has 2^(d/bands) buckets and pairs
    are deduped across bands before exact-cosine verification)."""
    a = _banded_sig(embeddings, d, bands, max_bucket, id_col, vec_col).withColumnsRenamed(
        {"_id": "vec1", "_vec": "a_vec"}
    )
    b = _banded_sig(embeddings, d, bands, max_bucket, id_col, vec_col).withColumnsRenamed(
        {"_id": "vec2", "_vec": "b_vec"}
    )
    pairs = (
        a.join(b, ["band", "key"])
        .where(F.col("vec1") < F.col("vec2"))
        .dropDuplicates(["vec1", "vec2"])
    )
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


def kmeans_centroids(
    embeddings: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
) -> DataFrame:
    """Lloyd (spherical) k-means coarse quantizer for IVF.

    The scale shape keeps the corpus distributed and only the O(n_cells)
    centroid table ever moves: each iteration is one broadcast argmax
    join (assignment) + one (cell, dim) hash aggregate (new means),
    after which the tiny centroid table is collected and re-broadcast.
    Deterministic: init = the ``n_cells`` smallest-id corpus vectors,
    cosine ties break toward the lower cell id, and a cell that loses
    all members keeps its previous centroid.  Returns (cell, cent_vec)
    with cells numbered 0..n_cells-1.
    """
    spark = embeddings.sparkSession
    init = (
        embeddings.orderBy(F.col(id_col))
        .limit(n_cells)
        .select(F.col(vec_col).cast("array<double>").alias("cent_vec"))
        .collect()
    )
    cents = [list(r["cent_vec"]) for r in init]
    corpus = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    aw = Window.partitionBy("_id").orderBy(F.desc("_sim"), F.asc("cell"))
    for _ in range(max(0, iters)):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cell int, cent_vec array<double>"
        )
        assigned = (
            corpus.join(F.broadcast(cdf))
            .withColumn("_sim", F.round(cosine_expr(F.col("_v"), F.col("cent_vec")), 6))
            .withColumn("_rk", F.row_number().over(aw))
            .where(F.col("_rk") == 1)
            .select("cell", F.posexplode("_v").alias("pos", "val"))
        )
        means = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_s"))
            .select("cell", F.transform("_s", lambda s: s["m"]).alias("cent_vec"))
            .collect()
        )
        for r in means:  # empty cells keep their previous centroid
            cents[int(r["cell"])] = list(r["cent_vec"])
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cell int, cent_vec array<double>"
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "deterministic",
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into cells,
    probe only the query's nearest cells.

    The default coarse quantizer is deterministic — the ``n_cells``
    corpus vectors with the smallest ids serve as centroids — so the
    DuckDB oracle reproduces the index bit-for-bit.
    ``quantizer="kmeans"`` instead trains Lloyd/spherical centroids
    (:func:`kmeans_centroids`, same deterministic init) — the
    production choice for clustered corpora, where data-adapted cells
    raise probe recall.  Every line below the centroid table is
    identical under both flags, which is the point: IVF's scale shape
    is the two broadcast argmax joins, not the centroid fitting.

      build:  corpus x centroids (broadcast, |C| rows) -> argmax cosine
              -> cell column; this is the inverted list, and on 100 TB
              it is written bucketed by cell so probes partition-prune
      probe:  query x centroids -> top-``nprobe`` cells -> equi-join on
              cell touches ~nprobe/n_cells of the corpus, exact cosine
              + top-k window only within the probed lists

    Complements ``bucketed_ann_topk`` (data-independent sign planes):
    data-dependent cells adapt to clustered corpora where fixed planes
    leave most buckets empty.  Cosine is rounded to 3dp BEFORE every
    argmax/rank (ties by id) so engine and oracle order identically.
    """
    if quantizer == "kmeans":
        cents = kmeans_centroids(embeddings, n_cells, id_col, vec_col)
    elif quantizer == "deterministic":
        cents = (
            embeddings.orderBy(F.col(id_col))
            .limit(n_cells)
            .select(
                F.col(id_col).alias("cell"),
                F.col(vec_col).cast("array<double>").alias("cent_vec"),
            )
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    aw = Window.partitionBy("neighbor_id").orderBy(F.desc("a_sim"), F.asc("cell"))
    assigned = (
        c.join(F.broadcast(cents))
        .withColumn(
            "a_sim",
            F.round(
                cosine_expr(F.col("c_vec").cast("array<double>"), F.col("cent_vec")), 3
            ),
        )
        .withColumn("_rk", F.row_number().over(aw))
        .where(F.col("_rk") == 1)
        .select("neighbor_id", "c_vec", "cell")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    qw = Window.partitionBy("query_id").orderBy(F.desc("p_sim"), F.asc("cell"))
    probes = (
        q.join(F.broadcast(cents))
        .withColumn(
            "p_sim",
            F.round(
                cosine_expr(F.col("q_vec").cast("array<double>"), F.col("cent_vec")), 3
            ),
        )
        .withColumn("_rk", F.row_number().over(qw))
        .where(F.col("_rk") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_expr(
                    F.col("q_vec").cast("array<double>"),
                    F.col("c_vec").cast("array<double>"),
                ),
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
