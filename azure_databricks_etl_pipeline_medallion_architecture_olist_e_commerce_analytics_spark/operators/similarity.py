"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, and an IVF-bucketed variant
as the scale path — both pure DataFrame ops (``zip_with``/``aggregate`` fold
for the dot product stays JVM-side; no Python in the row path).

Scale design (100 TB / billions of vectors):
- Brute force is O(n·m) pairs: usable when one side is small (a query batch)
  and the other side is broadcast-partitioned; never self-join a full corpus.
- IVF: k-means-style coarse quantizer (here: deterministic first-C centroids
  for reproducibility) → assign each vector to nearest centroid map-side
  (broadcast centroids) → queries probe only ``nprobe`` buckets → candidate
  set shrinks by ~C/nprobe. The bucket join is an equi-shuffle on
  ``centroid_id``, not a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a, b):
    """Σ aᵢ·bᵢ as a left-fold (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    query_filter=None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``query_filter`` bounds the query side (e.g. ``F.col('vec_id') < 100``) —
    the corpus side stays full. Sim is rounded to 6dp before ranking so the
    id tie-break is deterministic across engines.
    """
    # Norms are per-vector, not per-pair: compute them once on each side so
    # the O(n·m) join evaluates one fold (the dot product) per pair, not three.
    corpus = df.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        norm_col(F.col(vec_col)).alias("nbr_norm"),
    )
    queries = df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm_col(F.col(vec_col)).alias("query_norm"),
    )
    if query_filter is not None:
        queries = queries.filter(query_filter)
    sim = F.round(
        dot_col(F.col("query_vec"), F.col("nbr_vec"))
        / (F.col("query_norm") * F.col("nbr_norm")),
        6,
    )
    pairs = (
        queries.join(corpus, F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def ivf_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
) -> DataFrame:
    """Assign each vector to its nearest coarse centroid (broadcast join).

    Centroids are the first ``n_centroids`` vectors by id — deterministic and
    cheap; swap in k-means centroids for production recall without changing
    the plan shape.
    """
    centroids = (
        df.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )
    sim = cosine_col(F.col(vec_col), F.col("centroid_vec"))
    w = Window.partitionBy(id_col).orderBy(F.col("_csim").desc(), F.col("centroid_id"))
    return (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("_csim", sim)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "centroid_vec", "_csim")
    )


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int = 16,
    query_filter=None,
) -> DataFrame:
    """Approximate top-k: probe only the query's own IVF bucket.

    Recall < 1 by design (single-probe); the candidate join is an equi-join
    on ``centroid_id`` — the 100 TB-safe shape. Increase ``nprobe`` by
    unioning neighboring buckets for higher recall at linear extra cost.
    """
    assigned = ivf_assign(df, id_col, vec_col, n_centroids)
    corpus = assigned.select(
        F.col("centroid_id"),
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        norm_col(F.col(vec_col)).alias("nbr_norm"),
    )
    queries = assigned.select(
        F.col("centroid_id"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm_col(F.col(vec_col)).alias("query_norm"),
    )
    if query_filter is not None:
        queries = queries.filter(query_filter)
    sim = F.round(
        dot_col(F.col("query_vec"), F.col("nbr_vec"))
        / (F.col("query_norm") * F.col("nbr_norm")),
        6,
    )
    pairs = (
        queries.join(corpus, on="centroid_id")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    query_filter=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, bounded input).

    The scale path reuses :func:`ivf_assign`: near-dups almost always share a
    bucket, so dedup becomes per-bucket pair generation.
    """
    t = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm_col(F.col(vec_col)).alias("n"),
    )
    if query_filter is not None:
        t = t.filter(query_filter)
    a, b = t.alias("a"), t.alias("b")
    sim = F.round(
        dot_col(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
