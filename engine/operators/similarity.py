"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (no reference impl). Two paths:

- `cosine_topk`: exact brute-force k-NN — all-pairs cosine via higher-order
  array functions (zip_with dot product, aggregate norms), top-k per query
  with a window. Correct baseline; O(n²) pairs — at 100 TB this is the
  per-block kernel of a block-matrix sweep, not a global strategy.
- `lsh_ann_topk`: random-hyperplane LSH — deterministic pseudo-random planes
  derived from xxhash64(seed, plane, dim) so results are reproducible without
  any RNG state; candidates share a bucket (multi-probe over `tables`
  independent banded sign-prefixes), exact cosine re-rank inside buckets.
  This is the scale path: shuffle keys are (table, bucket), hubs don't exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _norm_col(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))


def _dot_col(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), _norm_col(F.col(vec_col)).alias("norm")
    )


def cosine_pairs(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All ordered pairs (id_a < id_b, cosine). Exact, O(n²)."""
    e = with_norm(embeddings, id_col, vec_col)
    a = e.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("norm").alias("na"))
    b = e.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("norm").alias("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (_dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k nearest neighbors per vector: (query_id, neighbor_id, cosine,
    knn_rank). Window partitioned per query — parallel across queries."""
    e = with_norm(embeddings, id_col, vec_col)
    q = e.select(F.col("id").alias("query_id"), F.col("vec").alias("qv"), F.col("norm").alias("qn"))
    d = e.select(F.col("id").alias("neighbor_id"), F.col("vec").alias("dv"), F.col("norm").alias("dn"))
    scored = (
        q.crossJoin(d)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot_col(F.col("qv"), F.col("dv")) / (F.col("qn") * F.col("dn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("knn_rank", F.row_number().over(w)).filter(F.col("knn_rank") <= k)


def _plane_weight(plane, dim, seed: int):
    """Deterministic pseudo-random hyperplane weight in [-1, 1)."""
    h = F.xxhash64(F.lit(seed), plane, dim)
    return (F.pmod(h, F.lit(2_000_001)).cast("double") / F.lit(1_000_000.0)) - F.lit(1.0)


def hyperplane_buckets(
    embeddings: DataFrame,
    planes_per_table: int = 8,
    tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket): sign-bit bucket of each vector in each of
    `tables` independent hyperplane sets. Pure Catalyst: the projection onto
    plane p is aggregate over (dim, value) pairs with hash-derived weights."""
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    out = None
    for t in range(tables):
        bucket = None
        for p in range(planes_per_table):
            proj = F.aggregate(
                F.zip_with(
                    F.col("vec"),
                    F.sequence(F.lit(0), F.size("vec") - 1),
                    lambda x, i: x.cast("double") * _plane_weight(F.lit(t * 1000 + p), i, seed),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            bit = F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
            bucket = bit if bucket is None else bucket.bitwiseOR(bit)
        piece = e.select("id", F.lit(t).alias("table"), bucket.alias("bucket"))
        out = piece if out is None else out.union(piece)
    return out


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    planes_per_table: int = 8,
    tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN: candidates from shared LSH buckets (any table),
    exact cosine re-rank. Same output shape as cosine_topk."""
    buckets = hyperplane_buckets(embeddings, planes_per_table, tables, seed, id_col, vec_col)
    cand = (
        buckets.select("table", "bucket", F.col("id").alias("query_id"))
        .join(buckets.select("table", "bucket", F.col("id").alias("neighbor_id")), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    e = with_norm(embeddings, id_col, vec_col)
    q = e.select(F.col("id").alias("query_id"), F.col("vec").alias("qv"), F.col("norm").alias("qn"))
    d = e.select(F.col("id").alias("neighbor_id"), F.col("vec").alias("dv"), F.col("norm").alias("dn"))
    scored = (
        cand.join(q, "query_id")
        .join(d, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot_col(F.col("qv"), F.col("dv")) / (F.col("qn") * F.col("dn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("knn_rank", F.row_number().over(w)).filter(F.col("knn_rank") <= k)


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a, id_b, cosine ≥ threshold)."""
    return cosine_pairs(embeddings, id_col, vec_col).filter(F.col("cosine") >= threshold)
