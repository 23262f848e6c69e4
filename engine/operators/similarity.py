"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (no reference impl). Three paths:

- Exact pairwise (`cosine_pairs`, `cosine_topk`): O(n²) compute, but
  distributed as a *block-grid sweep* (Okcan & Riedewald's 1-Bucket-Theta
  pattern): vectors get a deterministic block id, the tiny B×B block-pair
  grid is broadcast into both sides, and the two replicated streams
  equi-join on (block_a, block_b). Every task compares one bounded
  block×block tile — no crossJoin / BroadcastNestedLoopJoin, no skew, and
  memory per task is capped by `rows_per_block` regardless of n.
- `lsh_ann_topk`: random-hyperplane LSH — deterministic pseudo-random planes
  derived from xxhash64(seed, plane, dim) so results are reproducible without
  any RNG state; candidates share a bucket (multi-probe over `tables`
  independent banded sign-prefixes), exact cosine re-rank inside buckets.
  This is the 100 TB top-k path: shuffle keys are (table, bucket), hubs
  don't exist; recall < 1 by construction (documented, tested).
- `embedding_near_duplicates`: exact block-grid sweep below `exact_limit`
  vectors, LSH-candidates + exact-cosine verify above it. The LSH route is
  only sound for genuine near-dup thresholds (cosine ≳ 0.9, where bucket
  collision probability is high); at loose thresholds recall drops and the
  exact sweep is the correct (and unavoidable — the qualifying pairs sit at
  the decision boundary) strategy.
"""

from __future__ import annotations

import math

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


# ------------------------------------------------------------- block grid

# Catalyst-stats row estimate: a parquet embedding row is id (8 B) + a
# float array (4 B/dim + offsets; float vectors barely compress). 128 B/row
# sits in the middle of the 16-64-dim range and errs toward OVER-estimating
# rows (→ more, smaller blocks): tiles never exceed their memory budget,
# at the cost of some extra replication when vectors are wide.
EMBEDDING_BYTES_PER_ROW = 128


def _estimate_vectors(embeddings: DataFrame) -> int:
    """Row estimate from optimizer statistics — runs NO job (a count() on a
    derived 100 TB plan is a full execution just to pick a strategy).
    Returns 0 when stats are unusable (unknown-size sentinel)."""
    from engine.operators.pagerank import _estimate_rows

    return _estimate_rows(embeddings, bytes_per_row=EMBEDDING_BYTES_PER_ROW)


def _num_blocks(embeddings: DataFrame, num_blocks: int | None, rows_per_block: int) -> int:
    if num_blocks is not None:
        return max(1, num_blocks)
    n = _estimate_vectors(embeddings)
    if n <= 0:
        # unknown stats (join-derived plans): assume big enough to need a
        # real grid rather than collapsing to one unbounded tile; callers
        # at scale pass num_blocks (or materialize first) for a tight fit
        n = 64 * rows_per_block
    return max(1, math.ceil(n / rows_per_block))


def _grid(spark, num_blocks: int, ordered: bool) -> DataFrame:
    """B×B block-pair grid, generated JVM-side as explode(sequence(...)) over
    spark.range — near the 2M-vector auto-blocking ceiling B≈2000 means ~4M
    cells, which must never be a driver-side Python list shipped through
    createDataFrame (and a range×range cross join would be a
    BroadcastNestedLoopJoin — also banned in this plan family).
    ordered=True yields all B² cells (every ordered pair appears once);
    ordered=False the upper triangle incl. diagonal (every unordered pair
    appears once)."""
    ids = spark.range(num_blocks).select(F.col("id").cast("int").alias("_ba"))
    lo = F.lit(0) if ordered else F.col("_ba")
    return ids.select(
        "_ba", F.explode(F.sequence(lo, F.lit(num_blocks - 1))).alias("_bb")
    )


def _block_pairs(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    ordered: bool,
    num_blocks: int | None,
    rows_per_block: int,
) -> DataFrame:
    """All vector pairs with cosine, via the block-grid sweep.

    ordered=True  -> every (query_id, neighbor_id), query_id != neighbor_id.
    ordered=False -> every (id_a < id_b) unordered pair, canonical order.
    Shuffle volume is n·B rows per side (replication = grid cells touching a
    block); compute per task is one (n/B)² tile.
    """
    e = with_norm(embeddings, id_col, vec_col)
    # estimate on the RAW input (file-scan stats), not the norm projection
    B = _num_blocks(embeddings, num_blocks, rows_per_block)
    grid = _grid(e.sparkSession, B, ordered)
    blk = F.pmod(F.xxhash64("id"), F.lit(B)).cast("int")
    a = e.select(
        F.col("id").alias("_ia"), F.col("vec").alias("_va"), F.col("norm").alias("_na"),
        blk.alias("_ba"),
    ).join(F.broadcast(grid), "_ba")
    b = e.select(
        F.col("id").alias("_ib"), F.col("vec").alias("_vb"), F.col("norm").alias("_nb"),
        blk.alias("_bb"),
    ).join(F.broadcast(grid), "_bb")
    joined = a.join(b, ["_ba", "_bb"])
    cos = (_dot_col(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias("cosine")
    if ordered:
        return joined.filter(F.col("_ia") != F.col("_ib")).select(
            F.col("_ia").alias("query_id"), F.col("_ib").alias("neighbor_id"), cos
        )
    # unordered: diagonal tiles keep _ia < _ib; off-diagonal tiles hold each
    # unordered pair exactly once — canonicalize endpoint order
    return (
        joined.filter((F.col("_ba") != F.col("_bb")) | (F.col("_ia") < F.col("_ib")))
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            cos,
        )
    )


def cosine_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int | None = None,
    rows_per_block: int = 1024,
) -> DataFrame:
    """All unordered pairs (id_a < id_b, cosine). Exact; O(n²) compute spread
    over the block grid — no crossJoin."""
    return _block_pairs(embeddings, id_col, vec_col, False, num_blocks, rows_per_block)


def cosine_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int | None = None,
    rows_per_block: int = 1024,
) -> DataFrame:
    """Exact k nearest neighbors per vector: (query_id, neighbor_id, cosine,
    knn_rank). Block-grid sweep for the pair generation; the final top-k
    window is partitioned per query — parallel across queries."""
    scored = _block_pairs(embeddings, id_col, vec_col, True, num_blocks, rows_per_block)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("knn_rank", F.row_number().over(w)).filter(F.col("knn_rank") <= k)


# ------------------------------------------------------------- hyperplane LSH

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

    def table_bucket(t: int):
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
        return bucket

    # one posexplode branch, NOT a union of per-table projections — a union
    # re-scans the source once per table.
    return e.select(
        "id",
        F.posexplode(F.array(*[table_bucket(t) for t in range(tables)])).alias(
            "table", "bucket"
        ),
    )


MAX_BUCKET_SIZE = 10_000  # an LSH bucket with k members emits k² candidate rows


def _lsh_candidates(
    embeddings: DataFrame,
    planes_per_table: int,
    tables: int,
    seed: int,
    id_col: str,
    vec_col: str,
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
    metrics: dict | None = None,
) -> DataFrame:
    """Distinct (query_id, neighbor_id) sharing any LSH bucket.

    Hot-bucket guard (same k²-blowup class as the dedupe LSH bands —
    dedupe._cap_hot_buckets): (table, bucket) buckets above `max_bucket_size`
    are dropped from the self-join. Vectors with an IDENTICAL full bucket
    signature across all tables (exact/near-exact duplicate embeddings — the
    case that makes buckets hot) are re-connected via a min-rep star in both
    directions, O(k) rows per group, so every member keeps its cosine-1
    rep as a candidate. Only cross-signature pairs whose sole collision is a
    hot bucket are sacrificed (bounded extra recall loss on an already
    recall<1 method; `metrics={}` reports drop counts)."""
    from engine.operators.dedupe import _cap_hot_buckets, _pin

    # pinned: the bucket table (planes_per_table × tables aggregate
    # projections per vector — the expensive part) feeds the size cap, both
    # self-join sides, and the signature star; unpinned, Spark re-runs the
    # projections once per branch.
    buckets = _pin(
        hyperplane_buckets(embeddings, planes_per_table, tables, seed, id_col, vec_col)
    )
    capped = _cap_hot_buckets(buckets, ["table", "bucket"], max_bucket_size, metrics, "hyperplane")
    cand = (
        capped.select("table", "bucket", F.col("id").alias("query_id"))
        .join(capped.select("table", "bucket", F.col("id").alias("neighbor_id")), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    if max_bucket_size is not None:
        sig = buckets.groupBy("id").agg(
            F.sort_array(F.collect_list(F.struct("table", "bucket"))).alias("_sig")
        )
        rep = sig.groupBy("_sig").agg(F.min("id").alias("_rep"))
        members = sig.join(rep, "_sig").filter(F.col("id") != F.col("_rep"))
        star = members.select(
            F.col("_rep").alias("query_id"), F.col("id").alias("neighbor_id")
        ).union(
            members.select(F.col("id").alias("query_id"), F.col("_rep").alias("neighbor_id"))
        )
        cand = cand.union(star)
    return cand.distinct()


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    planes_per_table: int = 8,
    tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
    metrics: dict | None = None,
) -> DataFrame:
    """Approximate k-NN: candidates from shared LSH buckets (any table),
    exact cosine re-rank. Same output shape as cosine_topk."""
    cand = _lsh_candidates(
        embeddings, planes_per_table, tables, seed, id_col, vec_col, max_bucket_size, metrics
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


EXACT_SWEEP_LIMIT = 2_000_000  # ≤ ~4·10¹² pair-compute: the exact O(n²) ceiling


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    num_blocks: int | None = None,
    rows_per_block: int = 1024,
    planes_per_table: int = 8,
    tables: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
    metrics: dict | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a, id_b, cosine ≥ threshold).

    method:
      'exact' — block-grid sweep (cosine_pairs): exact recall, O(n²) compute
                evenly distributed, no crossJoin.
      'lsh'   — hyperplane-bucket candidates + exact cosine verify: the
                10⁸-vector path. Recall < 1: a true pair is found iff it
                collides in some table, p ≈ 1-(1-(1-θ/π)^b)^T — choose
                b/tables for the target threshold (defaults suit ≥0.9).
      'auto'  — exact below EXACT_SWEEP_LIMIT vectors, lsh above; the size
                comes from optimizer statistics (no job), and unknown stats
                fall back to lsh — the scale-safe path.
    """
    if method == "auto":
        # Catalyst-stats estimate, NO job (triangles._oriented pattern);
        # unknown stats → LSH, the scale-safe choice: an unknown-size input
        # must be assumed too big for an O(n²) sweep
        est = _estimate_vectors(embeddings)
        method = "exact" if 0 < est <= EXACT_SWEEP_LIMIT else "lsh"
    if method == "exact":
        pairs = cosine_pairs(embeddings, id_col, vec_col, num_blocks, rows_per_block)
        return pairs.filter(F.col("cosine") >= threshold)
    if method != "lsh":
        raise ValueError(f"unknown method {method!r}")
    cand = _lsh_candidates(
        embeddings, planes_per_table, tables, seed, id_col, vec_col, max_bucket_size, metrics
    )
    e = with_norm(embeddings, id_col, vec_col)
    a = e.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("norm").alias("na"))
    b = e.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("norm").alias("nb"))
    return (
        cand.filter(F.col("query_id") < F.col("neighbor_id"))
        .select(F.col("query_id").alias("id_a"), F.col("neighbor_id").alias("id_b"))
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (_dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def knn_classify(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote label imputation over the embedding table — the
    training-data op behind label propagation to unlabeled web documents
    and leave-one-out label-noise auditing (a vector's own row never votes
    for itself, so the prediction doubles as the LOO cross-validation).

    Built on the exact `cosine_topk` block sweep: each vector takes the
    majority label of its k nearest neighbors (ties → smaller label, the
    repo-wide deterministic tie-break), then the row's own label rides
    along for agreement checks. Returns (vec_id, label, pred_label,
    pred_votes BIGINT, agree BOOLEAN).

    Scale shape: ONE extra broadcast-size join (the label dictionary) and
    two grouped aggregates on top of the top-k sweep — the vote grouping
    keys start with query_id, so both aggregates reuse the top-k window's
    hash partitioning."""
    topk = cosine_topk(embeddings, k=k, id_col=id_col, vec_col=vec_col)
    lab = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("_nl")
    )
    votes = (
        topk.join(lab, "neighbor_id")
        .groupBy("query_id", "_nl")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    best = (
        votes.groupBy("query_id")
        .agg(
            F.max(
                F.struct(F.col("_cnt"), (-F.col("_nl")).cast("long").alias("_neg"))
            ).alias("_top")
        )
        .select(
            "query_id",
            (-F.col("_top._neg")).alias("pred_label"),
            F.col("_top._cnt").cast("long").alias("pred_votes"),
        )
    )
    own = embeddings.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("label")
    )
    return (
        own.join(best, "query_id")
        .select(
            F.col("query_id").alias(id_col),
            F.col("label").cast("long").alias("label"),
            "pred_label",
            "pred_votes",
            (F.col("label").cast("long") == F.col("pred_label")).alias("agree"),
        )
    )
