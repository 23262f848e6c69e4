"""Ranking-agreement diagnostics between two per-node score columns.

No reference counterpart (beyond-reference evaluation op): the standard
questions after computing two centralities — "does out-degree predict
PageRank here?", "how far is the Monte-Carlo estimate from the exact
ranks?" — are answered by rank correlation, not value comparison
(centrality scales differ; ranks don't). Ships the two canonical
measures:

- Spearman's ρ with tie handling: Pearson correlation of AVERAGE ranks
  (the textbook tie-aware form). Ranks come from the two-phase
  distributed global rank (tfidf.rank_index_distributed — no
  single-partition window), tie groups averaged per score value, so
  every rank input is an exact dyadic rational; the correlation itself
  is the only float reduction and rounds to 6 dp.
- top-k Jaccard overlap: |topA ∩ topB| / |topA ∪ topB| with the
  deterministic (score desc, id asc) cut — the "do the two measures
  agree on the head?" check that ρ (dominated by the tail) can mask.

Cross-engine note: callers should pass scores ALREADY quantized (e.g.
round(rank, 6)) — ranking raw doubles would let 1-ulp cross-engine
differences permute near-ties and wobble ρ; quantized ties collapse into
identical average ranks instead (the repo-wide round-6 policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def rank_agreement(
    a: DataFrame,
    b: DataFrame,
    key: str = "id",
    val_a: str = "rank",
    val_b: str = "deg",
    top_k: int = 100,
) -> DataFrame:
    """ONE row: (n BIGINT, spearman DOUBLE 6dp, topk_jaccard DOUBLE 6dp)
    over the inner join of `a` and `b` on `key` (nodes scored by both)."""
    from engine.operators.tfidf import rank_index_distributed

    joined = a.select(key, val_a).join(b.select(key, val_b), key)

    def avg_ranks(col: str, out: str) -> DataFrame:
        # alias the score first: rank_index_distributed emits its ordinal
        # as a column literally named "rank", which would SHADOW a score
        # column of that name and silently break the tie grouping
        scored = joined.select(F.col(key), F.col(col).alias("_v"))
        ranked = rank_index_distributed(scored, score_col="_v", key_col=key)
        # average rank per tied score value: exact half-integers
        return ranked.withColumn(
            out, F.avg("rank").over(Window.partitionBy("_v"))
        ).select(key, out)

    ra = avg_ranks(val_a, "_ra")
    rb = avg_ranks(val_b, "_rb")
    both = ra.join(rb, key)
    stats = both.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.corr("_ra", "_rb"), 6).alias("spearman"),
    )

    top_a = (
        joined.orderBy(F.col(val_a).desc(), F.col(key).asc())
        .limit(top_k)
        .select(key)
    )
    top_b = (
        joined.orderBy(F.col(val_b).desc(), F.col(key).asc())
        .limit(top_k)
        .select(key)
    )
    inter = top_a.join(top_b, key).count()
    union = top_a.unionAll(top_b).distinct().count()
    return stats.select(
        "n",
        "spearman",
        F.round(F.lit(inter) / F.lit(union), 6).alias("topk_jaccard"),
    )


def score_gini(
    scores: DataFrame,
    key: str = "id",
    val: str = "rank",
) -> DataFrame:
    """Gini coefficient of a non-negative score distribution — the
    classic "how concentrated is PageRank mass" web measurement (rank
    inequality over the crawl). Sorted-order formula

        G = (2·Σ i·x_(i)) / (n·Σ x) − (n + 1)/n

    with i the ASCENDING rank from the two-phase distributed global rank.
    Tied values make the Σ invariant to tie order (x constant within a
    tie block), so the deterministic key tie-break costs nothing.
    Float policy: callers pass quantized scores (the round-6 rule);
    products i·x sum as exact DECIMAL(38,9); the two final divisions are
    the only float ops. ONE row: (n BIGINT, total DOUBLE, gini DOUBLE 6dp).
    """
    from engine.operators.tfidf import rank_index_distributed

    scored = scores.select(F.col(key), F.col(val).alias("_v"))
    ranked = rank_index_distributed(scored, score_col="_v", key_col=key)
    # rank_index_distributed ranks DESC; ascending i = n + 1 - rank_desc,
    # folded into the aggregate so no second pass is paid
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("_v").cast("decimal(28,9)")).alias("_sx"),
        F.sum(
            F.col("_v").cast("decimal(28,9)") * F.col("rank").cast("decimal(28,0)")
        ).alias("_sdx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    # Σ i·x with ascending i: (n+1)·Σx − Σ rank_desc·x
    six = (n + 1) * sx - F.col("_sdx").cast("double")
    return agg.select(
        "n",
        F.round(sx, 6).alias("total"),
        F.round(F.lit(2.0) * six / (n * sx) - (n + 1) / n, 6).alias("gini"),
    )
