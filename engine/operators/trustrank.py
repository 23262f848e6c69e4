"""TrustRank and link-spam mass estimation over the edge table.

Web-graph spam analysis as thin compositions of the PageRank kernel
(engine/operators/pagerank.py — same gather strategies, checkpointing,
metrics). No reference impl; published semantics:

- **TrustRank** (Gyöngyi, Garcia-Molina, Pedersen, VLDB 2004): damped
  power iteration whose teleport vector is uniform over a hand-vetted
  trusted seed set instead of uniform over all pages — trust flows out
  of the seeds along links and attenuates with distance, so pages only
  reachable through spam-farm neighborhoods accumulate little of it.
  Exactly `pagerank(personalization=seeds)`.

- **Spam mass** (Gyöngyi, Berkhin, Garcia-Molina, Pedersen, VLDB 2006,
  "Link Spam Detection Based on Mass Estimation"): the fraction of a
  page's PageRank that does NOT come from the trusted core,
  m̃(p) = (PR(p) − PR'(p)) / PR(p) with PR' the seed-teleport rank.
  m̃ → 1 flags rank manufactured by spam link structure; pages inside /
  near the trusted core can go ≤ 0 (more trust-flow than uniform rank —
  kept raw, not clipped, per the paper's relative-mass definition).
  Pages unreachable from every seed have PR' exactly 0, hence m̃ = 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.operators.pagerank import PageRankResult, pagerank


def trustrank(edges: DataFrame, seeds: DataFrame, **pagerank_kwargs) -> PageRankResult:
    """TrustRank scores: (id, rank) summing to 1, teleport uniform over
    `seeds` (a DataFrame with an `id` column; duplicates are collapsed).
    All pagerank() knobs (alpha, tol, max_iter, gather strategy, weight_col,
    checkpointing) pass through unchanged.
    """
    pers = seeds.select("id").distinct().select("id", F.lit(1.0).alias("weight"))
    return pagerank(edges, personalization=pers, **pagerank_kwargs)


def spam_mass(edges: DataFrame, seeds: DataFrame, **pagerank_kwargs) -> DataFrame:
    """Relative spam mass per page: (id, rank, trust, spam_mass) where
    rank is uniform-teleport PageRank, trust is TrustRank over `seeds`
    (both normalized to Σ=1 — same total mass, as the published estimator
    requires), and spam_mass = (rank − trust) / rank.

    Two kernel runs over the SAME edge DataFrame — at scale, persist the
    edge table (or pass a bucketed source) so the scan is paid once; the
    final join is per-node (id, double) × (id, double), shuffle-light
    next to the iterations themselves.
    """
    pr = pagerank(edges, **pagerank_kwargs)
    tr = trustrank(edges, seeds, **pagerank_kwargs)
    return (
        pr.ranks.join(tr.ranks.select("id", F.col("rank").alias("trust")), "id")
        .select(
            "id",
            "rank",
            "trust",
            ((F.col("rank") - F.col("trust")) / F.col("rank")).alias("spam_mass"),
        )
    )


def inverse_pagerank_seeds(
    edges: DataFrame,
    k: int = 25,
    nodes: DataFrame | None = None,
    **pagerank_kwargs,
) -> DataFrame:
    """Trusted-seed CANDIDATE selection by inverse PageRank (Gyöngyi et al.
    VLDB 2004 §4.2): rank pages by PageRank over the TRANSPOSED graph —
    pages from which many pages are reachable in few steps score high, so
    vetting them propagates trust widely — and take the top k for human
    review. Returns (id, rank) with rank the inverse-PageRank score,
    deterministically tie-broken (rank desc, id asc; planned as
    TakeOrderedAndProject — per-partition partial top-k, no full sort).
    """
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    res = pagerank(rev, nodes=nodes, **pagerank_kwargs)
    return res.ranks.orderBy(F.desc("rank"), F.asc("id")).limit(k)
