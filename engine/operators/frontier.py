"""Crawl-frontier ranking: prioritize the unvisited pages a crawler should
fetch next.

The reference crawler expands its frontier FIFO (crawler/core.py:246-283 —
a BFS queue with a page cap). At web scale the frontier is bigger than the
crawl budget, so the engine ranks it: each unvisited page linked from the
crawled set is scored by the rank mass flowing to it from visited pages —
the OPIC/focused-crawling scheduling policy (Cho, Garcia-Molina & Page
1998's PageRank-ordered crawling; Abiteboul et al. 2003 OPIC). With no
rank vector the mass degrades to Σ 1/outdeg over visited in-neighbors
(every crawled page splits one unit over its out-links).

Spark shape: one semi-join to restrict edges to visited sources (no edge
payload duplicated), one broadcast-or-shuffle join to attach the per-source
weight, one map-side-combinable aggregate on dst, one anti-join to drop
already-visited targets. No driver-side loops; the visited set is never
collected.

Float policy (linkpred.py convention): per-edge terms rounded to 9 dp,
summed as exact DECIMAL(28,9), final mass rounded to 6 dp — bit-identical
between Spark and an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def frontier_ranking(
    edges: DataFrame,
    visited: DataFrame,
    ranks: DataFrame | None = None,
) -> DataFrame:
    """(id, n_links BIGINT, mass DOUBLE): every unvisited page reachable in
    one hop from the visited set, with the count of visited in-neighbors
    and the rank mass those neighbors forward to it.

    edges: (src, dst); visited: single-column id set; ranks: optional
    (id, rank) — per-source weight becomes rank/outdeg instead of 1/outdeg.
    Duplicate links and self-loops collapse first (crawl semantics: a link
    either exists or not). Outdeg is the distinct-target out-degree over
    the FULL graph, not just edges into the frontier — the mass a visited
    page forwards is split over everything it links to.
    """
    vis = visited.select(F.col(visited.columns[0]).alias("id")).distinct()
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    if ranks is not None:
        w = outdeg.join(
            ranks.select(F.col("id").alias("src"), "rank"), "src"
        ).select("src", F.round(F.col("rank") / F.col("deg"), 9).alias("w"))
    else:
        w = outdeg.select("src", F.round(F.lit(1.0) / F.col("deg"), 9).alias("w"))

    contrib = (
        e.join(vis.select(F.col("id").alias("src")), "src", "left_semi")
        .join(w, "src")
        .groupBy("dst")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.sum(F.col("w").cast("decimal(28,9)")).cast("double").alias("_m"),
        )
    )
    return (
        contrib.join(vis, contrib.dst == vis.id, "left_anti")
        .select(
            F.col("dst").alias("id"),
            "n_links",
            F.round(F.col("_m"), 6).alias("mass"),
        )
    )


def frontier_topk(
    edges: DataFrame,
    visited: DataFrame,
    k: int = 1000,
    ranks: DataFrame | None = None,
) -> DataFrame:
    """The next crawl batch: top-k frontier pages by forwarded mass
    (ties: n_links desc, then id asc — a total order, so the k-boundary is
    deterministic and engine-portable). TakeOrderedAndProject — no global
    sort materialization."""
    fr = frontier_ranking(edges, visited, ranks)
    return fr.orderBy(F.desc("mass"), F.desc("n_links"), F.asc("id")).limit(k)


def politeness_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    per_host_limit: int = 4,
) -> DataFrame:
    """Per-host rate-limited fetch rounds over a ranked frontier — crawl
    politeness (Heydon & Najork 1999, Mercator §2.2; every production
    crawler's per-host courtesy limit): round r may fetch at most
    ``per_host_limit`` URLs from one host, and higher-priority pages go in
    earlier rounds.

    Input: a frontier with ``host_col`` plus the ranking columns
    (mass, n_links, id — `frontier_ranking` output joined to its host).
    Output: input + (host_rank BIGINT, fetch_round BIGINT) where host_rank
    is the 0-based priority position within the host (mass desc, n_links
    desc, id asc — the frontier_topk total order) and
    fetch_round = host_rank // per_host_limit.

    Spark shape: ONE window partitioned by host — each host's row_number
    is independent, so the sort parallelizes across hosts and no global
    ordering is materialized; skew equals the biggest single host's
    frontier, which is exactly the set the limit exists to throttle.
    """
    from pyspark.sql import Window

    if per_host_limit < 1:
        raise ValueError(f"per_host_limit must be >= 1, got {per_host_limit}")
    w = Window.partitionBy(host_col).orderBy(
        F.desc("mass"), F.desc("n_links"), F.asc("id")
    )
    host_rank = (F.row_number().over(w) - 1).cast("long")
    return frontier.withColumn("host_rank", host_rank).withColumn(
        "fetch_round", F.floor(F.col("host_rank") / per_host_limit).cast("long")
    )
