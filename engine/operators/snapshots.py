"""Crawl snapshot diff — edge churn between two crawls of the same web.

Common-Crawl-style corpora arrive as monthly snapshots; the between-snapshot
link delta (edges added / removed / retained, per-source churn) is the basic
temporal question a link-graph engine answers over them. The reference is a
single-shot crawler (crawler/crawl.py runs once and overwrites
backend/data/edges.txt — there is no temporal axis), so this is a
beyond-reference extension op in the spirit of SURVEY §2's edge-table family.

Scale shape: both snapshots are reduced to DISTINCT (src, dst) sets — a
map-side-combinable aggregate — then combined with ONE co-partitioned
full-outer join on the same (src, dst) key the distincts already hashed by,
so Catalyst reuses the exchange and the whole diff costs one shuffle per
side regardless of snapshot size. No driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(edges_old: DataFrame, edges_new: DataFrame) -> DataFrame:
    """(src, dst, status) over the union of the two snapshots' distinct edge
    sets: 'added' (new only), 'removed' (old only), 'retained' (both).

    Duplicate edges within a snapshot collapse first (the question is about
    the link's existence, not its multiplicity — reference dedupe semantics,
    api/build_corpus.py:82-93)."""
    old = edges_old.select("src", "dst").distinct().withColumn("_in_old", F.lit(1))
    new = edges_new.select("src", "dst").distinct().withColumn("_in_new", F.lit(1))
    j = old.join(new, ["src", "dst"], "full_outer")
    return j.select(
        "src",
        "dst",
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("retained"))
        .alias("status"),
    )


def crawl_churn(edges_old: DataFrame, edges_new: DataFrame) -> DataFrame:
    """Per-source churn profile: (src, added, removed, retained,
    jaccard DOUBLE) where jaccard = retained / (added + removed + retained)
    over the source's out-link sets — 1.0 means the page's out-links are
    unchanged between snapshots, 0.0 means fully rewritten.

    One extra map-side-combinable aggregate over snapshot_diff's output —
    same (src,…) hash family, no new full-table shuffle of edge payloads."""
    d = snapshot_diff(edges_old, edges_new)
    cnt = lambda s: F.sum((F.col("status") == s).cast("long"))
    out = d.groupBy("src").agg(
        cnt("added").alias("added"),
        cnt("removed").alias("removed"),
        cnt("retained").alias("retained"),
    )
    return out.withColumn(
        "jaccard",
        F.round(
            F.col("retained")
            / (F.col("added") + F.col("removed") + F.col("retained")),
            6,
        ),
    )
