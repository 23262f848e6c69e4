"""Neighbor-overlap link prediction over the undirected simple graph.

No reference counterpart (beyond-reference link-graph op, task-brief
"training-data pipeline" family): given the link graph, score non-adjacent
vertex pairs by how strongly their neighborhoods overlap — the standard
candidate-generation step for crawl frontier ranking, related-page
suggestion, and graph-completion training data. Published measures
(Liben-Nowell & Kleinberg 2003 survey):

- common neighbors  CN(u,v) = |N(u) ∩ N(v)|
- Jaccard           CN / |N(u) ∪ N(v)|
- Adamic-Adar       Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w)   (Adamic & Adar 2003)
- resource alloc.   Σ_{w ∈ N(u)∩N(v)} 1/deg w       (Zhou et al. 2009)
- pref. attachment  deg(u) · deg(v)

Spark shape — wedge enumeration, the same skew surface as triangle
counting: every shared neighbor w emits deg(w)·(deg(w)-1)/2 candidate
pairs, so ONE web-scale hub (a deg-10^6 portal page) would alone emit
5·10^11 wedges. The standard mitigation (the survey's stop-word analogue)
is a degree cap on the *intermediary* role: vertices with undirected
degree > max_wedge_degree are excluded as shared neighbors — they still
receive scores themselves through their other, lower-degree neighbors.
The cap is disclosed, never silent: pass `metrics={}` to get the count of
capped intermediaries and the wedge mass they would have contributed.
This follows the repo-wide rule used by the LSH bucket caps
(engine/operators/dedupe.py).

Cross-engine float policy (same as __spark_entry__ header): the AA/RA
per-wedge terms are rounded to 9 dp, summed as exact DECIMAL(28,9), and
the final scores rounded to 6 dp — bit-identical between Spark and any
ANSI-SQL oracle (a raw double ln()+SUM would drift by libm ulps and
aggregation order). CN/PA are exact integers; Jaccard is one IEEE
division of exact integers (correctly rounded, engine-portable) rounded
to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.operators.pagerank import _estimate_rows
from engine.operators.triangles import BROADCAST_DEGREE_EDGE_LIMIT


def _undirected_simple(edges: DataFrame) -> DataFrame:
    """(u, v) with u < v, loops dropped, deduped."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )


def link_prediction_scores(
    edges: DataFrame,
    *,
    exclude_existing: bool = True,
    max_wedge_degree: int | None = None,
    min_common: int = 1,
    metrics: dict | None = None,
) -> DataFrame:
    """Score vertex pairs by neighborhood overlap.

    Returns (u, v, cn, jaccard, adamic_adar, resource_alloc, pref_attach)
    with u < v, one row per pair sharing >= min_common neighbors
    (after the cap). With exclude_existing=True (default — the link
    *prediction* task), pairs already joined by an edge are dropped.

    max_wedge_degree: exclude vertices with undirected degree above this
    from the shared-neighbor (intermediary) role; None = no cap (safe only
    when the max degree is known bounded). Capped counts go to `metrics`.
    """
    from engine.operators._pins import pin

    # und feeds three consumers (both union branches of sym + the
    # exclude_existing anti-join) and deg feeds three (the intermediary
    # filter + both endpoint degree attaches) — pin both or Spark re-runs
    # the full distinct / degree aggregation once per branch (the
    # triangles._adjacency pattern; release via pin_scope in long sessions)
    und = pin(_undirected_simple(edges))
    sym = und.select(F.col("u").alias("x"), F.col("v").alias("y")).union(
        und.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    deg = pin(sym.groupBy("x").agg(F.count(F.lit(1)).alias("deg")))

    # Intermediary table: (w, nbr, deg_w) — the wedge pivot side.
    mid = deg
    if max_wedge_degree is not None:
        if metrics is not None:
            capped = deg.filter(F.col("deg") > max_wedge_degree).agg(
                F.count(F.lit(1)).alias("capped"),
                F.coalesce(
                    F.sum(F.col("deg") * (F.col("deg") - 1) / F.lit(2)), F.lit(0.0)
                ).cast("long").alias("wedges_dropped"),
            ).collect()[0]
            metrics["linkpred_intermediaries_capped"] = int(capped["capped"])
            metrics["linkpred_wedges_dropped"] = int(capped["wedges_dropped"])
        mid = deg.filter(F.col("deg") <= max_wedge_degree)

    est = _estimate_rows(edges, bytes_per_row=16)
    if 0 < est <= BROADCAST_DEGREE_EDGE_LIMIT:
        deg_b = F.broadcast(deg)
        mid_b = F.broadcast(mid)
    else:
        deg_b, mid_b = deg, mid

    # Wedges through each eligible intermediary w: for each unordered pair
    # (u, v) of w's neighbors (u < v), one row carrying w's degree. The
    # per-wedge AA/RA terms are rounded to 9 dp here so the exact decimal
    # sum below is engine-portable.
    # adj is pinned: it feeds both sides of the wedge self-join, which would
    # otherwise each re-run the sym⋈degree join. (The two sides still
    # shuffle separately for the sort-merge join — column pruning
    # specializes their projections, so Spark cannot plan a ReusedExchange
    # here; the cache bounds the recompute to a columnar scan.)
    adj = pin(
        sym.join(mid_b.select(F.col("x"), F.col("deg").alias("deg_w")), "x").select(
            F.col("x").alias("w"), F.col("y").alias("nbr"), "deg_w"
        )
    )
    a1 = adj.select(F.col("w"), F.col("nbr").alias("u"), "deg_w")
    a2 = adj.select(F.col("w"), F.col("nbr").alias("v"))
    wedges = a1.join(a2, "w").filter(F.col("u") < F.col("v")).select(
        "u",
        "v",
        F.when(F.col("deg_w") > 1, F.round(F.lit(1.0) / F.log(F.col("deg_w")), 9))
        .otherwise(F.lit(0.0))
        .cast("decimal(28,9)")
        .alias("aa_term"),
        F.round(F.lit(1.0) / F.col("deg_w"), 9).cast("decimal(28,9)").alias("ra_term"),
    )

    pairs = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum("aa_term").cast("double").alias("aa_raw"),
        F.sum("ra_term").cast("double").alias("ra_raw"),
    )
    if min_common > 1:
        pairs = pairs.filter(F.col("cn") >= min_common)
    if exclude_existing:
        pairs = pairs.join(und, ["u", "v"], "left_anti")

    du = deg_b.select(F.col("x").alias("u"), F.col("deg").alias("du"))
    dv = deg_b.select(F.col("x").alias("v"), F.col("deg").alias("dv"))
    return (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            F.round(
                F.col("cn") / (F.col("du") + F.col("dv") - F.col("cn")), 6
            ).alias("jaccard"),
            F.round(F.col("aa_raw"), 6).alias("adamic_adar"),
            F.round(F.col("ra_raw"), 6).alias("resource_alloc"),
            (F.col("du") * F.col("dv")).cast("long").alias("pref_attach"),
        )
    )


def link_prediction_topk(
    edges: DataFrame,
    k: int = 100,
    *,
    by: str = "adamic_adar",
    **kwargs,
) -> DataFrame:
    """Top-k predicted links by one measure (ties broken by (u, v) for a
    deterministic, engine-portable cut). TakeOrderedAndProject — no global
    sort materialization."""
    scores = link_prediction_scores(edges, **kwargs)
    return scores.orderBy(F.col(by).desc(), "u", "v").limit(k)


def link_prediction_auc(
    edges: DataFrame,
    *,
    by: str = "adamic_adar",
    test_frac: float = 0.2,
    salt: str = "lp-eval",
    max_wedge_degree: int | None = None,
    min_common: int = 1,
    metrics: dict | None = None,
) -> DataFrame:
    """Hash-held-out evaluation of one overlap measure: split the
    undirected simple edge set by portable md5 (the sampling.hash_u
    family — assignment depends only on the pair, never on partitioning
    or cluster size), score the TRAIN graph's non-adjacent candidate
    pairs, and report the tie-aware Mann-Whitney AUC of `by` at
    retrieving the held-out TEST pairs — the standard link-prediction
    benchmark protocol (Liben-Nowell & Kleinberg 2003 §4).

    Candidate-restricted by construction: only pairs at train-distance 2
    (cn ≥ min_common after the wedge cap) are rankable, so test pairs
    outside that set are disclosed, not silently scored — the returned
    row carries n_test (all held-out pairs) next to n_pos (held-out
    pairs that are candidates); their gap is the coverage loss.

    Scale shape: the ranking uses tfidf.rank_index_distributed (two-phase
    range-partitioned rank — no single-partition window), and every AUC
    input is an exact dyadic rational (integer ranks, half-integer tie
    averages, counts), so the one final division is engine-portable with
    no float-sum order sensitivity.

    Returns ONE row: (n_candidates, n_test, n_pos, auc DOUBLE 6 dp);
    auc is NULL when the candidate set is all-positive or all-negative
    (the statistic is undefined there)."""
    from engine.operators.sampling import hash_u
    from engine.operators.tfidf import rank_index_distributed

    und = _undirected_simple(edges).withColumn(
        "_u01", hash_u(F.concat_ws(":", F.col("u"), F.col("v")), salt)
    )
    test = und.filter(F.col("_u01") < test_frac).select("u", "v")
    train = und.filter(F.col("_u01") >= test_frac).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    scores = link_prediction_scores(
        train,
        exclude_existing=True,
        max_wedge_degree=max_wedge_degree,
        min_common=min_common,
        metrics=metrics,
    ).select("u", "v", F.col(by).alias("_s"))
    labeled = scores.join(test.withColumn("_l", F.lit(1)), ["u", "v"], "left").select(
        F.concat_ws(":", "u", "v").alias("_k"),
        "_s",
        F.coalesce("_l", F.lit(0)).alias("_l"),
    )
    ranked = rank_index_distributed(labeled, score_col="_s", key_col="_k")
    # average DESC rank per score class handles ties; ascending rank is
    # M+1−r_desc, so R⁺ = P(M+1) − Σ np·ar_desc and
    # AUC = (R⁺ − P(P+1)/2) / (P·(M−P))
    per_score = ranked.groupBy("_s").agg(
        F.avg("rank").alias("_ar"),
        F.sum("_l").alias("_np"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    tot = per_score.agg(
        F.sum("_cnt").cast("long").alias("n_candidates"),
        F.sum("_np").cast("long").alias("n_pos"),
        F.sum(F.col("_np") * F.col("_ar")).alias("_sd"),
    )
    n_test = test.agg(F.count(F.lit(1)).cast("long").alias("n_test"))
    p = F.col("n_pos").cast("double")
    m = F.col("n_candidates").cast("double")
    # try_divide: the statistic is undefined (NULL) for an all-positive
    # or all-negative candidate set — ANSI mode would throw instead
    auc = F.try_divide(
        p * (m + 1) - F.col("_sd") - p * (p + 1) / 2, p * (m - p)
    )
    return tot.crossJoin(n_test).select(
        "n_candidates", "n_test", "n_pos", F.round(auc, 6).alias("auc")
    )
