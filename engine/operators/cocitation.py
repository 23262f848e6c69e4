"""Co-citation and bibliographic coupling over the directed link graph.

The two classic directed link-similarity measures (Small 1973; Kessler
1963 — the inputs HITS was built on, and the web's related-page primitives
per Dean & Henzinger 1999):

- co-citation        cocite(a, b)   = |{w : w→a AND w→b}|   (shared citers)
- bib. coupling      coupling(a, b) = |{w : a→w AND b→w}|   (shared out-links)

plus the cosine-normalized variant (Salton): count / sqrt(deg(a)·deg(b)),
where deg is in-degree for co-citation and out-degree for coupling.

No reference counterpart (beyond-reference link-graph op). The undirected
neighbor-overlap family lives in linkpred.py; these are the DIRECTED
role-split measures — a citer-side wedge and a cited-side wedge are
different signals on the web graph (a directory page co-citing two sites
vs two sites both linking the same utility page).

Spark shape — the same wedge-enumeration skew surface as linkpred: each
pivot vertex w emits fan(w)·(fan(w)-1)/2 pairs, so one deg-10^6 hub alone
would emit 5·10^11 rows. Mitigation is the same disclosed cap
(`max_fanout`): pivots whose fan exceeds it are excluded from the pivot
role (they still appear as endpoints through other pivots), and
`metrics={}` receives the capped-pivot count and dropped wedge mass —
the repo-wide "no silent caps" rule (see linkpred.py / dedupe.py).

Float policy: counts are exact longs; cosine is one IEEE division of
exact integers (correctly rounded) rounded to 6 dp — engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.operators._pins import pin
from engine.operators.pagerank import _estimate_rows
from engine.operators.triangles import BROADCAST_DEGREE_EDGE_LIMIT


def _pair_overlap(
    edges: DataFrame,
    pivot: str,
    endpoint: str,
    out_name: str,
    max_fanout: int | None,
    min_count: int,
    metrics: dict | None,
    metric_prefix: str,
) -> DataFrame:
    """Shared kernel: (a, b, <out_name>, cosine) with a < b, counting the
    distinct pivots adjacent to both endpoints. pivot/endpoint name the
    edge columns playing each role ("src"/"dst" for co-citation,
    "dst"/"src" for coupling)."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.col(pivot).alias("w"), F.col(endpoint).alias("x"))
        .distinct()
    )
    # fan feeds the cap filter AND both endpoint-degree attaches below;
    # e feeds both wedge sides — pin both (release via pin_scope)
    e = pin(e)
    fan = pin(e.groupBy("w").agg(F.count(F.lit(1)).alias("fan")))

    piv = fan
    if max_fanout is not None:
        if metrics is not None:
            capped = (
                fan.filter(F.col("fan") > max_fanout)
                .agg(
                    F.count(F.lit(1)).alias("capped"),
                    F.coalesce(
                        F.sum(F.col("fan") * (F.col("fan") - 1) / F.lit(2)),
                        F.lit(0.0),
                    )
                    .cast("long")
                    .alias("dropped"),
                )
                .collect()[0]
            )
            metrics[f"{metric_prefix}_pivots_capped"] = int(capped["capped"])
            metrics[f"{metric_prefix}_wedges_dropped"] = int(capped["dropped"])
        piv = fan.filter(F.col("fan") <= max_fanout)

    est = _estimate_rows(edges, bytes_per_row=16)
    small = 0 < est <= BROADCAST_DEGREE_EDGE_LIMIT

    adj = e.join(
        F.broadcast(piv.select("w")) if small else piv.select("w"), "w"
    )
    l = adj.select("w", F.col("x").alias("a"))
    r = adj.select("w", F.col("x").alias("b"))
    pairs = (
        l.join(r, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias(out_name))
    )
    if min_count > 1:
        pairs = pairs.filter(F.col(out_name) >= min_count)

    # endpoint degree = DISTINCT pivot-side degree over the full (uncapped)
    # simple graph, so the cosine denominator is the published quantity
    # even when the pivot role is capped
    deg = e.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    edeg = F.broadcast(deg) if small else deg
    da = edeg.select(F.col("x").alias("a"), F.col("d").alias("da"))
    db = edeg.select(F.col("x").alias("b"), F.col("d").alias("db"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            out_name,
            F.round(
                F.col(out_name) / F.sqrt(F.col("da") * F.col("db")), 6
            ).alias("cosine"),
        )
    )


def cocitation(
    edges: DataFrame,
    *,
    max_fanout: int | None = None,
    min_count: int = 1,
    metrics: dict | None = None,
) -> DataFrame:
    """(a, b, cocite, cosine) with a < b: number of distinct sources
    linking to BOTH a and b, plus Salton cosine over in-degrees.

    max_fanout caps the SOURCE (citer) role: pages whose distinct
    out-degree exceeds it do not pivot wedges (disclosed via metrics)."""
    return _pair_overlap(
        edges, "src", "dst", "cocite", max_fanout, min_count, metrics, "cocite"
    )


def bibliographic_coupling(
    edges: DataFrame,
    *,
    max_fanout: int | None = None,
    min_count: int = 1,
    metrics: dict | None = None,
) -> DataFrame:
    """(a, b, coupling, cosine) with a < b: number of distinct targets
    linked by BOTH a and b, plus Salton cosine over out-degrees.

    max_fanout caps the TARGET (cited) role: pages whose distinct
    in-degree exceeds it do not pivot wedges (disclosed via metrics)."""
    return _pair_overlap(
        edges, "dst", "src", "coupling", max_fanout, min_count, metrics, "coupling"
    )
