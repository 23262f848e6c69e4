"""k-truss decomposition over the undirected simple graph.

No reference implementation (beyond-reference graph operator, the edge
analogue of kcore.py). A k-truss is the maximal subgraph in which every
edge is supported by at least k−2 triangles (Cohen, "Trusses: cohesive
subgraphs for social network analysis", 2008; distributed peeling per
Cohen's MapReduce formulation / Wang & Cheng VLDB 2012). Peeling loop:

    e_0 = undirected simple edge set
    round r: support(e) = |triangles of e_{r-1} containing e|;
             e_r = {e ∈ e_{r-1} : support(e) ≥ k−2}

to fixpoint (`ktruss`) or exactly R rounds (`ktruss_fixed_rounds`, the
unrolled-SQL-expressible prefix used by the oracle-gated contract query).

Per round the support computation IS the oriented triangle kernel
(triangles.triangle_rows — (degree, id)-oriented sorted-adjacency
intersection, O(sqrt(m))-bounded lists under hub skew), followed by one
explode-to-edge-pairs groupBy. The edge set only shrinks, so the cost is
front-loaded exactly like k-core peeling. Each round materialises via an
eager localCheckpoint (lineage truncation) and releases its adjacency pin
through a `pin_scope` so long-lived sessions don't accumulate cache.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from engine.operators._pins import pin_scope
from engine.operators.triangles import triangle_rows


def _simple_undirected(edges: DataFrame) -> DataFrame:
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )


def _edge_support(e: DataFrame) -> DataFrame:
    """(u, v, s): triangle support per undirected edge of e (edges in no
    triangle are absent — callers coalesce to 0). Each triangle row (a,b,c)
    contributes one support unit to each of its three canonical edges."""
    rows = triangle_rows(e.select(F.col("u").alias("src"), F.col("v").alias("dst")))
    pairs = (
        rows.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .union(rows.select(F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")))
        .union(rows.select(F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")))
    )
    return pairs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("s"))


def _peel_round(e: DataFrame, k: int, P: int) -> DataFrame:
    """One support + filter round, materialised; adjacency pin released."""
    with pin_scope():
        supp = _edge_support(e)
        kept = (
            e.join(supp, ["u", "v"], "left")
            .filter(F.coalesce(F.col("s"), F.lit(0)) >= F.lit(k - 2))
            .select("u", "v")
            .repartition(P, "u")
            .localCheckpoint(eager=True)  # materialise INSIDE the scope
        )
    return kept


def ktruss(
    edges: DataFrame,
    k: int,
    max_rounds: int = 200,
    metrics: dict | None = None,
) -> DataFrame:
    """(u, v): the k-truss edge set (peeling fixpoint). k >= 2; k=2 keeps
    every simple edge (support >= 0 is vacuous)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    spark = edges.sparkSession
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = _simple_undirected(edges).repartition(P, "u").localCheckpoint(eager=True)
    m_prev = e.count()
    it = []
    for rnd in range(max_rounds):
        if m_prev == 0:
            break
        t0 = time.time()
        e_new = _peel_round(e, k, P)
        m_new = e_new.count()
        it.append(
            {"iter": rnd, "edges": m_new, "wall_sec": round(time.time() - t0, 4)}
        )
        e = e_new
        if m_new == m_prev:
            break
        m_prev = m_new
    if metrics is not None:
        metrics["ktruss_rounds"] = it
    return e


def ktruss_fixed_rounds(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """(u, v): surviving edges after exactly `rounds` peel rounds — the
    deterministic prefix of the fixpoint computation, unrolled-SQL
    expressible for the driver oracle (each round is one support join +
    filter; no convergence check)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    spark = edges.sparkSession
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = _simple_undirected(edges).repartition(P, "u").localCheckpoint(eager=True)
    for _ in range(rounds):
        e = _peel_round(e, k, P)
    return e
