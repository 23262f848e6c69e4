"""Bow-tie macro-structure classification of the directed web graph.

The signature empirical result of web-graph analysis (Broder, Kumar,
Maghoul, Raghavan, Rajagopalan, Stata, Tomkins, Wiener — "Graph structure
in the Web", WWW 2000): relative to the giant strongly connected core,
every page falls into one of five regions:

    CORE          the largest SCC
    IN            reaches the core but is not in it
    OUT           reachable from the core but not in it
    TENDRIL       weakly connected to the core without reaching / being
                  reached by it (Broder's tendrils + tubes, merged: a tube
                  is an IN→OUT path bypassing the core, still in this set)
    DISCONNECTED  no undirected path to the core at all

Pure composition of kernels this engine already gates: SCC labels
(scc.py — trim + FB coloring), forward/backward frontier reachability
(bfs.py — the anti-join frontier, run once on the edge table and once on
its transpose), and weak connectivity (components.py large-star/
small-star). The only driver-sized object is the 1-row core-label pick
(largest SCC, min-label tie-break). Everything else is per-node joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.operators.bfs import bfs_levels
from engine.operators.components import connected_components
from engine.operators.scc import strongly_connected_components


def bowtie_classification(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_depth: int = 50,
    **scc_kwargs,
) -> DataFrame:
    """Returns (id BIGINT, region STRING) over src ∪ dst (∪ nodes).

    region ∈ {CORE, IN, OUT, TENDRIL, DISCONNECTED} per Broder et al.;
    the core is the largest SCC with ties broken by minimum component
    label, so the classification is deterministic. max_depth bounds the
    two reachability sweeps (a frontier BFS round per hop — web distances
    from the core are short; raise it for pathological chains).
    """
    e = edges.select("src", "dst")
    scc = strongly_connected_components(e, nodes=nodes, **scc_kwargs)

    core_row = (
        scc.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("label"))
        .limit(1)
        .collect()[0]
    )
    core_label = core_row["label"]

    core = scc.filter(F.col("label") == core_label).select("id")
    fwd = bfs_levels(e, core, max_depth=max_depth).select("id")
    bwd = bfs_levels(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        core,
        max_depth=max_depth,
    ).select("id")
    weak = connected_components(e, nodes=nodes)
    weak_core_label = (
        weak.join(core.limit(1), "id").select("label").collect()[0]["label"]
    )

    return (
        scc.select("id")
        .join(core.withColumn("_core", F.lit(True)), "id", "left")
        .join(fwd.withColumn("_fwd", F.lit(True)), "id", "left")
        .join(bwd.withColumn("_bwd", F.lit(True)), "id", "left")
        .join(
            weak.filter(F.col("label") == weak_core_label)
            .select("id")
            .withColumn("_weak", F.lit(True)),
            "id",
            "left",
        )
        .select(
            "id",
            F.when(F.col("_core"), F.lit("CORE"))
            .when(F.col("_bwd"), F.lit("IN"))
            .when(F.col("_fwd"), F.lit("OUT"))
            .when(F.col("_weak"), F.lit("TENDRIL"))
            .otherwise(F.lit("DISCONNECTED"))
            .alias("region"),
        )
    )
