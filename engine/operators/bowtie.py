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


def dag_levels(
    dag_edges: DataFrame,
    max_depth: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Longest-path level of every node of a DAG: (id, level) with level 0
    for sources (no in-edges) and level(v) = 1 + max over predecessors —
    the crawl/ETL scheduling order of a condensation DAG (scc.condensation
    output: every level-k component can be processed once levels < k are
    done). Bellman-Ford-max: d_k(v) = max(d_{k-1}(v), max_{u→v} d_{k-1}(u)+1),
    converged when a round changes nothing (≤ DAG-depth rounds, each one
    src-keyed join + max aggregate — the gather shape again).

    Raises after max_depth rounds without convergence — on a cyclic input
    levels would grow forever, so the bound doubles as a cycle guard.
    """
    spark = dag_edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = dag_edges.select("src", "dst").distinct().repartition(P, "src").persist()
    e.count()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    d = nodes.select("id", F.lit(0).cast("long").alias("level")).repartition(
        P, "id"
    ).localCheckpoint(eager=True)

    for rnd in range(1, max_depth + 1):
        relaxed = (
            e.join(d.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg((F.max("level") + 1).alias("cand"))
        )
        new = (
            d.join(relaxed, "id", "left")
            .select("id", F.greatest("level", F.coalesce("cand", F.lit(0))).alias("level"))
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(d.withColumnRenamed("level", "old"), "id")
            .filter(F.col("level") != F.col("old"))
            .limit(1)
            .count()
        )
        d = new
        if changed == 0:
            e.unpersist()
            return d
    e.unpersist()
    raise RuntimeError(
        f"dag_levels did not converge within max_depth={max_depth} rounds — "
        "input has a cycle or a longer path; condense cycles first "
        "(scc.condensation) or raise max_depth"
    )
