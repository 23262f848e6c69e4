"""Sorted-adjacency triangle counting with degree-based edge orientation.

No reference implementation (SURVEY §7 Phase 3). Standard published scheme:
collapse to the undirected simple graph, orient every edge from the
lower-(degree, id) endpoint to the higher one — which bounds every oriented
adjacency list by O(sqrt(m)) regardless of hub skew (the scale-critical
property; orienting by id alone would leave hub lists huge) — then for each
oriented edge (a,b) count |N+(a) ∩ N+(b)| over sorted adjacency arrays.
Each triangle is counted exactly once. Oracle: tests/oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    """Undirected simple graph oriented by (degree, id): (a -> b) with
    rank(a) < rank(b). Returns columns (a, b)."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    sym = und.select(F.col("u").alias("x"), F.col("v").alias("y")).union(
        und.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    deg = sym.groupBy("x").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("x").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("deg").alias("dv"))
    j = und.join(du, "u").join(dv, "v")
    # a = endpoint with smaller (deg, id)
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return j.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )


def triangle_rows(edges: DataFrame) -> DataFrame:
    """One row (a, b, c) per triangle (each exactly once): for every oriented
    edge (a,b), explode the sorted-adjacency intersection N+(a) ∩ N+(b)."""
    o = _oriented(edges)
    adj = o.groupBy("a").agg(F.sort_array(F.collect_list("b")).alias("nbrs"))
    adj_a = adj.select(F.col("a"), F.col("nbrs").alias("na"))
    adj_b = adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nb"))
    return (
        o.join(adj_a, "a")
        .join(adj_b, "b")
        .select("a", "b", F.explode(F.array_intersect("na", "nb")).alias("c"))
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Single-row DataFrame (triangles BIGINT): total triangle count."""
    o = _oriented(edges)
    adj = o.groupBy("a").agg(F.sort_array(F.collect_list("b")).alias("nbrs"))
    adj_a = adj.select(F.col("a"), F.col("nbrs").alias("na"))
    adj_b = adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nb"))
    per_edge = (
        o.join(adj_a, "a")
        .join(adj_b, "b")
        .select(F.size(F.array_intersect("na", "nb")).alias("t"))
    )
    return per_edge.agg(F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("triangles"))


def triangles_per_vertex(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """(id, triangles): number of triangles each vertex participates in."""
    rows = triangle_rows(edges)
    members = (
        rows.select(F.col("a").alias("id"))
        .union(rows.select(F.col("b").alias("id")))
        .union(rows.select(F.col("c").alias("id")))
    )
    counts = members.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    if nodes is not None:
        counts = nodes.select("id").join(counts, "id", "left").select(
            "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
        )
    return counts
