"""Deterministic random-walk corpus generation over the link graph.

Walk corpora are the training input of DeepWalk/node2vec-style graph
embeddings; at web scale the generator has to be (a) driver-free — every
step a partitioned join, never a per-walk loop — and (b) reproducible, or
no two runs of the pipeline train on the same corpus. Same trick as
sampling.py: the "random" neighbor choice is a content hash —

    idx(step) = md5(cur || '|' || step || '|' || walk_id || salt)
                 as a uniform integer, mod out-degree(cur)

so a walk depends only on (start, walk_id, salt) and the adjacency, not
on partitioning, retries, or cluster size — and the whole corpus is
recomputable in any SQL engine for auditing (the DuckDB oracle replays
the identical arithmetic).

Mechanics: the deduped adjacency gets a per-src neighbor index
(row_number over dst order — deterministic for a set), walks advance by
joining the frontier on (cur, idx). Walks that reach a dangling vertex
terminate (the emitted walk is shorter — standard DeepWalk behavior).
Each step is one join against the degree table + one join against the
adjacency, both src-keyed — the PageRank gather shape, so the same
partitioning and skew handling applies. State is O(#walks) rows; steps
materialize with lineage truncation like every iterative kernel here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _ckpt(df: DataFrame, P: int, key: str) -> DataFrame:
    return df.repartition(P, key).localCheckpoint(eager=True)


def _hash_idx(cur, step: int, walk_id, salt: str):
    """Uniform integer from md5 — portable across engines (sampling.py)."""
    h = F.md5(
        F.concat_ws(
            "|", cur.cast("string"), F.lit(str(step)), walk_id.cast("string"), F.lit(salt)
        )
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def random_walks(
    edges: DataFrame,
    walk_length: int,
    num_walks: int = 1,
    salt: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate num_walks hash-deterministic walks from EVERY vertex.

    Returns (walk_id BIGINT, step BIGINT, node BIGINT): step 0 is the
    start vertex; a walk that hits a vertex with no out-edges simply has
    no later steps. walk_id = start_node * num_walks + replica, so the
    corpus is stable under any growth of the node set's partitioning.
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    if num_walks < 1:
        raise ValueError("num_walks must be >= 1")
    spark = edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    adj = edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    # deterministic neighbor index: row_number over the dst order within
    # each src (a set has one sorted order — reproducible anywhere)
    w = Window.partitionBy("src").orderBy("dst")
    adj = _ckpt(
        adj.select("src", "dst", (F.row_number().over(w) - 1).cast("long").alias("idx")),
        P,
        "src",
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    replicas = spark.range(num_walks).select(F.col("id").alias("rep"))
    frontier = _ckpt(
        nodes.crossJoin(replicas).select(
            (F.col("id") * num_walks + F.col("rep")).alias("walk_id"),
            F.col("id").alias("cur"),
        ),
        P,
        "cur",
    )
    out = frontier.select("walk_id", F.lit(0).cast("long").alias("step"), F.col("cur").alias("node"))

    for step in range(1, walk_length + 1):
        chosen = (
            frontier.join(deg.withColumnRenamed("src", "cur"), "cur")  # dangling walks drop out
            .select(
                "walk_id",
                "cur",
                F.pmod(_hash_idx(F.col("cur"), step, F.col("walk_id"), salt), F.col("deg")).alias("idx"),
            )
            .join(adj.withColumnRenamed("src", "cur"), ["cur", "idx"])
            .select("walk_id", F.col("dst").alias("cur"))
        )
        frontier = _ckpt(chosen, P, "cur")
        out = out.union(
            frontier.select("walk_id", F.lit(step).cast("long").alias("step"), F.col("cur").alias("node"))
        )
        if step % 25 == 0:  # bound the output union's plan depth (bfs.py rule)
            out = _ckpt(out, P, "walk_id")

    return out.select("walk_id", "step", "node")
