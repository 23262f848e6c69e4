"""Synchronous label propagation with deterministic min tie-break.

No reference implementation (SURVEY §7 Phase 3): per round, every node adopts
the most frequent label among its (undirected) neighbors, ties broken by the
minimum label; isolated nodes keep their own. Fully synchronous + min
tie-break ⇒ exactly reproducible (the BASELINE.json exact-match contract);
the oracle is tests/oracle.py:label_propagation_py.

Per round: one join (adjacency ⋈ labels) + one two-level aggregate
(count per (node,label), then max_by((count, -label))) + one changed-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def label_propagation(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (id BIGINT, label BIGINT) at convergence (or max_iter)."""
    spark = edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    adj = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(
            edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("u"), F.col("src").alias("v")
            )
        )
        .distinct()
        .repartition(P, "v")
        .persist()
    )
    adj.count()

    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    nodes = nodes.select("id").repartition(P, "id").persist()
    nodes.count()

    labels = nodes.select("id", F.col("id").alias("label")).persist()
    labels.count()

    for it in range(max_iter):
        nbr = adj.join(labels.withColumnRenamed("id", "v"), "v").select("u", "label")
        counts = nbr.groupBy("u", "label").agg(F.count(F.lit(1)).alias("cnt"))
        # most frequent, min label on ties: max over (cnt, -label)
        best = counts.groupBy("u").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("top")
        ).select(F.col("u").alias("id"), (-F.col("top.neg")).alias("new_label"))

        new_labels = (
            nodes.join(best, "id", "left")
            .join(labels.withColumnRenamed("label", "old_label"), "id")
            .select("id", F.coalesce("new_label", "old_label").alias("label"), "old_label")
            .persist()
        )
        changed = new_labels.filter(F.col("label") != F.col("old_label")).count()
        labels.unpersist()
        labels = new_labels.select("id", "label").localCheckpoint(eager=True)
        new_labels.unpersist()
        if changed == 0:
            break

    adj.unpersist()
    nodes.unpersist()
    return labels
