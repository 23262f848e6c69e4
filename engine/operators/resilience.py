"""Attack-tolerance of the link graph (Albert, Jeong & Barabási,
Nature 2000): how the largest connected component degrades when the
top-degree hubs are removed versus the same number of random nodes —
the classic scale-free-web resilience measurement (robust to random
failure, fragile to targeted attack).

No reference counterpart (beyond-reference measurement op). Per
scenario: drop the removal set from the edge list (two semi-filters —
the removal set is k rows, broadcast by the optimizer), run the
engine's large-star/small-star connected components on the survivor
graph, and report the largest component against the surviving node
count (nodes isolated BY the removal count as singleton survivors).

Determinism: the hub set orders by (degree desc, id asc); the random
set orders by md5(id || salt) — both engine-portable, so the whole
output is exact integers + one 6 dp division (oracle-gated as g46).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, functions as F

from engine.operators.components import connected_components


def attack_tolerance(
    edges: DataFrame,
    k_remove: int = 20,
    salt: str = "attack",
    max_rounds: int = 50,
) -> DataFrame:
    """(scenario STRING, removed BIGINT, nodes_left BIGINT,
    largest_cc BIGINT, frac DOUBLE) — one row for 'hubs', one for
    'random'. frac = largest_cc / nodes_left, 6 dp."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    ).persist()
    n_total = deg.count()

    hubs = deg.orderBy(F.col("deg").desc(), F.col("id").asc()).limit(k_remove).select("id")
    rand = (
        deg.orderBy(F.md5(F.concat(F.col("id").cast("string"), F.lit(salt))), F.col("id"))
        .limit(k_remove)
        .select("id")
    )

    spark = edges.sparkSession
    rows = []
    for name, removed in (("hubs", hubs), ("random", rand)):
        removed = removed.persist()
        k = removed.count()
        kept = (
            und.join(removed.withColumnRenamed("id", "a"), "a", "left_anti")
            .join(removed.withColumnRenamed("id", "b"), "b", "left_anti")
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
        cc = connected_components(kept, max_rounds=max_rounds)
        sizes = cc.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
        largest_row = sizes.agg(F.max("n")).collect()[0][0]
        largest = int(largest_row) if largest_row is not None else (1 if n_total > k else 0)
        nodes_left = n_total - k
        rows.append(
            (
                name,
                int(k),
                int(nodes_left),
                largest,
                # HALF_UP over the shortest repr — matches SQL round(),
                # not Python round()'s half-even (the simrank-twin rule)
                float(
                    Decimal(repr(largest / nodes_left)).quantize(
                        Decimal("1e-6"), ROUND_HALF_UP
                    )
                )
                if nodes_left
                else None,
            )
        )
        removed.unpersist()
    deg.unpersist()
    return spark.createDataFrame(
        rows,
        "scenario string, removed long, nodes_left long, largest_cc long, frac double",
    )
