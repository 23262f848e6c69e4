"""k-core decomposition over the undirected simple graph.

No reference implementation (beyond-reference graph operator, same family as
components.py / triangles.py). Two published algorithms, both as pure
DataFrame rounds:

- `kcore(edges, k)`: iterative peeling — drop every vertex whose degree in
  the current induced subgraph is < k, repeat to fixpoint (or a fixed round
  count, which makes the output expressible as unrolled SQL for the driver
  oracle). Each round is one degree aggregation plus two semi-joins; the
  edge set only ever shrinks, so at 100 TB the cost is front-loaded on the
  first rounds and decays geometrically on typical web graphs.

- `core_numbers(edges)`: exact coreness per vertex via the neighborhood
  h-index iteration (Lü, Zhou, Zhang, Stanley, "The H-index of a network
  node and its relation to degree and coreness", Nat. Commun. 2016):
  initialise c(v) = deg(v), then repeatedly set c(v) to the h-index of its
  neighbours' current values; the sequence is monotone non-increasing and
  converges to core(v) exactly. Each round is one join + one gather; the
  per-vertex neighbour-value list is O(deg(v)) — the same footprint bound
  as any vertex gather (for 10^12-edge hubs the list can be capped at the
  current estimate c(v)+1 values without changing the h-index, since values
  above c(v) can be clamped to c(v); not needed at test scale).

Convergence checks are exact integer counts (no float tolerance). Rounds
are materialised with an eager localCheckpoint (lineage truncation — see
components.py) and intermediate pins are tracked via _pins for release.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from engine.operators._pins import pin as _pin


def _simple_undirected(edges: DataFrame) -> DataFrame:
    """(u, v) canonical undirected simple pairs (u < v), self-loops dropped."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )


def _sym(e: DataFrame) -> DataFrame:
    """Both directions: (id, nbr)."""
    return e.select(F.col("u").alias("id"), F.col("v").alias("nbr")).union(
        e.select(F.col("v").alias("id"), F.col("u").alias("nbr"))
    )


def _degrees(e: DataFrame) -> DataFrame:
    return _sym(e).groupBy("id").agg(F.count(F.lit(1)).alias("degree"))


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    max_rounds: int = 200,
    metrics: dict | None = None,
) -> DataFrame:
    """(id, degree): vertices of the k-core (peeling fixpoint), with their
    degree in the final induced subgraph.

    rounds=None (default) peels to the exact fixpoint; rounds=R runs exactly
    R peel rounds (deterministic prefix of the fixpoint computation — used
    by the oracle-gated contract query, whose DuckDB twin unrolls the same R
    rounds as materialised CTEs). With rounds=R the surviving vertices'
    degrees are reported in the subgraph induced by the final survivor set,
    so they can be < k if convergence hasn't been reached yet.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    if rounds is not None:
        return kcore_fixed_rounds(edges, k, rounds)
    spark = edges.sparkSession
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = _pin(_simple_undirected(edges).repartition(P, "u"))
    n_prev = _sym(e).select("id").distinct().count()
    it = []
    for rnd in range(max_rounds):
        t0 = time.time()
        keep = (
            _degrees(e)
            .filter(F.col("degree") >= k)
            .select("id")
            .localCheckpoint(eager=True)
        )
        n_keep = keep.count()
        it.append({"iter": rnd, "nodes": n_keep, "wall_sec": round(time.time() - t0, 4)})
        if n_keep == n_prev:
            break
        ku = keep.select(F.col("id").alias("u"))
        kv = keep.select(F.col("id").alias("v"))
        e_new = (
            e.join(ku, "u", "left_semi").join(kv, "v", "left_semi")
            .repartition(P, "u")
            .localCheckpoint(eager=True)
        )
        e.unpersist()
        e = e_new
        n_prev = n_keep
    if metrics is not None:
        metrics["kcore_rounds"] = it
    # at fixpoint every remaining endpoint has degree >= k in the induced graph
    return _degrees(e)


def kcore_fixed_rounds(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """(id, degree): survivors after exactly `rounds` peel rounds, with their
    degree in the subgraph induced by the survivor set (0 if isolated).

    Deterministic unrolled-SQL-expressible semantics:
        e_0 = simple undirected edges; n_0 = all endpoints of e_0
        for r in 1..R: n_r = {v in n_{r-1} : deg_{e_{r-1}}(v) >= k}
                       e_r = e_{r-1} induced on n_r
        output: (id in n_R, deg_{e_R}(id))
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    spark = edges.sparkSession
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = _pin(_simple_undirected(edges).repartition(P, "u"))
    keep = None
    for _ in range(rounds):
        keep = (
            _degrees(e)
            .filter(F.col("degree") >= k)
            .select("id")
            .localCheckpoint(eager=True)
        )
        ku = keep.select(F.col("id").alias("u"))
        kv = keep.select(F.col("id").alias("v"))
        e_new = (
            e.join(ku, "u", "left_semi").join(kv, "v", "left_semi")
            .repartition(P, "u")
            .localCheckpoint(eager=True)
        )
        e.unpersist()
        e = e_new
    deg = _degrees(e)
    return keep.join(deg, "id", "left").select(
        "id", F.coalesce("degree", F.lit(0)).cast("long").alias("degree")
    )


def core_numbers(edges: DataFrame, max_iter: int = 100, metrics: dict | None = None) -> DataFrame:
    """(id, core): exact core number per vertex (h-index iteration)."""
    spark = edges.sparkSession
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = _pin(_sym(_simple_undirected(edges)).repartition(P, "id"))
    c = (
        sym.groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("core"))
        .localCheckpoint(eager=True)
    )
    it = []
    for rnd in range(max_iter):
        t0 = time.time()
        nbr_vals = sym.join(
            c.select(F.col("id").alias("nbr"), F.col("core").alias("ncore")), "nbr"
        )
        gathered = nbr_vals.groupBy("id").agg(
            F.sort_array(F.collect_list("ncore"), asc=False).alias("vals")
        )
        # h-index: #positions i (1-based) in the descending list with vals[i] >= i
        h = F.size(F.filter("vals", lambda x, i: x >= i + F.lit(1)))
        stepped = (
            c.join(gathered, "id", "left")
            .select(
                "id",
                F.col("core").alias("old"),
                F.when(F.col("vals").isNull(), F.lit(0))
                .otherwise(F.least(F.col("core"), h.cast("long")))
                .alias("core"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("core") != F.col("old")).count()
        c = stepped.select("id", "core")
        it.append({"iter": rnd, "changed": changed, "wall_sec": round(time.time() - t0, 4)})
        if changed == 0:
            break
    if metrics is not None:
        metrics["coreness_rounds"] = it
    return c
