"""Louvain-style modularity optimization (synchronous move rounds + graph
condensation).

No reference implementation (beyond-reference community-detection op, next
to synchronous LP — labelprop.py — and the modularity metric the engine
already ships): the Louvain method (Blondel, Guillaume, Lambiotte &
Lefebvre, J. Stat. Mech. 2008) is the standard web-graph community
detector — local modularity-gain moves, then collapse each community to a
super-node and repeat on the condensed graph.

The classic phase-1 sweep is sequential (nodes move one at a time, each
seeing the previous moves). That is inherently driver-side at 10^12 edges,
so the engine ships the standard distributed variant: **synchronous gain
rounds** (every node simultaneously picks the neighboring community with
the highest modularity gain, computed against the round-start labeling —
the same sync-semantics choice as `labelprop.label_propagation`, and the
parallel-Louvain formulation used by distributed implementations). Fully
synchronous + exact integer gain comparison + min-label tie-break ⇒
exactly reproducible (BASELINE.json exact-match contract); the oracle is
tests/oracle.py:louvain_rounds_py and an unrolled-SQL DuckDB twin
(`g47_louvain_2round`).

Gain arithmetic (all integers — engine-portable to the last bit): with
integer edge weights, moving node i (first removed from its community)
into community c changes modularity by ΔQ ∝ 2m·ki_in(i,c) − k_i·Σtot(c∖i),
where ki_in = weight from i to c's members, k_i = weighted degree, Σtot =
summed degree of c's members, 2m = total degree. Both products are exact
DECIMAL(38,0) (2m ~ 2·10^12 at crawl scale times a 10^9-degree hub
overflows BIGINT; DECIMAL keeps the comparison exact, never float).
Self-loops follow the Louvain convention: weight 2·w counts into k_i (and
therefore Σtot and 2m) but generates no candidate rows — at level 1 a
crawl graph has none, at level 2+ they carry the collapsed intra-community
mass.

Spark shape per round: one labels⨝adjacency gather + a
map-side-combinable groupBy (the PageRank gather shape — exchange-free
in broadcast mode, where the label vector is broadcast into the
u-partitioned cached adjacency; label-vector-only shuffle otherwise),
one O(communities) Σtot aggregate, one max_by argmax, labels
localCheckpoint'ed per round (the iterative-kernel lineage pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,0)"


def _undirected(edges: DataFrame, weight_col: str | None) -> DataFrame:
    """Symmetric weighted adjacency (u, v, w) with parallel links added,
    both directions present, self-loops preserved as (u, u, w)."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    d = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"), w.cast("long").alias("w"))
    sym = d.union(
        d.filter(F.col("u") != F.col("v")).select(
            F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
        )
    )
    return sym.groupBy("u", "v").agg(F.sum("w").alias("w"))


def louvain_move_rounds(
    edges: DataFrame,
    rounds: int = 5,
    weight_col: str | None = None,
    labels: DataFrame | None = None,
    num_partitions: int | None = None,
    broadcast_labels: bool | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Synchronous Louvain phase-1: `rounds` simultaneous gain-move rounds.

    edges: (src, dst[, weight_col]); labels: optional warm-start
    (id, label) — defaults to singleton communities (label = id).
    Returns (id BIGINT, label BIGINT) after the fixed number of rounds
    (early-exits when a round moves nothing). Deterministic: exact integer
    gains, ties broken by the minimum community id, a node only moves on a
    strictly positive improvement over its current placement.

    broadcast_labels: True → the (small) label vector and per-node /
    per-community stat frames are broadcast into the u-partitioned cached
    adjacency, so the edge-sized gather (join + groupBy(u, community))
    runs in one exchange-free stage — the labelprop/pagerank broadcast
    strategy. False → shuffle join on v (the 100 TB path: only the label
    vector shuffles; the cached adjacency is never re-exchanged). None →
    auto by node count (pagerank.BROADCAST_NODE_LIMIT).
    """
    from engine.operators.pagerank import BROADCAST_NODE_LIMIT

    spark = edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    adj = _undirected(edges, weight_col)
    loops = adj.filter(F.col("u") == F.col("v")).select(
        F.col("u").alias("id"), (2 * F.col("w")).alias("lw")
    )
    adj = adj.filter(F.col("u") != F.col("v"))

    # weighted degree: Σ_{j≠i} w(i,j) + 2·w(i,i)   (Louvain convention)
    k = (
        adj.groupBy(F.col("u").alias("id"))
        .agg(F.sum("w").alias("k"))
        .join(loops, "id", "full_outer")
        .select(
            "id",
            (F.coalesce(F.col("k"), F.lit(0)) + F.coalesce(F.col("lw"), F.lit(0))).alias("k"),
        )
        .repartition(P, "id")
        .persist()
    )
    n = k.count()
    if broadcast_labels is None:
        broadcast_labels = n <= BROADCAST_NODE_LIMIT
    # broadcast mode: partition by u so the gather's join + groupBy(u, c)
    # chain needs no exchange; shuffle mode: by the join key v
    adj = adj.repartition(P, "u" if broadcast_labels else "v").persist()
    two_m = k.agg(F.sum("k").cast(_DEC).alias("two_m"))  # lazy 1-row broadcast

    def _b(df):
        return F.broadcast(df) if broadcast_labels else df

    if labels is None:
        labels = k.select("id", F.col("id").alias("label"))
    else:
        labels = labels.select("id", "label")
    labels = labels.localCheckpoint(eager=True)

    for r in range(rounds):
        lv = labels.select(F.col("id").alias("v"), F.col("label").alias("c"))
        # the edge-sized gather: ki_in per (node, NEIGHBOR community); the
        # own community's stay score is reconstructed below, so no
        # edge-sized union/regroup is needed
        cand = adj.join(_b(lv), "v").groupBy("u", "c").agg(F.sum("w").alias("ki"))
        sig = (
            labels.join(k, "id", "left")
            .groupBy("label")
            .agg(
                F.sum(F.coalesce(F.col("k"), F.lit(0))).alias("tot"),
                F.count(F.lit(1)).alias("csize"),
            )
            .withColumnRenamed("label", "c")
        )
        # per-node frame: own community, its Σtot/size, own degree
        ownst = (
            labels.select("id", F.col("label").alias("own"))
            .join(
                sig.select(
                    F.col("c").alias("own"),
                    F.col("tot").alias("own_tot"),
                    F.col("csize").alias("own_size"),
                ),
                "own",
            )
            .join(k.select("id", F.col("k").alias("ku")), "id", "left")
            .select(
                F.col("id").alias("u"),
                "own",
                "own_tot",
                "own_size",
                F.coalesce(F.col("ku"), F.lit(0)).alias("ku"),
            )
        )
        scored = (
            cand.join(_b(sig), "c")
            .join(_b(ownst), "u")
            .crossJoin(F.broadcast(two_m))
            .select(
                "u",
                "c",
                "own",
                "csize",
                (
                    F.col("two_m") * F.col("ki").cast(_DEC)
                    - F.col("ku").cast(_DEC)
                    * (
                        F.col("tot")
                        - F.when(F.col("c") == F.col("own"), F.col("ku")).otherwise(F.lit(0))
                    ).cast(_DEC)
                ).alias("score"),
            )
        )
        # argmax: score DESC then community ASC. A move needs a strictly
        # better score than staying; when the own community is not among
        # the neighbor communities its stay score is reconstructed as
        # −k_u·(Σtot(own)−k_u) (ki_in = 0). Swap prevention (Ghosh et al.,
        # IPDPS 2018): under fully synchronous updates two adjacent
        # singletons can pick each other and oscillate forever, so a
        # singleton may join another SINGLETON only when the target
        # community id is smaller — deterministic, and the only case it
        # gates is the symmetric 2-cycle.
        best = scored.groupBy("u").agg(
            F.max_by(
                F.struct(F.col("c"), F.col("score"), F.col("csize")),
                F.struct(F.col("score"), -F.col("c")),
            ).alias("b"),
            F.max(F.when(F.col("c") == F.col("own"), F.col("score"))).alias("stay_in"),
        )
        moved_frame = (
            ownst.join(best, "u", "left")
            .select(
                F.col("u").alias("id"),
                "own",
                F.when(
                    (
                        F.col("b.score")
                        > F.coalesce(
                            F.col("stay_in"),
                            -F.col("ku").cast(_DEC)
                            * (F.col("own_tot") - F.col("ku")).cast(_DEC),
                        )
                    )
                    & ~(
                        (F.col("own_size") == 1)
                        & (F.col("b.csize") == 1)
                        & (F.col("b.c") > F.col("own"))
                    ),
                    F.col("b.c"),
                )
                .otherwise(F.lit(None))
                .alias("new_label"),
            )
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("own")).alias("label"),
                (F.col("new_label").isNotNull() & (F.col("new_label") != F.col("own")))
                .cast("int")
                .alias("_moved"),
            )
            .localCheckpoint(eager=True)
        )
        moved = moved_frame.agg(F.sum("_moved")).collect()[0][0] or 0
        labels = moved_frame.select("id", "label")
        if metrics is not None:
            metrics.setdefault("rounds", []).append({"round": r + 1, "moved": int(moved)})
        if moved == 0:
            break

    adj.unpersist()
    k.unpersist()
    return labels


def condense_graph(
    edges: DataFrame, labels: DataFrame, weight_col: str | None = None
) -> DataFrame:
    """Louvain phase-2: collapse each community to a super-node.

    Returns directed (src, dst, weight BIGINT) in label space — parallel
    edges add, intra-community mass becomes self-loops (kept: they carry
    the collapsed weight into the next level's k_i). One gather-shaped
    double dictionary join + one map-side-combinable aggregate."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("_ls"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("_ld"))
    return (
        edges.select("src", "dst", w.cast("long").alias("_w"))
        .join(ls, "src")
        .join(ld, "dst")
        .groupBy(F.col("_ls").alias("src"), F.col("_ld").alias("dst"))
        .agg(F.sum("_w").alias("weight"))
    )


def louvain(
    edges: DataFrame,
    levels: int = 2,
    rounds_per_level: int = 5,
    weight_col: str | None = None,
    num_partitions: int | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Multi-level Louvain: move rounds, condense, repeat on the community
    graph; the final (id BIGINT, label BIGINT) maps every original node to
    its top-level community. Each level's node count shrinks to the number
    of communities, so upper levels are progressively cheaper; the mapping
    composition is one dictionary join per level."""
    mapping = None  # original id -> current-level node
    cur_edges, cur_w = edges, weight_col
    for lvl in range(levels):
        mm: dict | None = {} if metrics is not None else None
        labels = louvain_move_rounds(
            cur_edges, rounds=rounds_per_level, weight_col=cur_w,
            num_partitions=num_partitions, metrics=mm,
        )
        if metrics is not None:
            metrics.setdefault("levels", []).append(mm)
        if mapping is None:
            mapping = labels
        else:
            right = labels.select(F.col("id").alias("_lid"), F.col("label").alias("_nl"))
            mapping = (
                mapping.join(right, mapping.label == right["_lid"])
                .select("id", F.col("_nl").alias("label"))
            )
        mapping = mapping.localCheckpoint(eager=True)
        if lvl + 1 < levels:
            cur_edges = condense_graph(cur_edges, labels, weight_col=cur_w).localCheckpoint(
                eager=True
            )
            cur_w = "weight"
    return mapping
