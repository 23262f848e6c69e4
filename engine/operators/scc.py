"""Strongly connected components over the directed link graph.

The directed-web-graph counterpart of components.py: the web's bowtie
structure (Broder et al., "Graph structure in the Web", WWW 2000) is an SCC
decomposition — the giant core plus IN/OUT/tendrils. No reference
implementation exists (beyond-reference graph operator, same family as
components.py / kcore.py); the exact-match contract is the same as CC's:
every vertex labelled with the minimum vertex id of its SCC.

Algorithm: trim + forward-coloring + backward-restricted reachability —
the distributed FB/coloring scheme (Orzan 2004; McLendon et al. 2005;
Slota, Rajamanickam, Madduri, IPDPS 2014), as pure DataFrame rounds:

1. **Trim**: a vertex with no in-edge or no out-edge in the current induced
   subgraph is a singleton SCC; peel to fixpoint. On web graphs this
   removes the huge IN/OUT/tendril DAG periphery for the cost of a degree
   semi-join per round.
2. **Color (forward max-propagation)**: color(v) = max vertex id that
   reaches v, to fixpoint. Each round is one src-keyed join + max
   aggregate — the same gather shape as a PageRank iteration, so the same
   partitioning/skew strategies apply.
3. **Backward sweep within color**: every color class has exactly one root
   r (color(r) = r); the SCC of r is the set of vertices of color r that
   reach r. Found by reverse-edge frontier expansion restricted to equal
   color — each vertex has one color, so membership is unambiguous.
4. Peel the found SCCs from the graph, repeat from 1.

Every pass is a join + aggregate over the (shrinking) edge set; rounds are
materialised with an eager localCheckpoint (lineage truncation, see
components.py) and multi-use frames are tracked via _pins for release.
Worst case is high-diameter cycles (coloring then needs O(diameter)
rounds — the known FB/coloring bound); on bowtie-shaped web graphs the
trim phase removes the periphery and one coloring round-trip finds the
giant core, so outer rounds are few.

Output contract: (id BIGINT, label BIGINT), label = min vertex id in the
SCC; singleton vertices (including pure-DAG vertices and self-loop-only
vertices) label themselves. Exactly the CC contract, directed.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, functions as F

from engine.operators._checkpoint import load_manifest, read_snapshot, snapshot_state
from engine.operators._pins import pin as _pin


def _ckpt(df: DataFrame, P: int, key: str | None = None) -> DataFrame:
    """Materialize a round's state with truncated lineage."""
    if key is not None:
        df = df.repartition(P, key)
    return df.localCheckpoint(eager=True)


def strongly_connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_outer: int = 50,
    max_inner: int = 200,
    num_partitions: int | None = None,
    metrics: list | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> DataFrame:
    """SCC labels for every vertex: (id BIGINT, label BIGINT).

    edges: (src, dst) directed; duplicates and self-loops allowed (a
    self-loop does not merge anything — a singleton is a singleton).
    nodes: optional (id) universe; default = all edge endpoints.
    metrics: optional list; appended one dict per outer round with the
    trim/color/backward round counts and wall seconds (the per-iteration
    metrics contract of pagerank/components). On resume it carries the
    prior rounds from the manifest followed by the new ones.

    checkpoint_dir: round-stamped Parquet snapshots of the peel state —
    the three frames (labels-so-far, remaining vertices, induced edges)
    encoded in one part-discriminated table — plus a manifest with
    per-round metrics and per-partition lineage (the CC/LP/pagerank
    contract). A rerun with the same dir resumes from the last completed
    outer round; the peel is deterministic, so the resumed run produces
    identical labels. A manifest written for a different edge set is
    ignored (fresh start), mirroring components.py.

    Raises RuntimeError if the decomposition hasn't finished after
    max_outer peels (wrong labels are never returned).
    """
    spark = edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # simple directed edge set: dups and self-loops dropped (neither affects
    # strong connectivity between distinct vertices)
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        # explicit universe: edges touching vertices outside it don't count
        nodes = nodes.select("id").distinct()
        e = e.join(nodes.select(F.col("id").alias("src")), "src", "left_semi").join(
            nodes.select(F.col("id").alias("dst")), "dst", "left_semi"
        ).select("src", "dst")

    # accumulated (id, label) output; unioned once per outer round and
    # re-checkpointed so the plan never grows past one node per round
    done: DataFrame | None = None
    all_metrics: list[dict] = []
    start_round = 0
    resumed = False
    m_raw = None
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        # input-identity guard (mirrors components.py): resuming against a
        # checkpoint written for a different edge set silently starts fresh
        m_raw = edges.count()
        man = load_manifest(checkpoint_dir) if resume else None
        if man and man.get("kernel") == "scc" and man.get("input_edges") == m_raw:
            snap = read_snapshot(spark, checkpoint_dir, man["completed_iter"])
            done = snap.filter(F.col("part") == "done").select(
                F.col("a").alias("id"), F.col("b").alias("label")
            )
            remaining = _ckpt(
                snap.filter(F.col("part") == "rem").select(F.col("a").alias("id")),
                P,
                "id",
            )
            e = _ckpt(
                snap.filter(F.col("part") == "e").select(
                    F.col("a").alias("src"), F.col("b").alias("dst")
                ),
                P,
                "src",
            )
            all_metrics = list(man.get("iterations", []))
            if metrics is not None:
                metrics.extend(all_metrics)
            start_round = man["completed_iter"] + 1
            resumed = True
            if man.get("finished"):
                return done.select("id", "label")
    if not resumed:
        e = _ckpt(e, P, "src")
        remaining = _ckpt(nodes, P, "id")
    n_remaining = remaining.count()

    def _add(labels: DataFrame) -> None:
        nonlocal done
        done = labels if done is None else done.union(labels)

    def _snapshot(rnd: int, finished: bool) -> None:
        if not checkpoint_dir:
            return
        empty = spark.createDataFrame([], "id bigint, label bigint")
        state = (
            (done if done is not None else empty)
            .select(
                F.lit("done").alias("part"),
                F.col("id").alias("a"),
                F.col("label").alias("b"),
            )
            .union(
                remaining.select(
                    F.lit("rem").alias("part"),
                    F.col("id").alias("a"),
                    F.lit(None).cast("bigint").alias("b"),
                )
            )
            .union(
                e.select(
                    F.lit("e").alias("part"),
                    F.col("src").alias("a"),
                    F.col("dst").alias("b"),
                )
            )
        )
        snapshot_state(
            state,
            checkpoint_dir,
            rnd,
            {
                "kernel": "scc",
                "input_edges": m_raw,
                "finished": finished,
                "iterations": all_metrics,
            },
        )

    for rnd in range(start_round, max_outer):
        if n_remaining == 0:
            break
        t0 = time.time()
        stats = {"outer": rnd, "remaining": n_remaining}

        # ---- 1. trim: peel no-in / no-out vertices (singleton SCCs) ----
        trims = 0
        while True:
            # one shuffle per trim round: tag endpoints, partial-agg map-side,
            # keep ids seen on BOTH sides (vs two distincts + a join = 3
            # shuffles over the same edge set)
            keep = _pin(
                e.select(F.col("src").alias("id"), F.lit(1).alias("o"), F.lit(0).alias("i"))
                .union(
                    e.select(F.col("dst").alias("id"), F.lit(0).alias("o"), F.lit(1).alias("i"))
                )
                .groupBy("id")
                .agg(F.max("o").alias("has_out"), F.max("i").alias("has_in"))
                .filter((F.col("has_out") == 1) & (F.col("has_in") == 1))
                .select("id")
            )
            n_keep = keep.count()
            if n_keep == n_remaining:
                break
            trimmed = remaining.join(keep, "id", "left_anti")
            _add(trimmed.select("id", F.col("id").alias("label")))
            remaining = _ckpt(keep, P, "id")
            e = _ckpt(
                e.join(remaining.select(F.col("id").alias("src")), "src", "left_semi")
                .join(remaining.select(F.col("id").alias("dst")), "dst", "left_semi")
                .select("src", "dst"),
                P,
                "src",
            )
            keep.unpersist()  # remaining/e checkpoints now hold the state
            n_remaining = n_keep
            trims += 1
            # deep-DAG graphs (chains) trim for O(diameter) rounds; the done
            # union grows one node per round and its anti-join inputs are
            # replaced frames — compact periodically to bound plan depth
            # (the BFS visited-compaction rule, bfs.py)
            if done is not None and trims % 25 == 0:
                done = _ckpt(done, P, "id")
        stats["trim_rounds"] = trims
        if n_remaining == 0:
            if done is not None:
                done = _ckpt(done, P, "id")
            stats["wall_sec"] = round(time.time() - t0, 4)
            all_metrics.append(stats)
            if metrics is not None:
                metrics.append(stats)
            _snapshot(rnd, finished=True)
            break

        # ---- 2. forward coloring: color(v) = max id reaching v ----
        color = _ckpt(remaining.select("id", F.col("id").alias("color")), P, "id")
        colors_done = False
        for _ in range(max_inner):
            in_max = (
                e.join(color.select(F.col("id").alias("src"), "color"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("color").alias("c_in"))
            )
            # carry the previous color through the checkpoint so the
            # convergence count is one aggregate over the just-stored
            # blocks, not a second join against the old frame
            color_new = _ckpt(
                color.select("id", F.col("color").alias("c_old"))
                .join(in_max, "id", "left")
                .select(
                    "id",
                    F.greatest("c_old", F.coalesce("c_in", "c_old")).alias("color"),
                    "c_old",
                ),
                P,
                "id",
            )
            changed = color_new.filter(F.col("color") != F.col("c_old")).count()
            color = color_new.select("id", "color")
            stats["color_rounds"] = stats.get("color_rounds", 0) + 1
            if changed == 0:
                colors_done = True
                break
        if not colors_done:
            raise RuntimeError(
                f"SCC coloring did not converge within max_inner={max_inner} rounds"
            )
        # color is an eager localCheckpoint — its blocks are already stored,
        # no extra persist layer needed for the backward sweep's reuse

        # ---- 3. backward sweep restricted to equal color ----
        # roots: color(r) == r; each vertex reaches exactly one root within
        # its color class, so membership rows are unique per vertex
        roots = color.filter(F.col("color") == F.col("id")).select(
            F.col("id").alias("member"), F.col("id").alias("root")
        )
        members = _ckpt(roots, P, "member")
        frontier = members
        for _ in range(max_inner):
            preds = (
                e.join(
                    frontier.select(F.col("member").alias("dst"), "root"), "dst"
                )
                .select(F.col("src").alias("member"), "root")
                .distinct()
                .join(color.select(F.col("id").alias("member"), "color"), "member")
                .filter(F.col("color") == F.col("root"))
                .select("member", "root")
            )
            new = _ckpt(
                preds.join(members, "member", "left_anti"), P, "member"
            )
            n_new = new.count()
            stats["backward_rounds"] = stats.get("backward_rounds", 0) + 1
            if n_new == 0:
                break
            members = _ckpt(members.union(new), P, "member")
            frontier = new
        else:
            raise RuntimeError(
                f"SCC backward sweep did not finish within max_inner={max_inner} rounds"
            )

        # ---- 4. label found SCCs with their min member id; peel ----
        scc_min = members.groupBy("root").agg(F.min("member").alias("label"))
        _add(
            members.join(scc_min, "root").select(
                F.col("member").alias("id"), "label"
            )
        )
        remaining = _ckpt(
            remaining.join(
                members.select(F.col("member").alias("id")), "id", "left_anti"
            ),
            P,
            "id",
        )
        n_remaining = remaining.count()
        e = _ckpt(
            e.join(remaining.select(F.col("id").alias("src")), "src", "left_semi")
            .join(remaining.select(F.col("id").alias("dst")), "dst", "left_semi")
            .select("src", "dst"),
            P,
            "src",
        )
        done = _ckpt(done, P, "id")
        stats["wall_sec"] = round(time.time() - t0, 4)
        all_metrics.append(stats)
        if metrics is not None:
            metrics.append(stats)
        _snapshot(rnd, finished=n_remaining == 0)
    else:
        if n_remaining != 0:
            raise RuntimeError(
                f"SCC did not finish within max_outer={max_outer} peels "
                f"({n_remaining} vertices remaining)"
            )

    if done is None:
        return nodes.select("id", F.col("id").alias("label"))
    return done.select("id", "label")


def condensation(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    labels: DataFrame | None = None,
    **scc_kwargs,
) -> DataFrame:
    """Condensation (component) DAG of the directed graph: one row per
    ordered pair of DISTINCT SCCs connected by at least one original edge,
    with the cross-edge multiplicity as weight.

    Returns (src_comp BIGINT, dst_comp BIGINT, weight BIGINT). Acyclic by
    the SCC contraction theorem — a cycle between two components would
    merge them into one SCC. This is the web bowtie's macro-structure
    artifact (Broder et al., WWW 2000): IN -> CORE -> OUT as a DAG whose
    node ids are SCC labels (min vertex id per component), ready for
    topological scheduling or reachability rollups.

    labels: optionally pass a precomputed (id, label) SCC labelling (e.g.
    from a checkpointed run) to skip recomputing it. Physical shape: the
    edge list is mapped through the label table twice — two hash joins on
    the vertex id — then one groupBy(src_comp, dst_comp) count; weight
    counts original edge instances (duplicates included — link
    multiplicity between the two components), self-pairs (same component)
    are dropped.
    """
    if labels is None:
        labels = strongly_connected_components(edges, nodes=nodes, **scc_kwargs)
    return (
        edges.select("src", "dst")
        .join(labels.select(F.col("id").alias("src"), F.col("label").alias("src_comp")), "src")
        .join(labels.select(F.col("id").alias("dst"), F.col("label").alias("dst_comp")), "dst")
        .filter(F.col("src_comp") != F.col("dst_comp"))
        .groupBy("src_comp", "dst_comp")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
