"""Damped power-iteration PageRank as an iterative DataFrame dataflow.

Semantics are pinned to the reference recurrence (pagerank_gpu.cu:137-191):

  per iteration (r = current ranks, n = |nodes|, alpha = damping):
    1. dangling_mass = Σ r[i] over outdeg(i)==0            (cu:149-154)
    2. r_new[i] = alpha*(Σ_{j→i} r[j]/outdeg(j) + dangling_mass/n)
                  + (1-alpha)/n                            (cu:156-166)
    3. delta = Σ |r_new - r|; stop when delta < tol        (cu:169-180)
  after loop: r /= Σ r                                     (cu:183-189)

Physical design (Spark-first, NOT a CSR port):
- `adj(src, dst, w=1/outdeg)` replaces the CSR transition matrix; built once,
  hash-partitioned on the join key and persisted (the reference's
  precompute-1/outdeg-outside-the-loop, cu:122-129).
- the SpMV gather (cu:197-217) = adj ⋈ ranks on src, then sum by dst. With
  `salt_buckets=S` the aggregation is an explicit two-stage skew split:
  partial sums on (dst, pmod(hash(src),S)) then final sum on dst — hub
  vertices with huge in-degree never serialize into one reducer.
- dangling is a rank-1 scalar correction (cu:102,125: dangling rows never
  enter the matrix), NOT materialized edges.
- convergence + next iteration's dangling mass + Σrank are ONE multi-aggregate
  pass over r_new ⋈ r_old (the reference makes three separate sweeps,
  cu:149-174).
- lineage is truncated every `checkpoint_every` iterations: either
  iteration-stamped Parquet snapshots + a JSON manifest with per-iteration
  metrics (resumable: a rerun picks up from the last snapshot), or
  localCheckpoint when no checkpoint_dir is given.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass
class PageRankResult:
    ranks: DataFrame  # (id BIGINT, rank DOUBLE), normalized to Σ=1
    iterations: int
    converged: bool
    final_delta: float
    num_nodes: int
    num_edges: int
    metrics: list[dict] = field(default_factory=list)  # per-iteration


def _shuffle_totals(spark) -> dict:
    """Best-effort cumulative shuffle bytes from the UI REST API (local and
    cluster mode both expose it); {} if unavailable."""
    try:
        import urllib.request

        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages", timeout=2) as r:
            stages = json.loads(r.read())
        return {
            "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
            "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        }
    except Exception:
        return {}


from engine.operators._checkpoint import load_manifest as _load_manifest
from engine.operators._checkpoint import snapshot_state as _snapshot_state


BROADCAST_NODE_LIMIT = 4_000_000  # ranks table ≈ 16 B/row → ≤ ~64 MB broadcast


def _estimate_rows(df: DataFrame, bytes_per_row: int = 16) -> int:
    """Row-count estimate from Catalyst's optimized-plan statistics (derived
    from input file sizes / injected stats) — runs NO job. Returns the
    explicit rowCount when the plan carries one; otherwise sizeInBytes /
    bytes_per_row. Falls back to 0 (→ caller's minimum) when statistics are
    the unknown-size sentinel (defaultSizeInBytes ~ 8 EB)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        size = int(str(stats.sizeInBytes()))
        if 0 < size < (1 << 50):
            return size // bytes_per_row
    except Exception:
        pass
    return 0


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    alpha: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    salt_buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    num_partitions: int | None = None,
    resume: bool = True,
    broadcast_ranks: bool | None = None,
    check_every: int = 1,
    personalization: DataFrame | None = None,
    weight_col: str | None = None,
    init_ranks: DataFrame | None = None,
) -> PageRankResult:
    """Run PageRank over an edge table (src BIGINT, dst BIGINT).

    nodes: optional single-column (id) node universe. Default: 0..max(src,dst)
    — the reference's dense-id convention (pagerank_gpu.cu:64-65), where ids
    absent from the edge file still exist and are dangling.
    Duplicate edges count with multiplicity (the reference never dedupes in
    load_graph; outdeg and the matrix both see every occurrence).
    Defaults alpha/tol/max_iter match pagerank_gpu.cu:367-370.

    broadcast_ranks: gather strategy. True → adj is hash-partitioned on dst
    ONCE and the (small) rank vector is broadcast each iteration, so the
    join + partial agg + final agg all run in a single exchange-free stage
    over the cached adjacency — no per-iteration multi-MB shuffle at all.
    False → shuffle gather (adj ⋈ ranks on src, shuffle by dst), the path
    for node counts too big to broadcast; combine with salt_buckets for hub
    skew. None (default) → auto: broadcast iff n ≤ BROADCAST_NODE_LIMIT.
    Both strategies compute the identical recurrence (float sum order may
    differ at the last ulp).

    check_every: cadence of the convergence-stats job (consecutive-iteration
    L1 delta, reference criterion unchanged — just evaluated every k-th
    iteration, so a run may do up to k-1 iterations past convergence). The
    dangling mass itself never needs a driver round-trip: it is folded into
    the update as a lazy broadcast 1-row aggregate of the current vector.
    With k > 1, per-iteration metrics carry delta/Σrank only on check
    iterations.

    weight_col: optional edge-weight column on `edges` (weighted PageRank —
    anchor-text/link-frequency weighting): each edge contributes
    rank(src)·w/Σw(src) instead of rank(src)/outdeg(src). Weights must be
    ≥ 0; zero-weight edges are dropped, and a source whose weights are ALL
    zero is dangling (exactly like a source with no out-edges). Costs one
    extra O(m) validation pass at build time (never per-iteration); the
    default None keeps the reference's unweighted recurrence bit-identical.

    init_ranks: optional (id, rank) seed vector for incremental re-ranking —
    warm-start this snapshot's run from the previous snapshot's converged
    vector (compose with snapshots.snapshot_diff for the monthly-crawl
    delta workflow). New ids get uniform mass, vanished ids drop, and the
    seed is renormalized to Σ=1, so the fixpoint and convergence criterion
    are identical to a cold run — only the iteration count shrinks (the
    power method starts near the dominant eigenvector). Precedence: a
    checkpoint_dir resume snapshot wins over init_ranks, which wins over
    the personalization/uniform default.

    personalization: optional (id, weight) teleport distribution (normalized
    to Σ=1 internally; missing ids get weight 0). Standard personalized
    PageRank: r_new[i] = α·(gather_i + dm·p_i) + (1−α)·p_i, init r = p —
    dangling mass redistributes along p, not uniformly. None (default)
    preserves the reference's uniform recurrence with the exact same scalar
    expressions (bit-identical to previous behavior).
    """
    spark = edges.sparkSession
    sc = spark.sparkContext
    conf_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if num_partitions:
        P = num_partitions
    else:
        # size the per-iteration shuffle to the graph: ~250k edge rows per
        # partition, clamped to the session default. Tiny graphs then run a
        # handful of tasks per stage instead of paying conf_p scheduling
        # overhead x iterations; at cluster scale callers pass num_partitions
        # (or the session default, ~2-3x total cores, wins). The estimate
        # comes from Catalyst's optimizer statistics (file sizes for scans —
        # NO job, no extra full pass over a 100 TB table), not a count().
        # When statistics are unusable (unknown-size sentinel, join-derived
        # plans) the estimate is 0: fall back to the session default rather
        # than collapsing a possibly-huge derived edge table to 2 partitions.
        est = _estimate_rows(edges, bytes_per_row=16)
        P = conf_p if est <= 0 else max(2, min(conf_p, (est // 250_000) + 1))

    if nodes is None:
        mx = edges.agg(
            F.greatest(F.max("src"), F.max("dst")).alias("mx")
        ).collect()[0]["mx"]
        if mx is None:
            raise ValueError("empty edge table")
        nodes = spark.range(0, int(mx) + 1).select(F.col("id"))

    # ---- one-time graph prep (outside the loop, like build_P cu:85-133) ----
    if broadcast_ranks is None:
        # decide before building adj: broadcast path wants dst-partitioning
        n_probe = nodes.count()
        broadcast_ranks = n_probe <= BROADCAST_NODE_LIMIT
    if weight_col is None:
        contrib_edges = edges
        out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        edge_w = F.lit(1.0) / F.col("deg")
    else:
        wc = F.col(weight_col).cast("double")
        bad = edges.filter(wc < 0).limit(1).count()
        if bad:
            raise ValueError(f"negative values in weight column {weight_col!r}")
        contrib_edges = edges.filter(wc > 0)
        out_deg = contrib_edges.groupBy("src").agg(F.sum(wc).alias("deg"))
        edge_w = wc / F.col("deg")
    adj = (
        contrib_edges.join(out_deg, "src")
        .select("src", "dst", edge_w.alias("w"))
        # broadcast gather: partition by dst so join→partial-agg→final-agg is
        # one exchange-free stage; shuffle gather: partition by src so only
        # the small rank vector shuffles into the join
        .repartition(P, "dst" if broadcast_ranks else "src")
        # one-time clustering by the per-iteration probe/join key, paid at
        # build and amortized over every iteration: broadcast path — rows
        # with equal src are adjacent, so the hashed-relation probe hits the
        # same entry ~avg-outdeg times in a row (cache-resident) instead of
        # a random DRAM-latency miss per edge; shuffle path — the cached
        # relation carries outputOrdering(src), so a sort-merge gather join
        # reuses it instead of re-sorting the edge side every iteration
        .sortWithinPartitions("src")
        .persist()
    )
    num_edges = adj.count()  # materialize

    node_info = nodes.select("id").join(
        out_deg.select(F.col("src").alias("id"), "deg"), "id", "left"
    ).select("id", F.col("deg").isNull().alias("is_dangling"))
    if personalization is not None:
        ptotal = personalization.agg(
            F.sum(personalization.columns[1]).alias("t")
        ).collect()[0]["t"]
        if not ptotal or ptotal <= 0:
            raise ValueError("personalization weights must sum to > 0")
        pw = personalization.select(
            F.col(personalization.columns[0]).alias("id"),
            (F.col(personalization.columns[1]) / F.lit(float(ptotal))).alias("pw"),
        )
        # ids absent from the node universe would silently shrink the
        # effective teleport vector below 1 (masked only by the final
        # renormalization) — surface the typo instead
        missing = pw.join(nodes.select("id"), "id", "left_anti").count()
        if missing:
            raise ValueError(
                f"{missing} personalization id(s) are not in the node universe"
            )
        node_info = node_info.join(pw, "id", "left").select(
            "id", "is_dangling", F.coalesce("pw", F.lit(0.0)).alias("pw")
        )
    node_info = node_info.repartition(P, "id").persist()
    n = node_info.count()
    teleport = (1.0 - alpha) / n

    # ---- init / resume ----
    # r carries (id, rank, is_dangling): the dangling flag rides along so the
    # per-iteration dangling-mass aggregate is a filter+sum over r itself —
    # no join, no driver round-trip (the reference's separate dangling sweep,
    # cu:149-154, folded into the dataflow).
    start_iter = 0
    metrics: list[dict] = []
    r = None
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        man = _load_manifest(checkpoint_dir) if resume else None
        if man and man.get("completed_iter", -1) >= 0 and man.get("n") == n:
            start_iter = man["completed_iter"] + 1
            metrics = man["iterations"]
            snap = os.path.join(checkpoint_dir, f"iter={man['completed_iter']}")
            r = (
                spark.read.parquet(snap)
                .join(node_info, "id")
                .select("id", "rank", "is_dangling")
                .repartition(P, "id")
                .localCheckpoint(eager=True)
            )
    if r is None and init_ranks is not None:
        # warm start (incremental re-rank over a snapshot delta): seed from a
        # prior run's vector. Ids absent from init_ranks (pages new in this
        # snapshot) get the uniform mass; the seeded vector is then
        # renormalized to Σ=1 with a lazy 1-row broadcast aggregate (the
        # recurrence preserves Σ=1 from there, so the convergence criterion
        # and fixpoint are identical to a cold run — only the iteration
        # count changes). Vanished ids drop out via the inner node join.
        seeded = node_info.join(
            init_ranks.select("id", F.col("rank").alias("_r0")), "id", "left"
        ).select(
            "id",
            F.coalesce(F.col("_r0"), F.lit(1.0 / n)).alias("rank"),
            "is_dangling",
        )
        tot = seeded.agg(F.sum("rank").alias("_t"))
        r = (
            seeded.join(F.broadcast(tot))
            .select("id", (F.col("rank") / F.col("_t")).alias("rank"), "is_dangling")
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
    if r is None:
        init_rank = F.col("pw") if personalization is not None else F.lit(1.0 / n)
        r = node_info.select(
            "id", init_rank.alias("rank"), "is_dangling"
        ).localCheckpoint(eager=True)

    converged = False
    delta = float("inf")
    dangling_mass = None  # informational (manifest/metrics); not on the critical path
    it = start_iter - 1
    base_shuffle = _shuffle_totals(spark)

    for it in range(start_iter, max_iter):
        t0 = time.time()
        ranks_src = r.select(F.col("id").alias("src"), "rank")
        # lazy scalar: Σ rank over dangling nodes of the CURRENT vector,
        # broadcast as a 1-row frame into the update projection
        dm_df = r.agg(
            F.coalesce(
                F.sum(F.when(F.col("is_dangling"), F.col("rank"))), F.lit(0.0)
            ).alias("_dm")
        )

        if broadcast_ranks:
            # exchange-free gather: broadcast-hash-join the rank vector into
            # the dst-partitioned cached adjacency; the groupBy(dst) partial
            # and final aggregates are satisfied by adj's existing hash
            # partitioning, so the whole SpMV is ONE stage, no shuffle files
            gathered = (
                adj.join(F.broadcast(ranks_src), "src")
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("gathered"))
            )
        elif salt_buckets and salt_buckets > 1:
            # explicit skew split: partial agg on (dst, salt(src)) bounds any
            # single reduce task to ~in_deg/S rows for hub destinations
            partial = (
                adj.join(ranks_src, "src")
                .groupBy("dst", F.pmod(F.hash("src"), F.lit(salt_buckets)).alias("_salt"))
                .agg(F.sum(F.col("rank") * F.col("w")).alias("psum"))
            )
            gathered = partial.groupBy("dst").agg(F.sum("psum").alias("gathered"))
        else:
            gathered = (
                adj.join(ranks_src, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("gathered"))
            )

        if personalization is not None:
            # PPR: dangling mass and teleport both follow the p vector
            update_expr = (
                F.lit(alpha)
                * (F.coalesce(F.col("gathered"), F.lit(0.0)) + F.col("_dm") * F.col("pw"))
                + F.lit(1.0 - alpha) * F.col("pw")
            )
        else:
            update_expr = (
                F.lit(alpha)
                * (
                    F.coalesce(F.col("gathered"), F.lit(0.0))
                    + F.col("_dm") / F.lit(float(n))
                )
                + F.lit(teleport)
            )
        r_new = (
            node_info.join(gathered.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(F.broadcast(dm_df))
            .select("id", update_expr.alias("rank"), "is_dangling")
        )
        # truncate lineage EVERY iteration: without this the logical plan
        # grows linearly and Catalyst re-analysis becomes the per-iteration
        # bottleneck (driver-side, superlinear). localCheckpoint materializes
        # r_new to executor block storage and replaces the plan with a
        # LogicalRDD — the double-buffer swap of pagerank_gpu.cu:175/307.
        r_new = r_new.localCheckpoint(eager=True)

        m = {"iter": it}
        check = (
            check_every <= 1
            or (it - start_iter) % check_every == check_every - 1
            or it == max_iter - 1
        )
        if check:
            # one multi-aggregate pass: L1 delta (consecutive iterations,
            # reference criterion cu:169-180) + dangling mass + Σrank
            stats = (
                r_new.join(r.select("id", F.col("rank").alias("old")), "id")
                .agg(
                    F.sum(F.abs(F.col("rank") - F.col("old"))).alias("delta"),
                    F.sum(
                        F.when(F.col("is_dangling"), F.col("rank")).otherwise(0.0)
                    ).alias("dm"),
                    F.sum("rank").alias("total"),
                )
                .collect()[0]
            )
            delta = float(stats["delta"])
            dangling_mass = float(stats["dm"])
            m["delta_l1"] = delta
            m["dangling_mass"] = dangling_mass
            m["sum_rank"] = float(stats["total"])
        m["wall_sec"] = round(time.time() - t0, 4)
        metrics.append(m)

        r.unpersist()
        r = r_new

        # lineage truncation + resumable snapshot. Shuffle-byte polling (UI
        # REST) happens only here — once per checkpoint window, not per
        # iteration: the stage list grows with the run and per-iteration
        # polling becomes a driver-side bottleneck on long runs.
        last_round = delta < tol or it == max_iter - 1
        if last_round or it % checkpoint_every == checkpoint_every - 1:
            cur_shuffle = _shuffle_totals(spark)
            if cur_shuffle and base_shuffle:
                m["shuffle_read_bytes"] = (
                    cur_shuffle["shuffle_read_bytes"] - base_shuffle["shuffle_read_bytes"]
                )
                m["shuffle_write_bytes"] = (
                    cur_shuffle["shuffle_write_bytes"] - base_shuffle["shuffle_write_bytes"]
                )
                base_shuffle = cur_shuffle
        if checkpoint_dir and (it % checkpoint_every == checkpoint_every - 1 or last_round):
            snap = _snapshot_state(
                r.select("id", "rank"),
                checkpoint_dir,
                it,
                {
                    "kernel": "pagerank",
                    "n": n,
                    "m": num_edges,
                    "alpha": alpha,
                    "tol": tol,
                    "dangling_mass": dangling_mass,
                    "iterations": metrics,
                },
            )
            r = (
                spark.read.parquet(snap)
                .join(node_info, "id")
                .select("id", "rank", "is_dangling")
                .repartition(P, "id")
                .localCheckpoint(eager=True)
            )
        if delta < tol:
            converged = True
            break

    # final normalization (cu:183-189)
    total = r.agg(F.sum("rank")).collect()[0][0]
    ranks = r.select("id", (F.col("rank") / F.lit(total)).alias("rank"))

    adj.unpersist()
    node_info.unpersist()
    return PageRankResult(
        ranks=ranks,
        iterations=it + 1 if it >= 0 else 0,
        converged=converged,
        final_delta=delta,
        num_nodes=n,
        num_edges=num_edges,
        metrics=metrics,
    )


def top_k(ranks: DataFrame, k: int = 10) -> DataFrame:
    """Top-k by rank desc (pagerank_gpu.cu:429-442). Spark plans this as
    TakeOrderedAndProject — per-partition partial top-k, no full sort."""
    return ranks.orderBy(F.desc("rank"), F.asc("id")).limit(k)
