"""Redirect / canonical-chain resolution by pointer doubling.

Web pipelines must canonicalize before any graph or dedup stage: HTTP
redirects and rel=canonical links form chains (a → b → c → …) and every
source URL needs its terminal target. At 10¹²-page scale the naive
follow-one-hop-per-round loop pays one edge-sized join per hop; pointer
doubling (the classic PRAM/MapReduce list-ranking technique, the same
trick large-star/small-star CC builds on) squares the jump length each
round — m_{k+1}(x) = m_k(m_k(x)) — so a chain of length L resolves in
⌈log₂ L⌉ joins instead of L.

State is one row per URL in the mapping's domain: (src, cur, hops) with
cur = f^hops(src), terminals mapping to themselves with hops 0. Each
round self-joins the state on cur = state.src and adds the hop counts —
a single hash join + projection per round, localCheckpoint-truncated
like every iterative kernel here. Cycles (a → b → a) never reach a
terminal; they are reported with resolved = false once the hop budget
(max_hops) is exhausted rather than looping forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resolve_redirects(
    redirects: DataFrame,
    max_hops: int = 64,
    num_partitions: int | None = None,
    metrics: list | None = None,
) -> DataFrame:
    """Resolve every chain of the FUNCTIONAL mapping `redirects` (src, dst).

    Multiple dsts per src are collapsed deterministically to min(dst)
    before resolving (a crawl can record conflicting canonicals; min is
    the stable choice). Returns one row per distinct URL of the RAW
    input (src ∪ dst before the collapse — a discarded conflicting
    target still resolves, to itself if nothing redirects it):

        (src, final, hops, resolved)

    final = the chain's terminal (a node that is not itself redirected)
    and hops = exact chain length when resolved; for cycle members and
    chains longer than max_hops, resolved = false and final/hops hold the
    position after the last doubling round (hops = the doubled jump
    count, NOT a chain length). Doubling runs ⌈log₂ max_hops⌉ rounds and
    exits early once every row is terminal-parked.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    spark = redirects.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    r = redirects.groupBy("src").agg(F.min("dst").alias("dst"))
    # domain = every URL observed in the RAW input (a dst discarded by the
    # min-collapse is still a crawled URL and resolves to itself)
    domain = (
        redirects.select(F.col("src").alias("id"))
        .union(redirects.select(F.col("dst").alias("id")))
        .distinct()
    )
    # terminals map to themselves with 0 hops, so composition is total
    state = (
        domain.join(r.withColumnRenamed("src", "id"), "id", "left")
        .select(
            F.col("id").alias("src"),
            F.coalesce("dst", F.col("id")).alias("cur"),
            F.when(F.col("dst").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("hops"),
        )
        .repartition(P, "cur")
        .localCheckpoint(eager=True)
    )

    import time

    rounds = max(1, (max_hops - 1).bit_length())  # 2^rounds >= max_hops
    for rnd in range(rounds):
        t0 = time.time()
        jump = state.select(
            F.col("src").alias("cur"), F.col("cur").alias("nxt"), F.col("hops").alias("h2")
        )
        new = (
            state.join(jump, "cur")
            .select(
                "src",
                F.col("nxt").alias("cur"),
                (F.col("hops") + F.col("h2")).alias("hops"),
            )
            .repartition(P, "cur")
            .localCheckpoint(eager=True)
        )
        # early exit: every row parked on a terminal (no row advanced)
        advanced = (
            new.join(state.select("src", F.col("hops").alias("h0")), "src")
            .filter(F.col("hops") != F.col("h0"))
            .limit(1)
            .count()
        )
        if metrics is not None:
            metrics.append(
                {"round": rnd, "advanced": bool(advanced),
                 "wall_sec": round(time.time() - t0, 4)}
            )
        state = new
        if advanced == 0:
            break

    terminals = domain.join(r.select(F.col("src").alias("id")), "id", "left_anti")
    return state.join(
        terminals.select(F.col("id").alias("cur"), F.lit(True).alias("resolved")),
        "cur",
        "left",
    ).select(
        "src",
        F.col("cur").alias("final"),
        "hops",
        F.coalesce("resolved", F.lit(False)).alias("resolved"),
    )
