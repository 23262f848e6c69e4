"""Incremental re-rank evidence: warm-start PageRank over a snapshot delta.

Monthly Common-Crawl-style workflow: snapshot B differs from snapshot A by
a small edge churn; re-ranking B from scratch repeats the whole power
iteration, while `pagerank(init_ranks=A.ranks)` starts at A's vector —
near the dominant eigenvector — and converges in a fraction of the
iterations. The iteration count is the scale-relevant quantity (each
iteration is one full edge-sized gather at any cluster size); walls are
reported for transparency but carry the usual host-steal noise.

Protocol: the bench's 50M-edge / 5M-node shuffle-path table is snapshot A;
snapshot B rewires the ~1% of edges whose xxhash64(src,dst,43) % 100 == 0
to a fresh hash-derived dst (deterministic, no data dependence). Cold A,
cold B, warm B (seeded with A's converged vector) all run at the same
tol/parallelism. Saves BENCH/warm.json; run_bench.write_report renders it
into BASELINE.md so the evidence survives re-banking.

Run: python BENCH/warm_bench.py [--save] (table auto-generates if absent).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

BENCH_DIR = Path(__file__).resolve().parent
sys.path.insert(0, str(BENCH_DIR.parent))  # engine package
sys.path.insert(0, str(BENCH_DIR))  # run_bench helpers

from run_bench import DATA_DIR, _session, generate_edges  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=50_000_000)
    ap.add_argument("--nodes", type=int, default=5_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--churn-pct", type=int, default=1)
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from engine.operators.pagerank import pagerank

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    path = str(DATA_DIR / f"edges_{args.edges}_{args.nodes}.parquet")
    if not os.path.exists(path):
        generate_edges(path, args.edges, args.nodes, args.partitions)

    spark = _session(args.cpus, args.partitions)
    snap_a = spark.read.parquet(path)
    churn = F.pmod(F.xxhash64("src", "dst", F.lit(43)), F.lit(100)) < args.churn_pct
    new_dst = F.pmod(F.xxhash64("src", "dst", F.lit(47)), F.lit(args.nodes))
    snap_b = snap_a.select(
        "src", F.when(churn, new_dst).otherwise(F.col("dst")).alias("dst")
    )

    def run(edges, label, init=None):
        t0 = time.time()
        res = pagerank(edges, tol=args.tol, max_iter=100, init_ranks=init)
        res.ranks.count()
        wall = round(time.time() - t0, 3)
        print(f"{label}: {res.iterations} iterations, {wall}s, converged={res.converged}")
        assert res.converged, label
        return res, {"iterations": res.iterations, "wall_sec": wall}

    res_a, rec_a = run(snap_a, "cold A")
    _res_bc, rec_bc = run(snap_b, "cold B")
    _res_bw, rec_bw = run(snap_b, "warm B (seeded from A)", init=res_a.ranks)

    out = {
        "edges": args.edges,
        "nodes": args.nodes,
        "cpus": args.cpus,
        "tol": args.tol,
        "churn_pct": args.churn_pct,
        "cold_a": rec_a,
        "cold_b": rec_bc,
        "warm_b": rec_bw,
        "iter_ratio": round(rec_bw["iterations"] / rec_bc["iterations"], 3),
    }
    print(json.dumps(out))
    if args.save:
        (BENCH_DIR / "warm.json").write_text(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
