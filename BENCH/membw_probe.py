"""Memory-subsystem probe: is the sub-0.8 high-thread scaling an artifact
of one box's shared memory bus, or of the engine?

Replicates the per-edge work of the PageRank broadcast gather in pure
NumPy — stream a large int64 edge-destination array, fancy-gather from a
500k-double rank vector, reduce — and runs P independent copies in P
processes (no shared state, no GIL, no Spark). If the aggregate
edges/sec curve flattens the same way the engine's local[8] -> local[32]
pair does, the cliff is the socket's memory subsystem, not the engine:
P independent processes have zero synchronization, zero shuffle, zero
JVM — nothing left to blame but shared hardware.

A real 4x-EXECUTOR scale-out adds 4x memory channels with the node
count, which is exactly the resource this probe shows saturating on one
box. Usage:

    python BENCH/membw_probe.py [--edges 100000000] [--nodes 500000]
                                [--procs 1 4 8 32] [--trials 3]

Appends nothing; prints a markdown table + one JSON line (paste into
BENCH/BASELINE.md). Run it on an otherwise-idle box (never concurrently
with a bench round).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def _worker(edges: int, nodes: int, seed: int, out):
    rng = np.random.default_rng(seed)
    ranks = rng.random(nodes)  # the broadcast rank vector (~4 MB at 500k)
    idx = rng.integers(0, nodes, size=edges, dtype=np.int64)  # dst stream
    # one warm pass so page faults / allocation are off the clock
    s = float(np.add.reduce(ranks[idx[: edges // 10]]))
    t0 = time.perf_counter()
    s += float(np.add.reduce(ranks[idx]))  # the gather: stream idx, hit ranks
    wall = time.perf_counter() - t0
    out.put((wall, s))


def run(procs: int, edges: int, nodes: int, trial: int) -> float:
    """Aggregate edges/sec across `procs` fully independent processes."""
    q: mp.Queue = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(edges, nodes, 1000 * trial + i, q))
        for i in range(procs)
    ]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    walls = [q.get()[0] for p in ps]
    for p in ps:
        p.join()
    # aggregate throughput over the span in which all P gathers ran;
    # per-process walls are near-identical (same fixed work)
    span = max(walls)
    return procs * edges / span


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=100_000_000)
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--procs", type=int, nargs="*", default=[1, 4, 8, 32])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument(
        "--save", action="store_true",
        help="merge best-kept cells into BENCH/membw.json (read by "
        "run_bench.py's report writer, so the probe section survives "
        "BASELINE.md regeneration)",
    )
    args = ap.parse_args(argv)

    best: dict[int, float] = {}
    draws: dict[int, int] = {}
    saved = {}
    save_path = None
    if args.save:
        from pathlib import Path

        save_path = Path(__file__).resolve().parent / "membw.json"
        if save_path.exists():
            saved = {int(k): v for k, v in json.loads(save_path.read_text())["cells"].items()}
            best = {p: c["edges_per_sec"] for p, c in saved.items()}
            draws = {p: c["draws"] for p, c in saved.items()}
    for t in range(args.trials):  # interleaved, best kept (host steal)
        for p in args.procs:
            tput = run(p, args.edges, args.nodes, t)
            best[p] = max(best.get(p, 0.0), tput)
            draws[p] = draws.get(p, 0) + 1
            print(f"trial {t + 1}/{args.trials} procs={p}: {tput:,.0f} gathered-edges/sec")

    rows = []
    base = min(best)
    print("\n| procs | gathered-edges/sec | per-proc | efficiency vs x(procs) |")
    print("|---|---|---|---|")
    for p in sorted(best):
        eff = best[p] / (best[base] * p / base)
        rows.append({"procs": p, "edges_per_sec": round(best[p]),
                     "efficiency": round(eff, 3), "draws": draws[p]})
        print(f"| {p} | {best[p]:,.0f} | {best[p] / p:,.0f} | {eff:.3f} |")
    print()
    out = {"probe": "numpy_gather_membw", "edges": args.edges,
           "nodes": args.nodes, "cells": {str(r["procs"]): r for r in rows}}
    print(json.dumps(out))
    if save_path is not None:
        save_path.write_text(json.dumps(out, indent=1))
        print(f"saved -> {save_path}")


if __name__ == "__main__":
    main()
