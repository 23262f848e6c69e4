"""Round-4 scaling evidence harness (VERDICT r3 items #3 and #8).

One interleaved round = five engine draws + two probe draws, in this order:

    sh/local[2]  partitions=64   (banked-config arm)
    sh/local[2]  partitions=2    (partitions≈threads arm)
    sh/local[8]  partitions=64   + membw probe @ 8 procs  (same window)
    sh/local[8]  partitions=8    (partitions≈threads arm)
    sh/local[32] partitions=64   + membw probe @ 32 procs (same window)

- **A/B (item #3)**: is the fixed 64-shuffle-partition config depressing
  the shuffle 2→8 pair? Both arms bank into `BENCH/ab_partitions.json`
  (best-per-cell per arm + the 2→8 efficiency each arm implies).
- **Probe correlation (item #8)**: each local[8]/local[32] engine draw is
  paired with an engine-free NumPy memory-bandwidth probe draw run in the
  SAME window, so host-steal attribution is per-window, not per-day.
  Rounds bank into `BENCH/probe_interleave.json`.
- The partitions=64 engine draws are ALSO appended to the main
  `BENCH/results.json` bank (same worker, same config as every banked
  draw), tightening the 2/8/32 shuffle cells.

Run on an otherwise-idle box (the bench protocol forbids concurrent Spark
work). `python BENCH/interleave_ab.py --rounds 3`.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

BENCH = Path(__file__).resolve().parent
sys.path.insert(0, str(BENCH))

SH_TABLE = "/tmp/linkgraph_bench/edges_50000000_5000000.parquet"


def engine_draw(cpus: int, partitions: int) -> dict:
    proc = subprocess.run(
        [
            sys.executable, str(BENCH / "run_bench.py"),
            "--worker", str(cpus),
            "--edges-path", SH_TABLE,
            "--mode", "shuffle",
            "--partitions", str(partitions),
            "--max-iter", "8",
            "--tol", "1e-6",
        ],
        capture_output=True, text=True, timeout=5400, cwd=str(BENCH.parent),
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        print(proc.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"worker local[{cpus}] p={partitions} failed")
    rec = json.loads(lines[-1][len("RESULT "):])
    rec["input"] = "sh"
    rec["partitions"] = partitions
    rec["ts"] = round(time.time(), 1)
    print(
        f"  engine local[{cpus}] p={partitions}: "
        f"{rec['edges_per_sec_per_iter']:,.0f} edges/s/iter",
        file=sys.stderr,
    )
    return rec


def probe_draw(procs: int, trial: int) -> dict:
    import membw_probe

    tput = membw_probe.run(procs, 100_000_000, 500_000, trial)
    print(f"  probe procs={procs}: {tput:,.0f} gathered-edges/s", file=sys.stderr)
    return {"procs": procs, "edges_per_sec": round(tput), "ts": round(time.time(), 1)}


def _load(path: Path, default):
    return json.loads(path.read_text()) if path.exists() else default


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "--skip-ab", action="store_true",
        help="probe-correlation rounds only (no local[2] / partitions≈threads draws)",
    )
    args = ap.parse_args(argv)

    ab_path = BENCH / "ab_partitions.json"
    il_path = BENCH / "probe_interleave.json"
    ab = _load(ab_path, {"draws": []})
    il = _load(il_path, {"rounds": []})

    for r in range(args.rounds):
        print(f"== round {r + 1}/{args.rounds}", file=sys.stderr)
        e2 = None
        if not args.skip_ab:
            e2 = engine_draw(2, 64)
            ab["draws"].append(e2)
            ab["draws"].append(engine_draw(2, 2))
        e8 = engine_draw(8, 64)
        p8 = probe_draw(8, len(il["rounds"]) + 1)
        if not args.skip_ab:
            ab["draws"].append(e8)
            ab["draws"].append(engine_draw(8, 8))
        e32 = engine_draw(32, 64)
        p32 = probe_draw(32, len(il["rounds"]) + 1)
        il["rounds"].append(
            {
                "engine8": e8["edges_per_sec_per_iter"],
                "probe8": p8["edges_per_sec"],
                "engine32": e32["edges_per_sec_per_iter"],
                "probe32": p32["edges_per_sec"],
                "engine_eff": round(
                    e32["edges_per_sec_per_iter"] / (4 * e8["edges_per_sec_per_iter"]), 3
                ),
                "probe_eff": round(p32["edges_per_sec"] / (4 * p8["edges_per_sec"]), 3),
                "ts": round(time.time(), 1),
            }
        )
        # bank the standard-config engine draws into the main results file
        res_path = BENCH / "results.json"
        res = json.loads(res_path.read_text())
        for rec in ([e8, e32] if e2 is None else [e2, e8, e32]):
            clean = {k: v for k, v in rec.items() if k not in ("partitions", "ts")}
            res["all_trials"].append(clean)
        res_path.write_text(json.dumps(res, indent=1))
        ab_path.write_text(json.dumps(ab, indent=1))
        il_path.write_text(json.dumps(il, indent=1))

    # A/B summary: best per (cpus, partitions) arm + implied 2→8 efficiency
    if ab["draws"]:
        best: dict = {}
        for d in ab["draws"]:
            key = f"local[{d['cpus']}]/p{d['partitions']}"
            cell = best.setdefault(key, {"tput": 0, "median_iter_sec": None, "draws": 0})
            if d["edges_per_sec_per_iter"] > cell["tput"]:
                cell["tput"] = d["edges_per_sec_per_iter"]
                cell["median_iter_sec"] = d["median_iter_sec"]
            cell["draws"] += 1
        summ = {"best": best}
        for arm, k2, k8 in (("p64", "local[2]/p64", "local[8]/p64"),
                            ("p=threads", "local[2]/p2", "local[8]/p8")):
            if k2 in best and k8 in best:
                summ[f"eff_2to8_{arm}"] = round(best[k8]["tput"] / (4 * best[k2]["tput"]), 3)
        ab["summary"] = summ
        ab_path.write_text(json.dumps(ab, indent=1))
        print(json.dumps(summ, indent=1))
    if il["rounds"]:
        print(json.dumps(il["rounds"][-args.rounds:], indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
