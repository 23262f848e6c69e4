"""Round-5 banking of the 2→8 same-window paired shuffle draws
(VERDICT r4 item #5: "more quiet-window draws can only tighten the
existence bound upward — no engine work expected").

Each round runs ONLY the pair that matters — shuffle local[2]/p64
immediately followed by shuffle local[8]/p64 on the same 50M-edge table —
so a round costs ~1/3 of a full interleave_ab round and the window stays
(mostly) fixed within the pair. Draws are appended to the same banks the
r4 harness used (`ab_partitions.json` for the paired table,
`results.json` for the best-per-cell scaling summary), plus a round log
in `paired_2_8_r5.json`.

Run on an otherwise-idle box: `python BENCH/bank_pairs_r5.py --rounds 15`.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

BENCH = Path(__file__).resolve().parent
sys.path.insert(0, str(BENCH))

from interleave_ab import engine_draw, _load  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=15)
    ap.add_argument("--deadline-ts", type=float, default=None,
                    help="stop starting new rounds after this unix time")
    args = ap.parse_args(argv)

    ab_path = BENCH / "ab_partitions.json"
    res_path = BENCH / "results.json"
    log_path = BENCH / "paired_2_8_r5.json"
    ab = _load(ab_path, {"draws": []})
    log = _load(log_path, {"rounds": []})

    for r in range(args.rounds):
        if args.deadline_ts and time.time() > args.deadline_ts:
            print(f"deadline reached after {r} rounds", file=sys.stderr)
            break
        print(f"== paired round {r + 1}/{args.rounds}", file=sys.stderr)
        e2 = engine_draw(2, 64)
        e8 = engine_draw(8, 64)
        eff = round(e8["edges_per_sec_per_iter"] / (4 * e2["edges_per_sec_per_iter"]), 3)
        print(f"  paired 2→8 efficiency: {eff}", file=sys.stderr)
        log["rounds"].append(
            {
                "e2": e2["edges_per_sec_per_iter"],
                "e8": e8["edges_per_sec_per_iter"],
                "eff": eff,
                "ts": round(time.time(), 1),
            }
        )
        ab["draws"].append(e2)
        ab["draws"].append(e8)
        res = json.loads(res_path.read_text())
        for rec in (e2, e8):
            clean = {k: v for k, v in rec.items() if k not in ("partitions", "ts")}
            res["all_trials"].append(clean)
        res_path.write_text(json.dumps(res, indent=1))
        ab_path.write_text(json.dumps(ab, indent=1))
        log_path.write_text(json.dumps(log, indent=1))

    effs = sorted(x["eff"] for x in log["rounds"])
    if effs:
        import statistics

        print(
            json.dumps(
                {
                    "r5_rounds": len(log["rounds"]),
                    "median_eff": round(statistics.median(effs), 3),
                    "max_eff": effs[-1],
                    "ge_0.7": sum(1 for x in effs if x >= 0.7),
                    "ge_0.8": sum(1 for x in effs if x >= 0.8),
                }
            )
        )


if __name__ == "__main__":
    main()
