"""Append the r5 paired 2→8 rounds (BENCH/paired_2_8_r5.json) to the
same-window paired-efficiency table in BENCH/BASELINE.md and refresh the
median/frequency summary line over ALL rounds (r4's 30 + r5's).

Idempotent: rewrites the whole table section from the r4 rows embedded in
the markdown plus the r5 bank, so re-running after more rounds is safe.
"""

from __future__ import annotations

import json
import re
import statistics
from pathlib import Path

BENCH = Path(__file__).resolve().parent
MD = BENCH / "BASELINE.md"


def main():
    log = json.loads((BENCH / "paired_2_8_r5.json").read_text())
    r5 = log["rounds"]
    text = MD.read_text()

    # parse the existing table rows (r4 rounds are the |1|..|30| block)
    sect_start = text.index("### Same-window paired efficiency")
    sect_end = text.index("### Per-window correlation")
    section = text[sect_start:sect_end]
    rows = re.findall(
        r"^\| (\d+) \| ([\d,]+) \| ([\d,]+) \| ([\d.]+) \|$", section, re.M
    )
    r4_rows = [
        (int(a), int(b.replace(",", "")), int(c.replace(",", "")), float(d))
        for a, b, c, d in rows
        if int(a) <= 30
    ]
    all_effs = [r[3] for r in r4_rows] + [x["eff"] for x in r5]

    lines = [
        "### Same-window paired efficiency — the 2→8 pair without window mixing",
        "",
        "The banked pair above divides the best local[8] draw by the best local[2]",
        "draw, which usually come from DIFFERENT host windows — steal in either",
        "window biases the ratio. Each harness round runs the two cells",
        "back-to-back, so pairing within a round holds the window (mostly) fixed",
        "(rounds 1-30 banked in r4 via interleave_ab.py; rounds 31+ banked in r5",
        "via bank_pairs_r5.py — same engine build per batch, pair-only rounds):",
        "",
        "| round | local[2] e/s/iter | local[8] e/s/iter | paired 2→8 efficiency |",
        "|---|---|---|---|",
    ]
    for i, (rnd, e2, e8, eff) in enumerate(r4_rows, start=1):
        lines.append(f"| {i} | {e2:,} | {e8:,} | {eff:.3f} |")
    for j, x in enumerate(r5, start=len(r4_rows) + 1):
        lines.append(f"| {j} | {round(x['e2']):,} | {round(x['e8']):,} | {x['eff']:.3f} |")

    n = len(all_effs)
    med = statistics.median(all_effs)
    ge7 = sum(1 for e in all_effs if e >= 0.7)
    ge8 = sum(1 for e in all_effs if e >= 0.8)
    mx = max(all_effs)
    lines += [
        "",
        f"Median paired efficiency {med:.3f}, max {mx:.3f} over {n}",
        f"rounds ({ge7} rounds ≥ 0.7, {ge8} rounds ≥ 0.8). The spread",
        "matches the documented steal magnitude, and the existence of",
        f"windows at {mx:.3f} shows **no engine mechanism caps this pair below",
        "0.8** — a genuine serialization bottleneck would bind in every window,",
        "quiet or not. (A single paired draw can also overshoot when its",
        "local[2] half caught steal, so the claim drawn here is the existence",
        "bound plus the ≥0.7 frequency, not any one round's number.)",
        "",
        "",
    ]
    MD.write_text(text[:sect_start] + "\n".join(lines) + text[sect_end:])
    print(f"updated: {n} rounds, median {med:.3f}, max {mx:.3f}, ge0.7 {ge7}, ge0.8 {ge8}")


if __name__ == "__main__":
    main()
