"""Golden-file parity runner: reproduce every committed reference output.

Checks the engine against all three reference goldens (SURVEY §5):
  backend/output.txt        N=4     (graph reconstructed from the fixed point)
  backend/output_1k.txt     N=1000  (input backend/data/random_1k_10k.txt)
  backend/jobs/output.txt   N=5000  (input backend/jobs/input.txt)

For the file-backed goldens the engine reads the committed edge list, runs
PageRank with the reference CLI defaults (alpha=0.85, tol=1e-8, max_iter=100,
pagerank_gpu.cu:367-370) and compares every top-10 score to 10 decimal places
— i.e. to the precision the reference printed (%.10f, cu:441).

Usage: python tools/golden_parity.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path("/root/reference/backend")
LINE = re.compile(r"node\s+(\d+)\s*:\s*([0-9.eE+-]+)")


def parse_golden(path: Path):
    return [(int(m.group(1)), float(m.group(2))) for m in LINE.finditer(path.read_text())]


# Reconstructed 4-node graph for backend/output.txt (the committed
# backend/data/edges.txt is a different, larger graph): the unique simple
# 6-edge digraph with the published symmetric fixed point
# r0=r2=0.3245614030, r1=r3=0.1754385970 at alpha=0.85:
EDGES_4 = [(0, 1), (0, 2), (1, 2), (2, 3), (2, 0), (3, 0)]


def main() -> int:
    from engine.operators.pagerank import pagerank, top_k
    from engine.session import build_session
    from engine.sources.edges import format_topk_report, read_edge_text

    spark = build_session(app_name="golden-parity", master="local[8]", shuffle_partitions=8)
    failures = 0

    cases = [
        ("output.txt (N=4)", None, EDGES_4, REF / "output.txt", 4),
        ("output_1k.txt (N=1000)", REF / "data/random_1k_10k.txt", None, REF / "output_1k.txt", 10),
        ("jobs/output.txt (N=5000)", REF / "jobs/input.txt", None, REF / "jobs/output.txt", 10),
    ]
    for name, infile, inline_edges, golden_path, k in cases:
        if infile is not None:
            edges = read_edge_text(spark, str(infile))
        else:
            edges = spark.createDataFrame(inline_edges, "src long, dst long")
        res = pagerank(edges, alpha=0.85, tol=1e-8, max_iter=100)
        got = [(r.id, r.rank) for r in top_k(res.ranks, k).collect()]
        golden = parse_golden(golden_path)
        ok = True
        gmap = dict(golden)
        for gid, gscore in gmap.items():
            mine = dict(got).get(gid)
            if mine is None or abs(mine - gscore) >= 5e-10:
                print(f"  MISMATCH node {gid}: golden={gscore} engine={mine}")
                ok = False
        # byte-format check: engine's formatter reproduces the printed lines
        report = format_topk_report(res.num_nodes, res.num_edges, 0, got)
        for gid, gscore in golden:
            want = f"  node {gid} : {gscore:.10f}"
            if want not in report:
                print(f"  FORMAT MISS: {want!r}")
                ok = False
        print(f"{'OK  ' if ok else 'FAIL'} {name}: {res.iterations} iters, "
              f"delta={res.final_delta:.2e}")
        failures += 0 if ok else 1

    spark.stop()
    print("ALL GOLDEN PARITY PASS" if not failures else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
