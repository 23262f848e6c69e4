"""spark-submit entrypoint: one-time edge-table bucketization.

    spark-submit --py-files engine.zip jobs/bucketize_job.py \
        --edges /path --format parquet|text --table NAME --buckets N \
        [--path /explicit/table/location --warehouse /warehouse/dir]

Pays the src hash-shuffle ONCE at ingest and persists it: every later
src-keyed aggregate over the table plans with zero Exchanges, and every
src-keyed join shuffles only the other side (see engine/sources/bucketed.py
and tests/test_plans.py::test_bucketed_*). At 10^12 edges this converts the
biggest recurring shuffle in the system into a one-time write cost.

Prints one JSON line {"table", "buckets", "edges", "wall_sec"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--format", choices=("parquet", "text"), default="parquet")
    ap.add_argument("--table", required=True)
    ap.add_argument("--buckets", type=int, required=True)
    ap.add_argument("--path", default=None, help="explicit table location")
    ap.add_argument("--warehouse", default=None, help="spark.sql.warehouse.dir")
    ap.add_argument(
        "--metastore-dir",
        default=None,
        help="persistent (Hive/Derby) metastore location so later jobs in "
        "other processes can resolve the table; omit for the in-memory "
        "session catalog (same-process use only)",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from engine.session import build_session
    from engine.sources.bucketed import catalog_conf, write_bucketed_edges
    from engine.sources.edges import read_edge_text

    spark = build_session(
        app_name="bucketize-edges",
        master=args.master,
        shuffle_partitions=args.partitions,
        extra_conf=catalog_conf(args.warehouse, args.metastore_dir),
    )
    t0 = time.time()
    if args.format == "text":
        edges = read_edge_text(spark, args.edges)
    else:
        edges = spark.read.parquet(args.edges).select("src", "dst")
    write_bucketed_edges(edges, args.table, buckets=args.buckets, path=args.path)
    n = spark.table(args.table).count()
    print(json.dumps({
        "table": args.table,
        "buckets": args.buckets,
        "edges": n,
        "wall_sec": round(time.time() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
