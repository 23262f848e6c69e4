"""spark-submit entrypoint: incremental page ingest → URL-edge extraction.

Streaming analog of the batch pipeline's extraction front half: watch a
pages-Parquet directory, extract edges from each arriving chunk, append to a
Parquet edge sink with exactly-once-per-file semantics.

    spark-submit --py-files engine.zip jobs/ingest_job.py \
        --pages /path/pages_parquet --out /path/edges_out \
        --checkpoint /path/ck [--base-domain example.org --lang en \
        --max-files 4 --continuous]

Default is a drain-and-stop run (availableNow); --continuous keeps the
stream running for new files until killed (state survives in --checkpoint).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--base-domain", default=None)
    ap.add_argument("--lang", default=None)
    ap.add_argument("--max-files", type=int, default=4)
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from engine.session import build_session
    from engine.streaming import ingest

    spark = build_session(
        app_name="edge-ingest", master=args.master, shuffle_partitions=args.partitions
    )
    stream = ingest.read_pages_stream(spark, args.pages, max_files=args.max_files)
    q = ingest.stream_extract_edges(
        stream,
        args.out,
        args.checkpoint,
        base_domain=args.base_domain,
        target_lang=args.lang,
        available_now=not args.continuous,
    )
    q.awaitTermination()
    n = spark.read.parquet(args.out).count()
    print(f'{{"edges_total": {n}}}')
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
