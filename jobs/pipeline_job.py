"""spark-submit entrypoint: full corpus pipeline (SURVEY §3.1 as ONE Spark job).

The reference runs this as four processes stitched with scp/ssh
(api/build_corpus.py:268-299: crawl → encode → remote CUDA pagerank → parse).
Here it is one declarative DAG plus the iterative rank loop:

    pages Parquet (url, warc_ts, html, text, lang)
      → Arrow-UDF extraction (text + hrefs, one shared parse)
      → explode / normalize / same-domain + scheme filters
      → dense node ids → encoded (src, dst) edge table   [written]
      → PageRank to tol                                   [ranks written]
      → ranks ⋈ nodes, sorted desc                        [pagerank.json analog]

    spark-submit --py-files engine.zip jobs/pipeline_job.py \
        --pages /path/pages_parquet --out /path/outdir \
        [--gen-pages 5000 --lang en --alpha 0.85 --tol 1e-6 --max-iter 100]

With --gen-pages N (no --pages), the deterministic synthetic Common-Crawl-style
table is generated distributed (engine/datagen.py) first — no external data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default=None, help="input pages parquet dir")
    ap.add_argument("--gen-pages", type=int, default=0, help="generate N synthetic pages instead")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    ap.add_argument("--lang", default=None, help="language filter prefix (e.g. en)")
    ap.add_argument("--base-domain", default=None, help="same-domain filter (last two labels)")
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--top-k", type=int, default=100000)  # api/build_corpus.py:104
    ap.add_argument(
        "--near-dedupe", action="store_true",
        help="MinHash-LSH near-dup pass over the extracted corpus text: "
        "writes surviving docs to <out>/pages_dedup and records the "
        "hot-bucket cap drop counts in summary.json (no silent caps)",
    )
    ap.add_argument("--dedupe-threshold", type=float, default=0.8)
    ap.add_argument(
        "--dedupe-max-bucket", type=int, default=None,
        help="LSH hot-bucket cap (default: engine MAX_BUCKET_SIZE)",
    )
    ap.add_argument(
        "--host-ranks", action="store_true",
        help="also write <out>/host_ranks: host-level graph rollup + "
        "weighted PageRank over the extracted URL edges",
    )
    ap.add_argument(
        "--quality-filter", action="store_true",
        help="Gopher/C4-style map-only quality gate over the extracted "
        "corpus: writes kept docs to <out>/pages_quality and records "
        "kept/dropped plus per-reason drop counts in summary.json",
    )
    ap.add_argument(
        "--scrub-pii", action="store_true",
        help="PII anonymization over the extracted corpus: writes scrubbed "
        "docs to <out>/pages_scrubbed and records email/phone/IP removal "
        "counts in summary.json",
    )
    ap.add_argument(
        "--decontaminate", default=None, metavar="BENCH_PARQUET",
        help="benchmark decontamination: parquet dir with a 'text' column; "
        "writes per-doc contamination flags to <out>/contamination and "
        "records contaminated/clean counts in summary.json",
    )
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from engine import datagen
    from engine.operators import graph
    from engine.operators.pagerank import pagerank
    from engine.session import build_session

    spark = build_session(
        app_name="corpus-pipeline", master=args.master, shuffle_partitions=args.partitions
    )
    t_start = time.time()

    if args.pages:
        pages = spark.read.parquet(args.pages)
        base_domain = args.base_domain
    else:
        if not args.gen_pages:
            ap.error("need --pages or --gen-pages")
        pages = datagen.generate_pages_df(spark, args.gen_pages, seed=args.seed)
        base_domain = args.base_domain or datagen.BASE_DOMAIN

    pages = graph.filter_lang(pages, args.lang)

    extracted = graph.extract_pages(pages).persist()
    edges_url = graph.build_edges_url(extracted, base_domain=base_domain)
    nodes = graph.build_nodes(pages.select("url"), edges_url).persist()
    edges = graph.encode_edges(edges_url, nodes).persist()

    os.makedirs(args.out, exist_ok=True)
    # pages.json analog: extracted corpus (id, url, text)
    extracted.join(nodes, "url").select("id", "url", "text").write.mode(
        "overwrite"
    ).parquet(os.path.join(args.out, "pages"))
    nodes.write.mode("overwrite").parquet(os.path.join(args.out, "nodes"))
    graph.dedupe_edges(edges).write.mode("overwrite").parquet(
        os.path.join(args.out, "edges")
    )
    t_extract = time.time()

    dedupe_metrics: dict = {}
    if args.near_dedupe:
        # training-data near-dedupe over the extracted corpus (not the
        # graph): MinHash -> capped LSH banding -> exact-Jaccard verify ->
        # CC min-rep survivors. metrics={} threads the cap drop counts into
        # the manifest — the library's no-silent-caps rule applied to the
        # flagship pipeline itself.
        from engine.operators import dedupe as dedupe_ops
        from engine.operators._pins import pin_scope

        corpus = extracted.join(nodes, "url").select("id", "url", "text")
        cap = (
            args.dedupe_max_bucket
            if args.dedupe_max_bucket is not None
            else dedupe_ops.MAX_BUCKET_SIZE
        )
        with pin_scope():
            pairs = dedupe_ops.minhash_lsh_dedupe_pairs(
                corpus, id_col="id", text_col="text",
                threshold=args.dedupe_threshold,
                max_bucket_size=cap, metrics=dedupe_metrics,
            ).persist()
            dedupe_metrics["near_dup_pairs"] = pairs.count()
            survivors = dedupe_ops.drop_near_duplicates(corpus, pairs, id_col="id")
            survivors.write.mode("overwrite").parquet(
                os.path.join(args.out, "pages_dedup")
            )
            pairs.unpersist()
        dedupe_metrics["survivors"] = (
            spark.read.parquet(os.path.join(args.out, "pages_dedup")).count()
        )
        dedupe_metrics["threshold"] = args.dedupe_threshold
        dedupe_metrics["max_bucket_size"] = cap

    quality_metrics: dict = {}
    if args.quality_filter:
        # map-only keep/drop gate (zero shuffles for the gate itself); the
        # per-reason drop counts go into the manifest so no document is
        # silently dropped without an attributable rule
        from engine.operators import textstats

        corpus = extracted.join(nodes, "url").select("id", "url", "text")
        gated = textstats.quality_filter(corpus, id_col="id").persist()
        corpus.join(
            gated.where("keep").select("id"), "id", "left_semi"
        ).write.mode("overwrite").parquet(os.path.join(args.out, "pages_quality"))
        quality_metrics["kept"] = gated.where("keep").count()
        quality_metrics["dropped"] = gated.where("NOT keep").count()
        quality_metrics["drop_reasons"] = {
            r["reasons"]: r["n"]
            for r in gated.where("NOT keep")
            .groupBy("reasons")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        gated.unpersist()

    pii_metrics: dict = {}
    if args.scrub_pii:
        # map-only anonymization pass; removal counts to the manifest so
        # nothing is scrubbed silently
        from engine.operators import textstats

        corpus = extracted.join(nodes, "url").select("id", "url", "text")
        scrubbed = textstats.scrub_pii(corpus, id_col="id")
        scrubbed.write.mode("overwrite").parquet(
            os.path.join(args.out, "pages_scrubbed")
        )
        row = (
            spark.read.parquet(os.path.join(args.out, "pages_scrubbed"))
            .agg(
                F.sum("n_emails").alias("e"),
                F.sum("n_phones").alias("p"),
                F.sum("n_ips").alias("i"),
                F.count(F.lit(1)).alias("n"),
            )
            .first()
        )
        pii_metrics = {
            "docs": int(row["n"]),
            "emails_scrubbed": int(row["e"] or 0),
            "phones_scrubbed": int(row["p"] or 0),
            "ips_scrubbed": int(row["i"] or 0),
        }

    contamination_metrics: dict = {}
    if args.decontaminate:
        # GPT-3 Appendix C n-gram train-test overlap vs the supplied
        # benchmark table; flags written per doc, counts to the manifest
        from engine.operators import dedupe as dedupe_ops

        corpus = extracted.join(nodes, "url").select("id", "url", "text")
        bench = spark.read.parquet(args.decontaminate).select("text")
        flags = dedupe_ops.decontaminate(corpus, bench, id_col="id")
        flags.write.mode("overwrite").parquet(os.path.join(args.out, "contamination"))
        written = spark.read.parquet(os.path.join(args.out, "contamination"))
        contamination_metrics["contaminated"] = written.where("contaminated").count()
        contamination_metrics["clean"] = written.where("NOT contaminated").count()

    res = pagerank(
        edges,
        nodes=nodes.select("id"),
        alpha=args.alpha,
        tol=args.tol,
        max_iter=args.max_iter,
        checkpoint_dir=os.path.join(args.out, "checkpoints"),
        num_partitions=args.partitions,
    )
    # pagerank.json analog: (id, url, score) sorted desc, Σ=1
    # (parse_pagerank.py:43-68 semi-join + renormalize + sort)
    scored = (
        res.ranks.join(nodes, "id")
        .select("id", "url", F.col("rank").alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(args.top_k)
    )
    scored.write.mode("overwrite").parquet(os.path.join(args.out, "pagerank"))
    t_rank = time.time()

    host_summary: dict = {}
    if args.host_ranks:
        # Common Crawl-style host-graph artifact: rollup + weighted
        # PageRank over the same URL edge table (intra-host links dropped
        # — they reward navigation templates, not endorsement)
        hr = graph.host_pagerank(
            edges_url, alpha=args.alpha, tol=args.tol, max_iter=args.max_iter
        ).orderBy(F.desc("rank"), F.asc("host"))
        hr.write.mode("overwrite").parquet(os.path.join(args.out, "host_ranks"))
        host_summary["hosts"] = (
            spark.read.parquet(os.path.join(args.out, "host_ranks")).count()
        )

    summary = {
        "pages": pages.count(),
        "nodes": res.num_nodes,
        "edges": res.num_edges,
        "iterations": res.iterations,
        "converged": res.converged,
        "final_delta": res.final_delta,
        "extract_sec": round(t_extract - t_start, 3),
        "rank_sec": round(t_rank - t_extract, 3),
        "iterate_wall_sec": round(sum(m["wall_sec"] for m in res.metrics), 3),
    }
    if dedupe_metrics:
        summary["dedupe_metrics"] = dedupe_metrics
    if host_summary:
        summary["host_ranks"] = host_summary
    if quality_metrics:
        summary["quality_filter"] = quality_metrics
    if pii_metrics:
        summary["pii_scrub"] = pii_metrics
    if contamination_metrics:
        summary["contamination"] = contamination_metrics
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({**summary, "metrics": res.metrics}, f, indent=1)
    print(json.dumps(summary))

    extracted.unpersist()
    nodes.unpersist()
    edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
