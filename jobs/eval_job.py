"""spark-submit entrypoint: graph/embedding evaluation suite.

    spark-submit --py-files engine.zip jobs/eval_job.py \
        --edges /path --format parquet|text --out /path/outdir \
        [--embeddings /path/embeddings_parquet] [--top-k 100]
        [--test-frac 0.2] [--knn-k 5] [--partitions P --master M]

One JSON (eval.json + stdout) with the measurement suite the analysis
operators exist for:

  linkpred_auc      hash-held-out Adamic-Adar retrieval AUC + coverage gap
  rank_agreement    tie-aware Spearman + top-k Jaccard: out-degree vs the
                    converged PageRank (does degree explain rank here?)
  rank_gini         Lorenz concentration of the converged PageRank mass
  knn_accuracy      leave-one-out k-NN label agreement over --embeddings
                    (skipped when no embeddings table is given)
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
    ap.add_argument("--edges", required=True)
    ap.add_argument("--format", choices=("parquet", "text"), default="parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--embeddings", default=None, help="embeddings parquet (vec_id, embedding, label)")
    ap.add_argument("--top-k", type=int, default=100)
    ap.add_argument("--test-frac", type=float, default=0.2)
    ap.add_argument("--knn-k", type=int, default=5)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from engine.operators.linkpred import link_prediction_auc
    from engine.operators.pagerank import pagerank
    from engine.operators.rankeval import rank_agreement, score_gini
    from engine.session import build_session
    from engine.sources.edges import read_edge_text

    spark = build_session(
        app_name="eval-suite", master=args.master, shuffle_partitions=args.partitions
    )
    t0 = time.time()
    if args.format == "text":
        edges = read_edge_text(spark, args.edges)
    else:
        edges = spark.read.parquet(args.edges).select("src", "dst")
    edges = edges.persist()

    out: dict = {"edges": edges.count()}

    auc = link_prediction_auc(edges, test_frac=args.test_frac).collect()[0]
    out["linkpred_auc"] = {
        "n_candidates": auc["n_candidates"],
        "n_test": auc["n_test"],
        "n_pos": auc["n_pos"],
        "auc": auc["auc"],
    }

    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    res = pagerank(edges, nodes=nodes, tol=args.tol, max_iter=args.max_iter)
    pr = res.ranks.select("id", F.round("rank", 6).alias("rank")).persist()
    od = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    agree = rank_agreement(pr, od, val_a="rank", val_b="deg", top_k=args.top_k).collect()[0]
    out["rank_agreement"] = {
        "n": agree["n"],
        "spearman": agree["spearman"],
        "topk_jaccard": agree["topk_jaccard"],
        "top_k": args.top_k,
    }
    gini = score_gini(pr).collect()[0]
    out["rank_gini"] = gini["gini"]
    out["pagerank_iterations"] = res.iterations

    if args.embeddings:
        from engine.operators.similarity import knn_classify

        emb = spark.read.parquet(args.embeddings)
        cls = knn_classify(emb, k=args.knn_k).persist()
        n = cls.count()
        n_agree = cls.filter("agree").count()
        cls.write.mode("overwrite").parquet(os.path.join(args.out, "knn_labels"))
        out["knn_accuracy"] = {"n": n, "agree": n_agree, "acc": round(n_agree / max(n, 1), 6)}
        cls.unpersist()

    out["wall_sec"] = round(time.time() - t0, 3)
    os.makedirs(args.out, exist_ok=True)
    pr.write.mode("overwrite").parquet(os.path.join(args.out, "ranks"))
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    pr.unpersist()
    edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
