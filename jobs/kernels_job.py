"""spark-submit entrypoint: graph kernels over an edge table.

    spark-submit --py-files engine.zip jobs/kernels_job.py \
        --edges /path --format parquet|text --out /path/outdir \
        [--kernels cc,lp,tri --max-iter 50 --partitions P --checkpoint-dir DIR]

Writes one Parquet per kernel plus kernels.json with iteration/convergence
metadata:
  cc/   (id, component)   large-star/small-star connected components
  lp/   (id, label)       synchronous label propagation (min tie-break)
  tri/  (triangles)       sorted-adjacency triangle count
  kcore/ (id, degree)     k-core peel survivors (--kcore-k, default 3)
  coreness/ (id, core)    exact core numbers (h-index iteration)
  scc/   (id, label)      strongly connected components (trim + FB coloring)
  salsa/ (id, hub, authority)  SALSA stochastic hub/authority chains
  bowtie/ (id, region)    Broder CORE/IN/OUT/TENDRIL/DISCONNECTED regions
  condense/ (src_comp, dst_comp, weight) + dag_levels/ (id, level)
                          SCC condensation DAG and its scheduling levels
  wlp/   (id, label)      WEIGHTED label propagation (multiplicity votes)
  simrank/ (a, b, s)      truncated SimRank pairs (--simrank-iters, with a
                          disclosed --simrank-max-fanout pivot cap and
                          --simrank-min-sim state pruning)
  louvain/ (id, label)    multi-level Louvain communities
                          (--louvain-levels / --louvain-rounds)

--edges-table reads a bucketed catalog table (engine/sources/bucketed.py,
written by jobs/bucketize_job.py) instead of --edges: the src-clustering
is then satisfied by the scan and no kernel re-shuffles the raw edges.
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
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--edges")
    g.add_argument("--edges-table", help="bucketed catalog table (see jobs/bucketize_job.py)")
    ap.add_argument("--format", choices=("parquet", "text"), default="parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--kernels", default="cc,lp,tri")
    ap.add_argument("--kcore-k", type=int, default=3)
    ap.add_argument("--simrank-iters", type=int, default=2)
    ap.add_argument("--simrank-max-fanout", type=int, default=1000,
                    help="simrank: exclude pivots with out-fan above this (disclosed in kernels.json)")
    ap.add_argument("--simrank-min-sim", type=float, default=0.0,
                    help="simrank: prune carried pairs below this between rounds")
    ap.add_argument("--louvain-levels", type=int, default=2)
    ap.add_argument("--louvain-rounds", type=int, default=5,
                    help="louvain: synchronous gain rounds per level")
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--checkpoint-dir", default=None, help="resume CC/LP from snapshots under DIR/cc, DIR/lp")
    ap.add_argument("--warehouse", default=None, help="with --edges-table: spark.sql.warehouse.dir")
    ap.add_argument("--metastore-dir", default=None, help="with --edges-table: persistent metastore written by bucketize_job")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from engine.operators.components import connected_components
    from engine.operators.labelprop import label_propagation
    from engine.operators.triangles import triangle_count
    from engine.session import build_session
    from engine.sources.edges import read_edge_text

    from engine.sources.bucketed import catalog_conf

    spark = build_session(
        app_name="graph-kernels",
        master=args.master,
        shuffle_partitions=args.partitions,
        extra_conf=catalog_conf(args.warehouse, args.metastore_dir),
    )
    if args.edges_table:
        from engine.sources.bucketed import read_bucketed_edges

        edges = read_bucketed_edges(spark, args.edges_table).select("src", "dst")
    elif args.format == "text":
        edges = read_edge_text(spark, args.edges)
    else:
        edges = spark.read.parquet(args.edges).select("src", "dst")
    edges = edges.persist()
    m = edges.count()

    os.makedirs(args.out, exist_ok=True)
    meta = {"edges": m}
    wanted = set(args.kernels.split(","))

    if "cc" in wanted:
        t0 = time.time()
        cc_ck = os.path.join(args.checkpoint_dir, "cc") if args.checkpoint_dir else None
        cc = connected_components(edges, max_rounds=args.max_iter, checkpoint_dir=cc_ck)
        cc.write.mode("overwrite").parquet(os.path.join(args.out, "cc"))
        meta["cc_sec"] = round(time.time() - t0, 3)
    if "lp" in wanted:
        t0 = time.time()
        lp_ck = os.path.join(args.checkpoint_dir, "lp") if args.checkpoint_dir else None
        lp = label_propagation(edges, max_iter=args.max_iter, checkpoint_dir=lp_ck)
        lp.write.mode("overwrite").parquet(os.path.join(args.out, "lp"))
        meta["lp_sec"] = round(time.time() - t0, 3)
    if "wlp" in wanted:
        # weighted LP: votes are the raw parallel-edge multiplicities
        from pyspark.sql import functions as F

        t0 = time.time()
        e_w = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
        wlp = label_propagation(e_w, max_iter=args.max_iter, weight_col="w")
        wlp.write.mode("overwrite").parquet(os.path.join(args.out, "wlp"))
        meta["wlp_sec"] = round(time.time() - t0, 3)
    if "tri" in wanted:
        from engine.operators._pins import pin_scope

        t0 = time.time()
        with pin_scope():  # frees the pinned adjacency after the writes
            tri = triangle_count(edges)
            tri.write.mode("overwrite").parquet(os.path.join(args.out, "tri"))
            meta["triangles"] = tri.collect()[0][0]
        meta["tri_sec"] = round(time.time() - t0, 3)

    if "kcore" in wanted:
        from engine.operators._pins import pin_scope
        from engine.operators.kcore import kcore

        t0 = time.time()
        kc_metrics: dict = {}
        with pin_scope():
            kc = kcore(edges, args.kcore_k, metrics=kc_metrics)
            kc.write.mode("overwrite").parquet(os.path.join(args.out, "kcore"))
        meta["kcore_k"] = args.kcore_k
        meta["kcore_rounds"] = len(kc_metrics.get("kcore_rounds", []))
        meta["kcore_sec"] = round(time.time() - t0, 3)
    if "scc" in wanted:
        from engine.operators._pins import pin_scope
        from engine.operators.scc import strongly_connected_components

        t0 = time.time()
        scc_metrics: list = []
        with pin_scope():
            sc = strongly_connected_components(
                edges, max_outer=args.max_iter, metrics=scc_metrics
            )
            sc.write.mode("overwrite").parquet(os.path.join(args.out, "scc"))
        meta["scc_outer_rounds"] = len(scc_metrics)
        meta["scc_metrics"] = scc_metrics
        meta["scc_sec"] = round(time.time() - t0, 3)
    if "coreness" in wanted:
        from engine.operators._pins import pin_scope
        from engine.operators.kcore import core_numbers

        t0 = time.time()
        cn_metrics: dict = {}
        with pin_scope():
            cn = core_numbers(edges, max_iter=args.max_iter, metrics=cn_metrics)
            cn.write.mode("overwrite").parquet(os.path.join(args.out, "coreness"))
        meta["coreness_rounds"] = len(cn_metrics.get("coreness_rounds", []))
        meta["coreness_sec"] = round(time.time() - t0, 3)

    if "salsa" in wanted:
        from engine.operators.salsa import salsa

        t0 = time.time()
        res = salsa(edges, max_iter=args.max_iter)
        res.scores.write.mode("overwrite").parquet(os.path.join(args.out, "salsa"))
        meta["salsa_iterations"] = res.iterations
        meta["salsa_converged"] = res.converged
        meta["salsa_sec"] = round(time.time() - t0, 3)
    if "bowtie" in wanted:
        from engine.operators.bowtie import bowtie_classification

        t0 = time.time()
        bt = bowtie_classification(edges, max_depth=args.max_iter)
        bt.write.mode("overwrite").parquet(os.path.join(args.out, "bowtie"))
        meta["bowtie_sec"] = round(time.time() - t0, 3)
    if "condense" in wanted:
        from engine.operators.bowtie import dag_levels
        from engine.operators.scc import condensation

        t0 = time.time()
        dag = condensation(edges, max_outer=args.max_iter)
        dag.write.mode("overwrite").parquet(os.path.join(args.out, "condense"))
        lv = dag_levels(
            dag.select(
                dag.src_comp.alias("src"), dag.dst_comp.alias("dst")
            ),
            max_depth=max(args.max_iter, 100),
        )
        lv.write.mode("overwrite").parquet(os.path.join(args.out, "dag_levels"))
        meta["condense_sec"] = round(time.time() - t0, 3)

    if "mis" in wanted:
        from engine.operators.mis import maximal_independent_set

        t0 = time.time()
        mis_metrics: list = []
        mi = maximal_independent_set(edges, max_rounds=args.max_iter, metrics=mis_metrics)
        mi.write.mode("overwrite").parquet(os.path.join(args.out, "mis"))
        meta["mis_rounds"] = len(mis_metrics)
        meta["mis_sec"] = round(time.time() - t0, 3)
    if "matching" in wanted:
        from engine.operators.matching import maximal_matching

        t0 = time.time()
        mm_metrics: list = []
        mm = maximal_matching(edges, max_rounds=args.max_iter, metrics=mm_metrics)
        mm.write.mode("overwrite").parquet(os.path.join(args.out, "matching"))
        meta["matching_rounds"] = len(mm_metrics)
        meta["matching_sec"] = round(time.time() - t0, 3)
    if "coloring" in wanted:
        from engine.operators.coloring import greedy_coloring

        t0 = time.time()
        col_metrics: list = []
        col = greedy_coloring(edges, max_rounds=max(args.max_iter, 200), metrics=col_metrics)
        col.write.mode("overwrite").parquet(os.path.join(args.out, "coloring"))
        meta["coloring_rounds"] = len(col_metrics)
        meta["coloring_sec"] = round(time.time() - t0, 3)
    if "simrank" in wanted:
        from engine.operators.simrank import simrank

        t0 = time.time()
        sr_metrics: dict = {}
        sr = simrank(
            edges,
            iterations=args.simrank_iters,
            max_fanout=args.simrank_max_fanout,
            min_sim=args.simrank_min_sim,
            metrics=sr_metrics,
        )
        sr.write.mode("overwrite").parquet(os.path.join(args.out, "simrank"))
        meta.update({f"sr_{k}": v for k, v in sr_metrics.items()})
        meta["simrank_iterations"] = args.simrank_iters
        meta["simrank_sec"] = round(time.time() - t0, 3)
    if "louvain" in wanted:
        from engine.operators.louvain import louvain

        t0 = time.time()
        lv_metrics: dict = {}
        lu = louvain(
            edges,
            levels=args.louvain_levels,
            rounds_per_level=args.louvain_rounds,
            metrics=lv_metrics,
        )
        lu.write.mode("overwrite").parquet(os.path.join(args.out, "louvain"))
        meta["louvain_levels"] = [
            lvl.get("rounds", []) for lvl in lv_metrics.get("levels", [])
        ]
        meta["louvain_sec"] = round(time.time() - t0, 3)
    if "densest" in wanted:
        from engine.operators.densest import densest_subgraph

        t0 = time.time()
        dn_metrics: list = []
        dn = densest_subgraph(edges, max_rounds=max(args.max_iter, 200), metrics=dn_metrics)
        dn.write.mode("overwrite").parquet(os.path.join(args.out, "densest"))
        best = max(dn_metrics, key=lambda e: (e["density"], -e["round"]))
        meta["densest_best_density"] = round(best["density"], 6)
        meta["densest_best_round"] = best["round"]
        meta["densest_rounds"] = len(dn_metrics)
        meta["densest_sec"] = round(time.time() - t0, 3)

    with open(os.path.join(args.out, "kernels.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))
    edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
