"""Edge-list text/CSV sources & sinks + golden-output format tooling.

Covers SURVEY §2.1: S1 (edge text scan, pagerank_gpu.cu:41-83), S2 (edge CSV
sink, crawler/crawl.py:59-71), S3 (CUDA-ready txt sink, crawl.py:73-75),
S5/S6 (top-k report format/scan, pagerank_gpu.cu:413-444 /
backend/data/parse_pagerank.py:6,30-37).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

EDGE_SCHEMA = "src LONG, dst LONG"


def read_edge_text(spark: SparkSession, path: str) -> DataFrame:
    """Whitespace-separated int pairs, one per line (fscanf "%d %d",
    pagerank_gpu.cu:53). Duplicates preserved."""
    return (
        spark.read.csv(path, sep=" ", schema=EDGE_SCHEMA)
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )


def num_nodes_from_edges(edges: DataFrame) -> int:
    """n = max id + 1 over both columns (pagerank_gpu.cu:53-65)."""
    row = edges.agg(F.greatest(F.max("src"), F.max("dst")).alias("mx")).collect()[0]
    if row["mx"] is None:
        raise ValueError("empty or invalid edge input")
    return int(row["mx"]) + 1


def validate_edges(edges: DataFrame, n: int) -> DataFrame:
    """Reject out-of-range sources (pagerank_gpu.cu:70-74 aborts; we filter
    with the same predicate — F7)."""
    return edges.filter((F.col("src") >= 0) & (F.col("src") < n))


def write_edge_text(edges: DataFrame, path: str, mode: str = "overwrite") -> None:
    """'src dst' lines (crawler/crawl.py:73-75)."""
    edges.select(F.concat_ws(" ", "src", "dst").alias("value")).write.mode(mode).text(path)


def write_edge_csv(edges_url: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV with header source,target_id (crawler/crawl.py:59-71)."""
    edges_url.select(
        F.col(edges_url.columns[0]).alias("source"),
        F.col(edges_url.columns[1]).alias("target_id"),
    ).write.mode(mode).option("header", True).csv(path)


def format_topk_report(n: int, m: int, dangling_count: int, topk_rows) -> str:
    """Byte-format of the reference output file (pagerank_gpu.cu:420-442).

    topk_rows: iterable of (node_id, rank) already sorted desc.
    """
    lines = [
        "Graph summary:",
        f"  N (nodes) : {n}",
        f"  M (edges) : {m}",
        f"  Dangling nodes: {dangling_count}",
        "",
        f"Top {len(topk_rows)} nodes by PageRank:",
    ]
    for node, rank in topk_rows:
        lines.append(f"  node {node} : {rank:.10f}")
    return "\n".join(lines) + "\n"


# backend/data/parse_pagerank.py:6 / api/main.py:40
TOP_LINE_RE = re.compile(r"node\s+(\d+)\s*:\s*([0-9.eE+-]+)")


def parse_topk_report(spark: SparkSession, path: str) -> DataFrame:
    """Scan a reference-format output file back into (id, score) — S6."""
    lines = spark.read.text(path)
    return (
        lines.select(
            F.regexp_extract("value", TOP_LINE_RE.pattern, 1).alias("id_s"),
            F.regexp_extract("value", TOP_LINE_RE.pattern, 2).alias("score_s"),
        )
        .filter(F.col("id_s") != "")
        .select(
            F.col("id_s").cast("long").alias("id"),
            F.col("score_s").cast("double").alias("score"),
        )
    )
