"""Incremental page-ingest → edge-extraction stream.

Streaming analog of the reference's crawl loop (crawler/core.py:239-318):
instead of a BFS frontier fetching pages, new page files land in the input
directory (Common-Crawl-style dumps arrive in chunks) and each micro-batch
runs the SAME extraction DAG as the batch pipeline — Arrow-UDF parse,
explode, normalize, filters — appending URL-level edges to a Parquet sink.
Exactly-once per input file via the stream checkpoint. Dense-ID encoding
stays a batch step (it needs the global URL dictionary) — run
graph.build_nodes/encode_edges over the accumulated edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from engine.datagen import PAGES_SCHEMA
from engine.operators import graph


def read_pages_stream(
    spark: SparkSession, path: str, max_files: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_extract_edges(
    pages_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    base_domain: str | None = None,
    target_lang: str | None = None,
    available_now: bool = True,
):
    """Start the extraction stream; returns the StreamingQuery.

    Each micro-batch: lang filter → shared-parse extraction → href explode →
    normalize → domain/scheme filters → append (src,dst) URL edges. The
    transformation is the exact batch DAG (graph.extract_pages/
    build_edges_url), so streamed output == batch output over the same files.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        pages = graph.filter_lang(batch_df, target_lang)
        ex = graph.extract_pages(pages)
        eu = graph.build_edges_url(ex, base_domain=base_domain)
        eu.write.mode("append").parquet(out_path)

    writer = (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
