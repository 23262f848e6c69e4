"""Incremental page-ingest → edge-extraction stream.

Streaming analog of the reference's crawl loop (crawler/core.py:239-318):
instead of a BFS frontier fetching pages, new page files land in the input
directory (Common-Crawl-style dumps arrive in chunks) and each micro-batch
runs the SAME extraction DAG as the batch pipeline — Arrow-UDF parse,
explode, normalize, filters — writing URL-level edges through the streaming
parquet file sink. Exactly-once per input file: the source checkpoint dedups
input files AND the sink's _spark_metadata commit log makes each batch's
write atomic (a retried batch never double-appends). Dense-ID encoding
stays a batch step (it needs the global URL dictionary) — run
graph.build_nodes/encode_edges over the accumulated edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from engine.datagen import PAGES_SCHEMA
from engine.operators import graph


def _guard_fresh_sink_dir(spark: SparkSession, out_path: str) -> None:
    """Fail fast on an upgraded-in-place output directory: batch readers of a
    streaming-file-sink directory resolve files through _spark_metadata, so
    parquet files written to out_path by anything OTHER than this sink (e.g.
    a plain batch append) are invisible to them — silent data loss. The sink
    output directory must be fresh or already a file-sink directory."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(out_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return
    if fs.exists(jvm.org.apache.hadoop.fs.Path(out_path + "/_spark_metadata")):
        return
    # RECURSIVE listing: a pre-existing PARTITIONED batch output nests its
    # parquet under key=value subdirectories — a top-level-only check would
    # pass it and those files would stay invisible to log-aware readers
    # (exactly the silent-loss case this guard exists for)
    it = fs.listFiles(path, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if name.endswith(".parquet") or name.endswith(".orc"):
            raise ValueError(
                f"streaming sink target {out_path!r} already holds data files "
                "with no _spark_metadata commit log: those files would be "
                "invisible to log-aware readers. Use a fresh directory, or "
                "migrate the existing files into the metadata log first."
            )


def read_pages_stream(
    spark: SparkSession, path: str, max_files: int = 4
) -> DataFrame:
    # fail fast on a wrong-shaped input: a streaming reader with an explicit
    # schema silently null-fills columns the parquet files don't have, so
    # pointing this at e.g. an already-EXTRACTED (id, url, text) table would
    # "work" and yield zero edges. One footer-metadata-only batch read.
    try:
        have = set(spark.read.parquet(path).columns)
    except Exception:
        have = None  # empty/not-yet-created dir: legitimate for continuous mode
    if have is not None:
        from pyspark.sql.types import StructType

        missing = {f.name for f in StructType.fromDDL(PAGES_SCHEMA).fields} - have
        if missing:
            raise ValueError(
                f"pages stream source {path!r} is missing column(s) "
                f"{sorted(missing)}: expected a RAW pages table "
                "(url, warc_ts, html, text, lang) — e.g. datagen output, "
                "not an extracted/derived table"
            )
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

    _guard_fresh_sink_dir(pages_stream.sparkSession, out_path)

    pages = graph.filter_lang(pages_stream, target_lang)
    ex = graph.extract_pages(pages)
    eu = graph.build_edges_url(ex, base_domain=base_domain)

    # Streaming parquet FILE SINK, not foreachBatch+append: the sink's
    # _spark_metadata commit log makes the write transactional per batch —
    # a micro-batch retried after a partial/unacknowledged write replaces its
    # uncommitted files instead of appending duplicates (true exactly-once;
    # a plain append in foreachBatch is only at-least-once). Batch readers of
    # out_path go through the same log and see only committed files.
    writer = (
        eu.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def trending_targets(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    base_domain: str | None = None,
) -> DataFrame:
    """Windowed inbound-link counts per target host — the crawl-stream
    "trending pages" measurement (which hosts are suddenly being linked
    to, per event-time window of the crawl).

    Each page contributes its extracted edges at its `warc_ts` event time
    (the same Arrow-UDF parse + resolve + scheme filters as the edge
    pipeline, crawler/core.py:296-310 order); targets collapse to hosts
    (the domain_graph rollup notion). Returns
    (window_epoch BIGINT, dst_host STRING, links BIGINT).

    ONE function serves both modes: on a streaming pages source the
    watermarked windowed aggregate maintains O(open windows × hosts)
    state and drops crawl chunks later than `watermark`; on a batch pages
    table `withWatermark` is a no-op and the same plan is the parity
    oracle form (stream==batch asserted in tests)."""
    from pyspark.sql import functions as F

    from engine.functions.udfs import (
        base_domain_udf,
        extract_page_udf,
        resolve_href_udf,
    )

    e = (
        pages.select("url", "warc_ts", extract_page_udf(F.col("html")).alias("ex"))
        .select("url", "warc_ts", F.explode("ex.hrefs").alias("href"))
        .withColumn("dst", resolve_href_udf(F.col("url"), F.col("href")))
        .filter(
            ~F.col("dst").startswith("mailto:")
            & ~F.col("dst").startswith("javascript:")
        )
    )
    if base_domain is not None:
        e = e.filter(base_domain_udf(F.col("dst")) == F.lit(base_domain.lower()))
    hosts = e.select(
        "warc_ts", F.lower(F.parse_url(F.col("dst"), F.lit("HOST"))).alias("dst_host")
    ).filter(F.col("dst_host").isNotNull())
    return (
        hosts.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "dst_host")
        .agg(F.count(F.lit(1)).alias("links"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_epoch"),
            "dst_host",
            "links",
        )
    )
