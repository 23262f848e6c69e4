"""Streaming exact content-dedupe over the crawl pages stream.

Crawls re-fetch identical content under different URLs (mirrors, tracking
params, soft redirects); the training-data pipeline wants the FIRST copy
per content fingerprint and bounded state while the stream runs forever.
The reference has no streaming (SURVEY §2.9) — this extends the engine's
ingest surface (streaming/ingest.py) with the dedupe stage every
Common-Crawl-style pipeline runs before extraction.

Same-function-on-batch-and-stream pattern as streaming/events.py: the
fingerprint column is identical on both paths, so the batch path is the
oracle for the streaming path in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.operators.textstats import fingerprint_md5_col


def with_content_fp(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the exact-content fingerprint (md5 of whitespace-collapsed
    lowercase text — the same normalization the batch dedupe family uses)."""
    return pages.withColumn("fp", fingerprint_md5_col(F.col(text_col)))


def dedupe_pages_stream(
    pages: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """First-copy-per-content dedupe.

    Streaming input: `dropDuplicatesWithinWatermark` on the fingerprint —
    state is one entry per DISTINCT fingerprint seen within the watermark
    horizon and is evicted after it, so an infinite crawl stream runs with
    bounded state (plain dropDuplicates would pin every fingerprint ever
    seen). Which duplicate survives follows arrival order, as in any
    at-least-once streaming dedupe.

    Batch input: deterministic representative instead — the (ts, url)-min
    copy per fingerprint via min_by struct, one map-side-combinable
    aggregate. The fingerprint SETS of the two paths agree exactly; tests
    assert that parity.
    """
    p = with_content_fp(pages, text_col)
    if p.isStreaming:
        return p.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["fp"])
    cols = [c for c in p.columns if c != "fp"]
    packed = F.struct(F.col(ts_col), F.col("url"), *[F.col(c) for c in cols if c not in (ts_col, "url")])
    rep = p.groupBy("fp").agg(F.min(packed).alias("r"))
    return rep.select("fp", *[F.col(f"r.{c}").alias(c) for c in [ts_col, "url"] + [c for c in cols if c not in (ts_col, "url")]]).select(*cols, "fp")
