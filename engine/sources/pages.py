"""Pages / ranks JSON sources & sinks (SURVEY §2.1 S4, S7).

The reference serializes the page corpus as `pages.json`
(crawler/crawl.py:79-81: [{id,url,text}]) and the final scores as
`pagerank.json` (backend/data/parse_pagerank.py:64-68: [{id,url,score}]
sorted desc). Parquet is this engine's primary store; these JSON mappings
exist for interchange parity. Spark json is JSON-Lines (one object per
line) rather than the reference's single indented array — same records,
streaming-friendly at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PAGES_JSON_SCHEMA = "id BIGINT, url STRING, text STRING"
RANKS_JSON_SCHEMA = "id BIGINT, url STRING, score DOUBLE"


def write_pages_json(pages: DataFrame, path: str, mode: str = "overwrite") -> None:
    """(id, url, text) JSON-lines sink (crawler/crawl.py:79-81)."""
    pages.select("id", "url", "text").write.mode(mode).json(path)


def read_pages_json(spark: SparkSession, path: str) -> DataFrame:
    """Explicit-schema scan (api/main.py:59-60 reads the same shape)."""
    return spark.read.schema(PAGES_JSON_SCHEMA).json(path)


def write_ranks_json(
    ranks_with_urls: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """(id, url, score) sink, score-desc within each file
    (parse_pagerank.py:64-68). Global order is not a JSON-lines property;
    readers re-sort (T4) as the reference's consumers do via the list order."""
    (
        ranks_with_urls.select("id", "url", "score")
        .sortWithinPartitions(F.desc("score"))
        .write.mode(mode)
        .json(path)
    )


def read_ranks_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(RANKS_JSON_SCHEMA).json(path)
