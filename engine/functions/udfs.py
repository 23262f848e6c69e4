"""Vectorized Arrow-batched pandas UDFs — the engine's entire Python surface.

Per the input contract (BASELINE.json input_hint), everything Python runs as
pandas UDFs over Arrow batches; there are NO per-row Python UDFs anywhere in
the engine. The JVM<->Python boundary is crossed once per Arrow batch
(spark.sql.execution.arrow.maxRecordsPerBatch rows), and all downstream
relational work is pure Catalyst.

UDFs:
- extract_page_udf(html)        -> struct<text string, hrefs array<string>>
  (one shared parse per page, like the reference shares one soup object:
   crawler/core.py:272,292,296)
- normalize_url_udf(url)        -> string   (crawler/core.py:39-60)
- resolve_href_udf(url, href)   -> string   (urljoin+normalize, core.py:298-299)
- base_domain_udf(url)          -> string   (core.py:13-23 over the netloc)
- detect_lang_udf(html)         -> string   (core.py:65-95)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_PAGE_STRUCT = StructType(
    [
        StructField("text", StringType()),
        StructField("hrefs", ArrayType(StringType())),
    ]
)

from engine.functions import htmlx, urls

_ANCHOR_ARRAY = ArrayType(
    StructType(
        [
            StructField("href", StringType()),
            StructField("anchor", StringType()),
        ]
    )
)

__all__ = [
    "extract_page_udf",
    "extract_text_udf",
    "extract_anchors_udf",
    "normalize_url_udf",
    "resolve_href_udf",
    "base_domain_udf",
    "detect_lang_udf",
]


@pandas_udf(_PAGE_STRUCT)
def extract_page_udf(html: pd.Series) -> pd.DataFrame:
    texts = []
    hrefs = []
    for h in html:
        if h is None:
            texts.append("")
            hrefs.append([])
        else:
            t, a = htmlx.extract_page(h)
            texts.append(t)
            hrefs.append(a)
    return pd.DataFrame({"text": texts, "hrefs": hrefs})


@pandas_udf(_ANCHOR_ARRAY)
def extract_anchors_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda h: [] if h is None else htmlx.extract_anchors(h))


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda h: "" if h is None else htmlx.extract_text(h))


@pandas_udf(StringType())
def normalize_url_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: None if u is None else urls.normalize_url(u))


@pandas_udf(StringType())
def resolve_href_udf(url: pd.Series, href: pd.Series) -> pd.Series:
    out = []
    for u, h in zip(url, href):
        out.append(None if (u is None or h is None) else urls.resolve_href(u, h))
    return pd.Series(out, dtype="object")


@pandas_udf(StringType())
def base_domain_udf(url: pd.Series) -> pd.Series:
    from urllib.parse import urlparse

    def bd(u):
        if u is None:
            return None
        try:
            return urls.get_base_domain(urlparse(u).netloc.lower())
        except Exception:
            return ""

    return url.map(bd)


@pandas_udf(StringType())
def detect_lang_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda h: None if h is None else htmlx.detect_page_language(h))
