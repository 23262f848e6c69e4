"""Content-based boilerplate removal: jusText-style block classification.

No reference implementation — the reference strips boilerplate by a fixed
selector list (crawler/core.py:112-134: header/footer/nav/.cookie/...),
which misses unlabeled boilerplate and deletes mislabeled content. This
operator ships the standard content-based alternative (Pomikálek 2011,
"Removing boilerplate and duplicate content from web corpora" — the
jusText algorithm; same family as Kohlschütter et al. WSDM 2010
Boilerpipe): segment the page into text blocks
(htmlx.extract_blocks) and classify each by link density, stopword
density, and length, then smooth short/ambiguous blocks by their
neighbors' classes.

Classification (jusText's shape, thresholds calibrated to the engine's
deterministic 15-word stopword list — the published defaults 0.30/0.32
assume jusText's ~600-word lists; both are parameters):

  context-free per block:
    link_density > max_link_density            -> bad
    n_chars < length_low                       -> bad if any link chars,
                                                  else short
    stopword_density >= stopwords_high         -> good if n_chars >
                                                  length_high else neargood
    stopword_density >= stopwords_low          -> neargood
    otherwise                                  -> bad

  context pass (document order, edges count as bad):
    neargood -> good when the nearest decisive (good/bad) neighbor on
                EITHER side is good, else bad
    short    -> good when the nearest decisive neighbors on BOTH sides
                are good, else bad; h1-h6 blocks need only the FOLLOWING
                side (jusText's heading promotion: a heading introducing
                good content belongs to the content)

All arithmetic is per-document and deterministic, so the whole operator
is ONE Arrow-batched pandas UDF per page — no shuffle at all for
`clean_text` (plan-asserted map-only), one posexplode for the per-block
view. Python is unavoidable here for the same reason as the extraction
pipeline (HTML parsing), and is Arrow-batched like it (SURVEY §2.10
UDF discipline: pandas_udf, never per-row).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from engine.functions import htmlx
from engine.operators.textstats import STOPWORDS

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# thresholds calibrated to the built-in 15-word list (see module docstring)
DEFAULTS = dict(
    length_low=70,
    length_high=200,
    stopwords_low=0.12,
    stopwords_high=0.17,
    max_link_density=0.2,
)

_BLOCK_STRUCT = StructType(
    [
        StructField("tag", StringType()),
        StructField("text", StringType()),
        StructField("n_chars", IntegerType()),
        StructField("link_density", DoubleType()),
        StructField("stopword_density", DoubleType()),
        StructField("label", StringType()),
    ]
)


def classify_blocks(
    blocks: list,
    stopwords=None,
    length_low: int = DEFAULTS["length_low"],
    length_high: int = DEFAULTS["length_high"],
    stopwords_low: float = DEFAULTS["stopwords_low"],
    stopwords_high: float = DEFAULTS["stopwords_high"],
    max_link_density: float = DEFAULTS["max_link_density"],
) -> list:
    """Label htmlx.extract_blocks output: returns [(block, link_density,
    stopword_density, label), ...] with label in {'good', 'bad'} after the
    context pass. Pure Python (runs inside the Arrow batch), deterministic."""
    sw_set = frozenset(stopwords if stopwords is not None else STOPWORDS["en"])
    cf = []
    feats = []
    for b in blocks:
        # length thresholds use the visible text length (jusText measures
        # the paragraph string); link density uses token chars on both
        # sides (spaces carry no link information)
        n = len(b["text"])
        ld = (b["link_chars"] / b["n_chars"]) if b["n_chars"] else 0.0
        words = _WORD_RE.findall(b["text"].lower())
        sw = (sum(1 for w in words if w in sw_set) / len(words)) if words else 0.0
        if ld > max_link_density:
            c = "bad"
        elif n < length_low:
            c = "bad" if b["link_chars"] > 0 else "short"
        elif sw >= stopwords_high:
            c = "good" if n > length_high else "neargood"
        elif sw >= stopwords_low:
            c = "neargood"
        else:
            c = "bad"
        cf.append(c)
        feats.append((ld, sw))

    # context pass: nearest decisive (context-free good/bad) neighbor per
    # side; document edges count as bad
    n_blocks = len(blocks)
    prev_dec = ["bad"] * n_blocks
    last = "bad"
    for i in range(n_blocks):
        prev_dec[i] = last
        if cf[i] in ("good", "bad"):
            last = cf[i]
    next_dec = ["bad"] * n_blocks
    last = "bad"
    for i in range(n_blocks - 1, -1, -1):
        next_dec[i] = last
        if cf[i] in ("good", "bad"):
            last = cf[i]

    out = []
    headings = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))
    for i, b in enumerate(blocks):
        c = cf[i]
        if c == "neargood":
            c = "good" if (prev_dec[i] == "good" or next_dec[i] == "good") else "bad"
        elif c == "short":
            if b["tag"] in headings:
                # jusText's heading promotion: a heading introducing good
                # content belongs to the content
                c = "good" if next_dec[i] == "good" else "bad"
            else:
                c = (
                    "good"
                    if (prev_dec[i] == "good" and next_dec[i] == "good")
                    else "bad"
                )
        out.append((b, feats[i][0], feats[i][1], c))
    return out


def make_blocks_udf(**params):
    """Arrow-batched html -> array<struct> of classified blocks."""

    @pandas_udf(ArrayType(_BLOCK_STRUCT))
    def blocks_udf(html):
        import pandas as pd

        out = []
        for h in html:
            if h is None:
                out.append([])
                continue
            rows = []
            for b, ld, sw, label in classify_blocks(
                htmlx.extract_blocks(h), **params
            ):
                rows.append(
                    {
                        "tag": b["tag"],
                        "text": b["text"],
                        "n_chars": b["n_chars"],
                        "link_density": round(ld, 6),
                        "stopword_density": round(sw, 6),
                        "label": label,
                    }
                )
            out.append(rows)
        return pd.Series(out)

    return blocks_udf


def page_blocks(
    pages: DataFrame, html_col: str = "html", url_col: str = "url", **params
) -> DataFrame:
    """Per-block view: (url, block_idx, tag, text, n_chars, link_density,
    stopword_density, label) in document order — the audit-trail form (what
    was classified boilerplate, and why the numbers said so)."""
    udf = make_blocks_udf(**params)
    return pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(udf(F.col(html_col))).alias("block_idx", "b"),
    ).select("url", "block_idx", "b.*")


def clean_text(
    pages: DataFrame, html_col: str = "html", url_col: str = "url", **params
) -> DataFrame:
    """(url, content): the page's good-block text joined in document order —
    the content-based replacement for selector-list stripping. Map-only:
    classify + filter + join happen inside the row, zero Exchange
    (plan-asserted in tests/test_plans.py)."""
    udf = make_blocks_udf(**params)
    return pages.select(
        F.col(url_col).alias("url"),
        F.array_join(
            F.transform(
                F.filter(udf(F.col(html_col)), lambda b: b["label"] == "good"),
                lambda b: b["text"],
            ),
            " ",
        ).alias("content"),
    )
