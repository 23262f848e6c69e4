"""TF-IDF postings, cosine search, and the combined TF-IDF+PageRank score.

DataFrame re-expression of the reference index (api/tfidf_index.py:34-132)
and search endpoint (api/main.py:367-419):

- tokenize: \\b\\w+\\b findall + lowercase (tfidf_index.py:23-28) — pure
  Catalyst (`regexp_extract_all`), no UDF.
- postings: tf per (url, term) → idf = ln((1+N)/(1+df)) + 1 → w = tf·idf
  (tfidf_index.py:59-89); doc norms ‖d‖ = sqrt(Σ w²) (:79-93).
- search: postings filtered to query terms (the inverted-index lookup is
  predicate pushdown), Σ q_w·d_w per doc / (‖q‖·‖d‖) (:115-129), top-k.
- combined score 0.8·tfidf + 0.2·minmax(pr) with missing PR → 0
  (api/main.py:385-398), over-fetch 3k before re-rank (:385,412-413).
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# maximal \w+ runs == \b\w+\b findall; (?U) switches Java regex \w to the
# Unicode character class, matching Python's re.UNICODE behavior
TOKEN_PATTERN = r"(?U)\w+"


def tokenize_col(text_col):
    """ArrayType(String) of lowercase tokens — reference tokenizer semantics."""
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_PATTERN), 0)


def build_postings(docs: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """(id, text, ...) -> postings (url, term, w DOUBLE). Docs with zero
    tokens are skipped entirely (tfidf_index.py:52-54: they don't increment
    N either)."""
    postings, _, _ = build_postings_with_idf(docs, id_col, text_col)
    return postings


def doc_norms(postings: DataFrame) -> DataFrame:
    """(url, norm): ‖d‖ = sqrt(Σ w²) (tfidf_index.py:79-93)."""
    return postings.groupBy("url").agg(F.sqrt(F.sum(F.pow("w", 2))).alias("norm"))


class _LazyScalar:
    """Driver-side lazy scalar over a 1-row/1-col frame: collect()s on first
    use, so callers that ignore it never pay the job."""

    def __init__(self, df: DataFrame):
        self._df, self._val, self._have = df, None, False

    def value(self):
        if not self._have:
            self._val = self._df.collect()[0][0]
            self._have = True
        return self._val

    def __int__(self):
        return int(self.value())

    def __eq__(self, other):
        return self.value() == other

    def __repr__(self):
        return f"_LazyScalar({self._val if self._have else '<unevaluated>'})"


def build_postings_with_idf(docs: DataFrame, id_col: str = "url", text_col: str = "text"):
    """Returns (postings, idf DataFrame (term, idf), n_docs lazy scalar).

    IDF's N (non-empty doc count) is a lazy 1-row aggregate broadcast into
    the idf projection — the `minmax_normalize` pattern — so the whole
    postings build is ONE DAG with no driver round-trip; the returned
    n_docs only runs its count job if the caller actually reads it."""
    toks = docs.select(
        F.col(id_col).alias("url"), tokenize_col(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") > 0)
    ndf = toks.agg(F.count(F.lit(1)).alias("_n"))
    tf = (
        toks.select("url", F.explode("toks").alias("term"))
        .groupBy("url", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.crossJoin(F.broadcast(ndf)).select(
        "term", (F.log((F.lit(1.0) + F.col("_n")) / (1.0 + F.col("df"))) + 1.0).alias("idf")
    )
    postings = tf.join(idf, "term").select(
        "url", "term", (F.col("tf") * F.col("idf")).alias("w")
    )
    return postings, idf, _LazyScalar(ndf)


def search(
    postings: DataFrame,
    idf: DataFrame,
    query: str,
    top_k: int | None = 10,
) -> DataFrame:
    """Cosine TF-IDF search (tfidf_index.py:95-132). Returns
    (url, tfidf_score) top-k desc (all matches, unsorted, when top_k is
    None). Query weighting happens driver-side (a query is a handful of
    terms); the doc side is fully distributed — the IN-list on term is
    pushed to the postings scan."""
    import re as _re

    tokens = [t.lower() for t in _re.findall(r"\b\w+\b", query)]
    if not tokens:
        return postings.sparkSession.createDataFrame([], "url string, tfidf_score double")
    q_tf = Counter(tokens)
    idf_map = {
        r.term: r.idf
        for r in idf.filter(F.col("term").isin(list(q_tf.keys()))).collect()
    }
    q_weights = {t: f * idf_map[t] for t, f in q_tf.items() if t in idf_map}
    if not q_weights:
        return postings.sparkSession.createDataFrame([], "url string, tfidf_score double")
    q_norm = math.sqrt(sum(w * w for w in q_weights.values())) or 1.0

    qdf = postings.sparkSession.createDataFrame(
        [(t, w) for t, w in q_weights.items()], "term string, qw double"
    )
    norms = doc_norms(postings)
    scored = (
        postings.join(F.broadcast(qdf), "term")
        .groupBy("url")
        .agg(F.sum(F.col("qw") * F.col("w")).alias("dot"))
        .join(norms, "url")
        .select(
            "url", (F.col("dot") / (F.lit(q_norm) * F.col("norm"))).alias("tfidf_score")
        )
    )
    if top_k is None:
        return scored
    return scored.orderBy(F.desc("tfidf_score"), F.asc("url")).limit(top_k)


def minmax_normalize(scores: DataFrame, col: str = "score") -> DataFrame:
    """(url, score) -> (url, score, score_norm) min-max normalized to [0,1]
    (api/main.py:116-127; span 1.0 when max==min).

    The min/max pair is a lazy 1-row aggregate broadcast into the
    projection — no driver round-trip, no separate job: the whole
    normalization is one plan (same pattern as pagerank's dangling-mass
    scalar)."""
    stats = scores.agg(
        F.coalesce(F.min(col), F.lit(0.0)).alias("_mn"),
        F.when(F.max(col) > F.min(col), F.max(col) - F.min(col))
        .otherwise(F.lit(1.0))
        .alias("_span"),
    )
    return (
        scores.crossJoin(F.broadcast(stats))
        .withColumn("score_norm", (F.col(col) - F.col("_mn")) / F.col("_span"))
        .drop("_mn", "_span")
    )


def combined_search(
    postings: DataFrame,
    idf: DataFrame,
    pagerank_scores: DataFrame,
    query: str,
    top_k: int = 10,
    tfidf_weight: float = 0.8,
    pr_weight: float = 0.2,
) -> DataFrame:
    """The reference /api/search ranking (api/main.py:367-413): over-fetch
    3·k TF-IDF hits, left-join min-max-normalized PageRank (missing → 0.0,
    main.py:396-397), combined = 0.8·tfidf + 0.2·pr_norm, re-rank, cut to k.

    pagerank_scores: (url, score). Returns
    (url, tfidf_score, pagerank_norm, combined_score)."""
    hits = search(postings, idf, query, top_k=top_k * 3)
    pr_norm = minmax_normalize(pagerank_scores, "score").select(
        "url", F.col("score_norm").alias("pagerank_norm")
    )
    out = (
        hits.join(pr_norm, "url", "left")
        .select(
            "url",
            "tfidf_score",
            F.coalesce("pagerank_norm", F.lit(0.0)).alias("pagerank_norm"),
        )
        .withColumn(
            "combined_score",
            F.lit(tfidf_weight) * F.col("tfidf_score")
            + F.lit(pr_weight) * F.col("pagerank_norm"),
        )
    )
    return out.orderBy(F.desc("combined_score"), F.asc("url")).limit(top_k)


def search_api(
    postings: DataFrame,
    idf: DataFrame,
    pagerank_scores: DataFrame,
    docs: DataFrame,
    query: str,
    top_k: int = 10,
    id_col: str = "url",
    text_col: str = "text",
    max_len: int = 220,
    tfidf_weight: float = 0.8,
    pr_weight: float = 0.2,
) -> DataFrame:
    """The FULL /api/search response shape (api/main.py:367-419): one row per
    result with (url, snippet, tfidf_score, pagerank_score, combined_score).

    Composition of the endpoint's steps as one DAG: over-fetch 3·k TF-IDF
    hits → left-join raw + min-max-normalized PageRank (missing → 0.0) →
    combined = 0.8·tfidf + 0.2·pr_norm → join page text (candidates without
    a pages row are skipped BEFORE the top-k cut, exactly the reference's
    `pages_by_url.get` guard at api/main.py:392-394 — a missing page backfills
    the next candidate instead of shrinking the result) → re-rank, cut to k →
    multi-term snippet around the first query-term hit. The 3·k candidate set
    is broadcast into the docs join — the big table is never shuffled — and
    the cut is a TakeOrderedAndProject over the joined candidates."""
    hits = search(postings, idf, query, top_k=top_k * 3)
    pr = minmax_normalize(pagerank_scores, "score").select(
        "url",
        F.col("score").alias("pagerank_score"),
        F.col("score_norm").alias("pagerank_norm"),
    )
    ranked = (
        hits.join(pr, "url", "left")
        .select(
            "url",
            "tfidf_score",
            F.coalesce("pagerank_score", F.lit(0.0)).alias("pagerank_score"),
            F.coalesce("pagerank_norm", F.lit(0.0)).alias("pagerank_norm"),
        )
        .withColumn(
            "combined_score",
            F.lit(tfidf_weight) * F.col("tfidf_score")
            + F.lit(pr_weight) * F.col("pagerank_norm"),
        )
    )
    pages = docs.select(F.col(id_col).alias("url"), F.col(text_col).alias("_text"))
    return (
        pages.join(F.broadcast(ranked), "url")
        .orderBy(F.desc("combined_score"), F.asc("url"))
        .limit(top_k)
        .select(
            "url",
            snippet_col(F.col("_text"), query, max_len).alias("snippet"),
            "tfidf_score",
            "pagerank_score",
            "combined_score",
        )
        .orderBy(F.desc("combined_score"), F.asc("url"))
    )


def snippet_col(text_col, query: str, max_len: int = 220):
    """Snippet around the FIRST case-insensitive hit of ANY query term —
    exact reference semantics (api/main.py:332-362 `_make_snippet`):

      terms   = query.lower().split()           (whitespace split)
      pos     = min over found first-hit positions
      no hit  -> text[:max_len] + '…' if longer, else text unchanged
      hit     -> window text[start:start+max_len], start = max(0, pos -
                 max_len//3), stripped, '… ' prefix iff start>0 and ' …'
                 suffix iff the window ends before the text does
      empty/null text -> ''

    Pure Catalyst (locate/substring/regexp) — no UDF."""
    terms = [t for t in str(query).lower().split() if t]
    lowered = F.lower(text_col)
    length = F.coalesce(F.length(text_col), F.lit(0))
    if terms:
        # 1-based locate, 0 = miss; array_min skips nulls → min found position
        pos = F.array_min(
            F.array(*[F.when(F.locate(t, lowered) > 0, F.locate(t, lowered)) for t in terms])
        )
    else:
        pos = F.lit(None).cast("int")
    start0 = F.greatest(pos - 1 - F.lit(max_len // 3), F.lit(0))  # 0-based
    end = F.least(length, start0 + F.lit(max_len))
    core = F.regexp_replace(
        F.substring(text_col, (start0 + 1).cast("int"), max_len), r"(?U)^\s+|\s+$", ""
    )
    hit = F.concat(
        F.when(start0 > 0, F.lit("… ")).otherwise(F.lit("")),
        core,
        F.when(end < length, F.lit(" …")).otherwise(F.lit("")),
    )
    nohit = F.when(
        length > max_len, F.concat(F.substring(text_col, 1, max_len), F.lit("…"))
    ).otherwise(text_col)
    return F.when(text_col.isNull() | (length == 0), F.lit("")).otherwise(
        F.when(pos.isNotNull(), hit).otherwise(nohit)
    )


def rank_index(scores: DataFrame, score_col: str = "score") -> DataFrame:
    """rank = i+1 in score-desc order (api/main.py:281-291, T5).
    Note: a global row_number is a single-partition window — fine for top-k
    result sets (its only use in the reference), not for full tables; use
    rank_index_distributed for those."""
    w = Window.orderBy(F.desc(score_col))
    return scores.withColumn("rank", F.row_number().over(w))


def rank_index_distributed(
    scores: DataFrame,
    score_col: str = "score",
    key_col: str = "url",
    num_partitions: int | None = None,
) -> DataFrame:
    """Full-table global rank (1-based, score desc, key asc tie-break) with
    NO single-partition window — the scale path for ranking 10⁹ rows.

    Same two-phase pattern as graph.dense_node_ids: range-partition on the
    total order (score desc, key asc) → per-partition row_number →
    per-partition counts → prefix-sum offsets (≤P tiny rows) broadcast back;
    global rank = offset + local row_number."""
    spark = scores.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    order = [F.col(score_col).desc(), F.col(key_col).asc()]
    ranged = scores.repartitionByRange(P, *order).withColumn(
        "_p", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_p").orderBy(*order)
    local = ranged.withColumn("_rn", F.row_number().over(w_local).cast("long"))
    counts = ranged.groupBy("_p").agg(F.count(F.lit(1)).alias("_c"))
    w_off = Window.orderBy("_p").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_p", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).cast("long").alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_p")
        .withColumn("rank", F.col("_off") + F.col("_rn"))
        .drop("_p", "_rn", "_off")
    )


def bm25_search(
    docs: DataFrame,
    query: str,
    id_col: str = "url",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = 10,
) -> DataFrame:
    """Okapi BM25 ranking (Robertson & Zaragoza 2009; the Lucene default
    scorer) — the probabilistic counterpart of the cosine TF-IDF `search`:

        score(d) = Σ_{t ∈ q} ln(1 + (N − df + ½)/(df + ½))
                     · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    over DISTINCT query terms (short-query practice: query tf ignored).
    N counts non-empty docs (the tfidf N semantics). Physical shape: the
    query-term IN-list prunes the exploded token stream before the tf
    grouping, df comes from the same pruned stream, and the two corpus
    scalars (N, avgdl) are a lazy 1-row aggregate broadcast into the
    projection — one DAG, no driver round-trip. Returns (url, bm25_score),
    top-k desc (url-asc tie-break); ALL matches unsorted when top_k=None.
    """
    import re as _re

    terms = sorted({t.lower() for t in _re.findall(r"\b\w+\b", query)})
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], "url string, bm25_score double")

    toks = docs.select(
        F.col(id_col).alias("url"), tokenize_col(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") > 0)
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"), F.avg(F.size("toks")).alias("_avgdl")
    )
    tf = (
        toks.select("url", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("url", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "url",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("url")
        .agg(F.sum("part").alias("bm25_score"))
    )
    if top_k is None:
        return scored
    return scored.orderBy(F.desc("bm25_score"), F.asc("url")).limit(top_k)
