"""TF-IDF pipeline vs the pure-Python reference-port oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.operators import tfidf
from oracle import tfidf_search_py, tfidf_weights_py, tokenize_py

DOCS = {
    "u1": "PageRank ranks web pages by link structure. Links matter!",
    "u2": "TF-IDF weighs terms by inverse document frequency across pages.",
    "u3": "Spark shuffles data between stages; pages of memory spill to disk.",
    "u4": "the the the and and of",
    "u5": "",  # zero tokens: skipped entirely, doesn't increment N
    "u6": "Völlig unterschiedlicher Text über Suchmaschinen und Ränge.",
}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in DOCS.items()], "url string, text string"
    )


def test_tokenizer_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in DOCS.values()], "text string")
    got = [r[0] for r in df.select(tfidf.tokenize_col(F.col("text"))).collect()]
    exp = [tokenize_py(t) for t in DOCS.values()]
    assert got == exp


def test_postings_match_oracle(docs_df):
    postings, idf, n = tfidf.build_postings_with_idf(docs_df)
    assert n == 5  # u5 skipped
    got = {(r.url, r.term): r.w for r in postings.collect()}
    inv, norms, _ = tfidf_weights_py(DOCS)
    exp = {(doc, term): w for term, posting in inv.items() for doc, w in posting.items()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-12)

    got_norms = {r.url: r.norm for r in tfidf.doc_norms(postings).collect()}
    for doc, nv in norms.items():
        assert got_norms[doc] == pytest.approx(nv, rel=1e-12)


def test_search_matches_oracle(docs_df):
    postings, idf, _ = tfidf.build_postings_with_idf(docs_df)
    for query in ["pages", "link structure pages", "inverse frequency", "zzz missing"]:
        got = [(r.url, r.tfidf_score) for r in tfidf.search(postings, idf, query, top_k=4).collect()]
        exp = tfidf_search_py(DOCS, query, top_k=4)
        assert len(got) == len(exp)
        # compare as score maps (oracle sort is not id-tie-stable)
        gm, em = dict(got), dict(exp)
        assert set(gm) == set(em)
        for kk in gm:
            assert gm[kk] == pytest.approx(em[kk], rel=1e-9)


def test_combined_search_weighting(docs_df, spark):
    postings, idf, _ = tfidf.build_postings_with_idf(docs_df)
    pr = spark.createDataFrame(
        [("u1", 0.5), ("u2", 0.3), ("u3", 0.2)], "url string, score double"
    )
    res = tfidf.combined_search(postings, idf, pr, "pages", top_k=3).collect()
    assert len(res) == 3
    for r in res:
        # min-max norm: u1 -> 1.0, u2 -> 1/3, u3 -> 0.0
        expected_norm = {"u1": 1.0, "u2": pytest.approx(1 / 3), "u3": 0.0}[r.url]
        assert r.pagerank_norm == expected_norm
        assert r.combined_score == pytest.approx(0.8 * r.tfidf_score + 0.2 * r.pagerank_norm)
    # desc order
    scores = [r.combined_score for r in res]
    assert scores == sorted(scores, reverse=True)


def test_minmax_norm_degenerate(spark):
    one = spark.createDataFrame([("a", 0.7)], "url string, score double")
    got = tfidf.minmax_normalize(one).collect()[0]
    assert got.score_norm == 0.0  # span defaults to 1.0 (api/main.py:121)


def test_rank_index(spark):
    df = spark.createDataFrame(
        [("a", 3.0), ("b", 1.0), ("c", 2.0)], "url string, score double"
    )
    got = {r.url: r.rank for r in tfidf.rank_index(df).collect()}
    assert got == {"a": 1, "c": 2, "b": 3}


def _make_snippet_ref(text: str, query: str, max_len: int = 220) -> str:
    """Literal port of reference api/main.py:332-362 _make_snippet — the
    byte-parity oracle for snippet_col."""
    if not text:
        return ""
    lowered = text.lower()
    terms = [t for t in query.lower().split() if t]
    pos = None
    for term in terms:
        idx = lowered.find(term)
        if idx != -1:
            pos = idx if pos is None else min(pos, idx)
    if pos is None:
        return (text[:max_len] + "…") if len(text) > max_len else text
    start = max(0, pos - max_len // 3)
    end = min(len(text), start + max_len)
    snippet = text[start:end].strip()
    if start > 0:
        snippet = "… " + snippet
    if end < len(text):
        snippet = snippet + " …"
    return snippet


def test_snippet_multiterm_byte_parity(spark):
    long_tail = "filler words here " * 30
    texts = [
        "",  # empty → ''
        "short text with a table inside",  # hit, whole text fits
        "Table at the very start " + long_tail,  # hit at pos 0 (start==0, end<len)
        long_tail + " the table appears late " + long_tail,  # hit mid → both ellipses
        long_tail + "tail table",  # hit near end → prefix ellipsis only
        "no match but quite long " + long_tail,  # no hit, len>max_len
        "no match short",  # no hit, short → unchanged
        "  spark leads but TABLE is earlier? no - spark first " + long_tail,  # multi-term min pos
        "aaa spark bbb " + long_tail + " table ccc",  # spark hit before table hit
    ]
    query = "table spark"
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r.i: r.s
        for r in df.select("i", tfidf.snippet_col(F.col("text"), query).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _make_snippet_ref(t, query), f"case {i}: {got[i]!r}"
    # window-size parameter honored
    g2 = df.select("i", tfidf.snippet_col(F.col("text"), query, max_len=60).alias("s")).collect()
    for r in g2:
        assert r.s == _make_snippet_ref(texts[r.i], query, max_len=60)


def test_search_api_full_response_shape(docs_df, spark):
    """search_api composes the whole /api/search endpoint (api/main.py:367-419):
    url, snippet, tfidf_score, pagerank_score (raw), combined_score."""
    postings, idf, _ = tfidf.build_postings_with_idf(docs_df)
    pr = spark.createDataFrame(
        [("u1", 0.5), ("u2", 0.3), ("u3", 0.2)], "url string, score double"
    )
    query = "pages link"
    res = tfidf.search_api(postings, idf, pr, docs_df, query, top_k=3).collect()
    assert [r.url for r in res]  # non-empty
    assert res[0].__fields__ == ["url", "snippet", "tfidf_score", "pagerank_score", "combined_score"]
    raw = {"u1": 0.5, "u2": 0.3, "u3": 0.2}
    norm = {"u1": 1.0, "u2": 1 / 3, "u3": 0.0}
    for r in res:
        assert r.pagerank_score == raw.get(r.url, 0.0)
        assert r.combined_score == pytest.approx(
            0.8 * r.tfidf_score + 0.2 * norm.get(r.url, 0.0)
        )
        assert r.snippet == _make_snippet_ref(DOCS[r.url], query)
    scores = [r.combined_score for r in res]
    assert scores == sorted(scores, reverse=True)


def test_search_api_backfills_missing_pages(docs_df, spark):
    """Reference guard semantics (api/main.py:392-394): a ranked url with no
    pages row is skipped BEFORE the top-k cut, so the next candidate
    backfills — the response never shrinks below k while candidates remain."""
    postings, idf, _ = tfidf.build_postings_with_idf(docs_df)
    pr = spark.createDataFrame([("u1", 0.5)], "url string, score double")
    query = "pages link"
    full = tfidf.search_api(postings, idf, pr, docs_df, query, top_k=2).collect()
    assert len(full) == 2
    # remove the top result's page row: the previous #3 must backfill to #2
    docs_missing = docs_df.filter(F.col("url") != full[0].url)
    got = tfidf.search_api(postings, idf, pr, docs_missing, query, top_k=2).collect()
    assert len(got) == 2
    assert full[0].url not in [r.url for r in got]
    assert got[0].url == full[1].url


def test_rank_index_distributed_matches_window(spark):
    """The two-phase distributed ranker must equal the single-window ranker
    (total order: score desc, url asc) and never cross into Python."""
    import random

    from engine.plans import inspect as pi

    rng = random.Random(13)
    rows = [(f"u{i}", float(rng.randrange(50))) for i in range(500)]  # many ties
    df = spark.createDataFrame(rows, "url string, score double")
    got = {r.url: r.rank for r in tfidf.rank_index_distributed(df, num_partitions=7).collect()}
    exp_rows = sorted(rows, key=lambda kv: (-kv[1], kv[0]))
    exp = {u: i + 1 for i, (u, _) in enumerate(exp_rows)}
    assert got == exp
    out = tfidf.rank_index_distributed(df, num_partitions=7)
    assert not pi.has_python_eval(out)


def test_bm25_search_vs_python(spark):
    """BM25 vs a literal Python transcription of the formula; ranking and
    scores agree, and the saturation/length-norm behaviors hold."""
    import math
    import re
    from collections import Counter

    from engine.operators.tfidf import bm25_search

    docs = [
        ("a", "spark joins tables with spark spark spark"),
        ("b", "the table of join results"),
        ("c", "spark table"),
        ("d", "completely unrelated text about pagerank graphs"),
        ("e", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    query = "spark join table"
    got = {
        r.url: r.bm25_score
        for r in bm25_search(df, query, id_col="doc_id", top_k=None).collect()
    }

    k1, b = 1.2, 0.75
    toks = {i: re.findall(r"[a-z0-9_]+", t.lower()) for i, t in docs}
    toks = {i: t for i, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    terms = sorted({t.lower() for t in re.findall(r"\b\w+\b", query)})
    dfreq = {t: sum(1 for d in toks.values() if t in d) for t in terms}
    want = {}
    for i, t in toks.items():
        tf = Counter(w for w in t if w in terms)
        s = 0.0
        for term, f in tf.items():
            idf = math.log(1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            s += idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * len(t) / avgdl))
        if tf:
            want[i] = s
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-12
    # doc 'a' spams 'spark': saturation keeps it ahead but bounded; 'c' is
    # short and matches 2 terms -> highest per-length score ordering holds
    assert got["a"] > got["d"] if "d" in got else True
    assert "d" not in got and "e" not in got
    # top_k path: deterministic cut
    top2 = bm25_search(df, query, id_col="doc_id", top_k=2).collect()
    assert [r.url for r in top2] == sorted(want, key=lambda i: (-want[i], i))[:2]
