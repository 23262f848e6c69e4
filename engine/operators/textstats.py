"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

All pure Catalyst expressions (no UDFs) so they run inside whole-stage
codegen over the documents table. Training-data extension ops (no reference
impl; the tokenizer matches api/tfidf_index.py:23-28 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.operators.tfidf import tokenize_col

# tiny deterministic stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "on", "at", "this"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht", "ein", "eine", "auf", "für", "im"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "dans", "que", "pour", "sur", "avec", "pas"],
}
_LANG_ORDER = ("en", "de", "fr")  # deterministic tie-break order


def token_count_ws(text_col):
    """Whitespace token count."""
    t = F.trim(text_col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count_re(text_col):
    """\\w+ token count (BPE-ish regex proxy; matches the TF-IDF tokenizer)."""
    return F.size(tokenize_col(text_col))


def add_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("n_tokens_ws", token_count_ws(F.col(text_col))).withColumn(
        "n_tokens_re", token_count_re(F.col(text_col))
    )


def quality_score_col(text_col):
    """Heuristic quality in [0,1] from: length band, alnum ratio,
    mean word length band, stopword ratio. Deterministic, codegen-friendly."""
    n_chars = F.length(text_col)
    toks = tokenize_col(text_col)
    n_tok = F.size(toks)
    alnum = F.length(F.regexp_replace(text_col, r"[^\p{L}\p{N}]", ""))
    alnum_ratio = F.when(n_chars > 0, alnum / n_chars).otherwise(F.lit(0.0))
    mean_wl = F.when(n_tok > 0, alnum / n_tok).otherwise(F.lit(0.0))
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    sw_hits = F.size(F.array_intersect(F.array_distinct(toks), sw))
    len_band = F.when(n_chars >= 200, 1.0).when(n_chars >= 50, 0.6).otherwise(0.2)
    wl_band = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0).otherwise(0.4)
    sw_band = F.when(sw_hits >= 3, 1.0).when(sw_hits >= 1, 0.6).otherwise(0.3)
    return (
        F.lit(0.3) * len_band
        + F.lit(0.25) * F.least(alnum_ratio * 1.25, F.lit(1.0))
        + F.lit(0.2) * wl_band
        + F.lit(0.25) * sw_band
    ).alias("quality")


def add_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("quality", quality_score_col(F.col(text_col)))


def langid_col(text_col):
    """Stopword-hit language heuristic: distinct tokens ∩ per-language
    stopword lists; argmax hits with deterministic en>de>fr tie order;
    'und' (undetermined) when nothing hits."""
    toks = F.array_distinct(tokenize_col(text_col))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array([F.lit(w) for w in STOPWORDS[lang]])))
        for lang in _LANG_ORDER
    }
    best = F.greatest(*[hits[lang] for lang in _LANG_ORDER])
    expr = F.when(best <= 0, F.lit("und"))
    for lang in _LANG_ORDER:
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr


def add_langid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("lang_pred", langid_col(F.col(text_col)))


def fingerprint_md5_col(text_col):
    """Stable content fingerprint: md5 of whitespace-collapsed lowercase text
    (normalization per crawler/core.py:157 then case-fold)."""
    norm = F.lower(F.trim(F.regexp_replace(text_col, r"\s+", " ")))
    return F.md5(norm.cast("binary"))


def fingerprint_rolling_col(text_col, base: int = 1000003, mod: int = 2147483647):
    """Order-sensitive rolling token hash: fold xxhash64(token) through a
    polynomial accumulator mod a Mersenne prime (aggregate higher-order
    function, JVM-side; modular form keeps ANSI-mode long arithmetic exact:
    acc<2^31, base<2^20 → acc*base+h' < 2^52)."""
    toks = tokenize_col(text_col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(base) + F.pmod(F.xxhash64(t), F.lit(mod)), F.lit(mod)),
    )


def add_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("fp_md5", fingerprint_md5_col(F.col(text_col))).withColumn(
        "fp_rolling", fingerprint_rolling_col(F.col(text_col))
    )


def ngrams_col(text_col, n: int = 2):
    """ArrayType(String) of space-joined word n-grams over the reference
    tokenizer's token stream — sequence/slice/concat_ws, pure Catalyst
    (no UDF, stays inside whole-stage codegen). Docs with < n tokens yield
    an empty array."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = tokenize_col(text_col)

    # let-bind the token array (transform over a 1-element wrapper): a HOF
    # lambda re-evaluates captured outer expressions per element, so using
    # `toks` directly in the per-position lambda would re-run the tokenizer
    # regex once per token — O(len²) per doc (see dedupe.word_shingles_col)
    def grams(t):
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.transform(F.array(toks), grams))


def top_ngrams(
    docs: DataFrame, text_col: str = "text", n: int = 2, k: int = 100
) -> DataFrame:
    """Corpus-wide top-k word n-grams: (ngram, cnt BIGINT) — the LM-training
    profile question ("what boilerplate phrases dominate this crawl?").

    Scale shape: explode multiplies rows by ~tokens-per-doc but the count
    aggregate is map-side combinable (partial counts per partition before
    the shuffle carries only distinct grams), and the final top-k is a
    TakeOrderedAndProject — no full sort, no driver-side loop. The ordering
    (cnt DESC, ngram ASC) is total, so the k-boundary is deterministic."""
    grams = docs.select(F.explode(ngrams_col(F.col(text_col), n)).alias("ngram"))
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
    line_sep: str = "\n",
) -> DataFrame:
    """Gopher-style per-document repetition quality signals (Rae et al. 2021,
    "Scaling Language Models: Methods, Analysis & Insights from Training
    Gopher", repetition filters in Table A1; the same family is applied by
    RefinedWeb and Dolma): documents dominated by repeated lines or repeated
    n-grams are boilerplate/spam and get dropped before LM training.

    Output, one row per input doc:
      (id_col, n_lines BIGINT, dup_line_frac DOUBLE, dup_line_char_frac
       DOUBLE, n_ngrams BIGINT, dup_ngram_frac DOUBLE, top_ngram_frac DOUBLE)

    - dup_line_frac      = 1 - distinct_lines / line_occurrences
    - dup_line_char_frac = chars in lines whose (trimmed) content occurs
                           more than once / total line chars
    - dup_ngram_frac     = 1 - distinct_ngrams / ngram_occurrences
                           (word n-grams from the reference tokenizer)
    - top_ngram_frac     = occurrences of the modal n-gram / occurrences
    Docs with no non-blank lines (resp. < ngram_n tokens) get 0 counts and
    0.0 fractions. ``line_sep`` is a Java regex (default: newline).

    Scale shape: two explode -> groupBy passes (line units, gram units),
    each map-side combinable on (id, unit) then reduced per id, joined back
    on id — both aggregate sides already satisfy the join's hash(id)
    requirement, so only the slim (id-only) base projection pays an
    exchange (or broadcasts). Per-doc reducer state is bounded by the
    doc's own distinct units. The tempting single-pass per-row alternative
    (transform(array_distinct(units), u -> size(filter(units, x = u)))) is
    O(len^2) per document and melts on long pages; this stays linear.
    """
    id_ = F.col(id_col)

    lines_arr = F.filter(
        F.split(F.col(text_col), line_sep), lambda x: F.trim(x) != ""
    )
    ln = docs.select(id_.alias("id"), F.explode(lines_arr).alias("raw")).select(
        "id", F.trim(F.col("raw")).alias("line")
    )
    per_line = ln.groupBy("id", "line").agg(F.count(F.lit(1)).alias("c"))
    occ_chars = F.col("c") * F.length("line")
    line_stats = per_line.groupBy("id").agg(
        F.sum("c").alias("n_lines"),
        (F.lit(1.0) - F.count(F.lit(1)) / F.sum("c")).alias("dup_line_frac"),
        (
            F.coalesce(F.sum(F.when(F.col("c") > 1, occ_chars)), F.lit(0))
            / F.sum(occ_chars)
        ).alias("dup_line_char_frac"),
    )

    g = docs.select(
        id_.alias("id"), F.explode(ngrams_col(F.col(text_col), ngram_n)).alias("g")
    )
    per_gram = g.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    gram_stats = per_gram.groupBy("id").agg(
        F.sum("c").alias("n_ngrams"),
        (F.lit(1.0) - F.count(F.lit(1)) / F.sum("c")).alias("dup_ngram_frac"),
        (F.max("c") / F.sum("c")).alias("top_ngram_frac"),
    )

    return (
        docs.select(id_.alias("id"))
        .join(line_stats, "id", "left")
        .join(gram_stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
            F.coalesce("dup_line_char_frac", F.lit(0.0)).alias("dup_line_char_frac"),
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("dup_ngram_frac", F.lit(0.0)).alias("dup_ngram_frac"),
            F.coalesce("top_ngram_frac", F.lit(0.0)).alias("top_ngram_frac"),
        )
    )


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_quality: float = 0.75,
    max_dup_ngram_frac: float = 0.08,
    ngram_n: int = 2,
) -> DataFrame:
    """Composable Gopher/C4-style document gate (Rae et al. 2021 Table A1;
    Raffel et al. 2020 §2.2): the keep/drop decision actual cleaning
    pipelines apply before LM training, with an audit trail of WHICH rule
    fired per document.

    Output, one row per doc:
      (id_col, n_tokens BIGINT, quality DOUBLE, dup_ngram_frac DOUBLE,
       reasons STRING, keep BOOLEAN)
    ``reasons`` is a comma-joined list of failed-rule tags in fixed order
    (too_short, too_long, low_quality, repetitive); '' when kept.

    Scale shape: every signal here is a per-row LINEAR expression — token
    count, the heuristic quality score, and the duplicate-n-gram fraction
    via array_distinct (O(len) per row) — so the whole filter is map-only
    and runs inside the scan stage with zero shuffles at any corpus size.
    The modal-n-gram and duplicate-line signals need per-unit counts and
    live in `repetition_stats` (explode→agg, one shuffle) for pipelines
    that want the full Gopher set; they are deliberately NOT part of this
    gate so that the common path stays a pure map.
    """
    text = F.col(text_col)
    n_tok = token_count_re(text)
    grams = ngrams_col(text, ngram_n)
    dup_frac = F.when(
        F.size(grams) > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams),
    ).otherwise(F.lit(0.0))
    quality = quality_score_col(text)

    rules = [
        ("too_short", n_tok < min_tokens),
        ("too_long", n_tok > max_tokens),
        ("low_quality", quality < min_quality),
        ("repetitive", dup_frac > max_dup_ngram_frac),
    ]
    tags = F.filter(
        F.array(*[F.when(cond, F.lit(tag)) for tag, cond in rules]),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        quality.alias("quality"),
        dup_frac.alias("dup_ngram_frac"),
        F.array_join(tags, ",").alias("reasons"),
        (F.size(tags) == 0).alias("keep"),
    )


# PII patterns: ASCII-class regexes chosen to mean the same thing in Java
# regex (Spark) and RE2 (DuckDB/most engines) — no lookarounds, no unicode
# classes, so the scrub is engine-portable and vectorizable.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d\-() ]{7,}\d"


def scrub_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII anonymization pass (the Dolma / CCNet / BigScience ROOTS
    pre-training hygiene step): replace emails, +international phone
    numbers, and IPv4 literals with typed placeholder tokens, and count
    what was removed so the drop is attributable (no silent scrubbing).

    Output: input columns with ``text`` replaced by the scrubbed text, plus
      (n_emails INT, n_phones INT, n_ips INT) counted on the ORIGINAL text.

    Replacement order is fixed (email -> phone -> ip) so nested matches
    resolve deterministically. Map-only: three regexp counts + three
    chained regexp_replace per row, zero shuffles at any corpus size —
    like `quality_filter`, it runs inside the scan stage.
    """
    text = F.col(text_col)
    out_cols = [c for c in docs.columns if c != text_col]
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IPV4_RE,
        "<IP>",
    )
    return docs.select(
        *out_cols,
        scrubbed.alias(text_col),
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), 0)).alias("n_phones"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), 0)).alias("n_ips"),
    )


def unigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean unigram log-probability — the CCNet-style LM
    quality proxy (Wenzek et al. 2020 §3.3 score documents with a language
    model; the unigram member of that family is exactly expressible in
    relational ops, no model artifact needed). Fluent prose built from
    common tokens scores high; gibberish, rare-token soup and boilerplate
    ID dumps score low — rank or threshold on it like any quality signal.

    Model: add-one-smoothed unigram MLE over ``ref_docs`` (default: the
    corpus itself — self-scoring, the usual bootstrap when no clean
    reference corpus exists):  P(t) = (c_t + 1) / (total + vocab), with
    unseen tokens getting the floor 1 / (total + vocab).

    Output, one row per input doc:
      (id_col, n_tokens BIGINT, avg_logprob DOUBLE)   -- ln-space mean;
    avg_logprob is NULL for token-less docs (nothing to score).

    Scale shape: the count table (O(vocab) rows — SMALL next to the corpus)
    feeds two consumers, the score join and the (total, vocab) normalizer,
    so it is pinned (engine.operators._pins — release via pin_scope) and
    the reference corpus is tokenized exactly ONCE; unpinned, Spark would
    re-run the explode+aggregate per branch. The normalizer itself is a
    lazy 1-row aggregate broadcast into the probability projection (the
    `build_postings_with_idf` pattern — no driver round-trip). Token counts
    are map-side combinable; the final per-doc mean is one more hash
    aggregate. Unseen-token floor = left join + coalesce, so scoring a
    corpus against a separate reference LM has the same plan shape.
    """
    from engine.operators._pins import pin

    ref = docs if ref_docs is None else ref_docs
    ref_toks = ref.select(F.explode(tokenize_col(F.col(text_col))).alias("term"))
    cnt = pin(ref_toks.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("_c")))
    norm = cnt.agg(
        F.sum("_c").alias("_total"), F.count(F.lit(1)).cast("double").alias("_vocab")
    )

    toks = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokenize_col(F.col(text_col))).alias("term")
    )
    scored = (
        toks.join(cnt, "term", "left")
        .crossJoin(F.broadcast(norm))
        .select(
            "_id",
            F.log(
                (F.coalesce(F.col("_c"), F.lit(0.0)) + 1.0)
                / (F.col("_total") + F.col("_vocab"))
            ).alias("_lp"),
        )
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_n"), F.avg("_lp").alias("_alp"))
    )
    return docs.join(scored, docs[id_col] == scored["_id"], "left").select(
        F.col(id_col),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_tokens"),
        F.col("_alp").alias("avg_logprob"),
    )
