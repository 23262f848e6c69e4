"""Deduplication operators: exact, argmax-per-key, MinHash-LSH, SimHash,
token-set Jaccard.

Exact/argmax variants mirror the reference's dedupes (api/build_corpus.py:82-93
edge 'seen' set → distinct; api/main.py:67-83 keep-longest-text;
api/main.py:104-114 keep-max-score). The near-dup family (MinHash+LSH banding,
SimHash hamming, token Jaccard) is the standard training-data-pipeline
extension (no reference impl): everything is pure Catalyst — shingling via
higher-order array functions, hashing via xxhash64, banding via self-joins —
so the whole path is JVM-side and shuffle-bound, not Python-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.operators._pins import pin as _pin  # noqa: F401  (re-exported)
from engine.operators._pins import pin_scope, release_all_pins  # noqa: F401
from engine.operators.tfidf import tokenize_col

# _pin: persist (memory-and-disk) a multi-consumer intermediate. Every LSH
# pipeline below reads its shingle/signature/fingerprint table from 3-4
# downstream subplans; without the pin Spark re-executes the whole upstream
# once per branch (exchange reuse only dedupes the shuffle, not the
# aggregation above it — measured ~2-4× on the full pipelines). Disk-backed
# and partitioned, so pinning stays scale-safe. The CacheManager holds the
# blocks until an explicit unpersist (NOT freed automatically when the
# result plan is dropped) — long-lived sessions should wrap the terminal
# action in `engine.operators._pins.pin_scope()` or call
# `release_all_pins()`; see _pins.py.


# ---------------------------------------------------------------- exact / argmax

def dedupe_exact(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """DISTINCT on the given columns (partial-hash-agg dedupe) — A6."""
    return df.select(*cols).distinct() if cols else df.distinct()


def dedupe_exact_text(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id doc per exact text value (hash-groupBy on the text —
    at scale, group on md5(text) so shuffle keys stay small)."""
    return (
        docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("_h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
        .join(docs, id_col)
    )


def line_dedupe(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """C4-style global line dedup (Raffel et al. 2020 §2.2: keep ONE
    occurrence of every repeated line across the whole corpus).

    Split each doc on `sep`, trim lines, drop empties; for every distinct
    line content keep exactly the occurrence with the smallest
    (doc_id, position) and delete all others corpus-wide; reassemble each
    doc from its surviving lines in original order. Returns
    (id, text_clean STRING, n_lines_kept BIGINT, n_lines_dropped BIGINT)
    with one row per input doc (a doc whose every line lost dedup — the
    boilerplate-only page — keeps an empty text_clean).

    Scale shape: occurrences shuffle by md5(line) — 16-byte keys, never
    the raw text — into a partial-agg min(struct(id,pos)) (map-side
    combine collapses hot boilerplate lines before the exchange); winners
    join back on the same hash key (AQE skew-split handles mega-lines);
    reassembly is one groupBy(id) sort_array/array_join. Two shuffles
    total, both on compact keys.
    """
    lines = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_raw"),
        )
        .select("_id", "_pos", F.trim(F.col("_raw")).alias("_line"))
        .filter(F.col("_line") != "")
        .select("_id", "_pos", "_line", F.md5(F.col("_line").cast("binary")).alias("_h"))
    )
    winners = lines.groupBy("_h").agg(
        F.min(F.struct(F.col("_id").alias("i"), F.col("_pos").alias("p"))).alias("_w")
    )
    kept = (
        lines.join(winners, "_h")
        .filter((F.col("_id") == F.col("_w.i")) & (F.col("_pos") == F.col("_w.p")))
        .select("_id", "_pos", "_line")
    )
    # per-line totals per doc (for the dropped count) and the reassembly
    per_doc = lines.groupBy("_id").agg(F.count(F.lit(1)).alias("_n_total"))
    reassembled = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_pos").alias("p"), F.col("_line").alias("l")))
                ),
                lambda s: s["l"],
            ),
            sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .distinct()
        .join(per_doc, "_id", "left")
        .join(reassembled, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            (
                F.coalesce("_n_total", F.lit(0)) - F.coalesce("n_lines_kept", F.lit(0))
            ).alias("n_lines_dropped"),
        )
    )


def keep_longest_text(pages: DataFrame, key_col: str = "url", text_col: str = "text") -> DataFrame:
    """Per key, keep the row with the longest text (api/main.py:67-83).
    max_by(struct) — single hash aggregate, no window sort."""
    cols = [c for c in pages.columns]
    return (
        pages.groupBy(key_col)
        .agg(
            F.max(
                F.struct(F.length(text_col).alias("_len"), *[F.col(c) for c in cols if c != key_col])
            ).alias("_best")
        )
        .select(key_col, *[F.col(f"_best.{c}") for c in cols if c != key_col])
    )


def keep_max_score(scores: DataFrame, key_col: str = "url", score_col: str = "score") -> DataFrame:
    """Per key, keep the max score (api/main.py:104-114)."""
    return scores.groupBy(key_col).agg(F.max(score_col).alias(score_col))


# ---------------------------------------------------------------- shingling

def word_shingles_col(text_col, n: int = 3):
    """Array of word n-gram shingles (space-joined), pure Catalyst.

    The token array is LET-BOUND via transform(array(toks), t -> ...):
    a higher-order-function lambda captures outer expressions by
    re-evaluation (no CSE across the lambda boundary), so referencing the
    tokenizer regex directly inside the per-position lambda re-runs
    regexp_extract_all once per token — O(len²) regex work per doc
    (measured 4× on the whole MinHash signature stage at sf0.1). Binding
    it to a lambda VARIABLE evaluates it exactly once per row; flatten
    unwraps the 1-element wrapper array."""
    toks = tokenize_col(text_col)

    def sh(t):
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", t)))

    return F.flatten(F.transform(F.array(toks), sh))


def _doc_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return (
        docs.select(F.col(id_col).alias("doc"), word_shingles_col(F.col(text_col), n).alias("sh"))
        .select("doc", F.explode("sh").alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------- cutoffs

MAX_SHINGLE_DF = 10_000  # a shingle shared by k docs contributes k² candidates
MAX_BUCKET_SIZE = 10_000  # an LSH bucket with k members emits k² candidate rows


def _cap_hot_buckets(
    banded: DataFrame,
    keys: list[str],
    max_bucket_size: int | None,
    metrics: dict | None = None,
    label: str = "lsh",
) -> DataFrame:
    """Drop every row belonging to a (keys)-bucket with more than
    `max_bucket_size` members — the k²-blowup guard for LSH candidate
    self-joins (boilerplate-identical web pages share every band; one bucket
    of 10⁶ docs would emit 10¹² candidate rows before distinct()). Same
    df-cutoff pattern as `token_jaccard_pairs`' max_shingle_df.

    No silent caps: pass `metrics={}` to get bucket/row drop counts back
    (one extra small aggregation job); callers are expected to supplement
    exact-duplicate connectivity separately (see the signature-star unions
    in minhash/simhash below) so capping never orphans exact dupes."""
    kept, _ = _cap_hot_buckets_with_hot(banded, keys, max_bucket_size, metrics, label)
    return kept


def _cap_hot_buckets_with_hot(
    banded: DataFrame,
    keys: list[str],
    max_bucket_size: int | None,
    metrics: dict | None = None,
    label: str = "lsh",
) -> tuple[DataFrame, DataFrame | None]:
    """_cap_hot_buckets, additionally returning the hot (keys) bucket keys
    (None when capping is disabled) so callers can build their
    exact-duplicate reconnection star from ONLY the dropped members —
    identical-signature docs always share the same dropped/kept status, so
    restricting the star to dropped members is output-equivalent to a
    full-table star and skips the wide full-signature groupBy when nothing
    (or little) was capped."""
    if max_bucket_size is None:
        return banded, None
    sizes = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bsz"))
    if metrics is not None:
        row = sizes.agg(
            F.count(F.lit(1)).alias("total"),
            F.coalesce(
                F.sum(F.when(F.col("_bsz") > max_bucket_size, F.lit(1))), F.lit(0)
            ).alias("dropped"),
            F.coalesce(
                F.sum(F.when(F.col("_bsz") > max_bucket_size, F.col("_bsz"))), F.lit(0)
            ).alias("rows"),
        ).collect()[0]
        metrics[f"{label}_buckets_total"] = int(row["total"])
        metrics[f"{label}_buckets_dropped"] = int(row["dropped"])
        metrics[f"{label}_bucket_rows_dropped"] = int(row["rows"])
    hot = _pin(sizes.filter(F.col("_bsz") > max_bucket_size).select(*keys))
    return banded.join(hot, keys, "left_anti"), hot


# ---------------------------------------------------------------- token jaccard

def token_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_n: int = 1,
    max_shingle_df: int | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Exact n-gram-set Jaccard over pairs sharing ≥1 non-frequent shingle.

    Blocking on shared shingles means disjoint pairs are never materialized.
    With `max_shingle_df` set, candidate generation drops shingles with
    document frequency > the cutoff (a stop-shingle shared by 10⁶ docs would
    otherwise emit 10¹² candidate rows — the standard published-dedup-pipeline
    cutoff); the Jaccard itself is then verified EXACTLY over the full (uncut)
    shingle sets, so reported values are never approximated. The only
    approximation is recall: a pair whose overlap is exclusively frequent
    shingles is missed — by construction such pairs are dominated by
    boilerplate. The DEFAULT is None (exact blocking, exact-by-construction
    vs an all-pairs oracle); at web scale pass MAX_SHINGLE_DF (or your own
    cutoff) explicitly. With `metrics={}` the cutoff's drop counts are
    reported back (no silent caps).
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    sh = _pin(_doc_shingles(docs, id_col, text_col, shingle_n))
    if max_shingle_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        if metrics is not None:
            row = dfreq.agg(
                F.count(F.lit(1)).alias("total"),
                F.coalesce(
                    F.sum(F.when(F.col("_df") > max_shingle_df, F.lit(1))), F.lit(0)
                ).alias("dropped"),
                F.coalesce(
                    F.sum(F.when(F.col("_df") > max_shingle_df, F.col("_df"))), F.lit(0)
                ).alias("rows"),
            ).collect()[0]
            metrics["shingles_total"] = int(row["total"])
            metrics["shingles_dropped"] = int(row["dropped"])
            metrics["shingle_rows_dropped"] = int(row["rows"])
        hot = dfreq.filter(F.col("_df") > max_shingle_df).select("shingle")
        blockable = sh.join(hot, "shingle", "left_anti")
    else:
        blockable = sh
    cand = (
        blockable.select(F.col("doc").alias("id_a"), "shingle")
        .join(blockable.select(F.col("doc").alias("id_b"), "shingle"), "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(cand, sh, threshold)


def _verify_jaccard(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over candidate pairs, from the full shingle sets."""
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc").alias("id_a"), "shingle")
    b = sh.select(F.col("doc").alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- MinHash + LSH

def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc, mh0..mh{k-1}): k independent min-hashes, hash_j(s) =
    hash(j, s). One exploded pass, one grouped multi-aggregate.

    hash_fn: 'xxhash64' (default — fastest, JVM-native) or 'md5'
    (60-bit md5-hex arithmetic, the walks.py/_hash_idx portability
    contract: bit-identically replayable in DuckDB/any SQL engine, so the
    whole MinHash→LSH→verify path can be externally oracle-graded).

    Aggregates the NON-distinct exploded multiset: min() is insensitive to
    duplicate shingles, and skipping the distinct means the per-doc mins
    fold map-side over the narrow explode — no (doc, shingle) shuffle."""
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles_col(F.col(text_col), shingle_n)).alias("shingle"),
    )
    return _signatures_from_shingles(sh, num_hashes, hash_fn)


def _mh_hash(parts: list, hash_fn: str):
    """One 64-bit-ish hash column from `parts` (cols or lits). md5 mode
    takes the top 15 hex chars (60 bits, sign-safe in BIGINT) of
    md5('p0|p1|...') — DuckDB twin: ('0x' || substring(md5(...),1,15))::BIGINT."""
    if hash_fn == "xxhash64":
        return F.xxhash64(*parts)
    if hash_fn == "md5":
        s = F.concat_ws("|", *[p.cast("string") for p in parts])
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def _signatures_from_shingles(
    sh: DataFrame, num_hashes: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    aggs = [
        F.min(_mh_hash([F.lit(j), F.col("shingle")], hash_fn)).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_candidates(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
    metrics: dict | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Band the signature into `bands` groups of r = k/bands rows; docs
    sharing any band bucket are candidates. Returns distinct (id_a, id_b).

    Hot-bucket guard: (band, bucket) buckets larger than `max_bucket_size`
    are dropped from the self-join (k docs in a bucket emit k² rows — at web
    scale boilerplate-identical pages share EVERY band). Signature-identical
    docs are re-connected via a min-rep star union (O(k) rows, found by one
    hash-agg on the full signature), so exact/near-exact duplicates never
    lose connectivity to the cap; only cross-signature pairs whose sole
    collision is a hot bucket are sacrificed (documented recall cutoff —
    pass `metrics={}` for drop counts). max_bucket_size=None disables."""
    r = num_hashes // bands
    assert bands * r == num_hashes
    signatures = _pin(signatures)
    # one posexplode branch, NOT a union of per-band projections: a union
    # plans the full signature subtree once per band, and Spark re-executes
    # the aggregation behind it for every branch (exchange reuse only
    # dedupes the shuffle, not the agg).
    buckets = [
        _mh_hash([F.col(f"mh{b * r + i}") for i in range(r)], hash_fn)
        for b in range(bands)
    ]
    banded_all = _pin(
        signatures.select(
            "doc", F.posexplode(F.array(*buckets)).alias("band", "bucket")
        )
    )
    banded, hot = _cap_hot_buckets_with_hot(
        banded_all, ["band", "bucket"], max_bucket_size, metrics, "minhash"
    )
    left = banded.select("band", "bucket", F.col("doc").alias("id_a"))
    right = banded.select("band", "bucket", F.col("doc").alias("id_b"))
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if hot is not None:
        # signature-identical star: min-doc rep per full signature -> others.
        # O(group size) rows where the banded join would emit O(size²); a
        # strict subset of the uncapped candidate set (id_a = group min < id_b).
        # Built from the DROPPED-bucket members only: identical signatures
        # imply identical buckets, so a signature group is either wholly
        # capped (star reconnects it here) or wholly kept (the banded join
        # above already pairs it) — skipping the full-table wide groupBy.
        sig_cols = [f"mh{j}" for j in range(num_hashes)]
        dropped_docs = (
            banded_all.join(hot, ["band", "bucket"], "left_semi")
            .select("doc")
            .distinct()
        )
        dsigs = signatures.join(dropped_docs, "doc", "left_semi")
        rep = dsigs.groupBy(*sig_cols).agg(F.min("doc").alias("id_a"))
        star = (
            dsigs.join(rep, sig_cols)
            .filter(F.col("doc") != F.col("id_a"))
            .select("id_a", F.col("doc").alias("id_b"))
        )
        cand = cand.union(star)
    return cand.distinct()


def minhash_lsh_dedupe_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
    metrics: dict | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: candidates from banding, then exact
    Jaccard verification over shingle sets. Returns (id_a, id_b, jaccard).

    Scale shape (all three output-identical to the naive
    shingle→distinct→sign→band→verify chain):
    - signatures aggregate the NON-distinct exploded multiset — min() is
      set-insensitive, and the exploded rows are already co-located with
      their doc row, so the per-doc mins fold map-side with no
      (doc, shingle) shuffle; the corpus-wide distinct never runs.
    - verification shingle sets are built only for docs that appear in a
      candidate pair (left_semi before distinct) — at web scale the
      distinct shuffles candidate docs' shingles, not the corpus's.
    - candidate pairs whose md5(text) fingerprints are equal are exact
      duplicates: jaccard = 1.0 by definition (identical shingle sets),
      emitted directly without set intersection — the boilerplate-heavy
      case (10⁴ clones → 10⁴ star pairs) skips the k×|shingles| verify
      join entirely.
    The exploded multiset feeds the signature aggregate and the verify
    semi-join, so it is pinned (see `_pin`)."""
    raw = _pin(
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(word_shingles_col(F.col(text_col), shingle_n)).alias("shingle"),
        )
    )
    sigs = _signatures_from_shingles(raw, num_hashes, hash_fn)
    cand = minhash_lsh_candidates(
        sigs, num_hashes, bands, max_bucket_size, metrics, hash_fn
    )
    fp = docs.select(F.col(id_col).alias("doc"), F.md5(F.col(text_col)).alias("_fp"))
    # pinned: exact / rest / cand_docs all branch from it
    withfp = _pin(
        cand.join(fp.select(F.col("doc").alias("id_a"), F.col("_fp").alias("_fpa")), "id_a")
        .join(fp.select(F.col("doc").alias("id_b"), F.col("_fp").alias("_fpb")), "id_b")
    )
    exact = withfp.filter(F.col("_fpa").eqNullSafe(F.col("_fpb"))).select(
        "id_a", "id_b", F.lit(1.0).alias("jaccard")
    )
    rest = withfp.filter(~F.col("_fpa").eqNullSafe(F.col("_fpb"))).select("id_a", "id_b")
    cand_docs = (
        rest.select(F.col("id_a").alias("doc"))
        .union(rest.select(F.col("id_b").alias("doc")))
        .distinct()
    )
    sh = _pin(raw.join(cand_docs, "doc", "left_semi").distinct())
    return _verify_jaccard(rest, sh, threshold).union(
        exact.filter(F.col("jaccard") >= threshold)
    )


def drop_near_duplicates(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cluster verified near-dup pairs with the CC kernel (components.py) and
    keep only the min-id representative of each cluster.

    The pair edges are localCheckpointed first: `pairs` typically arrives
    with the whole LSH/verify lineage attached, and feeding that into an
    iterative kernel makes every AQE stage re-plan the full multi-join tree
    (measured 22 s -> 4 s on the 100k-doc boilerplate benchmark for a
    9999-edge star — pure driver-side Catalyst time, no execution change)."""
    from engine.operators.components import connected_components

    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    labels = connected_components(edges, nodes=docs.select(F.col(id_col).alias("id")))
    keep = labels.filter(F.col("id") == F.col("label")).select(F.col("id").alias(id_col))
    return docs.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------- SimHash

def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc, simhash BIGINT): SimHash over tf-weighted tokens.

    Per bit i: s_i = Σ_terms tf · (bit_i(hash(term)) ? +1 : -1);
    fingerprint bit i set iff s_i > 0. One hash agg with a sum per bit —
    all codegen'd, no Python.

    hash_fn: 'xxhash64' (default — 64 bits) or 'md5' (60 bits, the
    minhash/walks md5 60-bit portability arithmetic, so a DuckDB oracle
    can recompute the fingerprints bit-for-bit — see d4b in
    __spark_entry__.py). The downstream banding/verify in
    simhash_near_pairs is width-agnostic (a 60-bit fingerprint simply has
    four zero bits in its top chunk)."""
    nbits = 64 if hash_fn == "xxhash64" else 60
    tf = (
        docs.select(F.col(id_col).alias("doc"), F.explode(tokenize_col(F.col(text_col))).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", _mh_hash([F.col("term")], hash_fn))
    )
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"s{i}")
        for i in range(nbits)
    ]
    sums = tf.groupBy("doc").agg(*aggs)
    fp = None
    for i in range(nbits):
        bit = F.when(F.col(f"s{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return sums.select("doc", fp.alias("simhash"))


def simhash_near_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
    metrics: dict | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Pigeonhole banding: split 64 bits into `chunks` 16-bit pieces; any pair
    within distance < chunks must share a piece — candidates come from
    equi-joins on (chunk_idx, chunk_value), then exact bit_count verify.

    Hot-bucket guard (same k²-blowup class as the MinHash bands): (chunk,
    piece) buckets above `max_bucket_size` are dropped from the self-join;
    fingerprint-identical docs (hamming 0 — the boilerplate case that makes
    buckets hot in the first place) are re-connected via a min-rep star on
    the full 64-bit fingerprint, O(k) rows per group. `metrics={}` reports
    drop counts; max_bucket_size=None disables."""
    width = 64 // chunks
    mask = (1 << width) - 1
    fingerprints = _pin(fingerprints)
    # one posexplode branch instead of a union of per-chunk projections
    # (a union re-executes the fingerprint subtree once per chunk).
    piece_exprs = [
        F.shiftrightunsigned(F.col("simhash"), c * width).bitwiseAND(F.lit(mask))
        for c in range(chunks)
    ]
    banded_all = _pin(
        fingerprints.select(
            "doc", "simhash", F.posexplode(F.array(*piece_exprs)).alias("chunk", "piece")
        )
    )
    banded, hot = _cap_hot_buckets_with_hot(
        banded_all, ["chunk", "piece"], max_bucket_size, metrics, "simhash"
    )
    left = banded.select("chunk", "piece", F.col("doc").alias("id_a"), F.col("simhash").alias("fa"))
    right = banded.select("chunk", "piece", F.col("doc").alias("id_b"), F.col("simhash").alias("fb"))
    cand = (
        left.join(right, ["chunk", "piece"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).alias("hamming"))
    )
    if hot is not None:
        # fingerprint-identical star from DROPPED members only — identical
        # fingerprints share every (chunk, piece) bucket, so a fingerprint
        # group is wholly capped or wholly kept (see minhash_lsh_candidates)
        dropped_docs = (
            banded_all.join(hot, ["chunk", "piece"], "left_semi")
            .select("doc", "simhash")
            .distinct()
        )
        rep = dropped_docs.groupBy("simhash").agg(F.min("doc").alias("id_a"))
        star = (
            dropped_docs.join(rep, "simhash")
            .filter(F.col("doc") != F.col("id_a"))
            .select("id_a", F.col("doc").alias("id_b"), F.lit(0).cast("int").alias("hamming"))
        )
        cand = cand.union(star)
    return cand.distinct().filter(F.col("hamming") <= max_hamming)


def cross_doc_ngram_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
    metrics: dict | None = None,
) -> DataFrame:
    """Fixed-length proxy for exact-substring deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — ExactSubstr):
    a word n-gram occurring in >= ``min_docs`` distinct documents marks a
    cross-document duplicated span; per document we report how many of its
    n-gram positions sit inside such spans. Downstream pipelines drop or
    trim docs with high ``dup_frac`` (the paper cuts 50-token spans; the
    n-gram grid is the shuffle-friendly approximation of its suffix array).

    Output, one row per doc with >= n tokens (shorter docs have no spans):
      (id_col, n_positions BIGINT, dup_positions BIGINT, dup_frac DOUBLE)

    Scale shape: the gram table is one row per token position — the same
    O(corpus tokens) working set as the suffix array. The distinct-doc
    count per gram is a map-side-combinable count after an (id, gram)
    distinct, and the span-marking join probes exactly ONE build row per
    gram key, so boilerplate grams shared by 100k docs contribute 100k
    probe rows, never 100k^2 pairs (the k^2 class the LSH kernels cap does
    not exist here); probe-side key skew is the AQE skew-join case, which
    splits cleanly against a one-row-per-key build side. The gram frame
    feeds three subplans (per-gram DF, per-doc totals, span marking), so it
    is pinned — release via `pin_scope()` / `release_all_pins()`.
    """
    from engine.operators.textstats import ngrams_col

    g = _pin(
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(ngrams_col(F.col(text_col), n)).alias("g"),
        )
    )
    gram_df = g.distinct().groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    dup_grams = gram_df.where(F.col("df") >= min_docs).select("g")
    if metrics is not None:
        row = gram_df.agg(
            F.count(F.lit(1)).alias("grams"),
            F.sum(F.when(F.col("df") >= min_docs, 1).otherwise(0)).alias("dup"),
        ).first()
        metrics["grams_distinct"] = int(row["grams"])
        metrics["grams_cross_duplicated"] = int(row["dup"] or 0)

    total = g.groupBy("id").agg(F.count(F.lit(1)).alias("n_positions"))
    dup = (
        g.join(dup_grams, "g", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("dup_positions"))
    )
    dup_pos = F.coalesce("dup_positions", F.lit(0))
    return (
        total.join(dup, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_positions",
            dup_pos.cast("long").alias("dup_positions"),
            (dup_pos / F.col("n_positions")).alias("dup_frac"),
        )
    )


# ---- Catalyst-native Bloom filter (bit-packed array<long>) ----
#
# Spark's own BloomFilterAggregate/BloomFilterMightContain are NOT in the
# public function registry (they exist only for the optimizer's internal
# runtime row-level filtering), so this builds the same structure out of
# registered expressions: k positions per key from seeded xxhash64, OR'd
# into 63-bit words by one hash aggregate, densified into one array<long>
# row. 63 usable bits per word keep every mask a positive signed long.

_BLOOM_WORD = 63


def _bloom_positions(key, num_bits: int, num_hashes: int):
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)]


def _pow2_array():
    return F.array(*[F.lit(1 << i) for i in range(_BLOOM_WORD)])


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int = 1 << 24, num_hashes: int = 4
) -> DataFrame:
    """1-row DataFrame (_bf array<long>) Bloom filter over keys[key_col].

    Entirely JVM-side, ONE aggregation job folded into the caller's DAG —
    no driver round-trip, no UDF: explode the k bit positions, bit_or them
    into per-word masks, densify via a map lookup over a generated index.
    Size: num_bits/63 longs ≈ num_bits/8 bytes (2 MB at the 2^24 default —
    broadcastable where the raw key strings would be gigabytes). No false
    negatives ever; false-positive rate ≈ (1 - e^(-k·n/m))^k.
    """
    if num_bits > (1 << 30):
        raise ValueError("num_bits > 2^30 not supported (single-row array ceiling)")
    n_words = (num_bits + _BLOOM_WORD - 1) // _BLOOM_WORD
    pos = keys.select(
        F.explode(
            F.array(*_bloom_positions(F.col(key_col), num_bits, num_hashes))
        ).alias("_p")
    )
    words = (
        pos.select(
            (F.col("_p") / _BLOOM_WORD).cast("long").alias("_w"),
            F.element_at(
                _pow2_array(), F.pmod(F.col("_p"), F.lit(_BLOOM_WORD)).cast("int") + 1
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(_m)").alias("_bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("_w", "_bits"))).alias("_map")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda w: F.coalesce(F.col("_map")[w], F.lit(0).cast("long")),
        ).alias("_bf")
    )


def bloom_might_contain(key, num_bits: int, num_hashes: int, bf_col: str = "_bf"):
    """Boolean Column: key possibly inserted (never a false negative).
    Evaluate against a crossJoin(broadcast(bloom_build(...))) frame."""
    cond = F.lit(True)
    for p in _bloom_positions(key, num_bits, num_hashes):
        word = F.element_at(F.col(bf_col), (p / _BLOOM_WORD).cast("int") + 1)
        mask = F.element_at(
            _pow2_array(), F.pmod(p, F.lit(_BLOOM_WORD)).cast("int") + 1
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
    broadcast_benchmark: bool = True,
    prefilter_bits: int | None = None,
    prefilter_hashes: int = 4,
) -> DataFrame:
    """Benchmark decontamination by n-gram overlap (Brown et al. 2020
    GPT-3 Appendix C; the PaLM / Llama train-test-overlap procedure): a
    corpus document is contaminated when it shares >= ``min_hits`` distinct
    word n-grams with ANY benchmark document. Training pipelines drop (or
    flag for eval exclusion) the contaminated rows before training.

    Output, one row per corpus doc:
      (id_col, bench_ngram_hits BIGINT, contaminated BOOLEAN)

    ``bench_ngram_hits`` counts the corpus doc's DISTINCT n-grams that
    appear anywhere in the benchmark (per-doc distinct, so a gram repeated
    inside the doc counts once).

    Scale shape: the benchmark gram set is eval-sized (thousands of docs →
    at most a few million distinct grams) while the corpus is the 100 TB
    side, so the overlap join broadcasts the benchmark grams by default —
    the corpus-side explode→distinct is the only shuffle (map-side
    combinable on (id, gram)), and the probe never moves the corpus across
    the wire for the join itself. Set ``broadcast_benchmark=False`` for a
    benchmark too large to broadcast (falls back to a shuffled hash join
    with one build row per gram key — no pairwise blowup either way).

    ``prefilter_bits``: Bloom-prefilter the corpus grams INSIDE the scan
    stage before the per-doc distinct — the dominant shuffle of this job
    (every gram of the 100 TB corpus) shrinks to the might-contain
    survivors (true overlaps + the fpp tail). Exactness is unchanged:
    the Bloom filter has no false negatives and the exact gram join
    afterwards kills its false positives, so the output is row-identical
    to the unfiltered path — only the physical plan differs. Use when the
    corpus-side gram shuffle, not the benchmark broadcast, is the
    bottleneck; ~num_bits/8 bytes ride the broadcast.
    """
    from engine.operators.textstats import ngrams_col

    bench_grams = (
        benchmark.select(F.explode(ngrams_col(F.col(text_col), n)).alias("g"))
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(ngrams_col(F.col(text_col), n)).alias("g"),
    )
    if prefilter_bits is not None:
        from engine.operators._pins import pin

        # bench grams feed the bloom build AND the exact verify join
        bench_grams = pin(bench_grams)
        bloom = bloom_build(bench_grams, "g", prefilter_bits, prefilter_hashes)
        corpus_grams = (
            corpus_grams.crossJoin(F.broadcast(bloom))
            .filter(bloom_might_contain(F.col("g"), prefilter_bits, prefilter_hashes))
            .drop("_bf")
        )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    corpus_grams = corpus_grams.distinct()
    hits = (
        corpus_grams.join(bench_grams, "g")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("bench_ngram_hits"))
    )
    hit_count = F.coalesce("bench_ngram_hits", F.lit(0))
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            hit_count.cast("long").alias("bench_ngram_hits"),
            (hit_count >= min_hits).alias("contaminated"),
        )
    )
