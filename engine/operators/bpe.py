"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch, ACL 2016).

No reference implementation (beyond-reference webtext op, task-brief
"training-data pipeline" family): byte-pair-encoding merge learning is the
standard subword-tokenizer training step of an LLM data pipeline, and its
heavy phase — turning a crawl into a word-frequency dictionary — is
exactly one tokenize + map-side-combinable groupBy over the corpus.
Everything after that runs on the DISTINCT-WORD table, which Zipf bounds
far below corpus size (the classic BPE trick: learn_bpe iterates over the
frequency dict, never the corpus), so per-merge cost is O(vocab · word
length) regardless of corpus scale.

Algorithm (the canonical learn_bpe loop, deterministic tie-break):
  1. words: (word, cnt) from the corpus tokenizer (tfidf.TOKEN_PATTERN).
  2. Each word becomes a symbol array: its characters + a final '</w>'
     end-of-word sentinel (so merges never cross word boundaries and a
     word-final subword is distinguishable from a word-internal one).
  3. Per merge round: count weighted adjacent symbol pairs, pick the
     (count DESC, left ASC, right ASC) argmax — deterministic where
     reference implementations break ties arbitrarily — and rewrite every
     word's symbol array by greedy left-to-right non-overlapping
     replacement of that pair.

The rewrite is a pure-Catalyst `aggregate` fold (no UDF): scanning
symbols left to right, merge when the accumulator's last element is A and
the current symbol is B. Because a merge writes A||B (≠ A for nonempty
B), a just-merged token can never immediately re-merge as the left half
of the same pair, which makes the fold exactly the greedy non-overlap
scan of the reference implementation (e.g. pair (a,a) on 'aaaa' →
[aa, aa], on 'aaa' → [aa, a]).

Scale shape: per merge, one 1-row argmax job (the same per-round driver
cadence as the other iterative kernels' convergence checks — the row IS
the output artifact) and one dictionary-rewrite job; the word table is
localCheckpoint'ed per round to truncate lineage. Oracle:
tests/oracle.py:bpe_train_py (the classic dict-based learn_bpe) and the
`x16_bpe_pairs` contract query gates the distributed pair-count stage
against DuckDB SQL.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from engine.operators.tfidf import tokenize_col

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt BIGINT): corpus word-frequency dictionary — the ONLY
    corpus-sized stage of BPE training (map-side-combinable count)."""
    return (
        docs.select(F.explode(tokenize_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(word, cnt, syms ARRAY<STRING>): characters + the '</w>' sentinel."""
    return words.withColumn(
        "syms",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))),
    )


def pair_counts(symbol_words: DataFrame) -> DataFrame:
    """(a, b, cnt BIGINT): weighted adjacent-symbol pair counts over the
    word dictionary — cnt multiplies each word's corpus frequency. The
    explode multiplies the (small) word table by word length; the count is
    map-side combinable on the (a, b) shuffle."""
    pairs = symbol_words.select(
        F.col("cnt"),
        F.explode(
            # let-bind syms via the 1-element-wrapper transform (HOF lambdas
            # re-evaluate captured outer expressions per element — the
            # ngrams_col rule)
            F.flatten(
                F.transform(
                    F.array(F.col("syms")),
                    # guard: a fully-merged word is ONE symbol, and
                    # sequence(1, 0) would generate a DESCENDING [1, 0]
                    lambda s: F.when(
                        F.size(s) >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size(s) - 1),
                            lambda i: F.struct(
                                F.element_at(s, i).alias("a"),
                                F.element_at(s, i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(
                        F.array().cast("array<struct<a:string,b:string>>")
                    ),
                )
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("cnt").alias("cnt")
    )


def merge_pair_col(syms, left, right):
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (left, right) with left||right inside a symbol array — a pure
    Catalyst aggregate fold (see module docstring for why the fold is
    exactly the reference scan)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (s == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(left, right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


@dataclass
class BpeResult:
    merges: DataFrame  # (rank INT, left STRING, right STRING, pair_count BIGINT)
    words: DataFrame  # (word, cnt, syms) after all merges
    vocab: DataFrame  # (token STRING, cnt BIGINT) final subword vocabulary


def bpe_train(
    docs: DataFrame, num_merges: int = 100, text_col: str = "text"
) -> BpeResult:
    """Learn `num_merges` BPE merges from the corpus. Stops early when no
    adjacent pair occurs twice (count < 2 can't compress). Deterministic:
    (count DESC, left ASC, right ASC) argmax per round."""
    words = initial_symbols(word_counts(docs, text_col)).localCheckpoint(eager=True)
    merge_frames: list[DataFrame] = []
    for rank in range(num_merges):
        best = (
            pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(
                F.lit(rank).alias("rank"),
                F.col("a").alias("left"),
                F.col("b").alias("right"),
                F.col("cnt").alias("pair_count"),
            )
            .localCheckpoint(eager=True)
        )
        row = best.collect()
        if not row or row[0].pair_count < 2:
            break
        merge_frames.append(best)
        words = (
            words.select(
                "word",
                "cnt",
                merge_pair_col(
                    F.col("syms"), F.lit(row[0].left), F.lit(row[0].right)
                ).alias("syms"),
            )
            .localCheckpoint(eager=True)
        )
    spark = docs.sparkSession
    if merge_frames:
        merges = merge_frames[0]
        for f in merge_frames[1:]:
            merges = merges.union(f)
    else:
        merges = spark.createDataFrame(
            [], "rank int, left string, right string, pair_count long"
        )
    vocab = (
        words.select(F.col("cnt"), F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return BpeResult(merges=merges, words=words, vocab=vocab)


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    checkpoint_every: int = 64,
) -> DataFrame:
    """Apply an ordered merge list to new text: (doc columns..., tokens
    ARRAY<STRING>) where tokens is the subword stream (with '</w>' folded
    into word-final subwords' trailing marker kept as-is). Each merge is
    one Catalyst fold over each word's symbols; the plan is compacted
    every `checkpoint_every` merges to bound expression depth. Exact-apply
    path for validation and modest merge lists — a production tokenizer
    would bake the merges into a trie, but the training artifact this
    validates is the same."""
    out = docs.withColumn(
        "_words",
        F.transform(
            tokenize_col(F.col(text_col)),
            lambda w: F.concat(F.split(w, ""), F.array(F.lit(END))),
        ),
    )
    # closure factory: default-arg capture would change the visible lambda
    # arity, which PySpark uses to bind HOF variables
    def _apply(left, right):
        return lambda s: merge_pair_col(s, F.lit(left), F.lit(right))

    for i, (left, right) in enumerate(merges):
        out = out.withColumn(
            "_words", F.transform(F.col("_words"), _apply(left, right))
        )
        if (i + 1) % checkpoint_every == 0:
            out = out.localCheckpoint(eager=True)
    return out.withColumn("tokens", F.flatten(F.col("_words"))).drop("_words")
