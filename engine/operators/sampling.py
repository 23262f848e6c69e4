"""Deterministic hash-based sampling and split assignment.

Training-data curation needs sampling that is REPRODUCIBLE at cluster
scale: `df.sample()` draws per-partition pseudo-random numbers, so its
output changes whenever partitioning, parallelism, or input file order
changes — the exact things that differ between a laptop run and a
1000-executor run, or between two runs of the same pipeline after a
repartition. The fix is content-hash sampling: u(key) = the first 8 hex
digits of md5(key || salt) scaled to [0, 1), so membership depends only
on the row's key and the salt. Properties that matter at 100 TB:

- **Map-only.** No shuffle, no aggregate, no state — a narrow projection
  /filter that fuses into whole-stage codegen around the scan; filters
  push down on top of it.
- **Stable** under repartitioning, AQE re-planning, speculative retries,
  and cluster size. The same (key, salt) lands in the same split forever —
  which is what makes train/test splits *leak-proof across pipeline
  versions*: re-running ingest can add or drop rows but never silently
  moves a document from train to test.
- **Nested**: hash_sample(rate=0.2) is a strict subset of
  hash_sample(rate=0.5) for the same salt (threshold nesting), so
  down-sampled dev corpora are true subsets of the full corpus.
- **Portable**: md5 is engine-independent, so the same assignment is
  computable in any SQL engine for auditing (the DuckDB oracle in
  __spark_entry__ recomputes it bit-for-bit).

Choose distinct salts for independent decisions (e.g. split assignment
vs subsampling) — with the same salt the two decisions are maximally
correlated by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_u(key: Column, salt: str = "") -> Column:
    """Deterministic uniform-[0,1) from a key: first 8 md5 hex digits.

    The key is cast to string first, so integer and string keys with equal
    text representations agree across engines."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(
        float(1 << 32)
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by hashed key.

    splits: ordered {label: weight}; weights must sum to ~1 (validated to
    1e-9). A row lands in the first label whose cumulative weight exceeds
    its u(key) — so the label boundaries, and therefore every assignment,
    are insensitive to row order, partitioning, and cluster size.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if not splits:
        raise ValueError("splits must be non-empty")
    u = hash_u(F.col(key_col), salt)
    labels = list(splits)
    expr = F.lit(labels[-1])  # last label absorbs the 1.0 boundary
    cum = 0.0
    conds = []
    for name, w in list(splits.items())[:-1]:
        cum += w
        conds.append((name, cum))
    for name, bound in reversed(conds):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep rows with u(key) < rate — deterministic, nested across rates."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_u(F.col(key_col), salt) < F.lit(rate))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language corpus mixing:
    keep 100% of low-resource languages, 10% of English). rates maps a
    stratum value to its keep-rate; strata not listed use default_rate.
    Still map-only: the stratum→rate mapping is a CASE expression, not a
    join."""
    for v, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {v!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    rate_expr = F.lit(float(default_rate))
    for v, r in rates.items():
        rate_expr = F.when(F.col(strata_col) == F.lit(v), F.lit(float(r))).otherwise(
            rate_expr
        )
    return df.filter(hash_u(F.col(key_col), salt) < rate_expr)


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 512,
    num_buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """GPT-style sequence packing layout (Brown et al. 2020 §2.3 /
    T5 "packing"): documents are concatenated in a deterministic order and
    chunked into fixed ``max_len``-token training sequences; a document may
    straddle a chunk boundary (that is the point — zero padding waste).
    This computes the LAYOUT (which chunk each document starts in and at
    what offset); the actual token concatenation happens downstream at
    materialization.

    Output, one row per doc:
      (id_col, bucket INT, n_tokens BIGINT, start_offset BIGINT,
       chunk_id BIGINT, chunk_offset BIGINT)

    Scale shape: a single global concatenation order would be one giant
    window over the whole corpus — a single-partition sort at 100 TB. So
    docs are first salted into ``num_buckets`` INDEPENDENT packing streams
    by portable md5 (the `hash_u` family — layout is engine- and
    partitioning-independent, NOT a Spark-hash artifact), and the running
    token offset is a window cumsum within bucket ordered by (id) — each
    bucket's window is its own partition, so the sort parallelizes and any
    engine reproduces the identical layout. Chunks never cross buckets;
    per-bucket tail waste is < max_len tokens, negligible at corpus scale.
    """
    from engine.operators.textstats import token_count_re
    from pyspark.sql import Window

    bucket = F.floor(hash_u(F.col(id_col), salt) * num_buckets).cast("int")
    base = docs.select(
        F.col(id_col),
        bucket.alias("bucket"),
        token_count_re(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    return base.select(
        id_col,
        "bucket",
        "n_tokens",
        start,
        F.floor((cum - F.col("n_tokens")) / max_len).cast("long").alias("chunk_id"),
        ((cum - F.col("n_tokens")) % max_len).cast("long").alias("chunk_offset"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    metrics: dict | None = None,
) -> DataFrame:
    """Keep at most `cap` rows per group — the C4/Gopher-style domain
    balancing step ("at most N pages per host"), generalizing the
    keep-one dedupe argmax (dedupe.keep_longest_text) to top-N.

    Deterministic and engine-portable: rows within a group are ranked by
    `order_by` (default: id_col asc) with id_col as the final tie-break,
    so the kept set never depends on partitioning or cluster size.

    Spark shape: ONE hash shuffle on the group key + a per-group window
    row_number. Each group sorts independently inside its partition —
    the standard top-N-per-key plan; a pathologically hot group (one
    host owning a double-digit share of the corpus) spills that one
    partition's sort, never the job. `metrics={}` receives the number of
    groups that hit the cap and the rows dropped (no silent caps)."""
    from pyspark.sql.window import Window

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    order = list(order_by) if order_by else []
    order.append(F.col(id_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    ranked = df.withColumn("_rn", F.row_number().over(w))
    if metrics is not None:
        over = (
            ranked.filter(F.col("_rn") > cap)
            .agg(
                F.countDistinct(group_col).alias("g"),
                F.count(F.lit(1)).alias("d"),
            )
            .collect()[0]
        )
        metrics["groups_capped"] = int(over["g"])
        metrics["rows_dropped"] = int(over["d"])
    return ranked.filter(F.col("_rn") <= cap).drop("_rn")
