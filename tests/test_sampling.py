"""Deterministic hash sampling / split assignment: stability, nesting,
stratification, and cross-engine portability of the md5 arithmetic."""

from __future__ import annotations

import pytest

from engine.operators.sampling import (
    hash_sample,
    hash_split,
    hash_u,
    stratified_hash_sample,
)
from engine.operators import sampling


def _ids(spark, n=4000):
    return spark.range(0, n).selectExpr("id AS doc_id")


def test_hash_split_exhaustive_disjoint_and_fractions(spark):
    n = 4000
    out = hash_split(
        _ids(spark, n), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v1"
    )
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == n  # exhaustive + disjoint (one label per row)
    assert set(counts) == {"train", "val", "test"}
    # md5 uniformity at n=4000: loose 3-sigma-ish bands
    assert abs(counts["train"] / n - 0.8) < 0.03
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02


def test_hash_split_stable_under_repartition(spark):
    df = _ids(spark, 1000)
    splits = {"a": 0.5, "b": 0.5}
    one = {r.doc_id: r.split for r in hash_split(df.repartition(3), "doc_id", splits).collect()}
    two = {r.doc_id: r.split for r in hash_split(df.repartition(11), "doc_id", splits).collect()}
    assert one == two  # assignment depends only on (key, salt), never layout


def test_hash_sample_nested_and_rate(spark):
    df = _ids(spark, 4000)
    small = {r.doc_id for r in hash_sample(df, "doc_id", 0.2, salt="s").collect()}
    big = {r.doc_id for r in hash_sample(df, "doc_id", 0.5, salt="s").collect()}
    assert small <= big  # threshold nesting
    assert abs(len(small) / 4000 - 0.2) < 0.03
    assert abs(len(big) / 4000 - 0.5) < 0.03
    # a different salt draws an (almost surely) different subset
    other = {r.doc_id for r in hash_sample(df, "doc_id", 0.2, salt="t").collect()}
    assert other != small


def test_stratified_rates_and_default(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_hash_sample(
        df, "doc_id", "lang", {"en": 0.2, "de": 1.0}, default_rate=0.0, salt="mix"
    )
    got = out.groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in got}
    assert counts.get("de") == 1000  # rate 1.0 keeps every row
    assert "fr" not in counts  # default 0.0 drops unlisted strata
    assert abs(counts["en"] / 1000 - 0.2) < 0.05


def test_split_weight_validation(spark):
    df = _ids(spark, 10)
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", 1.5)
    with pytest.raises(ValueError):
        stratified_hash_sample(df, "doc_id", "doc_id", {"x": 2.0})


def test_hash_u_matches_duckdb(spark):
    """The portability claim, checked directly: Spark's u(key) equals the
    DuckDB recomputation bit-for-bit for 500 keys."""
    import duckdb

    from pyspark.sql import functions as F

    df = _ids(spark, 500).select("doc_id", hash_u(F.col("doc_id"), "v1").alias("u"))
    got = {r.doc_id: r.u for r in df.collect()}
    want = dict(
        duckdb.sql(
            "SELECT range AS doc_id, ('0x' || substring(md5(range::VARCHAR || 'v1'), 1, 8))::BIGINT"
            " / 4294967296.0 AS u FROM range(500)"
        ).fetchall()
    )
    assert got == want


def test_sampling_is_map_only(spark):
    """Scale property: the whole split+sample plan is narrow — no Exchange."""
    df = hash_split(
        hash_sample(_ids(spark, 100), "doc_id", 0.5, salt="s"),
        "doc_id",
        {"a": 0.5, "b": 0.5},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_layout_invariants(spark):
    import hashlib
    import re

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    max_len, nb = 128, 8
    out = sampling.pack_sequences(docs, max_len=max_len, num_buckets=nb).collect()
    assert len(out) == docs.count()

    # python replay: identical bucket, offsets, chunk assignment
    rows = sorted(
        ((r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()),
    )
    by_bucket: dict[int, int] = {}
    expect = {}
    for doc_id, text in rows:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        u = int(h[:8], 16) / float(1 << 32)
        b = int(u * nb)
        n = len(re.findall(r"\w+", text.lower()))
        start = by_bucket.get(b, 0)
        expect[doc_id] = (b, n, start, start // max_len, start % max_len)
        by_bucket[b] = start + n
    for r in out:
        assert (
            r.bucket, r.n_tokens, r.start_offset, r.chunk_id, r.chunk_offset
        ) == expect[r.doc_id], r.doc_id

    # layout is partitioning-independent: same result at different parallelism
    out2 = sampling.pack_sequences(
        docs.repartition(13), max_len=max_len, num_buckets=nb
    ).collect()
    assert {tuple(r) for r in out2} == {tuple(r) for r in out}
    # every bucket's stream is gapless: offsets tile exactly
    assert all(0 <= r.chunk_offset < max_len for r in out)


def test_cap_per_group_keeps_topn_and_discloses(spark):
    from pyspark.sql import functions as F

    rows = [(i, f"g{i % 3}", 100 - i) for i in range(20)]  # g0:7, g1:7, g2:6
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    metrics = {}
    kept = sampling.cap_per_group(
        df, "source", cap=4, order_by=[F.col("n_chars").desc()], metrics=metrics
    ).collect()
    assert len(kept) == 12
    by_g = {}
    for r in kept:
        by_g.setdefault(r.source, []).append(r.n_chars)
    # per group: the 4 LARGEST n_chars survive (order_by honored)
    for g, vals in by_g.items():
        allv = [100 - i for i in range(20) if f"g{i % 3}" == g]
        assert sorted(vals, reverse=True) == sorted(allv, reverse=True)[:4]
    assert metrics == {"groups_capped": 3, "rows_dropped": 8}


def test_cap_per_group_stable_under_repartition(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 5}") for i in range(100)], "doc_id long, source string"
    )
    a = {(r.doc_id) for r in sampling.cap_per_group(df, "source", 7).collect()}
    b = {
        (r.doc_id)
        for r in sampling.cap_per_group(df.repartition(13), "source", 7).collect()
    }
    assert a == b and len(a) == 35
