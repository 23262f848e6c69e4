"""Dedupe family + similarity search tests (exact semantics on small data,
plus the driver's documents/embeddings tables at sf0.001)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from engine.operators import dedupe, similarity

SF = "/root/testdata/sf0.001"


def _jaccard_tokens(a, b):
    import re

    sa = set(re.findall(r"\w+", a.lower()))
    sb = set(re.findall(r"\w+", b.lower()))
    return len(sa & sb) / len(sa | sb)


def test_keep_longest_text(spark):
    df = spark.createDataFrame(
        [("u", "short", 1), ("u", "a longer text", 2), ("v", "x", 3)],
        "url string, text string, id int",
    )
    got = {r.url: (r.text, r.id) for r in dedupe.keep_longest_text(df).collect()}
    assert got["u"] == ("a longer text", 2)
    assert got["v"] == ("x", 3)


def test_keep_max_score(spark):
    df = spark.createDataFrame(
        [("u", 0.1), ("u", 0.9), ("v", 0.5)], "url string, score double"
    )
    got = {r.url: r.score for r in dedupe.keep_max_score(df).collect()}
    assert got == {"u": 0.9, "v": 0.5}


def test_dedupe_exact_text(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in dedupe.dedupe_exact_text(df).collect())
    assert kept == [1, 3]


def _line_dedupe_py(rows, sep="\n"):
    """Exact replay: global keep-first (min doc_id, pos) per trimmed line."""
    occs = []  # (id, pos, line)
    for i, text in rows:
        for pos, raw in enumerate(text.split(sep)):
            line = raw.strip()
            if line:
                occs.append((i, pos, line))
    winner = {}
    for i, pos, line in occs:
        if line not in winner or (i, pos) < winner[line]:
            winner[line] = (i, pos)
    out = {}
    for i, text in rows:
        kept, total = [], 0
        for pos, raw in enumerate(text.split(sep)):
            line = raw.strip()
            if not line:
                continue
            total += 1
            if winner[line] == (i, pos):
                kept.append(line)
        out[i] = (sep.join(kept), len(kept), total - len(kept))
    return out


def test_line_dedupe_vs_python_replay(spark):
    rows = [
        (1, "alpha\nboiler plate\n  gamma  \n\nboiler plate"),  # within-doc dup + ws + empty
        (2, "boiler plate\ndelta\nalpha"),  # loses two lines to doc 1
        (3, "boiler plate"),  # boilerplate-only page -> empty text_clean
        (4, "epsilon\nzeta"),
        (5, "   \n\n"),  # whitespace-only doc: 0 lines either way
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_clean, r.n_lines_kept, r.n_lines_dropped)
        for r in dedupe.line_dedupe(df).collect()
    }
    assert got == _line_dedupe_py(rows)
    assert got[3] == ("", 0, 1)
    assert got[5] == ("", 0, 0)
    # corpus-wide invariant: every distinct line survives exactly once
    all_kept = [
        ln for t, _, _ in got.values() if t for ln in t.split("\n")
    ]
    assert len(all_kept) == len(set(all_kept))


def test_token_jaccard_pairs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a lazy dog"),
        (3, "completely unrelated content about spark shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.jaccard for r in dedupe.token_jaccard_pairs(df, threshold=0.5).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == pytest.approx(_jaccard_tokens(rows[0][1], rows[1][1]))


def test_token_jaccard_frequent_shingle_cutoff(spark):
    """Cutoff drops hot shingles from CANDIDATE GENERATION only: pairs found
    via surviving shingles keep their exact (full-set) Jaccard; pairs whose
    entire overlap is hot shingles are skipped."""
    rows = [
        (1, "common common alpha beta gamma"),
        (2, "common common alpha beta delta"),
        (3, "common common zeta eta theta"),
        (4, "common common zeta eta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # unigram shingles; 'common' has df=4, everything else ≤ 2
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedupe.token_jaccard_pairs(df, threshold=0.4, max_shingle_df=None).collect()
    }
    cut = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedupe.token_jaccard_pairs(df, threshold=0.4, max_shingle_df=3).collect()
    }
    # hot shingle 'common' no longer blocks, but (1,2)/(3,4) still share
    # non-hot shingles — and their Jaccard values are the exact full-set ones
    assert set(cut) == set(full) == {(1, 2), (3, 4)}
    for k in cut:
        assert cut[k] == pytest.approx(full[k], abs=1e-12)
    # pairs overlapping ONLY via the hot shingle (e.g. 1-3) are absent from
    # candidates even at threshold 0 when the cutoff is active
    lo = {
        (r.id_a, r.id_b)
        for r in dedupe.token_jaccard_pairs(df, threshold=0.0, max_shingle_df=3).collect()
    }
    assert (1, 3) not in lo
    lo_full = {
        (r.id_a, r.id_b)
        for r in dedupe.token_jaccard_pairs(df, threshold=0.0, max_shingle_df=None).collect()
    }
    assert (1, 3) in lo_full


def test_minhash_lsh_finds_near_dups(spark):
    base = "pagerank computes stationary distribution of the random surfer on the web graph "
    rows = [
        (1, base * 3),
        (2, base * 3 + "with one extra tail sentence here"),
        (3, "unrelated document about cooking recipes and baking bread at home in the oven"),
        (4, base * 3),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in dedupe.minhash_lsh_dedupe_pairs(df, threshold=0.5).collect()}
    assert (1, 4) in pairs
    assert (1, 2) in pairs and (2, 4) in pairs
    assert not any(3 in p for p in pairs)

    kept = sorted(
        r.doc_id
        for r in dedupe.drop_near_duplicates(
            df, dedupe.minhash_lsh_dedupe_pairs(df, threshold=0.5)
        ).collect()
    )
    assert kept == [1, 3]


def test_minhash_md5_twin_structural_equivalence(spark):
    """hash_fn='md5' runs the SAME banding/cap/star/verify code path as the
    default xxhash64 and must find the same verified near-dup pairs on the
    canonical fixture (verification is exact Jaccard, so any recall gap
    between the two hash families would surface as a missing pair). The md5
    signatures themselves are pinned against a hashlib twin — the
    portability contract the d3b DuckDB oracle relies on."""
    import hashlib

    base = "pagerank computes stationary distribution of the random surfer on the web graph "
    rows = [
        (1, base * 3),
        (2, base * 3 + "with one extra tail sentence here"),
        (3, "unrelated document about cooking recipes and baking bread at home in the oven"),
        (4, base * 3),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    xx = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedupe.minhash_lsh_dedupe_pairs(df, threshold=0.5).collect()
    }
    md = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedupe.minhash_lsh_dedupe_pairs(df, threshold=0.5, hash_fn="md5").collect()
    }
    assert xx == md  # same pairs AND same exact-Jaccard values
    assert {(1, 4), (1, 2), (2, 4)} <= {(a, b) for a, b, _ in md}

    # signature arithmetic: engine md5 mins == hashlib twin over the same
    # 3-gram shingle sets (60-bit top-15-hex integers)
    sigs = {
        r.doc: [r[f"mh{j}"] for j in range(16)]
        for r in dedupe.minhash_signatures(df, hash_fn="md5").collect()
    }

    def shingles(text):
        import re

        toks = re.findall(r"[a-z0-9_]+", text.lower())
        if len(toks) >= 3:
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)}

    for doc_id, text in rows:
        want = [
            min(
                int(hashlib.md5(f"{j}|{s}".encode()).hexdigest()[:15], 16)
                for s in shingles(text)
            )
            for j in range(16)
        ]
        assert sigs[doc_id] == want, doc_id


def test_simhash_fingerprints_deterministic(spark):
    text1 = " ".join(f"tok{i}" for i in range(150))
    rows = [(1, text1), (2, text1), (3, "totally different words nothing shared")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc: r.simhash for r in dedupe.simhash_fingerprints(df).collect()}
    assert fps[1] == fps[2]  # identical text → identical fingerprint
    assert fps[1] != fps[3]
    fps2 = {r.doc: r.simhash for r in dedupe.simhash_fingerprints(df).collect()}
    assert fps == fps2  # rerun-deterministic


def test_simhash_md5_twin_matches_python(spark):
    """hash_fn='md5' (the d4b portability contract): the 60-bit engine
    fingerprints equal a hashlib/pure-Python recomputation bit-for-bit."""
    import hashlib
    import re
    from collections import Counter

    rows = [
        (1, "pagerank ranks the web graph by the random surfer model"),
        (2, "pagerank ranks the web graph by the random surfer model"),
        (3, "cooking bread at home requires flour water salt and patience"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc: r.simhash for r in dedupe.simhash_fingerprints(df, hash_fn="md5").collect()}
    assert fps[1] == fps[2] and fps[1] != fps[3]
    for doc_id, text in rows:
        tf = Counter(re.findall(r"[a-z0-9_]+", text.lower()))
        sums = [0] * 60
        for term, cnt in tf.items():
            h = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
            for i in range(60):
                sums[i] += cnt if (h >> i) & 1 else -cnt
        want = sum(1 << i for i in range(60) if sums[i] > 0)
        assert fps[doc_id] == want, doc_id
    fps2 = {r.doc: r.simhash for r in dedupe.simhash_fingerprints(df, hash_fn="md5").collect()}
    assert fps == fps2  # rerun-deterministic


def test_simhash_near_pairs_banding(spark):
    # handcrafted fingerprints with known hamming distances
    f1 = 0b1010_1111_0000_1100
    rows = [
        (1, f1),
        (2, f1 ^ 0b0110),  # hamming 2
        (3, f1 ^ ((1 << 62) | (1 << 40) | (1 << 20) | 1)),  # hamming 4, spread across chunks
        (4, ~f1 & 0x7FFFFFFFFFFFFFFF),  # far
    ]
    fps = spark.createDataFrame(rows, "doc long, simhash long")
    got = {(r.id_a, r.id_b): r.hamming for r in dedupe.simhash_near_pairs(fps, max_hamming=3).collect()}
    assert got == {(1, 2): 2}
    # distance-4 pair IS found as a candidate when the budget allows
    # (4 chunks pigeonhole guarantees candidates for hamming < 4; here the 4
    # flipped bits land in 4 distinct chunks — verify exclusion was by the
    # hamming filter, not a banding miss, by widening max_hamming)
    wide = {(r.id_a, r.id_b): r.hamming for r in dedupe.simhash_near_pairs(fps, max_hamming=64).collect()}
    assert (1, 3) not in wide  # all 4 chunks differ → correctly not a candidate
    assert wide[(1, 2)] == 2


def test_minhash_hot_bucket_cap_adversarial(spark):
    """The dominant web-scale case: 10⁴ boilerplate-IDENTICAL docs share
    every band, so the uncapped (band, bucket) self-join would emit ~10⁸
    candidate rows (k² blowup). With the cap: hot buckets are dropped from
    the join, the signature-star re-connects the identical docs in O(k)
    rows, drop counts are surfaced (no silent caps), and near-dup clustering
    still collapses the clones to one representative."""
    n = 10_000
    base = "identical boilerplate page body shared by every mirror of the site"
    clones = spark.range(n).select(F.col("id").alias("doc_id"), F.lit(base).alias("text"))
    docs = clones.union(
        spark.createDataFrame(
            [(n, "one unique document about completely different matters entirely")],
            "doc_id long, text string",
        )
    )
    metrics: dict = {}
    pairs = dedupe.minhash_lsh_dedupe_pairs(
        docs, threshold=0.5, max_bucket_size=100, metrics=metrics
    )
    # bounded: exactly the n-1 star pairs (rep=0 -> clone), all jaccard 1.0
    got = pairs.collect()
    assert len(got) == n - 1
    assert all(r.id_a == 0 and r.jaccard == 1.0 for r in got)
    assert metrics["minhash_buckets_dropped"] > 0
    assert metrics["minhash_bucket_rows_dropped"] >= n  # ≥ one full band of clones
    kept = sorted(r.doc_id for r in dedupe.drop_near_duplicates(docs, pairs).collect())
    assert kept == [0, n]


def test_simhash_hot_bucket_cap_adversarial(spark):
    """Same k²-blowup guard on the SimHash (chunk, piece) join: identical
    fingerprints re-connect via the fingerprint star at hamming 0."""
    n = 10_000
    fps = spark.range(n).select(F.col("id").alias("doc"), F.lit(0x1234ABCD5678 << 8).alias("simhash"))
    fps = fps.union(spark.createDataFrame([(n, 0x7FFFFFFFFFFFFFFF)], "doc long, simhash long"))
    metrics: dict = {}
    got = dedupe.simhash_near_pairs(fps, max_hamming=3, max_bucket_size=100, metrics=metrics).collect()
    assert len(got) == n - 1
    assert all(r.id_a == 0 and r.hamming == 0 for r in got)
    assert metrics["simhash_buckets_dropped"] > 0


def test_simhash_cap_parity_on_small_data(spark):
    """A cap that never triggers must not change results (star pairs are a
    subset of the uncapped candidate set)."""
    f1 = 0b1010_1111_0000_1100
    rows = [(1, f1), (2, f1 ^ 0b0110), (3, f1), (4, ~f1 & 0x7FFFFFFFFFFFFFFF)]
    fps = spark.createDataFrame(rows, "doc long, simhash long")
    uncapped = {
        (r.id_a, r.id_b): r.hamming
        for r in dedupe.simhash_near_pairs(fps, max_hamming=3, max_bucket_size=None).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.hamming
        for r in dedupe.simhash_near_pairs(fps, max_hamming=3, max_bucket_size=1000).collect()
    }
    assert capped == uncapped == {(1, 2): 2, (1, 3): 0, (2, 3): 2}


def test_hyperplane_hot_bucket_cap_adversarial(spark):
    """The hyperplane LSH bucket join gets the same guard: 10⁴ identical
    embeddings share every (table, bucket); capped, every clone keeps its
    cosine-1 rep as a candidate via the both-direction signature star."""
    n = 10_000
    clones = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.5), F.lit(0.25), F.lit(0.0)).cast("array<float>").alias("embedding"),
    )
    df = clones.union(
        spark.createDataFrame(
            [(n, [0.0, 0.0, 0.0, 1.0])], "vec_id long, embedding array<float>"
        )
    )
    metrics: dict = {}
    top1 = similarity.lsh_ann_topk(
        df, k=1, planes_per_table=4, tables=2, max_bucket_size=100, metrics=metrics
    )
    got = {r.query_id: (r.neighbor_id, r.cosine) for r in top1.collect()}
    assert metrics["hyperplane_buckets_dropped"] > 0
    # every clone's nearest neighbor is its rep (or, for the rep, some clone)
    assert got[0][0] in range(1, n) and got[0][1] == pytest.approx(1.0)
    for q in (1, 17, n - 1):
        assert got[q] == (0, pytest.approx(1.0))


def test_cosine_topk_exact(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.query_id, r.knn_rank): r.neighbor_id
        for r in similarity.cosine_topk(df, k=1).collect()
    }
    assert got[(1, 1)] == 2 and got[(2, 1)] == 1
    c = {(r.id_a, r.id_b): r.cosine for r in similarity.cosine_pairs(df).collect()}
    assert c[(1, 2)] == pytest.approx(0.9 / math.sqrt(0.81 + 0.01), rel=1e-6)
    assert c[(1, 3)] == pytest.approx(0.0, abs=1e-9)


def test_lsh_ann_recall_on_testdata(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = similarity.cosine_topk(emb, k=3)
    approx = similarity.lsh_ann_topk(emb, k=3, planes_per_table=4, tables=12)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"LSH recall too low: {recall}"
    # determinism: identical rerun
    a2 = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_ann_topk(emb, k=3, planes_per_table=4, tables=12).collect()
    }
    assert a == a2


def test_embedding_near_duplicates(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.999, 0.001]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in similarity.embedding_near_duplicates(df, 0.99).collect()}
    assert pairs == {(1, 2)}


def test_block_grid_sweep_no_cross_join(spark):
    """The exact pairwise sweep must distribute as block-grid equi-joins —
    no BroadcastNestedLoopJoin / CartesianProduct anywhere in the plan."""
    from engine.plans import inspect as pi

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    for df in (
        similarity.cosine_pairs(emb, num_blocks=4),
        similarity.cosine_topk(emb, k=3, num_blocks=4),
        similarity.embedding_near_duplicates(emb, 0.35, num_blocks=4),
    ):
        plan = pi.physical_plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_block_grid_partition_invariant(spark):
    """Block count is a physical knob: 1 block vs 5 blocks must yield the
    identical pair set (every unordered/ordered pair appears exactly once)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p1 = {(r.id_a, r.id_b): r.cosine for r in similarity.cosine_pairs(emb, num_blocks=1).collect()}
    p5 = {(r.id_a, r.id_b): r.cosine for r in similarity.cosine_pairs(emb, num_blocks=5).collect()}
    assert set(p1) == set(p5)
    for k in p1:
        assert p1[k] == pytest.approx(p5[k], abs=1e-12)
    t1 = {(r.query_id, r.knn_rank): r.neighbor_id for r in similarity.cosine_topk(emb, k=2, num_blocks=1).collect()}
    t4 = {(r.query_id, r.knn_rank): r.neighbor_id for r in similarity.cosine_topk(emb, k=2, num_blocks=4).collect()}
    assert t1 == t4


def test_near_dup_lsh_route_high_threshold(spark):
    """The LSH near-dup route (the 10⁸-vector path) finds high-cosine pairs:
    at genuine near-dup thresholds bucket collision probability is high, and
    the exact-cosine verify makes precision 1.0 by construction."""
    rows = [
        (1, [1.0, 0.01, 0.0, 0.02]),
        (2, [0.999, 0.012, 0.001, 0.021]),  # near-dup of 1
        (3, [0.0, 1.0, 0.02, 0.0]),
        (4, [0.01, 0.998, 0.019, 0.002]),  # near-dup of 3
        (5, [0.3, 0.3, 0.9, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_duplicates(df, 0.99, method="exact").collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_duplicates(df, 0.99, method="lsh", tables=16).collect()
    }
    assert lsh == exact == {(1, 2), (3, 4)}
    # precision: every LSH pair is exact-verified, so lsh ⊆ exact always
    assert lsh <= exact


def test_boilerplate_hot_bucket_cap_end_to_end(spark):
    """Adversarial boilerplate corpus (VERDICT r3 #4): a block of identical
    docs makes every LSH band bucket hot. The cap must (a) bound the
    candidate set far below the uncapped k² blowup, (b) report its drops in
    metrics (no silent caps), and (c) still collapse the exact-dup block to
    ONE representative via the signature-identical star union."""
    from engine import datagen
    from engine.operators._pins import pin_scope

    n_docs, n_boiler, cap = 1500, 600, 100
    docs = datagen.generate_boilerplate_docs(spark, n_docs, n_boiler, seed=7).persist()
    try:
        with pin_scope():
            metrics = {}
            pairs = dedupe.minhash_lsh_dedupe_pairs(
                docs, threshold=0.8, max_bucket_size=cap, metrics=metrics
            )
            kept = dedupe.drop_near_duplicates(docs, pairs)
            kept_ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
        # (c) exact-dup block -> exactly its min-id representative survives
        assert [i for i in kept_ids if i < n_boiler] == [0]
        # unique docs are all kept (verification is exact Jaccard)
        assert len(kept_ids) == n_docs - n_boiler + 1
        # (b) the cap fired and said so
        assert metrics["minhash_buckets_dropped"] >= 1
        assert metrics["minhash_bucket_rows_dropped"] >= n_boiler
        # (a) candidate-set blowup guard: uncapped emits >= C(n_boiler, 2)
        # pairs for the block alone; capped stays orders of magnitude below
        with pin_scope():
            sigs = dedupe.minhash_signatures(docs)
            capped = dedupe.minhash_lsh_candidates(sigs, max_bucket_size=cap).count()
        with pin_scope():
            sigs = dedupe.minhash_signatures(docs)
            uncapped = dedupe.minhash_lsh_candidates(sigs, max_bucket_size=None).count()
        assert uncapped >= n_boiler * (n_boiler - 1) // 2
        assert capped <= uncapped / 50
    finally:
        docs.unpersist()


# ---------------------------------------------------------------- IVF ANN


def test_ivf_probe_all_matches_exact(spark):
    """nprobe = k_centroids probes every cell, so the candidate set is ALL
    ordered pairs and the result must equal cosine_topk row-for-row — the
    plumbing-exactness gate: IVF recall loss may come only from probing
    fewer cells, never from assignment/join/re-rank mechanics."""
    from engine.operators import ivf

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r.query_id, r.knn_rank): r.neighbor_id
        for r in similarity.cosine_topk(emb, k=3).collect()
    }
    got = {
        (r.query_id, r.knn_rank): r.neighbor_id
        for r in ivf.ivf_ann_topk(emb, k=3, k_centroids=8, nprobe=8, iters=2).collect()
    }
    assert got == exact


def test_ivf_train_deterministic_normalized_and_small_n(spark):
    import numpy as np

    from engine.operators import ivf

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = ivf.ivf_train(emb, k_centroids=8, iters=2)
    c2 = ivf.ivf_train(emb, k_centroids=8, iters=2)
    assert np.array_equal(c1, c2)  # hash sample + hash seeds + argmax: no RNG
    assert c1.shape == (8, 64)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)  # spherical k-means
    # fewer vectors than centroids: k_eff collapses to n, queries still work
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    tiny = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c3 = ivf.ivf_train(tiny, k_centroids=32, iters=1)
    assert c3.shape == (3, 4)
    out = ivf.ivf_ann_topk(tiny, k=1, nprobe=3, centroids=c3).collect()
    assert len(out) == 3


def test_ivf_recall_assign_and_cell_cap(spark):
    from engine.operators import ivf

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c = ivf.ivf_train(emb, k_centroids=16, iters=3)
    exact = {(r.query_id, r.neighbor_id) for r in similarity.cosine_topk(emb, k=3).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf.ivf_ann_topk(emb, k=3, nprobe=4, centroids=c).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 64-dim near-uniform vectors are IVF's hardest case (centroid cells
    # barely separate); the smoke-measured value is ~0.64 at nprobe=4/k=16
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # assignment: every vector lands in exactly one in-range cell
    assign = ivf.ivf_assign(emb, c).collect()
    assert len(assign) == emb.count()
    assert all(0 <= r.cid < c.shape[0] for r in assign)
    # adversarial cell cap: every cell is hot at max_cell_size=1, metrics
    # account for the drops (the dedupe._cap_hot_buckets contract)
    m: dict = {}
    capped = ivf.ivf_ann_topk(emb, k=3, nprobe=4, centroids=c, max_cell_size=1, metrics=m)
    assert capped.count() == 0
    assert m["ivf_cell_buckets_dropped"] >= 1
    assert m["ivf_cell_bucket_rows_dropped"] >= m["ivf_cell_buckets_dropped"]


def test_ivf_assignment_plan_arrow_batched(spark):
    """The Python surface of IVF (centroid assignment) must be Arrow-batched
    — ArrowEvalPython in the plan, never row-at-a-time BatchEvalPython."""
    import numpy as np

    from engine.operators import ivf
    from engine.plans import inspect as pi

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c = np.eye(4, 64, dtype=np.float64)
    plan = pi.physical_plan(ivf.ivf_assign(emb, c))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    plan = pi.physical_plan(ivf.ivf_ann_topk(emb, k=2, nprobe=2, centroids=c))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_generate_embeddings_deterministic_and_clustered(spark):
    from engine import datagen

    a = {r.vec_id: list(r.embedding) for r in
         datagen.generate_embeddings_df(spark, 60, dim=8, n_clusters=4, seed=3).collect()}
    b = {r.vec_id: list(r.embedding) for r in
         datagen.generate_embeddings_df(spark, 60, dim=8, n_clusters=4, seed=3).collect()}
    assert a == b  # pure xxhash64 expressions: no RNG state anywhere
    assert set(a) == set(range(60)) and all(len(v) == 8 for v in a.values())
    c = {r.vec_id: list(r.embedding) for r in
         datagen.generate_embeddings_df(spark, 60, dim=8, n_clusters=4, seed=4).collect()}
    assert a != c
    # planted clusters: same-cluster vectors must be closer (cosine) than
    # cross-cluster on average — the property that makes ANN benchmarks real
    import numpy as np

    import pyspark.sql.functions as F
    cid = {r.vec_id: r.cid for r in
           datagen.generate_embeddings_df(spark, 60, dim=8, n_clusters=4, seed=3)
           .select("vec_id", F.pmod(F.xxhash64(F.lit(3), F.col("vec_id")), F.lit(4)).alias("cid"))
           .collect()}
    vecs = {i: np.array(v) / np.linalg.norm(v) for i, v in a.items()}
    same, cross = [], []
    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i < j:
                (same if cid[i] == cid[j] else cross).append(float(vecs[i] @ vecs[j]))
    assert np.mean(same) > np.mean(cross) + 0.2


def test_cross_doc_ngram_dups_vs_python_oracle(spark):
    import re
    from collections import defaultdict

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),   # shares the 5-gram prefix span
        (3, "one two three four five six seven"),    # unique content
        (4, "alpha beta gamma delta epsilon zeta"),  # exact dup of doc 1
        (5, "too short"),                            # < n tokens -> no spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 5
    got = {
        r.doc_id: r
        for r in dedupe.cross_doc_ngram_dups(df, n=n, min_docs=2).collect()
    }

    grams_by_doc, docs_by_gram = {}, defaultdict(set)
    for doc_id, text in rows:
        toks = re.findall(r"\w+", text.lower())
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        grams_by_doc[doc_id] = grams
        for g in grams:
            docs_by_gram[g].add(doc_id)

    expected_ids = {d for d, g in grams_by_doc.items() if g}
    assert set(got) == expected_ids  # doc 5 absent (no spans)
    for doc_id in expected_ids:
        grams = grams_by_doc[doc_id]
        dup = sum(1 for g in grams if len(docs_by_gram[g]) >= 2)
        r = got[doc_id]
        assert (r.n_positions, r.dup_positions) == (len(grams), dup), doc_id
        assert abs(r.dup_frac - dup / len(grams)) < 1e-12

    # exact dup pair saturates; unique doc has zero duplicated spans
    assert got[1].dup_frac == got[4].dup_frac == 1.0
    assert got[3].dup_positions == 0


def test_cross_doc_ngram_dups_metrics_and_scale_shape(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    metrics = {}
    from engine.operators._pins import pin_scope

    with pin_scope():
        out = dedupe.cross_doc_ngram_dups(docs, n=5, min_docs=2, metrics=metrics)
        rows = out.collect()
    assert metrics["grams_distinct"] > 0
    assert 0 <= metrics["grams_cross_duplicated"] <= metrics["grams_distinct"]
    assert all(0.0 <= r.dup_frac <= 1.0 for r in rows)
    assert all(r.dup_positions <= r.n_positions for r in rows)
    # the span-marking join must not be a cartesian/broadcast-nested-loop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_vs_python_oracle(spark):
    import re
    from collections import defaultdict

    corpus_rows = [
        (1, "alpha beta gamma delta epsilon zeta eta"),
        (2, "one two three four five six"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "tiny"),  # < n tokens -> can never hit, still present in output
    ]
    bench_rows = [
        (100, "alpha beta gamma delta epsilon something else"),
        (101, "quick brown fox jumps over the lazy dog indeed"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    n = 5
    got = {
        r.doc_id: r
        for r in dedupe.decontaminate(corpus, bench, n=n, min_hits=1).collect()
    }
    assert set(got) == {1, 2, 3, 4}  # every corpus doc, hits or not

    def grams(text):
        toks = re.findall(r"\w+", text.lower())
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench_grams = set().union(*(grams(t) for _, t in bench_rows))
    for doc_id, text in corpus_rows:
        hits = len(grams(text) & bench_grams)
        r = got[doc_id]
        assert r.bench_ngram_hits == hits, doc_id
        assert r.contaminated == (hits >= 1), doc_id
    assert got[1].contaminated and got[3].contaminated
    assert not got[2].contaminated and not got[4].contaminated
    assert got[4].bench_ngram_hits == 0


def test_decontaminate_broadcast_plan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    out = dedupe.decontaminate(corpus, bench, n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the benchmark gram set must be on the broadcast side of the overlap join
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    rows = out.collect()
    assert len(rows) == corpus.count()
    assert any(r.contaminated for r in rows)  # tiny vocab guarantees overlap


def test_bloom_filter_no_false_negatives_and_sane_fpp(spark):
    keys = spark.createDataFrame([(f"key-{i}",) for i in range(2000)], "g string")
    bits, hashes = 1 << 16, 4
    bloom = dedupe.bloom_build(keys, "g", bits, hashes)
    present = keys.crossJoin(F.broadcast(bloom)).filter(
        dedupe.bloom_might_contain(F.col("g"), bits, hashes)
    )
    assert present.count() == 2000  # a Bloom filter NEVER false-negatives

    absent = spark.createDataFrame(
        [(f"absent-{i}",) for i in range(2000)], "g string"
    )
    fp = (
        absent.crossJoin(F.broadcast(bloom))
        .filter(dedupe.bloom_might_contain(F.col("g"), bits, hashes))
        .count()
    )
    # m/n = 32.8 bits/key, k=4 -> theoretical fpp ~0.24%; assert a loose 3%
    assert fp / 2000 < 0.03


def test_decontaminate_bloom_prefilter_is_row_identical(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    exact = {
        (r.doc_id, r.bench_ngram_hits, r.contaminated)
        for r in dedupe.decontaminate(corpus, bench, n=5).collect()
    }
    from engine.operators._pins import pin_scope

    with pin_scope():
        pre = {
            (r.doc_id, r.bench_ngram_hits, r.contaminated)
            for r in dedupe.decontaminate(
                corpus, bench, n=5, prefilter_bits=1 << 20
            ).collect()
        }
    assert pre == exact
    assert any(c for _, _, c in exact)  # the fixture genuinely overlaps


# ---------------------------------------------------------------------------
# embedding whitening / PCA (pre-ANN transform)
# ---------------------------------------------------------------------------

def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_embedding_moments_exact_vs_numpy(spark):
    import numpy as np

    from engine.operators import whitening

    df = _emb(spark)
    X = np.asarray([r.embedding for r in df.collect()], dtype=np.float64)
    got = {(r.i, r.j): r.s for r in whitening.embedding_moments(df).collect()}
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2 + d
    for i in range(d):
        assert got[(i, -1)] == pytest.approx(X[:, i].sum(), abs=1e-3)
        for j in range(i, d):
            assert got[(i, j)] == pytest.approx((X[:, i] * X[:, j]).sum(), abs=1e-3)


def test_embedding_moments_scale_path_matches_exact(spark):
    import numpy as np

    from engine.operators import whitening

    df = _emb(spark)
    parts = whitening.embedding_moments_scale(df).collect()
    n = sum(p.n for p in parts)
    sums = np.sum([p.sums for p in parts], axis=0)
    gram = np.sum([np.asarray(p.gram).reshape(64, 64) for p in parts], axis=0)
    assert n == df.count()
    exact = {(r.i, r.j): r.s for r in whitening.embedding_moments(df).collect()}
    for i in range(64):
        assert sums[i] == pytest.approx(exact[(i, -1)], abs=1e-3)
        for j in range(i, 64):
            assert gram[i, j] == pytest.approx(exact[(i, j)], abs=1e-3)


def test_zca_whitening_gives_identity_covariance(spark):
    import numpy as np

    from engine.operators import whitening

    df = _emb(spark)
    out = whitening.whiten_embeddings(df, mode="zca", eps=1e-9)
    Y = np.asarray([r.whitened for r in out.collect()], dtype=np.float64)
    assert Y.shape[1] == 64
    assert np.allclose(Y.mean(axis=0), 0.0, atol=1e-9)
    cov = np.cov(Y, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(64), atol=1e-5)


def test_pca_topk_decorrelates_and_orders_variance(spark):
    import numpy as np

    from engine.operators import whitening

    df = _emb(spark)
    mean, W = whitening.fit_whitening(df, k=8, eps=1e-9)
    assert W.shape == (8, 64)
    out = whitening.transform_embeddings(df, mean, W)
    Y = np.asarray([r.whitened for r in out.collect()], dtype=np.float64)
    assert Y.shape[1] == 8
    cov = np.cov(Y, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(8), atol=1e-5)  # whitened: unit variance
    # the SAME projection without the 1/sqrt(lambda) scaling must order
    # variance descending — verify against a NumPy-only PCA
    X = np.asarray([r.embedding for r in df.collect()], dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    vals = np.linalg.eigvalsh(C)[::-1]
    proj_var = np.var((X - mean) @ W.T, axis=0) * (vals[:8] + 1e-9)
    assert np.allclose(sorted(proj_var, reverse=True), proj_var, atol=1e-9)


def test_transform_is_arrow_batched(spark):
    from engine.operators import whitening
    from engine.plans import inspect as pi
    import numpy as np

    df = _emb(spark)
    out = whitening.transform_embeddings(df, np.zeros(64), np.eye(64))
    plan = pi.physical_plan(out)
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_knn_classify_clustered_labels(spark):
    import numpy as np

    from engine.operators.similarity import knn_classify

    # two tight clusters around orthogonal axes: every vector's 3 nearest
    # neighbors share its cluster, so LOO prediction is perfect
    rng = np.random.default_rng(7)
    rows = []
    for i in range(12):
        base = np.zeros(8)
        base[0 if i < 6 else 4] = 1.0
        v = base + rng.normal(0, 0.05, 8)
        rows.append((i, [float(x) for x in v], 0 if i < 6 else 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: r for r in knn_classify(df, k=3).collect()}
    assert len(got) == 12
    assert all(r.agree and r.pred_label == r.label and r.pred_votes == 3 for r in got.values())


def test_knn_classify_tie_breaks_to_min_label(spark):
    from engine.operators.similarity import knn_classify

    # query 0 between two singleton clusters of labels 7 and 3 with k=2:
    # one vote each -> tie -> pred 3
    rows = [
        (0, [1.0, 1.0, 0.0, 0.0], 9),
        (1, [1.0, 0.0, 0.0, 0.0], 7),
        (2, [0.0, 1.0, 0.0, 0.0], 3),
        (3, [-1.0, -1.0, 0.0, 0.0], 5),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    r = {x.vec_id: x for x in knn_classify(df, k=2).collect()}[0]
    assert r.pred_label == 3 and r.pred_votes == 1 and not r.agree
