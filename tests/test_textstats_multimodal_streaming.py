"""Text analysis, multimodal plumbing, and streaming window ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.operators import multimodal, textstats
from engine.streaming import events as ev

SF = "/root/testdata/sf0.001"


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world  foo",), ("",), ("a-b c",)], "text string"
    )
    got = textstats.add_token_counts(df).collect()
    assert [(r.n_tokens_ws, r.n_tokens_re) for r in got] == [(3, 3), (0, 0), (2, 3)]


def test_langid_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it was happy for this day",),
            ("der hund und die katze sind nicht zu hause mit den kindern",),
            ("le chat est dans la maison avec les enfants pour une heure",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    got = [r.lang_pred for r in textstats.add_langid(df).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_quality_and_fingerprints(spark):
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog and keeps running for a while longer in the field today. " * 3),
            (2, "!!! ??? ###"),
        ],
        "doc_id long, text string",
    )
    q = {r.doc_id: r.quality for r in textstats.add_quality(df).collect()}
    assert q[1] > 0.8 and q[2] < 0.4

    fp = textstats.add_fingerprints(df)
    rows = {r.doc_id: (r.fp_md5, r.fp_rolling) for r in fp.collect()}
    assert rows[1][0] != rows[2][0]
    # whitespace-normalization invariance of the md5 fingerprint
    df2 = spark.createDataFrame([(1, "  !!!   ???\n###  ")], "doc_id long, text string")
    fp2 = textstats.add_fingerprints(df2).collect()[0]
    assert fp2.fp_md5 == rows[2][0]


def test_langid_on_documents_table_deterministic(spark):
    # the testdata's lang labels are synthetic (text vocabulary is English
    # regardless of label), so assert determinism + valid codes, not agreement
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p1 = {r.doc_id: r.lang_pred for r in textstats.add_langid(docs).collect()}
    p2 = {r.doc_id: r.lang_pred for r in textstats.add_langid(docs).collect()}
    assert p1 == p2
    assert set(p1.values()) <= {"en", "de", "fr", "und"}


def test_binary_byte_stats(spark):
    df = spark.createDataFrame(
        [(1, bytes([0] * 50)), (2, bytes(range(256))), (3, b"")],
        "id long, media binary",
    )
    got = {r.id: r for r in multimodal.binary_byte_stats(df).collect()}
    assert got[1].n_bytes == 50 and got[1].n_distinct == 1 and got[1].entropy == 0.0
    assert got[2].n_distinct == 256 and got[2].entropy == pytest.approx(8.0)
    assert got[3].n_bytes == 0
    assert got[2].head_hex == "0001020304050607"


def test_media_metadata_sniff(spark):
    df = spark.createDataFrame(
        [(1, b"\xff\xd8\xff\xe0rest"), (2, b"\x89PNG\r\n"), (3, b"plain")],
        "id long, media binary",
    )
    got = {r.id: r.media_kind for r in multimodal.media_metadata(df).collect()}
    assert got == {1: "jpeg", 2: "png", 3: "unknown"}


def test_decode_stub_and_fake(spark):
    df = spark.createDataFrame([(1, b"abcdef")], "id long, media binary")
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        multimodal.decode_image_features(df).collect()
    got = multimodal.decode_image_features(df, decoder=multimodal.fake_decoder).collect()[0]
    assert (got.height, got.width) == (8, 8)
    assert got.mean_px > 0


def test_windowed_event_counts_batch_vs_stream(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = ev.windowed_event_counts(events, window="1 day")
    b = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in batch.collect()}
    assert len(b) > 0

    # file streams need a directory source
    stream_dir = str(tmp_path / "events_stream")
    events.repartition(3).write.parquet(stream_dir)
    stream = ev.read_event_stream(spark, stream_dir)
    sres = ev.run_stream_to_memory(
        ev.windowed_event_counts(stream, window="1 day"), "win_counts", spark
    )
    s = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in sres.collect()}
    # streaming availableNow == batch semantics (float sums up to add order)
    assert set(s) == set(b)
    for k in b:
        assert s[k][0] == b[k][0]
        assert s[k][1] == pytest.approx(b[k][1], rel=1e-12)


def test_session_window_counts(spark):
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, "c", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 7, "c", 1.0, "{}"),
        (3, t0 + dt.timedelta(hours=2), 7, "c", 1.0, "{}"),
        (4, t0, 8, "c", 1.0, "{}"),
    ]
    df = spark.createDataFrame(rows, ev.EVENTS_SCHEMA)
    got = {(r.user_id, r.session_start): r.n_events for r in ev.user_session_counts(df).collect()}
    assert got[(7, t0)] == 2
    assert got[(7, t0 + dt.timedelta(hours=2))] == 1
    assert got[(8, t0)] == 1


def test_stateful_user_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState carries per-user state across micro-batches:
    final emitted totals == batch groupBy aggregate over all events."""
    events = spark.read.parquet(f"{SF}/events.parquet").limit(2000)
    stream_dir = str(tmp_path / "events_stateful")
    # several files -> several micro-batches (maxFilesPerTrigger=1)
    events.repartition(4).write.parquet(stream_dir)

    stream = ev.read_event_stream(spark, stream_dir, max_files=1)
    q = (
        ev.stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.table("user_totals")
    # n_events is monotone per user -> the max row is the final state
    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in emitted.orderBy("user_id", "n_events").collect()
    }
    batch = {
        r.user_id: (r.n_events, r.total_value)
        for r in ev.user_totals_batch(events).collect()
    }
    assert set(final) == set(batch)
    for u in batch:
        assert final[u][0] == batch[u][0]
        assert final[u][1] == pytest.approx(batch[u][1], rel=1e-9)
    # state really spanned multiple batches: more emissions than users
    assert emitted.count() > len(batch)


def test_stream_extract_edges_matches_batch(spark, tmp_path):
    """Incremental ingest: pages arriving in chunks produce exactly the batch
    pipeline's edge multiset; a restart with the same checkpoint is a no-op
    (exactly-once per input file)."""
    from engine import datagen
    from engine.operators import graph
    from engine.streaming import ingest

    pages = datagen.generate_pages_df(spark, 120, seed=9, partitions=3)
    pages_dir = str(tmp_path / "pages_in")
    pages.write.parquet(pages_dir)  # 3 files -> multiple micro-batches

    out = str(tmp_path / "edges_out")
    ck = str(tmp_path / "ingest_ck")
    stream = ingest.read_pages_stream(spark, pages_dir, max_files=1)
    q = ingest.stream_extract_edges(
        stream, out, ck, base_domain=datagen.BASE_DOMAIN
    )
    q.awaitTermination(180)

    batch = graph.build_edges_url(
        graph.extract_pages(spark.read.parquet(pages_dir)),
        base_domain=datagen.BASE_DOMAIN,
    )
    got = sorted((r.src, r.dst) for r in spark.read.parquet(out).collect())
    exp = sorted((r.src, r.dst) for r in batch.collect())
    assert got == exp and len(got) > 0

    # restart with the same checkpoint: no new files -> no new rows
    q2 = ingest.stream_extract_edges(
        ingest.read_pages_stream(spark, pages_dir, max_files=1),
        out,
        ck,
        base_domain=datagen.BASE_DOMAIN,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(got)


def test_stream_sink_rejects_unmanaged_parquet_dir(spark, tmp_path):
    """Upgrade-in-place guard: parquet files written to the sink directory by
    anything other than the file sink (no _spark_metadata) would be invisible
    to log-aware readers — the sink must fail fast instead of silently
    orphaning them."""
    from engine import datagen
    from engine.streaming import ingest

    pages = datagen.generate_pages_df(spark, 10, seed=3, partitions=1)
    pages_dir = str(tmp_path / "pages_in2")
    pages.write.parquet(pages_dir)

    out = str(tmp_path / "edges_preexisting")
    # simulate a previous plain batch append (no commit log)
    spark.range(3).select(F.col("id").alias("src"), F.col("id").alias("dst")).write.parquet(out)

    with pytest.raises(ValueError, match="_spark_metadata"):
        ingest.stream_extract_edges(
            ingest.read_pages_stream(spark, pages_dir, max_files=1),
            out,
            str(tmp_path / "ck2"),
            base_domain=datagen.BASE_DOMAIN,
        )


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed agg with a 1h watermark across two checkpointed
    runs: the watermark persisted by run 1 drops run 2's late event."""
    import datetime as dt
    import glob
    import os

    t0 = dt.datetime(2025, 3, 1, 0, 0, 0)
    stream_dir = str(tmp_path / "late_events")
    out_dir = str(tmp_path / "late_out")
    ck = str(tmp_path / "late_ck")
    os.makedirs(stream_dir)

    def add_chunk(name, rows):
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, ev.EVENTS_SCHEMA).coalesce(1).write.parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, part), os.path.join(stream_dir, f"{name}.parquet"))

    def run_once():
        stream = ev.read_event_stream(spark, stream_dir, max_files=1)
        agg = ev.windowed_event_counts(stream, window="1 hour", watermark="1 hour")
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")  # emits only watermark-finalized windows
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: two on-time events in window t0 + one at t0+3h -> watermark t0+2h
    add_chunk("a", [
        (1, t0 + dt.timedelta(minutes=5), 1, "c", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 1, "c", 1.0, "{}"),
        (3, t0 + dt.timedelta(hours=3), 1, "c", 1.0, "{}"),
    ])
    run_once()

    # run 2: a LATE event back in window t0 (behind the persisted watermark)
    # and an on-time one at t0+3h10m
    add_chunk("b", [
        (4, t0 + dt.timedelta(minutes=20), 1, "c", 1.0, "{}"),
        (5, t0 + dt.timedelta(hours=3, minutes=10), 1, "c", 1.0, "{}"),
    ])
    run_once()

    assert glob.glob(f"{out_dir}/*.parquet") or glob.glob(f"{out_dir}/**/*.parquet")
    got = {r.window_start: r.n_events for r in spark.read.parquet(out_dir).collect()}
    # window [t0, t0+1h) finalized with ONLY the on-time events; #4 dropped
    assert got.get(t0) == 2


def test_top_ngrams_vs_counter_oracle(spark):
    import re
    from collections import Counter

    from engine.operators.textstats import top_ngrams

    docs = [
        (0, "the cat sat on the mat the cat"),
        (1, "the cat ran"),
        (2, "one"),          # < 2 tokens -> contributes nothing
        (3, ""),             # empty
        (4, "The CAT sat"),  # case-folds into the same bigrams
    ]
    exp = Counter()
    for _i, t in docs:
        toks = re.findall(r"\w+", t.lower())
        exp.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = top_ngrams(df, "text", n=2, k=100).collect()
    assert {r.ngram: r.cnt for r in got} == dict(exp)
    # total ordering: cnt desc then ngram asc
    keys = [(-r.cnt, r.ngram) for r in got]
    assert keys == sorted(keys)


def test_top_ngrams_k_boundary_and_trigrams(spark):
    import re
    from collections import Counter

    from engine.operators.textstats import top_ngrams

    docs = [(i, f"alpha beta gamma delta token{i} alpha beta gamma") for i in range(20)]
    exp = Counter()
    for _i, t in docs:
        toks = re.findall(r"\w+", t.lower())
        exp.update(" ".join(toks[i : i + 3]) for i in range(len(toks) - 2))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k = 5
    got = [(r.ngram, r.cnt) for r in top_ngrams(df, "text", n=3, k=k).collect()]
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want


def test_ngrams_col_no_python_udf(spark):
    # sequence/slice/concat_ws n-gram expansion must stay JVM-side
    from engine.operators.textstats import top_ngrams

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = top_ngrams(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_repetition_stats_vs_python_oracle(spark):
    import re
    from collections import Counter

    rows = [
        (1, "spam spam spam\nspam spam spam\nunique line here"),
        (2, "one two three four"),          # all-distinct bigrams, one line
        (3, "ab ab ab ab"),                 # modal bigram 'ab ab' x3
        (4, "   \n  "),                     # blank-only -> zero everything
        (5, ""),                            # empty text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in textstats.repetition_stats(df, ngram_n=2).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}

    def oracle(text, n=2):
        lines = [ln.strip() for ln in text.split("\n") if ln.strip() != ""]
        toks = re.findall(r"\w+", text.lower())
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        lc, gc = Counter(lines), Counter(grams)
        n_lines, n_grams = len(lines), len(grams)
        chars = sum(len(l) for l in lines)
        dup_chars = sum(len(l) * c for l, c in lc.items() if c > 1)
        return (
            n_lines,
            0.0 if not n_lines else 1 - len(lc) / n_lines,
            0.0 if not chars else dup_chars / chars,
            n_grams,
            0.0 if not n_grams else 1 - len(gc) / n_grams,
            0.0 if not n_grams else max(gc.values()) / n_grams,
        )

    for doc_id, text in rows:
        r = got[doc_id]
        exp = oracle(text)
        assert (
            r.n_lines,
            round(r.dup_line_frac, 9),
            round(r.dup_line_char_frac, 9),
            r.n_ngrams,
            round(r.dup_ngram_frac, 9),
            round(r.top_ngram_frac, 9),
        ) == (
            exp[0],
            round(exp[1], 9),
            round(exp[2], 9),
            exp[3],
            round(exp[4], 9),
            round(exp[5], 9),
        ), f"doc {doc_id}"

    # doc 1: 2 identical lines of 3 -> dup_line_frac = 1 - 2/3
    assert abs(got[1].dup_line_frac - (1 - 2 / 3)) < 1e-12
    # doc 3: grams = [ab ab, ab ab, ab ab] -> top frac 1.0, dup frac 2/3
    assert got[3].top_ngram_frac == 1.0 and abs(got[3].dup_ngram_frac - 2 / 3) < 1e-12
    # docs 4/5: all zeros
    for d in (4, 5):
        assert (got[d].n_lines, got[d].n_ngrams) == (0, 0)
        assert got[d].dup_line_frac == got[d].top_ngram_frac == 0.0


def test_repetition_stats_on_documents_table(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = textstats.repetition_stats(d, ngram_n=2)
    rows = out.collect()
    assert len(rows) == d.count()  # one row per doc, none lost
    for r in rows:
        for v in (r.dup_line_frac, r.dup_line_char_frac, r.dup_ngram_frac, r.top_ngram_frac):
            assert 0.0 <= v <= 1.0
        # single-line synthetic docs: line dup fracs must be exactly 0
        assert r.dup_line_frac == 0.0
    # the tiny vocabulary guarantees real within-doc bigram repetition
    assert sum(1 for r in rows if r.dup_ngram_frac > 0) > len(rows) * 0.5


def test_quality_filter_rules_and_reasons(spark):
    long_junk = "zz " * 40  # 80 tokens, no stopwords, heavy bigram repetition
    good = (
        "the quick brown fox jumps over the lazy dog and it was happy for "
        "this fine day in the sunny park with friends and games to play "
        "while the birds sing songs of joy and peace for everyone around"
    )
    rows = [(1, good), (2, "short text"), (3, long_junk)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in textstats.quality_filter(df).collect()}

    assert got[1].keep and got[1].reasons == ""
    assert not got[2].keep and "too_short" in got[2].reasons
    assert not got[3].keep
    # fixed tag order: too_short,too_long,low_quality,repetitive
    assert got[3].reasons == ",".join(
        t for t in ["too_short", "too_long", "low_quality", "repetitive"]
        if t in got[3].reasons
    )
    assert "repetitive" in got[3].reasons  # 'zz zz' bigram dominates
    # per-row linear signals must agree with the shuffle-based kernel
    rep = {r.doc_id: r for r in textstats.repetition_stats(df, ngram_n=2).collect()}
    for d in (1, 2, 3):
        assert abs(got[d].dup_ngram_frac - rep[d].dup_ngram_frac) < 1e-12


def test_quality_filter_is_map_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = textstats.quality_filter(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: pure map over the scan
    rows = out.collect()
    assert len(rows) == docs.count()
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)  # thresholds genuinely split the corpus


def test_dedupe_pages_stream_matches_batch(spark, tmp_path):
    from engine import datagen
    from engine.streaming import dedupe as sdd

    pages = datagen.generate_pages_df(spark, 120, seed=3, partitions=2)
    # mirror copies: same text under different urls, later fetch time
    mirrors = (
        pages.limit(30)
        .withColumn("url", F.concat(F.col("url"), F.lit("?ref=mirror")))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    src = str(tmp_path / "pages_in")
    pages.union(mirrors).write.mode("overwrite").parquet(src)

    batch_in = spark.read.parquet(src)
    batch = sdd.dedupe_pages_stream(batch_in).collect()
    fps_batch = {r.fp for r in batch}
    # one row per distinct fingerprint, mirrors collapsed
    assert len(batch) == len(fps_batch) == (
        sdd.with_content_fp(batch_in).select("fp").distinct().count()
    )
    # deterministic representative: never the later mirror copy
    assert not any(r.url.endswith("?ref=mirror") for r in batch)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in batch_in.schema)
    stream_in = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = sdd.dedupe_pages_stream(stream_in)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_pages")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_pages").collect()
    fps_stream = {r.fp for r in got}
    assert fps_stream == fps_batch       # same surviving content set
    assert len(got) == len(fps_stream)   # exactly one copy per fingerprint


def test_scrub_pii_vs_python_oracle(spark):
    import re

    rows = [
        (1, "mail me at jo.doe+spam@sub.example.co.uk or call +1 (555) 123-4567 now"),
        (2, "server at 10.0.255.3 and 192.168.1.1; no mail"),
        (3, "clean text with nothing sensitive at all"),
        (4, "double a@b.io c@d.org and ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in textstats.scrub_pii(df).collect()}

    email, phone, ip = (
        textstats.PII_EMAIL_RE,
        textstats.PII_PHONE_RE,
        textstats.PII_IPV4_RE,
    )
    for doc_id, text in rows:
        r = got[doc_id]
        assert r.n_emails == len(re.findall(email, text)), doc_id
        assert r.n_phones == len(re.findall(phone, text)), doc_id
        assert r.n_ips == len(re.findall(ip, text)), doc_id
        expected = re.sub(
            ip, "<IP>", re.sub(phone, "<PHONE>", re.sub(email, "<EMAIL>", text))
        )
        assert r.text == expected, doc_id
    assert got[1].n_emails == 1 and got[1].n_phones == 1
    assert got[2].n_ips == 2 and got[4].n_emails == 2
    assert "jo.doe" not in got[1].text and "<EMAIL>" in got[1].text
    # map-only: zero shuffles
    plan = textstats.scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_unigram_lm_scores_exact_oracle(spark):
    """avg_logprob matches a pure-Python add-one unigram LM to 1e-12;
    token-less docs come back with n_tokens=0 / NULL score."""
    import math
    import re
    from collections import Counter

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the the the the"),
        (3, "zzz qqq unseen-ish rare"),
        (4, ""),
        (5, "the cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.avg_logprob)
        for r in textstats.unigram_lm_scores(df, "doc_id", "text").collect()
    }

    tok = lambda s: re.findall(r"\w+", s.lower())
    cnt = Counter(t for _, s in rows for t in tok(s))
    total, vocab = sum(cnt.values()), len(cnt)
    for doc_id, s in rows:
        toks = tok(s)
        n, alp = got[doc_id]
        assert n == len(toks)
        if not toks:
            assert alp is None
        else:
            want = sum(math.log((cnt[t] + 1) / (total + vocab)) for t in toks) / len(toks)
            assert abs(alp - want) < 1e-12

    # common-token prose must outscore rare-token soup (the signal's point)
    assert got[1][1] > got[3][1]


def test_unigram_lm_scores_external_reference(spark):
    """Scoring against a separate reference corpus: tokens unseen in the
    reference get the 1/(total+vocab) floor via the left join."""
    import math

    ref = spark.createDataFrame([(10, "aa aa bb")], "doc_id long, text string")
    target = spark.createDataFrame([(1, "aa zz")], "doc_id long, text string")
    got = textstats.unigram_lm_scores(target, "doc_id", "text", ref_docs=ref).collect()[0]
    total, vocab = 3, 2
    want = (math.log((2 + 1) / (total + vocab)) + math.log(1 / (total + vocab))) / 2
    assert got.n_tokens == 2
    assert abs(got.avg_logprob - want) < 1e-12


def test_attribute_clicks_stream_matches_batch(spark, tmp_path):
    from engine.streaming import events as sev

    ev = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "events_in")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    batch_in = spark.read.parquet(src)
    imp_b = batch_in.where("event_type = 'view'")
    clk_b = batch_in.where("event_type = 'click'")
    batch = sev.attribute_clicks(imp_b, clk_b, horizon="1 hour")
    want = {
        (r.user_id, r.imp_id, r.click_id, r.gap_us, r.click_value)
        for r in batch.collect()
    }
    assert want  # the events table must actually produce attributions
    assert all(0 <= g <= 3_600_000_000 for _, _, _, g, _ in want)

    stream_in = sev.read_event_stream(spark, src)
    # files arrive in arbitrary time order, so give the stream a watermark
    # wider than the table's whole time span: every micro-batch joins, none
    # of the out-of-order arrivals is "late" — exact batch parity. (With a
    # tight watermark the stream CORRECTLY drops stragglers; that behavior
    # is Spark's late-data contract, not this operator's.)
    out = sev.attribute_clicks(
        stream_in.where("event_type = 'view'"),
        stream_in.where("event_type = 'click'"),
        horizon="1 hour",
        watermark="365 days",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("click_attr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.imp_id, r.click_id, r.gap_us, r.click_value)
        for r in spark.table("click_attr").collect()
    }
    assert got == want


def test_segment_revenue_stream_matches_batch(spark, tmp_path):
    from engine.streaming import events as sev

    ev = spark.read.parquet(f"{SF}/events.parquet")
    dim = spark.read.parquet(f"{SF}/customer.parquet")
    src = str(tmp_path / "ev_in")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    batch = sev.windowed_segment_revenue(spark.read.parquet(src), dim)
    want = {
        (r.window_start, r.segment, r.n_purchases, round(r.revenue, 6))
        for r in batch.collect()
    }
    assert want and len({s for _, s, _, _ in want}) >= 3  # several segments hit

    # static side broadcasts into every micro-batch; wide watermark so the
    # arbitrary file arrival order drops nothing (see w5's parity note) --
    # with a never-advancing watermark, append mode would hold every window
    # open forever, so drain in COMPLETE mode (final state == batch result)
    out = sev.windowed_segment_revenue(
        sev.read_event_stream(spark, src), dim, watermark="365 days"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("seg_rev")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.window_start, r.segment, r.n_purchases, round(r.revenue, 6))
        for r in spark.table("seg_rev").collect()
    }
    assert got == want


def test_chunk_audio_layout_invariants(spark):
    from engine.operators.multimodal import chunk_audio_layout

    rows = [(1, b"x" * 500), (2, b"y" * 160), (3, b""), (4, None), (5, b"z" * 161)]
    df = spark.createDataFrame(rows, "id long, media binary")
    # 160-byte chunks (16kHz * 2B * 5ms)
    got = chunk_audio_layout(df, chunk_ms=5).collect()
    by_id: dict = {}
    for r in got:
        by_id.setdefault(r.id, []).append(r)
    assert set(by_id) == {1, 2, 5}  # empty & NULL blobs produce no rows
    assert [ (r.chunk_idx, r.start_byte, r.chunk_bytes, r.start_ms) for r in sorted(by_id[1], key=lambda r: r.chunk_idx) ] == [
        (0, 0, 160, 0), (1, 160, 160, 5), (2, 320, 160, 10), (3, 480, 20, 15),
    ]
    assert [(r.chunk_bytes,) for r in by_id[2]] == [(160,)]
    assert sorted((r.chunk_idx, r.chunk_bytes) for r in by_id[5]) == [(0, 160), (1, 1)]
    # reassembly invariant: chunk bytes sum to the blob size
    assert sum(r.chunk_bytes for r in by_id[1]) == 500
    # pure Catalyst: no Python in the plan
    plan = chunk_audio_layout(df, chunk_ms=5)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_sample_frames_one_to_many_plumbing(spark):
    import pytest as _pytest

    from engine.operators.multimodal import fake_video_decoder, sample_frames

    df = spark.createDataFrame(
        [(1, bytes(range(100))), (2, b"\xff" * 10), (3, b"")], "id long, media binary"
    )
    got = sample_frames(df, every_ms=30, decoder=fake_video_decoder).collect()
    by_id: dict = {}
    for r in got:
        by_id.setdefault(r.id, []).append(r)
    # 100 'ms' at one frame per 30 ms -> ts 0,30,60,90; 10 ms -> ts 0; empty -> 1 frame at ts 0
    assert [r.ts_ms for r in sorted(by_id[1], key=lambda r: r.frame_idx)] == [0, 30, 60, 90]
    assert len(by_id[2]) == 1 and by_id[2][0].mean_px == 255.0
    assert len(by_id[3]) == 1 and by_id[3][0].mean_px == 0.0
    # deterministic: same input, same frames
    again = sample_frames(df, every_ms=30, decoder=fake_video_decoder).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # default decoder fails loudly, not silently
    with _pytest.raises(Exception, match="NotImplementedError|video codec"):
        sample_frames(df, every_ms=30).collect()


# --- BPE tokenizer training (Sennrich et al. 2016) --------------------------


def test_bpe_train_matches_classic_learn_bpe(spark):
    from engine.operators.bpe import bpe_train
    from oracle import bpe_train_py

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the theme of the thesis is the theory",
        "aaaa aaa aa banana bandana",  # overlap-greedy + repeated chars
        "low lower lowest newer newest wider widest",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    res = bpe_train(docs, num_merges=25)
    got = [
        (r.left, r.right, r.pair_count) for r in res.merges.orderBy("rank").collect()
    ]
    exp_merges, exp_vocab = bpe_train_py(texts, num_merges=25)
    assert got == exp_merges
    assert {r.token: r.cnt for r in res.vocab.collect()} == exp_vocab


def test_bpe_early_stop_when_nothing_repeats(spark):
    from engine.operators.bpe import bpe_train

    # every adjacent pair unique -> best count == 1 -> zero merges learned
    docs = spark.createDataFrame([(0, "abc xyz")], "doc_id long, text string")
    res = bpe_train(docs, num_merges=10)
    assert res.merges.count() == 0
    # vocab is then the raw character (+sentinel) distribution
    vocab = {r.token: r.cnt for r in res.vocab.collect()}
    assert vocab["</w>"] == 2 and vocab["a"] == 1


def test_bpe_segment_matches_trained_dictionary(spark):
    import re

    from engine.operators.bpe import bpe_segment, bpe_train

    texts = [
        "the theme of the thesis is the theory",
        "low lower lowest newer newest",
    ] * 4
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    res = bpe_train(docs, num_merges=15)
    merges = [(r.left, r.right) for r in res.merges.orderBy("rank").collect()]
    train_words = {r.word: list(r.syms) for r in res.words.collect()}
    # applying the learned merge list to the training docs reproduces the
    # trained word segmentation exactly, word by word (checkpoint_every
    # below the merge count to exercise the plan compaction)
    out = bpe_segment(docs.limit(3), merges, checkpoint_every=4)
    for row in out.collect():
        toks = list(row.tokens)
        i = 0
        for w in re.findall(r"\w+", row.text.lower(), re.UNICODE):
            n = len(train_words[w])
            assert toks[i : i + n] == train_words[w]
            i += n
        assert i == len(toks)


def test_bpe_train_no_python_udf(spark):
    from engine.operators.bpe import initial_symbols, pair_counts, word_counts

    docs = spark.createDataFrame([(0, "ab ab cd")], "doc_id long, text string")
    plan = (
        pair_counts(initial_symbols(word_counts(docs)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan  # pure Catalyst, no Python boundary


def test_trending_targets_stream_matches_batch(spark, tmp_path):
    from engine import datagen
    from engine.streaming.ingest import trending_targets

    pages = datagen.generate_pages_df(spark, 100, seed=11, partitions=2)
    src = str(tmp_path / "tpages")
    pages.write.mode("overwrite").parquet(src)

    batch_in = spark.read.parquet(src)
    batch = trending_targets(batch_in, window="1 hour").collect()
    key = lambda r: (r.window_epoch, r.dst_host)
    exp = {key(r): r.links for r in batch}
    assert exp and all(v > 0 for v in exp.values())
    # every target host of the synthetic crawl shows up
    hosts = {r.dst_host for r in batch}
    assert hosts  # non-trivial rollup

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in batch_in.schema
    )
    stream_in = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = trending_targets(stream_in, window="1 hour")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("trending")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "tck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {key(r): r.links for r in spark.table("trending").collect()}
    assert got == exp  # stream == batch, window by window, host by host
