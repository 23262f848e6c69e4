"""Extraction byte-parity + edge pipeline correctness (SURVEY §5.3).

The generator plants a known token stream; the extractor must recover it
byte-for-byte (the BASELINE.json input_hint per-row invariant). Edges derived
by the Spark pipeline must equal the set derived independently with the pure
functions over the generator's planted hrefs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from engine import datagen
from engine.functions import htmlx, urls
from engine.operators import graph

N = 300
SEED = 42


def expected_edges_for(spec):
    """Reference-semantics edge derivation from planted surviving hrefs
    (crawler/core.py:296-310 order: urljoin+normalize, domain, scheme)."""
    out = []
    for href in spec["content_hrefs"]:
        target = urls.resolve_href(spec["url"], href)
        if not urls.is_same_domain(target, datagen.BASE_DOMAIN):
            continue
        if target.startswith("mailto:") or target.startswith("javascript:"):
            continue
        out.append((spec["url"], target))
    return out


def test_pure_extraction_byte_parity():
    for i in range(N):
        spec = datagen.page_spec(i, N, SEED)
        text, hrefs = htmlx.extract_page(spec["html"])
        assert text == spec["expected_text"], f"text mismatch on page {i}"
        assert hrefs == spec["content_hrefs"], f"href mismatch on page {i}"


def test_lang_detection_matches_column():
    for i in range(N):
        spec = datagen.page_spec(i, N, SEED)
        detected = htmlx.detect_page_language(spec["html"])
        assert detected == spec["lang"], f"lang mismatch on page {i}"


def test_normalize_url_reference_cases():
    nu = urls.normalize_url
    assert nu("https://EN.Example.org/Foo/") == "https://en.example.org/Foo"
    assert nu("https://example.org/foo#frag") == "https://example.org/foo"
    assert nu("https://example.org") == "https://example.org/"
    assert nu("https://example.org/") == "https://example.org/"
    assert nu("https://example.org/a/b/") == "https://example.org/a/b"
    # path case preserved, only host lowercased
    assert nu("HTTPS://WWW.EXAMPLE.ORG/PaGe/1") == "https://www.example.org/PaGe/1"


def test_spark_extraction_matches_text_column(spark):
    pages = datagen.generate_pages_df(spark, N, SEED, partitions=4)
    extracted = graph.extract_pages(pages)
    joined = (
        pages.select("url", F.col("text").alias("expected"))
        .join(extracted.select("url", "text"), "url")
    )
    bad = joined.filter(F.col("expected") != F.col("text")).count()
    assert bad == 0
    assert joined.count() == N


def test_spark_edges_match_pure_derivation(spark):
    pages = datagen.generate_pages_df(spark, N, SEED, partitions=4)
    extracted = graph.extract_pages(pages)
    edges_url = graph.build_edges_url(extracted, base_domain=datagen.BASE_DOMAIN)
    got = [(r.src, r.dst) for r in edges_url.collect()]

    expected = []
    for i in range(N):
        expected.extend(expected_edges_for(datagen.page_spec(i, N, SEED)))

    assert sorted(got) == sorted(expected)
    # multiplicity is preserved (dedupe is a separate operator)
    assert len(got) == len(expected)


def test_dense_node_ids_deterministic_and_dense(spark):
    pages = datagen.generate_pages_df(spark, N, SEED, partitions=4)
    extracted = graph.extract_pages(pages)
    edges_url = graph.build_edges_url(extracted, base_domain=datagen.BASE_DOMAIN)
    nodes = graph.build_nodes(pages.select("url"), edges_url)
    rows = nodes.collect()
    ids = sorted(r.id for r in rows)
    assert ids == list(range(len(rows)))
    # sorted-URL order
    by_id = sorted(rows, key=lambda r: r.id)
    assert [r.url for r in by_id] == sorted(r.url for r in rows)
    # rerun gives identical assignment
    nodes2 = graph.build_nodes(pages.select("url"), edges_url)
    assert sorted(map(tuple, nodes.collect())) == sorted(map(tuple, nodes2.collect()))


def test_extract_anchors_minidom():
    html = (
        "<html><body>"
        "<nav><a href='/skip'>Skip nav</a></nav>"
        "<main>"
        "<a href='/a'>First <b>Link</b></a>"
        "<p><a href='/b'>second   link</a> prose</p>"
        "<a name='no-href'>not a link</a>"
        "</main>"
        "<footer><a href='/c'>footer link</a></footer>"
        "</body></html>"
    )
    got = htmlx.extract_anchors(html)
    # nav/footer anchors are decomposed away; anchor text is the
    # whitespace-normalized visible subtree text
    assert got == [("/a", "First Link"), ("/b", "second link")]


def test_anchor_text_index_spark(spark):
    rows = [
        (
            "https://example.org/p1",
            "<html><body><main>"
            "<a href='/target'>Great Article</a>"
            "<a href='https://example.org/target'>great read</a>"
            "<a href='mailto:x@y.z'>mail me</a>"
            "</main></body></html>",
        ),
        (
            "https://example.org/p2",
            "<html><body><main>"
            "<a href='/target'>article</a>"
            "<a href='https://other.net/x'>external</a>"
            "</main></body></html>",
        ),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    idx = {
        (r.dst, r.term): r.freq
        for r in graph.anchor_text_index(pages).collect()
    }
    t = "https://example.org/target"
    assert idx[(t, "great")] == 2
    assert idx[(t, "article")] == 2
    assert idx[(t, "read")] == 1
    assert ("https://other.net/x", "external") in idx
    assert not any(d.startswith("mailto:") for d, _ in idx)

    # same-domain restriction drops the external target
    restricted = {
        (r.dst, r.term): r.freq
        for r in graph.anchor_text_index(pages, base_domain="example.org").collect()
    }
    assert (t, "great") in restricted
    assert not any(d == "https://other.net/x" for d, _ in restricted)


# --- jusText-style boilerplate blocks (engine/operators/boilerplate.py) -----

_BP_HTML = """
<html><body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<h1>The Article Title</h1>
<p>This is the first paragraph of the article and it was written for the
test with plenty of the usual English words that appear in this kind of
writing, so that it reads as normal prose for the classifier, and it keeps
going for a while because real article paragraphs are longer than the
two hundred character threshold that the length band uses.</p>
<div>photo: a cat</div>
<p>The second paragraph is also long enough to matter and it continues in
the same style as the first one, with the words that it needs for the
stopword density to look like real text on this page, and it too runs past
the length threshold that separates the good band from the near-good band.</p>
<footer>Copyright 2026 <a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>
</body></html>
"""


def test_extract_blocks_segments_and_counts():
    blocks = htmlx.extract_blocks(_BP_HTML)
    assert [b["tag"] for b in blocks] == ["nav", "h1", "p", "div", "p", "footer"]
    nav = blocks[0]
    # nav text is entirely inside anchors
    assert nav["text"] == "Home About Contact"
    assert nav["link_chars"] == nav["n_chars"] == len("HomeAboutContact")
    foot = blocks[-1]
    assert foot["link_chars"] == len("TermsPrivacy")
    # token-char accounting: no spaces counted
    assert foot["n_chars"] == len("Copyright2026TermsPrivacy")
    # whitespace-collapse matches extract_text token semantics
    assert all("  " not in b["text"] and b["text"] == b["text"].strip() for b in blocks)


def test_classify_blocks_justext_labels():
    from engine.operators.boilerplate import classify_blocks

    labels = [
        (b["tag"], lab) for b, _, _, lab in classify_blocks(htmlx.extract_blocks(_BP_HTML))
    ]
    assert labels == [
        ("nav", "bad"),       # pure link list
        ("h1", "good"),       # heading promotion: introduces good content
        ("p", "good"),        # long, stopword-rich
        ("div", "good"),      # short caption surrounded by good
        ("p", "good"),
        ("footer", "bad"),    # copyright + links
    ]
    # without good context the same short caption is boilerplate
    only_caption = "<html><body><div>photo: a cat</div></body></html>"
    (_, _, _, lab), = classify_blocks(htmlx.extract_blocks(only_caption))
    assert lab == "bad"


def test_clean_text_map_only_and_content(spark):
    from engine.operators.boilerplate import clean_text, page_blocks
    from engine.plans import inspect as pi

    pages = spark.createDataFrame(
        [("http://e.org/x", _BP_HTML), ("http://e.org/empty", None)],
        "url string, html string",
    )
    ct = clean_text(pages)
    assert pi.count_exchanges(ct, live_only=True) == 0  # map-only
    plan = ct._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
    rows = {r.url: r.content for r in ct.collect()}
    assert rows["http://e.org/empty"] == ""
    content = rows["http://e.org/x"]
    assert content.startswith("The Article Title This is the first paragraph")
    assert "Home About" not in content and "Copyright" not in content
    # per-block audit view agrees with the joined content
    pb = page_blocks(pages).orderBy("url", "block_idx").collect()
    good = " ".join(r.text for r in pb if r.label == "good")
    assert good == content


def test_boilerplate_on_generated_pages(spark):
    """Over the synthetic crawl pages: classification runs Arrow-batched at
    table scale, labels are exhaustive, and nav/footer chrome never
    survives into the cleaned content."""
    from engine.operators.boilerplate import page_blocks

    pages = datagen.generate_pages_df(spark, 60, seed=SEED, partitions=4)
    pb = page_blocks(pages).persist()
    assert pb.where("label NOT IN ('good','bad')").count() == 0
    assert pb.count() > 0
    pb.unpersist()
