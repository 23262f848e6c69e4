"""Pages → link graph: extraction, edge building, dense node IDs, degrees.

Spark-first re-expression of the reference crawl/encode pipeline
(crawler/core.py:285-313, crawler/crawl.py:59-81, api/build_corpus.py:74-95):
the crawl loop's per-page work becomes one declarative DAG — Arrow-batched
extraction UDF, explode, normalize, filters, joins — that Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from engine.functions.udfs import (
    base_domain_udf,
    extract_page_udf,
    normalize_url_udf,
    resolve_href_udf,
)


def extract_pages(pages: DataFrame) -> DataFrame:
    """(url, html, ...) -> (url, text, hrefs) via ONE shared-parse Arrow UDF.

    Mirrors the reference's single BeautifulSoup parse per page feeding both
    text extraction and link parsing (crawler/core.py:272,292,296).
    """
    return pages.select(
        "url",
        extract_page_udf(F.col("html")).alias("ex"),
    ).select("url", F.col("ex.text").alias("text"), F.col("ex.hrefs").alias("hrefs"))


def filter_lang(pages: DataFrame, target_lang: str | None) -> DataFrame:
    """Language gate (crawler/core.py:277-283): keep pages whose normalized
    lang starts with the target prefix; pages with unknown (null) lang pass,
    exactly like the reference (it only skips when page_lang is truthy)."""
    if not target_lang:
        return pages
    t = target_lang.lower()
    return pages.filter(F.col("lang").isNull() | F.lower(F.col("lang")).startswith(t))


def build_edges_url(
    extracted: DataFrame, base_domain: str | None = None
) -> DataFrame:
    """Explode hrefs into normalized absolute edges with the reference's
    filters applied in the reference's order (crawler/core.py:296-310):
    urljoin+normalize, same-base-domain keep, mailto:/javascript: drop.
    Duplicates preserved (the reference appends every anchor; dedupe is a
    separate operator, api/build_corpus.py:82-93).

    base_domain: last-two-label domain to restrict to. None disables F2.
    Returns (src STRING, dst STRING).
    """
    e = (
        extracted.select("url", F.explode("hrefs").alias("href"))
        .withColumn("dst", resolve_href_udf(F.col("url"), F.col("href")))
        .select(F.col("url").alias("src"), "dst")
    )
    if base_domain is not None:
        e = e.filter(base_domain_udf(F.col("dst")) == F.lit(base_domain.lower()))
    # scheme filter; reference checks after urljoin (crawler/core.py:303-304)
    e = e.filter(
        ~F.col("dst").startswith("mailto:") & ~F.col("dst").startswith("javascript:")
    )
    return e


def dense_node_ids(urls: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Deterministic dense ids 0..n-1 over distinct URLs, sorted-URL order.

    The reference assigns first-seen crawl-order ids (crawler/core.py:285-289)
    which is nondeterministic under threading; scores are id-permutation
    invariant and all cross-checks key on url, so we use the deterministic
    distributed equivalent, as a pure-JVM two-phase assigner (SURVEY §4.2):

      1. range-partition the distinct urls on url (ascending key ranges map
         to ascending partition ids by RangePartitioner's contract) and
         row_number within each partition;
      2. per-partition counts -> prefix-sum offsets (≤P tiny rows, broadcast
         back); global id = offset(partition) + local row_number.

    No RDD/Python boundary anywhere: at web scale (10⁹ urls) every row stays
    in Tungsten format; the only driver-sized object is the P-row offset
    table. Both branches hang off the SAME range exchange (ReusedExchange),
    and RangePartitioner's boundary sampling is deterministically seeded per
    partition, so re-evaluations agree.
    Input: single STRING column 'url'. Output: (id BIGINT, url STRING).
    """
    from pyspark.sql.window import Window

    spark = urls.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        urls.select("url")
        .distinct()
        .repartitionByRange(P, "url")
        .select("url", F.spark_partition_id().alias("_p"))
    )
    w_local = Window.partitionBy("_p").orderBy("url")
    local = ranged.withColumn("_rn", F.row_number().over(w_local).cast("long") - 1)
    counts = ranged.groupBy("_p").agg(F.count(F.lit(1)).alias("_c"))
    # running-sum offsets over ≤P rows: the single-partition window is fine
    # at this cardinality (one row per partition, not per url)
    w_off = Window.orderBy("_p").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_p", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).cast("long").alias("_off")
    )
    return local.join(F.broadcast(offsets), "_p").select(
        (F.col("_off") + F.col("_rn")).alias("id"), "url"
    )


def build_nodes(page_urls: DataFrame, edges_url: DataFrame) -> DataFrame:
    """Node universe = indexed page urls ∪ edge endpoints (the reference's
    url_to_id gains entries for visited pages and all kept link targets,
    crawler/core.py:285-289,306-308). Returns (id, url)."""
    urls = (
        page_urls.select(F.col(page_urls.columns[0]).alias("url"))
        .union(edges_url.select(F.col("src").alias("url")))
        .union(edges_url.select(F.col("dst").alias("url")))
    )
    return dense_node_ids(urls)


def encode_edges(edges_url: DataFrame, nodes: DataFrame) -> DataFrame:
    """(src_url, dst_url) -> (src BIGINT, dst BIGINT) via double join with the
    id dictionary (crawler/crawl.py:66-75 dict lookups → two equi-joins; at
    web scale these are shuffle joins — nodes is too big to broadcast)."""
    n_src = nodes.select(F.col("url").alias("src"), F.col("id").alias("src_id"))
    n_dst = nodes.select(F.col("url").alias("dst"), F.col("id").alias("dst_id"))
    return (
        edges_url.join(n_src, "src")
        .join(n_dst, "dst")
        .select(F.col("src_id").alias("src"), F.col("dst_id").alias("dst"))
    )


def anchor_text_index(
    pages: DataFrame, base_domain: str | None = None
) -> DataFrame:
    """Inbound anchor-text index — the classic web ranking signal the
    page-level link graph carries beyond its topology (beyond-reference:
    the reference keeps only hrefs, crawler/core.py:296-297).

    pages (url, html, ...) → one Arrow-batched parse per page extracting
    (href, anchor_text) pairs → urljoin+normalize the target (the same
    resolve semantics as edge building) → scheme / optional same-domain
    filters in the reference's order → JVM-side tokenization (the
    reference tokenizer pattern, tfidf.TOKEN_PATTERN) → (dst, term, freq).

    Scale shape: the only Python is the per-page extraction UDF (Arrow
    batches, one mini-DOM parse shared across all anchors of a page);
    everything after the explode is whole-stage codegen, and the single
    shuffle is the final partial-agg groupBy on (dst, term)."""
    from engine.functions.udfs import extract_anchors_udf
    from engine.operators.tfidf import tokenize_col

    a = (
        pages.select("url", F.explode(extract_anchors_udf(F.col("html"))).alias("an"))
        .select(
            "url",
            F.col("an.href").alias("href"),
            F.col("an.anchor").alias("anchor"),
        )
        .withColumn("dst", resolve_href_udf(F.col("url"), F.col("href")))
    )
    if base_domain is not None:
        a = a.filter(base_domain_udf(F.col("dst")) == F.lit(base_domain.lower()))
    a = a.filter(
        ~F.col("dst").startswith("mailto:") & ~F.col("dst").startswith("javascript:")
    )
    terms = a.select(
        "dst", F.explode(tokenize_col(F.col("anchor"))).alias("term")
    )
    return terms.groupBy("dst", "term").agg(F.count(F.lit(1)).alias("freq"))


def domain_graph(
    edges_url: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    drop_intra: bool = False,
) -> DataFrame:
    """Collapse the page-level link graph to a host-level weighted graph —
    the standard web-graph rollup (Common Crawl publishes exactly this as
    its host-level graph artifact; the reference's domain restriction,
    crawler/core.py:301-308, keys on the same host notion).

    Host extraction is pure JVM (`parse_url(url, 'HOST')`, lowercased) —
    no Python in the hot path. The whole rollup is one partial-agg
    groupBy: at 10^12 edges the map-side combine collapses each input
    partition to its distinct host pairs (power-law graphs: orders of
    magnitude fewer) before the single shuffle.

    Returns (src_host STRING, dst_host STRING, weight BIGINT); rows whose
    url has no parseable host are dropped. drop_intra=True removes
    same-host edges (the usual choice before host-level PageRank, which
    otherwise rewards internal navigation templates).
    """

    def host(c: str):
        return F.lower(F.parse_url(F.col(c), F.lit("HOST")))

    g = edges_url.select(
        host(src_col).alias("src_host"), host(dst_col).alias("dst_host")
    ).filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if drop_intra:
        g = g.filter(F.col("src_host") != F.col("dst_host"))
    return g.groupBy("src_host", "dst_host").agg(F.count(F.lit(1)).alias("weight"))


def host_pagerank(edges_url: DataFrame, drop_intra: bool = True, **pr_kwargs):
    """Host-level PageRank: domain rollup → dense host ids → weighted
    power iteration (each host edge carries its page-link multiplicity as
    weight). Returns (host STRING, rank DOUBLE), Σ rank = 1.

    Composition of existing kernels: `domain_graph` (one shuffle),
    `dense_node_ids` (range-partition two-phase assigner — hosts are a
    string key set like urls), and `pagerank(weight_col='weight')`. The
    rolled-up graph is typically 3-4 orders of magnitude smaller than the
    page graph, so the iteration usually runs on the broadcast gather
    path even when the input needed the shuffle path."""
    from engine.operators.pagerank import pagerank

    dg = domain_graph(edges_url, drop_intra=drop_intra)
    hosts = dense_node_ids(
        dg.select(F.col("src_host").alias("url"))
        .union(dg.select(F.col("dst_host").alias("url")))
    )
    n_src = hosts.select(F.col("url").alias("src_host"), F.col("id").alias("src"))
    n_dst = hosts.select(F.col("url").alias("dst_host"), F.col("id").alias("dst"))
    e = dg.join(n_src, "src_host").join(n_dst, "dst_host").select("src", "dst", "weight")
    res = pagerank(e, weight_col="weight", **pr_kwargs)
    return res.ranks.join(hosts, "id").select(F.col("url").alias("host"), "rank")


def graph_mixing(edges: DataFrame) -> DataFrame:
    """Reciprocity + directed degree assortativity — the two standard
    web-graph mixing measures (Newman, "Mixing patterns in networks",
    2003; Broder et al.'s web measurements report both).

    - reciprocity: over the distinct non-loop edge set E, the fraction of
      (u,v) ∈ E with (v,u) ∈ E. One self-join on the reversed set.
    - assortativity: Pearson correlation, over raw edges (multiplicities
      count, matching the engine's degree convention), of
      (outdeg(src), indeg(dst)) — the out-in directed variant.

    Everything is partial-agg groupBys + one self-join + two 1-row
    reduces; the widest shuffle is the degree join back onto edges (the
    same gather shape as a PageRank iteration). Returns one row:
    (m_distinct BIGINT, reciprocal_edges BIGINT, reciprocity DOUBLE,
    assortativity DOUBLE), floats rounded to 6 dp."""
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).withColumn("_r", F.lit(1))
    flagged = e.join(rev, ["src", "dst"], "left").select(
        F.coalesce(F.col("_r"), F.lit(0)).alias("is_recip")
    )
    recip = flagged.agg(
        F.count(F.lit(1)).alias("m_distinct"),
        F.sum("is_recip").cast("long").alias("reciprocal_edges"),
        F.round(F.avg("is_recip"), 6).alias("reciprocity"),
    )
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    ind = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("ideg"))
    assort = (
        edges.join(outd, "src")
        .join(ind, "dst")
        .agg(F.round(F.corr("odeg", "ideg"), 6).alias("assortativity"))
    )
    return recip.crossJoin(assort)


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient φ(k) over the undirected simple graph
    (Zhou & Mondragón 2004; normalization discussion in Colizza et al.
    2006 — this is the raw φ(k), the quantity both papers start from):
    among the N_k vertices of degree > k,

        φ(k) = 2·E_k / (N_k·(N_k − 1))

    with E_k the number of edges whose BOTH endpoints have degree > k —
    the standard measurement of whether web hubs preferentially
    interlink. Evaluated at k = 0 and every realized degree value (φ is
    a right-continuous step function constant between realized degrees,
    so this grid is lossless).

    Spark shape: degrees (one shuffle), per-edge min-endpoint degree
    (two degree joins — the PageRank gather shape), then both tallies
    collapse to degree-value histograms and every N_k / E_k falls out of
    ONE pass of suffix sums. The histograms have at most 2·√m rows (the
    distinct degree values D satisfy D²/2 ≤ Σ distinct d ≤ Σ_v deg(v) =
    2m), so even a 10^12-edge crawl yields ≤ ~2·10^6 tiny rows and the
    unpartitioned cumulative window is bounded by construction — never
    data-scale.

    Returns (k BIGINT, n_k BIGINT, e_k BIGINT, rich_club DOUBLE) for
    rows with N_k ≥ 2, rich_club rounded to 6 dp (one IEEE division of
    exact longs — engine-portable)."""
    from pyspark.sql.window import Window

    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
    hist_e = (
        e.join(da, "a")
        .join(db, "b")
        .groupBy(F.least("da", "db").alias("v"))
        .agg(F.count(F.lit(1)).alias("ce"))
    )
    hist_n = deg.groupBy(F.col("d").alias("v")).agg(F.count(F.lit(1)).alias("cn"))
    hist = (
        hist_n.join(hist_e, "v", "full_outer")
        .select(
            "v",
            F.coalesce("cn", F.lit(0)).alias("cn"),
            F.coalesce("ce", F.lit(0)).alias("ce"),
        )
        # the k=0 anchor: degrees are ≥ 1, so the suffix sums at v=0 are
        # the full totals (all nodes, all edges)
        .unionAll(e.sparkSession.createDataFrame([(0, 0, 0)], "v long, cn long, ce long"))
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = hist.select(
        F.col("v").alias("k"),
        (F.sum("cn").over(w_all) - F.sum("cn").over(w_cum)).alias("n_k"),
        (F.sum("ce").over(w_all) - F.sum("ce").over(w_cum)).alias("e_k"),
    )
    return out.filter(F.col("n_k") >= 2).select(
        "k",
        "n_k",
        "e_k",
        F.round(
            F.lit(2.0) * F.col("e_k") / (F.col("n_k") * (F.col("n_k") - F.lit(1))), 6
        ).alias("rich_club"),
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """outdeg per source, duplicate edges counted (pagerank_gpu.cu:66-75
    counts every edge occurrence). Map-side partial agg is automatic."""
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))


def dangling(node_ids: DataFrame, out_deg: DataFrame) -> DataFrame:
    """Nodes with outdeg 0 (pagerank_gpu.cu:77-80): anti-join against edge
    sources. node_ids: single-column (id)."""
    return node_ids.select("id").join(
        out_deg.select(F.col("src").alias("id")), "id", "left_anti"
    )


def dedupe_edges(edges: DataFrame) -> DataFrame:
    """Exact (src,dst) dedupe (api/build_corpus.py:82-93 'seen' set)."""
    return edges.distinct()


def graph_summary(edges: DataFrame, num_nodes: int, dangling_count: int) -> dict:
    """N / M / dangling counts (pagerank_gpu.cu:420-427)."""
    m = edges.count()
    return {"n": num_nodes, "m": m, "dangling": dangling_count}


def powerlaw_alpha_mle(edges: DataFrame, k_min: int = 5, direction: str = "in") -> DataFrame:
    """Discrete power-law exponent of the degree distribution by maximum
    likelihood (Clauset, Shalizi, Newman, SIAM Review 2009, eq. 3.7):

        α ≈ 1 + n_tail / Σ_{k_i ≥ k_min} ln(k_i / (k_min − ½))

    The standard web-graph diagnostic — Broder et al. report α ≈ 2.1 for
    in-degree. One row: (k_min, n_tail, alpha DOUBLE). direction: 'in'
    (default, the classic fit) or 'out'. Pure aggregates — a groupBy
    degree count, a filter, one ln-sum — nothing iterative, no driver
    data beyond the single result row.
    """
    if direction not in ("in", "out"):
        raise ValueError("direction must be 'in' or 'out'")
    key = "dst" if direction == "in" else "src"
    deg = edges.groupBy(key).agg(F.count(F.lit(1)).alias("k"))
    tail = deg.filter(F.col("k") >= k_min)
    return tail.agg(
        F.lit(k_min).cast("long").alias("k_min"),
        F.count(F.lit(1)).alias("n_tail"),
        (
            F.lit(1.0)
            + F.count(F.lit(1)) / F.sum(F.log(F.col("k") / (F.lit(k_min) - F.lit(0.5))))
        ).alias("alpha"),
    )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL crawl-quality features — the URL-side gate crawl pipelines
    apply BEFORE fetching (cheaper than any content filter: spam farms and
    infinite calendars announce themselves in the URL): host, path depth,
    query-param count, host digit ratio, and tracking-param detection
    (C4/CCNet-style URL hygiene; Castillo 2004 crawl-ordering features).

    Output: input columns + (host STRING, path_depth INT, n_query_params
    INT, host_digit_ratio DOUBLE, has_tracking BOOLEAN).

    Pure Catalyst regexp on the raw string — deliberately NOT `parse_url`
    (its corner-case semantics are JVM-specific; these regexes mean the
    same thing in Java regex and RE2, so any engine reproduces the gate).
    Map-only, zero shuffles.
    """
    url = F.col(url_col)
    host = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    path_depth = F.size(F.filter(F.split(path, "/"), lambda x: x != ""))
    n_params = F.when(query == "", F.lit(0)).otherwise(F.size(F.split(query, "&")))
    digit_ratio = (
        F.length(F.regexp_replace(host, "[^0-9]", ""))
        / F.greatest(F.length(host), F.lit(1))
    )
    tracking = query.rlike("(^|&)(utm_[a-z]+|fbclid|gclid|msclkid)=")
    return df.select(
        "*",
        host.alias("host"),
        path_depth.cast("int").alias("path_depth"),
        n_params.cast("int").alias("n_query_params"),
        digit_ratio.alias("host_digit_ratio"),
        tracking.alias("has_tracking"),
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Degree-correlation curve k_nn(k) (Pastor-Satorras, Vázquez &
    Vespignani, PRL 2001 — the standard companion measurement to the
    assortativity coefficient in graph_mixing): over the undirected
    simple graph, for each realized degree k,

        k_nn(k) = mean over nodes u with deg(u)=k of
                  ( Σ_{v ∈ N(u)} deg(v) / deg(u) )

    Decaying k_nn(k) = disassortative mixing (the web's signature: hubs
    attach to low-degree pages). Returns (k BIGINT, n_nodes BIGINT,
    knn DOUBLE) for every realized degree, knn rounded to 6 dp.

    Spark shape: degrees (one shuffle), one degree-attach join back onto
    the adjacency (the PageRank gather shape), one per-node aggregate and
    one O(distinct degrees) aggregate. Float policy (linkpred.py
    convention): the per-node mean is one IEEE division of exact longs,
    rounded to 9 dp and summed as exact DECIMAL(28,9) within the degree
    class — bit-identical to an ANSI-SQL oracle.
    """
    nonloop = edges.filter(F.col("src") != F.col("dst"))
    und = (
        nonloop.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    per_node = (
        adj.join(dv, "v")
        .groupBy("u")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("dv").alias("sdv"),
        )
        .select(
            "k",
            F.round(F.col("sdv") / F.col("k"), 9).cast("decimal(28,9)").alias("mnd"),
        )
    )
    return (
        per_node.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            # cast the exact decimal sum to double BEFORE the division:
            # decimal-division result scales differ between engines, one
            # IEEE divide does not
            F.round(F.sum("mnd").cast("double") / F.count(F.lit(1)), 6).alias("knn"),
        )
        .select("k", "n_nodes", "knn")
    )


def host_communities(
    edges_url: DataFrame,
    drop_intra: bool = True,
    levels: int = 2,
    rounds_per_level: int = 5,
) -> DataFrame:
    """Host-level community detection: domain rollup → dense host ids →
    weighted multi-level Louvain. Returns (host STRING, community STRING)
    — community named by a member host (the one holding the minimal dense
    id in the community, which dense-id assignment makes the
    lexicographically smallest member host: deterministic and
    human-readable).

    Composition of existing kernels exactly like `host_pagerank`:
    `domain_graph` (one shuffle; page-link multiplicities become Louvain
    edge weights — integer, so gains stay exact), `dense_node_ids`, and
    `louvain(weight_col='weight')`. drop_intra=True removes same-host
    self-loops BEFORE the rollup; False keeps them, and Louvain folds
    them into k_i per its self-loop convention."""
    from engine.operators.louvain import louvain

    dg = domain_graph(edges_url, drop_intra=drop_intra)
    hosts = dense_node_ids(
        dg.select(F.col("src_host").alias("url"))
        .union(dg.select(F.col("dst_host").alias("url")))
    )
    n_src = hosts.select(F.col("url").alias("src_host"), F.col("id").alias("src"))
    n_dst = hosts.select(F.col("url").alias("dst_host"), F.col("id").alias("dst"))
    e = dg.join(n_src, "src_host").join(n_dst, "dst_host").select(
        "src", "dst", "weight"
    )
    lab = louvain(
        e, levels=levels, rounds_per_level=rounds_per_level, weight_col="weight"
    )
    # label ids are node ids, but not necessarily MEMBER ids after
    # condensation levels — normalize to the minimal member id, then name
    # the community by that member's host string
    rep = lab.groupBy("label").agg(F.min("id").alias("_rep"))
    named = lab.join(rep, "label").join(
        hosts.select(F.col("id").alias("_rep"), F.col("url").alias("community")),
        "_rep",
    )
    return named.join(hosts, "id").select(
        F.col("url").alias("host"), "community"
    )
