"""Property-based tests (hypothesis) for the pure-Python semantic kernels
that the Arrow UDFs wrap — fast, no SparkSession."""

from __future__ import annotations

import re
from urllib.parse import urlparse

from hypothesis import given, settings, strategies as st

from engine.functions.urls import get_base_domain, normalize_url, resolve_href

# URL-ish strategy: scheme://sub.domain.tld/path[?q][#frag] from constrained parts
_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789", min_size=1, max_size=8)
_path_seg = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=0, max_size=8)


@st.composite
def urls(draw):
    host = ".".join(draw(st.lists(_label, min_size=1, max_size=4)))
    segs = draw(st.lists(_path_seg, min_size=0, max_size=4))
    path = "/" + "/".join(segs)
    if draw(st.booleans()) and path != "/":
        path += "/"
    frag = draw(st.one_of(st.just(""), _label.map(lambda s: "#" + s)))
    query = draw(st.one_of(st.just(""), _label.map(lambda s: "?q=" + s)))
    return f"http://{host}{path}{query}{frag}"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_normalize_url_stable_after_two_passes(u):
    """normalize is NOT strictly idempotent (reference behavior,
    crawler/core.py:53-56: an all-slash path rstrips to '' which the next
    pass turns into '/') — but the second application is a fixed point."""
    n2 = normalize_url(normalize_url(u))
    assert normalize_url(n2) == n2


def test_normalize_url_all_slash_path_reference_behavior():
    # pinned: the engine reproduces the reference's quirk byte-for-byte
    assert normalize_url("http://a.b//") == "http://a.b"
    assert normalize_url("http://a.b") == "http://a.b/"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_normalize_url_contract(u):
    n = normalize_url(u)
    assert "#" not in n  # fragment dropped (crawler/core.py:48)
    # trailing slash stripped except root path (crawler/core.py:53-57)
    path = n.split("://", 1)[1]
    path = "/" + path.split("/", 1)[1] if "/" in path else "/"
    p = path.split("?")[0]
    assert p == "/" or not p.endswith("/")


@given(urls(), _path_seg)
@settings(max_examples=200, deadline=None)
def test_resolve_href_relative_stays_on_host(base, rel):
    out = resolve_href(base, rel)
    assert out.startswith("http://")
    # parse hosts with urlparse, not string splitting: the reference's
    # all-slash-path quirk (crawler/core.py:53-56) can leave an EMPTY path
    # before a query ("http://h//?q=x" -> "http://h?q=x"), where a naive
    # split-on-"/" would swallow the query into the "host"
    base_host = urlparse(base).netloc.lower()
    out_host = urlparse(out).netloc
    assert out_host == base_host  # relative hrefs resolve within the page host


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz.", min_size=0, max_size=30))
@settings(max_examples=300, deadline=None)
def test_base_domain_is_last_two_labels(netloc):
    bd = get_base_domain(netloc)
    parts = netloc.split(".")
    if len(parts) >= 2:
        assert bd == ".".join(parts[-2:])
    else:
        assert bd == netloc


TOKEN_RE = re.compile(r"\b\w+\b")


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_reference_tokenizer_equals_maximal_word_runs(text):
    """The engine tokenizes with maximal \\w+ runs (regexp_extract_all); the
    reference uses \\b\\w+\\b findall (api/tfidf_index.py:23-28). These are
    the same language — pinned here so the Catalyst pattern can't drift."""
    assert TOKEN_RE.findall(text.lower()) == re.findall(r"\w+", text.lower())


def test_normalize_matches_reference_examples():
    # hand-checked reference behaviors (crawler/core.py:39-60)
    assert normalize_url("http://EX.org/a/#frag") == "http://ex.org/a"
    assert normalize_url("http://ex.org/") == "http://ex.org/"
    assert normalize_url("http://ex.org") == "http://ex.org/"
    assert normalize_url("http://ex.org/a/b/") == "http://ex.org/a/b"
