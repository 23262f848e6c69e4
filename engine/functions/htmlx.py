"""HTML parsing + text/href extraction with the reference crawler's semantics.

Fresh stdlib implementation (``html.parser``) of the behavior of the reference
extractor (``crawler/core.py:100-158`` text extraction, ``crawler/core.py:296-310``
href extraction, ``crawler/core.py:65-95`` language detection). The reference uses
BeautifulSoup; this container has no bs4, so we implement the same *observable
semantics* over a minimal DOM:

- drop non-content tags (script/style/noscript/svg/img/picture/video/audio/
  canvas/form/button) — ``crawler/core.py:106-109``
- drop boilerplate containers by tag / .class / #id selector list —
  ``crawler/core.py:112-134``
- pick a main-like content region (<main>, else first of a candidate selector
  list, else <body>, else whole document) — ``crawler/core.py:137-153``
- get_text(" ", strip=True) + whitespace collapse — ``crawler/core.py:154-158``
  (net effect: every text node's whitespace-split tokens joined by single
  spaces, in document order)
- hrefs are collected from the *decomposed* tree (the reference calls
  extract_text_from_soup on the same soup object before link parsing, so
  anchors inside removed boilerplate never become edges) —
  ``crawler/core.py:292-296`` ordering.

These run inside Arrow-batched pandas UDFs (engine/functions/udfs.py); each
call here is per-document but the Python<->JVM boundary is crossed per batch.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = [
    "parse_html",
    "extract_text",
    "extract_hrefs",
    "extract_page",
    "detect_page_language",
]

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# crawler/core.py:106-109
_REMOVE_TAGS = frozenset(
    "script style noscript svg img picture video audio canvas form button".split()
)

# crawler/core.py:112-131 (order preserved; order is not observable since
# decompose is idempotent, but kept for fidelity)
_BOILERPLATE_SELECTORS = (
    "header",
    "footer",
    "nav",
    "aside",
    ".navbar",
    ".nav",
    ".navigation",
    ".site-header",
    ".site-footer",
    ".footer",
    "#header",
    "#footer",
    "#nav",
    "#navbar",
    ".cookie",
    ".cookie-banner",
    "#cookie-banner",
    ".banner",
)

# crawler/core.py:139-148
_MAIN_SELECTORS = (
    "article",
    "#main",
    ".main",
    ".main-content",
    "#content",
    ".content",
    ".page-content",
    ".layout__content",
)

_WS_RE = re.compile(r"\s+")


class Element:
    __slots__ = ("tag", "attrs", "children", "removed")

    def __init__(self, tag: str, attrs: dict):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Element | str
        self.removed = False


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs))
        self.stack[-1].children.append(el)
        if tag not in _VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Element(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # close the innermost matching open element; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html) -> Element:
    """Parse HTML (str or UTF-8 bytes) into a mini-DOM tree."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(html or "")
    return builder.root


def _matches(el: Element, selector: str) -> bool:
    if selector.startswith("."):
        cls = el.attrs.get("class")
        return cls is not None and selector[1:] in cls.split()
    if selector.startswith("#"):
        return el.attrs.get("id") == selector[1:]
    return el.tag == selector


def _iter_elements(root: Element):
    """Document-order DFS over non-removed elements (root excluded)."""
    stack = [iter(root.children)]
    while stack:
        try:
            node = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if isinstance(node, Element):
            if node.removed:
                continue
            yield node
            stack.append(iter(node.children))


def _decompose_matching(root: Element, selector: str) -> None:
    for el in _iter_elements(root):
        if _matches(el, selector):
            el.removed = True


def _find_first(root: Element, selector: str):
    for el in _iter_elements(root):
        if _matches(el, selector):
            return el
    return None


def _get_text_tokens(root: Element, out: list) -> None:
    stack = [iter(root.children)]
    while stack:
        try:
            node = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if isinstance(node, Element):
            if not node.removed:
                stack.append(iter(node.children))
        else:
            out.extend(node.split())


def decompose_non_content(root: Element) -> None:
    """Steps 1-2 of the reference extractor: remove non-content tags and
    boilerplate containers (crawler/core.py:106-134)."""
    for el in _iter_elements(root):
        if el.tag in _REMOVE_TAGS:
            el.removed = True
    for selector in _BOILERPLATE_SELECTORS:
        _decompose_matching(root, selector)


def _main_region(root: Element) -> Element:
    main = _find_first(root, "main")
    if main is None:
        for cand in _MAIN_SELECTORS:
            main = _find_first(root, cand)
            if main is not None:
                break
    if main is None:
        main = _find_first(root, "body")
    return main if main is not None else root


def extract_text(html) -> str:
    """Visible main-content text; semantics of crawler/core.py:100-158."""
    root = parse_html(html)
    decompose_non_content(root)
    region = _main_region(root)
    tokens: list = []
    _get_text_tokens(region, tokens)
    return " ".join(tokens)


def extract_hrefs(html) -> list:
    """Raw href values of <a href=...> anchors surviving decomposition, in
    document order (crawler/core.py:296-297 after the in-place decompose of
    extract_text_from_soup at :292). Duplicates preserved."""
    root = parse_html(html)
    decompose_non_content(root)
    return [el.attrs["href"] for el in _iter_elements(root) if el.tag == "a" and "href" in el.attrs]


def extract_page(html):
    """One parse shared by text + href extraction (mirrors the reference
    sharing one soup object): returns (text, hrefs)."""
    root = parse_html(html)
    decompose_non_content(root)
    hrefs = [el.attrs["href"] for el in _iter_elements(root) if el.tag == "a" and "href" in el.attrs]
    region = _main_region(root)
    tokens: list = []
    _get_text_tokens(region, tokens)
    return " ".join(tokens), hrefs


def extract_anchors(html) -> list:
    """[(href, anchor_text), ...] for every <a href=...> surviving
    decomposition, in document order. anchor_text is the whitespace-
    normalized visible text of the anchor's own subtree (the classic
    anchor-text ranking signal — beyond-reference: the reference keeps
    only hrefs, crawler/core.py:296-297). Duplicates preserved."""
    root = parse_html(html)
    decompose_non_content(root)
    out = []
    for el in _iter_elements(root):
        if el.tag == "a" and "href" in el.attrs:
            tokens: list = []
            _get_text_tokens(el, tokens)
            out.append((el.attrs["href"], " ".join(tokens)))
    return out


_CONTENT_LANG_RE = re.compile("content-language", re.I)
_LANGUAGE_RE = re.compile("language", re.I)


def detect_page_language(html):
    """<html lang> / meta content-language / meta name=language, normalized
    'en-US' -> 'en' (crawler/core.py:65-95). Runs on the *undecomposed* tree
    (the reference detects language before extraction, core.py:275)."""
    root = parse_html(html)
    lang = None
    html_el = _find_first(root, "html")
    if html_el is not None and "lang" in html_el.attrs:
        lang = html_el.attrs["lang"]
    if not lang:
        for el in _iter_elements(root):
            if el.tag == "meta":
                he = el.attrs.get("http-equiv")
                if he is not None and _CONTENT_LANG_RE.search(he) and el.attrs.get("content"):
                    lang = el.attrs["content"]
                    break
    if not lang:
        for el in _iter_elements(root):
            if el.tag == "meta":
                nm = el.attrs.get("name")
                if nm is not None and _LANGUAGE_RE.search(nm) and el.attrs.get("content"):
                    lang = el.attrs["content"]
                    break
    if not lang:
        return None
    lang = lang.strip().lower()
    lang = lang.split(",")[0]
    lang = lang.split("-")[0]
    return lang or None


# --- jusText-style block segmentation (boilerplate classification input) ----

# block-level tags: entering one starts a new text block (jusText §3.1
# segments on block-level boundaries; this is the HTML4/5 block set the
# mini-DOM can see without CSS)
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li dt dd td th pre blockquote article section "
    "aside header footer nav main table ul ol tr figure figcaption body".split()
)


def extract_blocks(html) -> list:
    """Segment a page into jusText-style text blocks (Pomikálek 2011 §3.1):
    contiguous visible-text runs split at block-level tag boundaries, each
    with its link-anchored character share. Only the NON-CONTENT tags are
    removed first (script/style/form... — extract_text's step 1); the
    reference's boilerplate CONTAINERS (header/footer/nav/...) are kept,
    because classifying their content is the block classifier's job —
    this is the content-based alternative to the reference's selector
    list (crawler/core.py:112-134).

    Returns [{'tag', 'text', 'n_chars', 'link_chars'}, ...] in document
    order; 'text' uses extract_text's whitespace-collapse token semantics,
    'n_chars'/'link_chars' count token characters (total / inside <a>).
    """
    root = parse_html(html)
    for el in _iter_elements(root):
        if el.tag in _REMOVE_TAGS:
            el.removed = True

    blocks: list = []
    state = {"tokens": [], "chars": 0, "link": 0, "tag": "body"}

    def flush():
        if state["tokens"]:
            blocks.append(
                {
                    "tag": state["tag"],
                    "text": " ".join(state["tokens"]),
                    "n_chars": state["chars"],
                    "link_chars": state["link"],
                }
            )
        state["tokens"] = []
        state["chars"] = 0
        state["link"] = 0

    def walk(el, in_link):
        for node in el.children:
            if isinstance(node, Element):
                if node.removed:
                    continue
                if node.tag in _BLOCK_TAGS:
                    flush()
                    prev_tag = state["tag"]
                    state["tag"] = node.tag
                    walk(node, in_link)
                    flush()
                    state["tag"] = prev_tag
                else:
                    walk(node, in_link or node.tag == "a")
            else:
                toks = node.split()
                if toks:
                    n = sum(len(t) for t in toks)
                    state["tokens"].extend(toks)
                    state["chars"] += n
                    if in_link:
                        state["link"] += n

    walk(root, False)
    flush()
    return blocks
