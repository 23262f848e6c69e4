"""URL normalization / domain predicates — reference crawler semantics.

Pure-Python functions (used inside Arrow-batched pandas UDFs and by the data
generator) re-implementing:

- ``normalize_url``: drop fragment, lowercase host, strip trailing slash except
  root (crawler/core.py:39-60; duplicate impl api/main.py:131-152 — they differ
  only in operation order, which is not observable).
- ``get_base_domain`` / ``is_same_domain``: last-two-label base domain match
  (crawler/core.py:13-36).
- ``resolve_href``: urljoin + normalize (crawler/core.py:298-299).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlparse, urlunparse

__all__ = ["normalize_url", "get_base_domain", "is_same_domain", "resolve_href"]


def normalize_url(url: str) -> str:
    parsed = urlparse(url)
    parsed = parsed._replace(fragment="")
    netloc = parsed.netloc.lower()
    path = parsed.path or "/"
    if path != "/" and path.endswith("/"):
        path = path.rstrip("/")
    parsed = parsed._replace(netloc=netloc, path=path)
    return urlunparse(parsed)


def get_base_domain(netloc: str) -> str:
    if not netloc:
        return ""
    parts = netloc.split(".")
    if len(parts) >= 2:
        return ".".join(parts[-2:])
    return netloc


def is_same_domain(url: str, base_domain: str) -> bool:
    try:
        url_netloc = urlparse(url).netloc.lower()
        return get_base_domain(url_netloc) == base_domain
    except Exception:
        return False


def resolve_href(page_url: str, href: str) -> str:
    """Absolute normalized target URL for an anchor on page_url."""
    return normalize_url(urljoin(page_url, href))
