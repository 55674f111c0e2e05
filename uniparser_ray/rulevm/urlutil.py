"""URL utilities: relative-path fixing and crawl canonicalization.

``fix_relative_path`` reproduces the reference's behavior
(reference: utils.py:707-726, golden at test_parsers.py:1386-1395) via
in-place attribute rewriting — the source markup is preserved
byte-for-byte except for the rewritten attribute values, which is both
faster than a DOM round-trip and avoids serializer drift.

``canonicalize_url`` and ``url_hash64`` are the frontier dedup keys:
the URL-seen set invariant is defined over canonical URLs.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

_DEFAULT_ATTRS = ("src", "href", "poster")


def fix_relative_path(base_url: str, html: str, attrs=None, strict=False) -> str:
    attrs = tuple(attrs) if attrs else _DEFAULT_ATTRS
    alt = "|".join(re.escape(a) for a in attrs)
    if not strict and not re.search(
            rf"\s({alt})=['\"](?!https?://)", html):
        return html
    pat = re.compile(rf"(\s(?:{alt})=)(['\"])(.*?)\2")

    def sub(m):
        val = m.group(3)
        if not val:
            return m.group(0)
        return f"{m.group(1)}{m.group(2)}{urljoin(base_url, val)}{m.group(2)}"

    return pat.sub(sub, html)


def canonicalize_url(url: str) -> str:
    """Deterministic canonical form: lowercase scheme/host, default
    ports stripped, fragment dropped, query keys sorted, trailing
    '?' removed, empty path -> '/'."""
    try:
        scheme, netloc, path, query, _frag = urlsplit(url)
    except ValueError:
        return url
    scheme = scheme.lower()
    netloc = netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    if not path:
        path = "/"
    if query:
        query = urlencode(sorted(parse_qsl(query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def url_hash64(url: str) -> int:
    """Stable unsigned 64-bit hash of a canonical URL (blake2b-8).

    Python's builtin hash() is salted per process — never use it for a
    cross-worker seen set."""
    return int.from_bytes(
        hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "big")
