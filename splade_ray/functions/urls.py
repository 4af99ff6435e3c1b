"""Vectorized URL canonicalization for Common-Crawl-style corpora.

Crawl snapshots carry the same page under many spellings — mixed-case
hosts, explicit default ports, trailing slashes, tracking params,
fragments.  Canonicalizing BEFORE the url-keyed dedup/groupby stages is
what keeps one page from becoming five index entries.  Everything here is
Arrow-RE2 kernels (``pc.extract_regex`` / ``pc.replace_substring_regex``)
over whole columns — no per-row Python — and every rule is chosen to be
replayable by DuckDB's RE2 ``regexp_extract``/``regexp_replace`` so the
SQL oracle can pin the exact same canonical form.

Rules (RFC 3986 normalization + the tracking-param strip every crawl
pipeline applies):
  1. drop the fragment
  2. lowercase scheme and host
  3. drop the default port (http:80 / https:443); keep explicit others
  4. strip ONE trailing slash from a non-root path
  5. drop ``utm_*`` tracking params, keeping other params in order
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/:?#]+)"
    r"(?::(?P<port>[0-9]+))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#.*)?$"
)


def normalize_urls(urls: pa.Array) -> pa.Array:
    """Canonicalize a string column of absolute http(s) URLs (one
    ``extract_regex`` + a handful of column-wide kernels; null/unparseable
    rows pass through unchanged)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    # RE2 groups that don't participate come back as EMPTY STRINGS (the
    # struct's row validity marks whole-row non-matches), so the absent
    # tests below are ''-equality, not null checks.
    parts = pc.extract_regex(urls, pattern=_URL_RE)
    valid = pc.is_valid(parts)
    scheme = pc.utf8_lower(parts.field("scheme"))
    host = pc.utf8_lower(parts.field("host"))
    port = parts.field("port")
    path = parts.field("path")
    query = parts.field("query")

    # default-port drop: http:80 / https:443; others keep ":port"
    is_default = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
    )
    port_part = pc.if_else(
        pc.or_(pc.equal(port, ""), is_default),
        "",
        pc.binary_join_element_wise(":", port, ""),
    )

    # empty path is '/' (RFC 3986 §6.2.3); one trailing slash off non-root
    path = pc.if_else(
        pc.equal(path, ""), "/", pc.replace_substring_regex(path, r"(.)/$", r"\1")
    )

    # utm_* params out.  Anchor to the PARAM boundary: prepend '&' so every
    # param starts with '&', strip '&utm_<value>' ([^&]* stops at the next
    # separator, so consecutive utm params fall in one pass and a non-utm
    # param whose name or VALUE merely contains 'utm_' is untouched), then
    # drop the sentinel separator.
    q = pc.binary_join_element_wise("&", query, "")
    q = pc.replace_substring_regex(q, r"&utm_[^&]*", "")
    q = pc.replace_substring_regex(q, r"^&", "")
    query_part = pc.if_else(
        pc.equal(q, ""), "", pc.binary_join_element_wise("?", q, "")
    )

    rebuilt = pc.binary_join_element_wise(
        scheme, "://", host, port_part, path, query_part, ""
    )
    # unparseable rows (no scheme://host) pass through verbatim
    return pc.if_else(valid, rebuilt, urls)
