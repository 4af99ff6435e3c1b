"""URL canonicalization kernel (functions/urls.py): RFC-3986 normalize +
tracking-param strip, edge cases the host_agg oracle can't reach."""

import pyarrow as pa

from splade_ray.functions.urls import normalize_urls


CASES = [
    # lowercase scheme+host, default https port, trailing slash, utm, fragment
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&id=3#frag", "https://www.example.com/a/b?id=3"),
    ("http://site.org:80/p/1", "http://site.org/p/1"),
    # non-default port survives
    ("http://site.org:8080/p/1/", "http://site.org:8080/p/1"),
    # all params were tracking -> no query at all
    ("https://a.b/?utm_a=1&utm_b=2", "https://a.b/"),
    ("https://a.b/x?id=1&utm_c=9", "https://a.b/x?id=1"),
    # utm in the middle keeps both neighbors
    ("https://a.b/x?utm_a=1&id=2&utm_b=3", "https://a.b/x?id=2"),
    # consecutive utm params fall in one pass
    ("https://a.b/x?utm_a=1&utm_b=2&id=3", "https://a.b/x?id=3"),
    # 'utm_' inside a non-utm param NAME or VALUE is untouched
    ("https://a.b/x?next=page_utm_a&id=1", "https://a.b/x?next=page_utm_a&id=1"),
    ("https://a.b/x?xutm_b=1", "https://a.b/x?xutm_b=1"),
    ("https://a.b/x?autm_x=1&b=2", "https://a.b/x?autm_x=1&b=2"),
    # empty path canonicalizes to '/' (RFC 3986 §6.2.3)
    ("https://a.b", "https://a.b/"),
    ("https://a.b/", "https://a.b/"),
    # root path never loses its slash
    ("https://a.b/?id=1", "https://a.b/?id=1"),
    # unparseable rows pass through verbatim
    ("not a url", "not a url"),
    ("", ""),
]


def test_normalize_urls_cases():
    got = normalize_urls(pa.array([u for u, _ in CASES])).to_pylist()
    for (u, want), g in zip(CASES, got):
        assert g == want, (u, g, want)


def test_normalize_urls_null_and_idempotent():
    arr = pa.array([u for u, _ in CASES] + [None])
    once = normalize_urls(arr)
    assert once.to_pylist()[-1] is None
    twice = normalize_urls(once)
    assert once.to_pylist() == twice.to_pylist()  # canonical form is a fixpoint


def test_normalize_urls_chunked():
    ch = pa.chunked_array([pa.array(["HTTP://A.B:80/x/"]), pa.array(["https://c.d/?utm_x=1"])])
    assert normalize_urls(ch).to_pylist() == ["http://a.b/x", "https://c.d/"]
