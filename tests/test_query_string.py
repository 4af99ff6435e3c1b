"""query_string grammar + composition contract tests (the cross-engine
scoring contract itself is pinned by the SQL oracle in the sweep)."""

from splade_ray.pipelines.search import IndexReader, parse_query_string


def test_parse_roles_kinds_boosts():
    assert parse_query_string('+a -b c^2 "d e"^1.5 "f g" h') == [
        ("must", "term", "a", 1.0),
        ("not", "term", "b", 1.0),
        ("should", "term", "c", 2.0),
        ("should", "phrase", "d e", 1.5),
        ("should", "phrase", "f g", 1.0),
        ("should", "term", "h", 1.0),
    ]


def test_parse_signed_phrase_and_fractional_boost():
    assert parse_query_string('+"x y" -z^0.5') == [
        ("must", "phrase", "x y", 1.0),
        ("not", "term", "z", 0.5),
    ]


def test_disjoint_shoulds_equal_plain_search(built_index):
    """All-should distinct-term query_string ≡ plain disjunctive BM25."""
    index_dir, cfg = built_index
    r = IndexReader(index_dir, cfg)
    assert r.search_query_string("w0001 w0002", 10) == r.search("w0001 w0002", 10)


def test_oov_must_empties_oov_not_is_noop(built_index):
    index_dir, cfg = built_index
    r = IndexReader(index_dir, cfg)
    assert r.search_query_string("+zzznotaword w0001", 10) == []
    assert r.search_query_string("w0001 -zzznotaword", 10) == r.search("w0001", 10)


def test_must_restricts_and_keeps_scores(built_index):
    """+a b: every hit contains a; scores = bm25(a) + bm25(b) where b hits."""
    index_dir, cfg = built_index
    r = IndexReader(index_dir, cfg)
    got = r.search_query_string("+w0001 w0002", 10)
    assert got, "must query should hit"
    only_a = {d: s for d, s, _ in r.search_query_string("+w0001", 10000)}
    both = {d: s for d, s, _ in r.search_query_string("+w0001 +w0002", 10000)}
    for d, s, _u in got:
        assert d in only_a
        if d in both:
            assert s > only_a[d]
        else:
            assert s == only_a[d]
