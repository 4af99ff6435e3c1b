"""Exact-phrase retrieval: forward (md5 token-stream) index + boolean-AND
candidates + adjacency verify + BM25 ranking, vs the numpy phrase oracle.

Covers: sorted and hashed vocab modes, broadcast and shuffle dedup, the
store_forward resume toggle (stale shards must re-materialize), and edge
phrases (OOV, empty, repeated tokens, whole-doc prefix)."""

import dataclasses
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from splade_ray.config import EngineConfig
from splade_ray.fixtures import write_web_pages
from splade_ray.oracle import build_oracle_index, oracle_phrase_search
from splade_ray.pipelines.build import build_index
from splade_ray.pipelines.search import IndexReader

N_PAGES = 800


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("phrase") / "web.parquet")
    write_web_pages(p, N_PAGES)
    return p


@pytest.fixture(scope="module")
def cfg():
    return EngineConfig(shard_size=200, num_buckets=4, store_forward=True)


@pytest.fixture(scope="module")
def built(corpus, cfg, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("phrase") / "idx")
    build_index(corpus, out, cfg)
    return out


def _phrases(oidx):
    out = []
    for dt in oidx.tokens[:40]:
        if len(dt) >= 4:
            out.append(" ".join(dt[:2]))  # doc-prefix bigram
            out.append(" ".join(dt[1:4]))  # interior trigram
    return sorted(set(out))[:10] + ["zzznotaword here", "", "   ", "w0001"]


def test_phrase_matches_oracle(corpus, cfg, built):
    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    reader = IndexReader(built, cfg)
    checked = 0
    for p in _phrases(oidx):
        got = [(d, round(s, 9)) for d, s, *_ in reader.search_phrase(p, 10)]
        want = [(d, round(s, 9)) for d, s in oracle_phrase_search(oidx, p, 10)]
        assert got == want, p
        checked += len(got)
    assert checked > 10  # the fixture must actually produce matches


def test_phrase_method_routing(corpus, cfg, built):
    reader = IndexReader(built, cfg)
    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    p = next(" ".join(dt[:2]) for dt in oidx.tokens if len(dt) >= 2)
    assert reader.search(p, 5, method="phrase") == reader.search_phrase(p, 5)


def test_phrase_repeated_token(corpus, cfg, built):
    """A phrase of one token repeated must require true adjacency of the
    repeat, not just tf >= 1 (the qtf-2 bag scoring also differs)."""
    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    reader = IndexReader(built, cfg)
    tokset = [dt for dt in oidx.tokens if len(dt) >= 2]
    reps = [" ".join([dt[i]] * 2) for dt in tokset[:60] for i in range(len(dt) - 1) if dt[i] == dt[i + 1]]
    probe = (reps[:3] or []) + [tokset[0][0] + " " + tokset[0][0]]
    for p in probe:
        got = [(d, round(s, 9)) for d, s, *_ in reader.search_phrase(p, 10)]
        want = [(d, round(s, 9)) for d, s in oracle_phrase_search(oidx, p, 10)]
        assert got == want, p


def test_span_near_matches_oracle(corpus, cfg, built):
    """Ordered span-near vs the brute-force (itertools over positions)
    oracle, across slops 0-4, 2- and 3-token spans, incl. gapped spans
    (tokens 0 and 2 of a doc: only matchable with slop >= 1)."""
    from splade_ray.oracle import oracle_span_near_search

    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    reader = IndexReader(built, cfg)
    spans = []
    for dt in oidx.tokens[:30]:
        if len(dt) >= 5:
            spans.append(" ".join(dt[:2]))  # adjacent pair
            spans.append(f"{dt[0]} {dt[2]}")  # gap-1 pair
            spans.append(f"{dt[1]} {dt[4]}")  # gap-2 pair
            spans.append(" ".join([dt[0], dt[2], dt[4]]))  # gapped triple
            spans.append(" ".join(dt[2:0:-1]))  # reversed pair (order matters)
    spans = sorted(set(spans))[:24] + ["zzznotaword here"]
    checked = 0
    for span in spans:
        for slop in (0, 1, 2, 4):
            got = [(d, round(s, 9)) for d, s, *_ in reader.search_span_near(span, slop, 10)]
            want = [(d, round(s, 9)) for d, s in oracle_span_near_search(oidx, span, slop, 10)]
            assert got == want, (span, slop)
            checked += len(got)
    assert checked > 40


def test_span_near_slop0_is_phrase(corpus, cfg, built):
    """slop=0 ≡ exact phrase for repeat-free spans (inOrder, no gaps)."""
    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    reader = IndexReader(built, cfg)
    probes = [" ".join(dt[:3]) for dt in oidx.tokens[:20] if len(dt) >= 3 and len(set(dt[:3])) == 3]
    assert probes
    for p in probes[:8]:
        assert reader.search_span_near(p, 0, 10) == reader.search_phrase(p, 10), p


def test_significant_terms_brute_force(corpus, cfg, built):
    """JLH significant terms vs a from-scratch recomputation off the
    oracle index's token lists (foreground = engine top-50 doc set)."""
    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    reader = IndexReader(built, cfg)
    for q in ["w0001 w0093", "w0042 w0010", "w0005"]:
        got = reader.significant_terms(q, 50, 10)
        top = [d for d, _s, _u in reader.search(q, 50)]
        if not top:
            assert got == []
            continue
        n_fg, n_docs = float(len(top)), float(oidx.n_docs)
        fg: dict[str, int] = {}
        for d in top:
            for t in set(oidx.tokens[d]):
                fg[t] = fg.get(t, 0) + 1
        bg = {t: int(oidx.df[oidx.term_to_id[t]]) for t in fg}
        sig = []
        for t, f in fg.items():
            fgp, bgp = f / n_fg, bg[t] / n_docs
            jlh = (fgp - bgp) * fgp / bgp
            if jlh > 0:
                sig.append((t, f, bg[t], jlh))
        want = sorted(sig, key=lambda r: (-r[3], r[0]))[:10]
        assert [(t, f, b, round(j, 9)) for t, f, b, j in got] == [
            (t, f, b, round(j, 9)) for t, f, b, j in want
        ], q
        assert got, q


def test_suggesters_brute_force(corpus, cfg, built):
    """Completion (prefix → cf ranking) and spelling (Levenshtein ≤ 2 →
    (dist, −df, term) ranking) suggesters vs from-scratch recomputation
    off the oracle index's token lists."""
    from splade_ray.oracle import _levenshtein

    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    reader = IndexReader(built, cfg)
    cf: dict[str, int] = {}
    df: dict[str, int] = {}
    for dt in oidx.tokens:
        for t in dt:
            cf[t] = cf.get(t, 0) + 1
        for t in set(dt):
            df[t] = df.get(t, 0) + 1

    for prefix in ["w00", "w005", "w1", "zzz"]:
        got = reader.suggest_completion(prefix, 10)
        want = sorted(
            ((t, cf[t], df[t]) for t in cf if t.startswith(prefix)),
            key=lambda r: (-r[1], r[0]),
        )[:10]
        assert got == want, prefix

    for term in ["w001", "w0x42", "qqqqqq"]:
        got = reader.suggest_spelling(term, 10, 2)
        cands = []
        for t in df:
            d = _levenshtein(t, term)
            if 1 <= d <= 2:
                cands.append((t, d, df[t]))
        want = sorted(cands, key=lambda r: (r[1], -r[2], r[0]))[:10]
        assert got == want, term
    assert reader.suggest_spelling("w001", 10, 2)  # fixture must produce hits


def test_term_vectors_brute_force(corpus, cfg, built):
    """Term-vectors API vs per-doc token counting + global df, incl.
    unknown doc ids (skipped) and the empty request."""
    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    reader = IndexReader(built, cfg)
    req = [0, 3, 7, 7, 10**9]  # dup + unknown
    got = reader.term_vectors(req)
    want = []
    for d in sorted({0, 3, 7}):
        cnt: dict[str, int] = {}
        for t in oidx.tokens[d]:
            cnt[t] = cnt.get(t, 0) + 1
        for t in sorted(cnt):
            want.append((d, t, cnt[t], int(oidx.df[oidx.term_to_id[t]])))
    assert got == want
    assert reader.term_vectors([10**9]) == []


def test_rare_terms_brute_force(corpus, cfg, built):
    """Rare-terms aggregation vs a from-scratch recomputation: foreground
    presence in the engine's top-50, global df filter, (df, term) order."""
    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    reader = IndexReader(built, cfg)
    max_df = 12
    checked = 0
    for q in ["w0001 w0093", "w0042 w0010", "w0005"]:
        got = reader.rare_terms(q, 50, max_df, 10)
        top = [d for d, _s, _u in reader.search(q, 50)]
        fg: dict[str, int] = {}
        for d in top:
            for t in set(oidx.tokens[d]):
                fg[t] = fg.get(t, 0) + 1
        cands = [
            (t, int(oidx.df[oidx.term_to_id[t]]), f)
            for t, f in fg.items()
            if int(oidx.df[oidx.term_to_id[t]]) <= max_df
        ]
        want = sorted(cands, key=lambda r: (r[1], r[0]))[:10]
        assert got == want, q
        checked += len(got)
    assert checked > 5  # the zipf tail must actually surface rare terms


def test_phrase_hashed_vocab_and_shuffle_dedup(corpus, cfg, tmp_path_factory):
    """The forward stream is vocab-mode independent: hashed-vocab and
    shuffle-dedup builds must return the same phrase top-k."""
    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    phrases = _phrases(oidx)[:6]
    base = IndexReader(_build(corpus, cfg, tmp_path_factory, "b0"), cfg)
    for variant in (
        dataclasses.replace(cfg, vocab_mode="hashed"),
        dataclasses.replace(cfg, dedup_mode="shuffle"),
    ):
        rd = IndexReader(_build(corpus, variant, tmp_path_factory, f"v{variant.vocab_mode}{variant.dedup_mode}"), variant)
        for p in phrases:
            got = [(d, round(s, 9), u) for d, s, u in rd.search_phrase(p, 10)]
            want = [(d, round(s, 9), u) for d, s, u in base.search_phrase(p, 10)]
            assert got == want, p


def _build(corpus, cfg, tmp_path_factory, tag):
    out = str(tmp_path_factory.mktemp("phrase") / f"idx_{tag}")
    build_index(corpus, out, cfg)
    return out


def test_store_forward_toggle_rematerializes(corpus, cfg, tmp_path_factory):
    """Building WITHOUT fwd then WITH fwd into the same dir must not skip
    the stale shards (shard manifests pin the fwd flag)."""
    out = str(tmp_path_factory.mktemp("phrase") / "idx_toggle")
    plain = dataclasses.replace(cfg, store_forward=False)
    build_index(corpus, out, plain)
    r0 = IndexReader(out, plain)
    assert all(sh.fwd_stream is None for sh in r0.shards)
    build_index(corpus, out, cfg)
    r1 = IndexReader(out, cfg)
    assert all(sh.fwd_stream is not None for sh in r1.shards)
    # and the streams reconcile with dl exactly
    for sh in r1.shards:
        assert sh.fwd_stream.size == int(sh.dl.sum())


def test_phrase_without_forward_raises(corpus, cfg, tmp_path_factory):
    plain = dataclasses.replace(cfg, store_forward=False)
    out = _build(corpus, plain, tmp_path_factory, "plain")
    reader = IndexReader(out, plain)
    with pytest.raises(ValueError, match="store_forward"):
        reader.search_phrase("w0001 w0002", 5)


def test_phrase_sharded_searcher(corpus, cfg, built):
    from splade_ray.pipelines.search import ShardedSearcher

    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    reader = IndexReader(built, cfg)
    searcher = ShardedSearcher(built, cfg, num_actors=2)
    try:
        for p in _phrases(oidx)[:6]:
            got = [(d, round(s, 9), u) for d, s, u in searcher.search(p, 10, method="phrase")]
            want = [(d, round(s, 9), u) for d, s, u in reader.search_phrase(p, 10)]
            assert got == want, p
    finally:
        searcher.shutdown()


def test_phrase_survives_segment_merge(corpus, cfg, tmp_path_factory):
    """Two forward-enabled segments merged must answer phrase queries
    identically to the single full build.  num_buckets=1 so the url-sorted
    segment split preserves the global doc-id order (same precondition the
    segment_merge_topk showcase uses); with multiple buckets internal doc
    ids legitimately differ between segmented and full builds — urls are
    the stable identity."""
    import pyarrow.compute as pc

    from splade_ray.pipelines.merge import merge_segments

    mcfg = dataclasses.replace(cfg, num_buckets=1)
    base = str(tmp_path_factory.mktemp("phrase") / "seg")
    tbl = pq.read_table(corpus)
    urls = tbl.column("url")
    split = sorted(urls.to_pylist())[tbl.num_rows // 2]
    a, b = os.path.join(base, "a.parquet"), os.path.join(base, "b.parquet")
    os.makedirs(base, exist_ok=True)
    pq.write_table(tbl.filter(pc.less(urls, split)), a)
    pq.write_table(tbl.filter(pc.greater_equal(urls, split)), b)
    # the fixture contains recrawls: segment B's doc ids continue from A's
    # DISTINCT url count (ids are per-url, not per-row)
    n_a = len(set(pq.read_table(a, columns=["url"]).column("url").to_pylist()))
    build_index(a, os.path.join(base, "segA"), mcfg, doc_id_base=0)
    build_index(b, os.path.join(base, "segB"), mcfg, doc_id_base=n_a)
    merged = os.path.join(base, "merged")
    merge_segments([os.path.join(base, "segA"), os.path.join(base, "segB")], merged, mcfg)

    full = _build(corpus, mcfg, tmp_path_factory, "full_for_merge")
    r_merged, r_full = IndexReader(merged, mcfg), IndexReader(full, mcfg)
    oidx = build_oracle_index(tbl, mcfg)
    matched = 0
    for p in _phrases(oidx)[:6]:
        got = [(d, round(s, 9), u) for d, s, u in r_merged.search_phrase(p, 10)]
        want = [(d, round(s, 9), u) for d, s, u in r_full.search_phrase(p, 10)]
        assert got == want, p
        matched += len(got)
    assert matched > 0


def test_near_matches_oracle(corpus, cfg, built):
    from splade_ray.oracle import oracle_near_search

    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    reader = IndexReader(built, cfg)
    # term pairs drawn from real docs: adjacent (gap 1), same-doc distant,
    # and cross-doc pairs that should only match at large windows
    probes = []
    for dt in oidx.tokens[:30]:
        if len(dt) >= 6 and dt[0] != dt[1]:
            probes.append((dt[0], dt[1], 1))
            probes.append((dt[0], dt[1], 0))  # window 0: same position only -> never
        if len(dt) >= 6 and dt[0] != dt[5]:
            probes.append((dt[0], dt[5], 5))
            probes.append((dt[0], dt[5], 4))  # one short of the gap
    probes = probes[:16] + [("zzznotaword", "w0001", 3)]
    checked = 0
    for ta, tb, w in probes:
        got = [(d, round(s, 9)) for d, s, *_ in reader.search_near(ta, tb, w, 10)]
        want = [(d, round(s, 9)) for d, s in oracle_near_search(oidx, ta, tb, w, 10)]
        assert got == want, (ta, tb, w)
        checked += len(got)
    assert checked > 10


def test_near_rejects_bad_terms(corpus, cfg, built):
    reader = IndexReader(built, cfg)
    with pytest.raises(ValueError):
        reader.search_near("two words", "x", 3)
    with pytest.raises(ValueError):
        reader.search_near("same", "same", 3)
