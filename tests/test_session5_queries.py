"""Session-5 query-surface invariants: span-not (positional exclusion),
static-signal scoring features (distance_feature / field_value_factor),
int8-quantized rescore kNN, and CCNet perplexity buckets — each
cross-checked against a brute-force replay or an established kernel,
independent of the sf-scale SQL oracles."""

import re

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fixture_index(ray_session, tmp_path_factory):
    from splade_ray.config import EngineConfig
    from splade_ray.fixtures import write_web_pages
    from splade_ray.pipelines.build import build_index
    from splade_ray.pipelines.search import IndexReader

    root = tmp_path_factory.mktemp("s5idx")
    corpus = str(root / "web.parquet")
    out = str(root / "idx")
    cfg = EngineConfig(shard_size=400, num_buckets=4, store_forward=True)
    write_web_pages(corpus, 1200)
    build_index(corpus, out, cfg)
    return IndexReader(out, cfg), out, cfg, corpus


def _tokens_by_doc(corpus):
    import pyarrow.parquet as pq

    tbl = pq.read_table(corpus, columns=["url", "text"])
    urls = tbl.column("url").to_pylist()
    texts = tbl.column("text").to_pylist()
    return {u: re.findall(r"[a-z0-9]+", t.lower()) for u, t in zip(urls, texts)}


# ----------------------------------------------------------------- span-not

def _brute_span_not(toks, t1, t2, excl, slop):
    """∃ ordered (i, j): toks[i]=t1, toks[j]=t2, j−i−1 ≤ slop, and no
    exclude occurrence inside positions [i, j]."""
    epos = [p for p, t in enumerate(toks) if t == excl]
    for i, t in enumerate(toks):
        if t != t1:
            continue
        for j in range(i + 1, min(i + slop + 2, len(toks))):
            if toks[j] == t2 and not any(i <= e <= j for e in epos):
                return True
    return False


def test_span_not_brute_force(fixture_index):
    reader, _out, _cfg, corpus = fixture_index
    docs = _tokens_by_doc(corpus)
    K = 10_000
    for t1, t2, excl, slop in [
        ("w0001", "w0012", "w0003", 3),
        ("w0002", "w0007", "w0001", 5),
        ("w0005", "w0004", "w0002", 2),
    ]:
        got = {u for _, _, u in reader.search_span_not(f"{t1} {t2}", excl, slop, K)}
        want = {u for u, toks in docs.items() if _brute_span_not(toks, t1, t2, excl, slop)}
        assert got == want, (t1, t2, excl, slop)


def test_span_not_oov_exclude_equals_span_near(fixture_index):
    """An OOV exclude term excludes nothing: span_not ≡ span_near, scores
    included (the BM25 bag is over the include terms on both paths)."""
    reader, *_ = fixture_index
    for text, slop in [("w0001 w0012", 3), ("w0002 w0007", 0)]:
        assert reader.search_span_not(text, "zzznotaword", slop, 50) == (
            reader.search_span_near(text, slop, 50)
        )


def test_span_not_subset_of_span_near(fixture_index):
    reader, *_ = fixture_index
    K = 10_000
    near = {u for _, _, u in reader.search_span_near("w0001 w0012", 4, K)}
    notq = {u for _, _, u in reader.search_span_not("w0001 w0012", "w0002", 4, K)}
    assert notq <= near


def test_span_not_rejects_bad_exclude(fixture_index):
    reader, *_ = fixture_index
    with pytest.raises(ValueError):
        reader.search_span_not("w0001 w0012", "w0001", 2, 10)  # excl ∈ include
    with pytest.raises(ValueError):
        reader.search_span_not("w0001 w0012", "w0002 w0003", 2, 10)  # two terms


# ------------------------------------------------- static-signal features

def test_score_boosted_unknown_feature_raises(fixture_index, tmp_path):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from splade_ray.pipelines.search import ShardedSearcher

    _reader, out, cfg, corpus = fixture_index
    # the fixture corpus has no numeric doc-value: derive one (n_chars)
    tbl = pq.read_table(corpus)
    tbl = tbl.append_column("n_chars", pc.utf8_length(tbl.column("text")))
    attr_corpus = str(tmp_path / "web_attr.parquet")
    pq.write_table(tbl, attr_corpus)
    ss = ShardedSearcher(out, cfg, num_actors=2, corpus_path=attr_corpus)
    try:
        with pytest.raises(Exception):
            ss.search_boosted("w0001 w0012", 10, feature="bogus")
        # distance_feature: boost is bounded by boost·1.0, so every boosted
        # score sits within +boost of some plain-BM25 score of the same doc
        plain = dict()
        for d, s, _u in ss.search("w0001 w0012", 10_000):
            plain[d] = s
        for d, s, _u in ss.search_boosted(
            "w0001 w0012", 50, boost=1.0, pivot=100.0, feature="distance", origin=300.0
        ):
            assert d in plain and plain[d] < s <= plain[d] + 1.0 + 1e-9
    finally:
        ss.shutdown()


# ------------------------------------------------------ int8 rescore kNN

def test_quantized_rescore_full_oversample_is_exact(ray_session):
    """With k·oversample ≥ corpus size, phase 1 keeps everything, so the
    exact-rescore ranking must equal brute force bit-for-bit."""
    import ray.data as rd

    from splade_ray.pipelines.ann import brute_force_topk, quantized_rescore_topk

    rng = np.random.default_rng(7)
    n, dim = 300, 16
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    )
    Q = vecs[:3].astype(np.float64)
    exact = brute_force_topk(ds, Q, k=10)
    resc = quantized_rescore_topk(ds, Q, k=10, oversample=(n // 10) + 1)
    assert resc["vec_id"].tolist() == exact["vec_id"].tolist()
    assert np.allclose(resc["score"].to_numpy(), exact["score"].to_numpy(), atol=1e-12)


def test_quantized_rescore_candidates_bounded(ray_session):
    import ray.data as rd

    from splade_ray.pipelines.ann import quantized_rescore_topk

    rng = np.random.default_rng(11)
    n, dim = 500, 8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    )
    out = quantized_rescore_topk(ds, vecs[:2].astype(np.float64), k=5, oversample=3)
    assert len(out) == 10  # 2 queries × k
    assert (out.groupby("query_idx")["rank"].max() == 5).all()
    # coarse is an approximation: top-1 by exact cosine should still be the
    # self-match (approx error is far below the self-match margin)
    top1 = out[out["rank"] == 1]
    assert top1["vec_id"].tolist() == [0, 1]


def test_int8_quantize_round_half_up():
    from splade_ray.pipelines.ann import _int8_quantize

    m = np.array([[1.0, -1.0, 0.5, -0.5]])
    q, mx = _int8_quantize(m)
    # scale 127/1.0; 0.5·127 = 63.5 → round-half-up 64; −63.5 → floor(−63) = −63
    assert mx.tolist() == [1.0]
    assert q.tolist() == [[127.0, -127.0, 64.0, -63.0]]
    z, mz = _int8_quantize(np.zeros((1, 3)))
    assert mz.tolist() == [1.0] and z.tolist() == [[0.0, 0.0, 0.0]]


# ------------------------------------------------------- CCNet ppl buckets

def test_ccnet_buckets_shape(ray_session):
    from splade_ray.pipelines.queries import ccnet_buckets

    out = ccnet_buckets("/root/testdata/sf0.001")
    for lang, g in out.groupby("lang"):
        assert set(g["bucket"]) == {"head", "middle", "tail"}
        sizes = g.set_index("bucket")["n_docs"]
        # ntile balance: bucket sizes differ by at most 1, larger first
        assert sizes.max() - sizes.min() <= 1
        assert sizes["head"] >= sizes["middle"] >= sizes["tail"]
        # head = lowest perplexity; bucket ranges ordered (rounded ties can
        # touch at the cuts, never cross)
        by = g.set_index("bucket")
        assert by.loc["head", "ppl_max_r"] <= by.loc["middle", "ppl_min_r"]
        assert by.loc["middle", "ppl_max_r"] <= by.loc["tail", "ppl_min_r"]
