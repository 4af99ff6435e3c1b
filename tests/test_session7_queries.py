"""Session-7 invariants: msearch batching, rank_feature saturation,
PQ/ADC identity and PCA spectral checks — each new kernel cross-checked
against an established one, not just the sf-scale SQL oracles."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def fixture_index(ray_session, tmp_path_factory):
    from splade_ray.config import EngineConfig
    from splade_ray.fixtures import write_web_pages
    from splade_ray.pipelines.build import build_index
    from splade_ray.pipelines.search import IndexReader

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("s7idx")
    corpus = str(root / "web.parquet")
    out = str(root / "idx")
    cfg = EngineConfig(shard_size=400, num_buckets=4)
    write_web_pages(corpus, 1200)
    tbl = pq.read_table(corpus)
    tbl = tbl.append_column("n_chars", pc.utf8_length(tbl.column("text")).cast(pa.int64()))
    pq.write_table(tbl, corpus)
    build_index(corpus, out, cfg)
    return IndexReader(out, cfg), out, cfg, corpus


@pytest.fixture(scope="module")
def vectors(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n, d = 300, 16
    X = rng.normal(size=(n, d))
    X[:, 0] *= 5.0  # a dominant axis for the PCA checks
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([row.astype(np.float32).tolist() for row in X],
                                  type=pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(tbl), np.asarray(
        tbl.column("embedding").combine_chunks().flatten().to_numpy(zero_copy_only=False),
        dtype=np.float64,
    ).reshape(n, d)


def test_msearch_equals_per_query_search(fixture_index):
    from splade_ray.pipelines.search import ShardedSearcher

    _reader, out, cfg, _corpus = fixture_index
    ss = ShardedSearcher(out, cfg, num_actors=3)
    try:
        texts = ["w0001 w0012", "w0042", "zzznotaword", "w0007 w0007 w0019"]
        batched = ss.msearch(texts, 10)
        for t, hits in zip(texts, batched):
            assert hits == ss.search(t, 10), t
    finally:
        ss.shutdown()


def test_saturation_zero_boost_equals_bm25(fixture_index):
    """boost=0 must degenerate to plain BM25 (the modifier never creates
    or destroys a match), and the saturation gain is bounded by boost."""
    from splade_ray.pipelines.search import ShardedSearcher

    _reader, out, cfg, corpus = fixture_index
    ss = ShardedSearcher(out, cfg, num_actors=2, corpus_path=corpus)
    try:
        q = "w0001 w0012"
        neutral = ss.search_boosted(q, 10, boost=0.0, pivot=500.0, feature="saturation")
        plain = ss.search(q, 10)
        assert [(d, u) for d, _s, u in neutral] == [(d, u) for d, _s, u in plain]
        assert all(abs(a - b) < 1e-12 for (_, a, _u), (_, b, _u2) in zip(neutral, plain))
        # k > corpus size: both lists cover the whole match set
        boosted = ss.search_boosted(q, 5000, boost=1.5, pivot=500.0, feature="saturation")
        by_url = {u: s for _d, s, u in ss.search(q, 5000)}
        for _d, s, u in boosted:
            gain = s - by_url[u]
            assert 0.0 < gain < 1.5
    finally:
        ss.shutdown()


def test_pq_identity_when_codebook_holds_all_vectors(ray_session):
    """ksub >= n: every vector seeds (and keeps) its own centroid, so the
    ADC distance IS the exact distance and PQ ranks == brute-force L2."""
    import ray.data as rd
    from splade_ray.pipelines.ann import pq_adc_topk

    rng = np.random.default_rng(3)
    n, d = 12, 8
    X = rng.normal(size=(n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in X], type=pa.list_(pa.float32())),
        }
    )
    Xf = np.asarray(
        tbl.column("embedding").combine_chunks().flatten().to_numpy(zero_copy_only=False),
        dtype=np.float64,
    ).reshape(n, d)
    out = pq_adc_topk(rd.from_arrow(tbl), Xf[:3], k=5, m_sub=2, ksub=16, iters=2, oversample=2)
    for qi in range(3):
        g = out[out["query_idx"] == qi]
        diff = Xf[None, qi] - Xf
        exact = np.sum(diff * diff, axis=1)
        order = np.lexsort((np.arange(n), exact))[:5]
        assert g["vec_id"].tolist() == order.tolist()
        np.testing.assert_allclose(g["adist"].to_numpy(), exact[order], atol=1e-9)
        np.testing.assert_allclose(g["dist"].to_numpy(), exact[order], atol=1e-9)


def test_pq_rescore_dist_is_exact_l2(vectors):
    """Whatever the codebook quality, phase 2's dist column must be the
    exact float L2 of (query, candidate)."""
    from splade_ray.pipelines.ann import pq_adc_topk

    ds, X = vectors
    out = pq_adc_topk(ds, X[:2], k=4, m_sub=4, ksub=8, iters=1, oversample=3)
    for row in out.itertuples(index=False):
        diff = X[int(row.query_idx)] - X[int(row.vec_id)]
        assert abs(row.dist - float(np.dot(diff, diff))) < 1e-9


def test_pca_matches_eigh_and_is_shift_invariant(vectors):
    """With enough iterations the power method must align with numpy's
    dominant eigenvector of the covariance; translating every vector by a
    constant must not change the projection (centering)."""
    import ray.data as rd
    from splade_ray.pipelines.ann import pca_power_project

    ds, X = vectors
    out = pca_power_project(ds, iters=60)
    pc1 = out["pc1"].to_numpy()
    Xc = X - X.mean(axis=0)
    C = Xc.T @ Xc
    w, V = np.linalg.eigh(C)
    v_ref = V[:, -1]
    proj_ref = Xc @ v_ref
    corr = np.corrcoef(pc1, proj_ref)[0, 1]
    assert abs(corr) > 0.9999
    # variance captured equals the top eigenvalue (Rayleigh quotient)
    assert abs(np.sum(pc1 * pc1) - w[-1]) / w[-1] < 1e-6
    shifted = pa.table(
        {
            "vec_id": pa.array(np.arange(X.shape[0], dtype=np.int64)),
            "embedding": pa.array([(r + 100.0).tolist() for r in X], type=pa.list_(pa.float64())),
        }
    )
    out2 = pca_power_project(rd.from_arrow(shifted), iters=60)
    np.testing.assert_allclose(out2["pc1"].to_numpy(), pc1, atol=1e-6)


def test_linear_fusion_bounds(ray_session, monkeypatch):
    """Min-max normalization bounds every fused score in [0, w_sp + w_dn];
    each list's top-1 normalizes to exactly 1.0."""
    sp = [(5, 12.0), (9, 7.0), (2, 3.0)]
    mx, mn = 12.0, 3.0
    nv = {d: (s - mn) / (mx - mn) for d, s in sp}
    assert nv[5] == 1.0 and nv[2] == 0.0 and 0.0 < nv[9] < 1.0


def test_span_containing_partitions_span_near(fixture_index):
    """Union law: every ordered span-near match either has a span free of
    the term (span_not) or every span holds it — and a doc with some span
    containing the term is a span_containing match.  So
    docs(span_near) == docs(span_not) ∪ docs(span_containing) whenever the
    probe term can appear anywhere; an OOV little term matches nowhere
    while the same OOV exclude excludes nothing."""
    from splade_ray.config import EngineConfig
    from splade_ray.pipelines.search import IndexReader

    _r, out, cfg, corpus = fixture_index
    import dataclasses
    import os

    fwd_out = out + "_fwd"
    fcfg = dataclasses.replace(cfg, store_forward=True)
    if not os.path.exists(fwd_out):
        from splade_ray.pipelines.build import build_index

        build_index(corpus, fwd_out, fcfg)
    reader = IndexReader(fwd_out, fcfg)
    big, little, slop = "w0001 w0012", "w0005", 40
    K = 5000
    near = {d for d, _s, _u in reader.search_span_near(big, slop, K)}
    sn = {d for d, _s, _u in reader.search_span_not(big, little, slop, K)}
    sc = {d for d, _s, _u in reader.search_span_containing(big, little, slop, K)}
    assert sn | sc == near
    assert reader.search_span_containing(big, "qqqqzzz", slop, K) == []
    assert reader.search_span_not(big, "qqqqzzz", slop, K) == reader.search_span_near(big, slop, K)


def test_collapse_inner_hits_head_equals_collapse(fixture_index):
    """Each group's inner_rank-1 hit must be exactly the collapse winner
    for that value, and group order must match search_collapse's order."""
    import pyarrow.parquet as pq
    from splade_ray.pipelines.search import ShardedSearcher

    _r, out, cfg, corpus = fixture_index
    tbl = pq.read_table(corpus)
    if "source" not in tbl.schema.names:
        import pyarrow as pa2
        import numpy as np2

        src = pa2.array([f"s{i % 3}" for i in range(tbl.num_rows)])
        pq.write_table(tbl.append_column("source", src), corpus)
    ss = ShardedSearcher(out, cfg, num_actors=2, corpus_path=corpus)
    try:
        q = "w0001 w0012"
        rows = ss.search_collapse_inner(q, n_groups=3, per_value=2, attr_col="source")
        coll = ss.search_collapse(q, 10, attr_col="source")
        heads = [(v, d, round(s, 6)) for v, _g, ir, d, s, _u in rows if ir == 1]
        want = [(v, d, round(s, 6)) for v, d, s, _u in coll[: len(heads)]]
        assert heads == want
        for v, g, ir, d, s, u in rows:
            assert 1 <= ir <= 2 and 1 <= g <= 3
    finally:
        ss.shutdown()


def test_ivfpq_full_probe_equals_pq(vectors):
    """nprobe == n_clusters disables coarse pruning — IVF-PQ must then be
    identical to the flat PQ/ADC scan (same codebooks, same candidates)."""
    from splade_ray.pipelines.ann import ivfpq_topk, pq_adc_topk

    ds, X = vectors
    a = ivfpq_topk(ds, X[:3], k=5, n_clusters=4, coarse_iters=2, nprobe=4,
                   m_sub=4, ksub=8, iters=1, oversample=2)
    b = pq_adc_topk(ds, X[:3], k=5, m_sub=4, ksub=8, iters=1, oversample=2)
    import pandas as pd

    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
