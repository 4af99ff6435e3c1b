"""Session-9 invariants: binary-quantized kNN rescore, combined_fields
scoring, funnel chain, Heaps'-law vocab growth, and the Q5 star join —
each cross-checked against an independent in-test reference (dense numpy /
brute force), not just the sf-scale SQL oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rand_vectors(n, dim, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, dim))


def test_binary_rescore_matches_dense_reference(ray_session):
    """Coarse = sign-agreement count; candidates = global top-30 by
    (-agree, vec_id); final = exact cosine over candidates — all replayed
    densely in-test."""
    import ray.data as rd

    from splade_ray.pipelines.ann import binary_rescore_topk

    E = _rand_vectors(300, 16, seed=7)
    ids = np.arange(300, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": pa.array(list(E), type=pa.list_(pa.float32()))})
    )
    # float32 storage: the engine reads f32 back, so the reference must too
    E32 = E.astype(np.float32).astype(np.float64)
    Q = E32[:4]
    out = binary_rescore_topk(ds, Q, k=5, oversample=4)
    Qs, Ds = np.where(Q > 0, 1.0, -1.0), np.where(E32 > 0, 1.0, -1.0)
    agree = (E32.shape[1] + Ds @ Qs.T) / 2.0
    for qi in range(Q.shape[0]):
        order = np.lexsort((ids, -agree[:, qi]))[:20]
        cand = set(ids[order])
        got = out[out["query_idx"] == qi]
        assert set(got["vec_id"]) <= cand
        en = np.linalg.norm(E32, axis=1)
        qn = np.linalg.norm(Q[qi])
        cos = (E32 @ Q[qi]) / (en * qn)
        cand_arr = np.asarray(sorted(cand))
        ref = cand_arr[np.lexsort((cand_arr, -cos[cand_arr]))][:5]
        np.testing.assert_array_equal(got.sort_values("rank")["vec_id"].to_numpy(), ref)


def test_binary_rescore_tie_break_deterministic(ray_session):
    """Identical vectors ⇒ fully tied coarse AND exact scores — the result
    must rank by vec_id ascending, independent of block layout."""
    import ray.data as rd

    from splade_ray.pipelines.ann import binary_rescore_topk

    E = np.tile(_rand_vectors(1, 8, seed=3), (50, 1))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(50, dtype=np.int64),
                "embedding": pa.array(list(E), type=pa.list_(pa.float32())),
            }
        )
    ).repartition(7)
    out = binary_rescore_topk(ds, E[:1], k=5, oversample=2)
    np.testing.assert_array_equal(out["vec_id"].to_numpy(), np.arange(5))


def test_combined_fields_unit_boosts_reduce_to_plain_bm25(ray_session, monkeypatch, tmp_path):
    """title/body PARTITION the token stream, so with all boosts = 1.0 the
    combined tf/dl/df equal the whole-document statistics and
    combined_fields must equal plain BM25 rank AND score."""
    from splade_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(q, "_FIELD_BOOSTS", {"title": 1.0, "body": 1.0})
    # separate index dirs so the unit-boost build can't poison the cached
    # 2.0-boost field indexes (corpus projections are boost-independent,
    # but keep the test hermetic anyway)
    plain = q.bm25_topk(sf)
    comb = q.combined_fields_topk(sf)
    merged = comb.merge(plain, on=["query_id", "rank"], suffixes=("_c", "_p"))
    assert len(merged) == len(comb) == len(plain)
    np.testing.assert_array_equal(merged["doc_id_c"], merged["doc_id_p"])
    np.testing.assert_allclose(merged["score_r_c"], merged["score_r_p"], atol=2e-6)


def test_event_funnel_brute_force(ray_session, tmp_path):
    """Greedy earliest-feasible chain vs a per-user brute force over all
    increasing (view, click, purchase) triples."""
    import ray.data as rd

    from splade_ray.pipelines.queries import event_funnel

    rng = np.random.default_rng(11)
    n = 600
    types = np.asarray(["view", "click", "purchase", "error"])[rng.integers(0, 4, n)]
    tbl = pa.table(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": types,
            "ts": pa.array(
                pd.to_datetime("2026-01-01") + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s")
            ),
            "value": rng.normal(size=n),
            "props": np.full(n, "{}", dtype=object),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = event_funnel(str(tmp_path))
    df = tbl.to_pandas()
    reach = np.zeros(4, dtype=np.int64)
    for _uid, g in df.groupby("user_id"):
        best = 0
        cur = None
        for st in ("view", "click", "purchase"):
            ts = g.loc[g["event_type"] == st, "ts"]
            if cur is not None:
                ts = ts[ts > cur]
            if ts.empty:
                break
            cur = ts.min()
            best += 1
        reach[best] += 1
    cum = reach[::-1].cumsum()[::-1]  # users reaching >= stage
    np.testing.assert_array_equal(out["n_users"].to_numpy(), cum[1:])


def test_vocab_growth_incremental_reference(ray_session, tmp_path):
    """Checkpoint counts == running distinct-set sizes from a sequential
    scan in doc_id order."""
    import pyarrow.parquet as pq

    from splade_ray.pipelines.queries import vocab_growth
    from splade_ray.tokenizer import Tokenizer

    rng = np.random.default_rng(5)
    words = [f"w{i:03d}" for i in range(120)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 20)).tolist()) for _ in range(100)
    ]
    tbl = pa.table(
        {
            "doc_id": np.arange(100, dtype=np.int64),
            "text": texts,
            "lang": np.full(100, "en", dtype=object),
            "source": np.full(100, "t", dtype=object),
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = vocab_growth(str(tmp_path))
    tok = Tokenizer()
    seen: set[str] = set()
    sizes = []
    marks = {int((i * 100) // 10): None for i in range(1, 11)}
    for d, t in enumerate(texts, start=0):
        if d in marks and marks[d] is None:
            marks[d] = len(seen)
        seen.update(tok.tokenize(t))
    ref = [marks[m] if marks[m] is not None else len(seen) for m in sorted(marks)]
    # checkpoint c covers docs 0..seen-1: count snapshot BEFORE doc `seen`
    sizes = out["vocab_size"].tolist()
    assert sizes == ref
    assert sizes == sorted(sizes)  # monotone growth


def test_regional_revenue_matches_duckdb_on_orphans(ray_session, tmp_path):
    """Synthetic star with orphan custkeys/suppkeys and cross-nation pairs:
    the co-partitioned kernel must drop non-matching nations exactly like
    the reference join."""
    import duckdb
    import pyarrow.parquet as pq

    from splade_ray.pipelines.queries import regional_revenue

    rng = np.random.default_rng(2)
    region = pa.table({"r_regionkey": np.arange(2, dtype=np.int64), "r_name": ["EAST", "WEST"]})
    nation = pa.table(
        {
            "n_nationkey": np.arange(4, dtype=np.int64),
            "n_name": ["A", "B", "C", "D"],
            "n_regionkey": np.asarray([0, 0, 1, 1], dtype=np.int64),
        }
    )
    customer = pa.table(
        {
            "c_custkey": np.arange(30, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(30)],
            "c_nationkey": rng.integers(0, 4, 30).astype(np.int64),
            "c_acctbal": np.zeros(30),
            "c_mktsegment": np.full(30, "S", dtype=object),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": np.arange(10, dtype=np.int64),
            "s_name": [f"s{i}" for i in range(10)],
            "s_nationkey": rng.integers(0, 4, 10).astype(np.int64),
            "s_acctbal": np.zeros(10),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": np.arange(200, dtype=np.int64),
            # custkey 98/99 are orphans (no customer row)
            "o_custkey": rng.integers(0, 32, 200).astype(np.int64) % 100,
        }
    )
    items = pa.table(
        {
            "l_orderkey": rng.integers(0, 210, 500).astype(np.int64),  # some orphan orders
            "l_suppkey": rng.integers(0, 12, 500).astype(np.int64),  # some orphan suppliers
            "l_extendedprice": np.round(rng.uniform(1, 1000, 500), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, 500), 2),
        }
    )
    pq.write_table(region, str(tmp_path / "region.parquet"))
    pq.write_table(nation, str(tmp_path / "nation.parquet"))
    pq.write_table(customer, str(tmp_path / "customer.parquet"))
    pq.write_table(supplier, str(tmp_path / "supplier.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(items, str(tmp_path / "lineitem.parquet"))
    got = regional_revenue(str(tmp_path))
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    want = con.execute(
        """
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
               round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0, 6) AS revenue,
               count(*) AS n_items
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_substring_expansion_equals_regexp_scan(ray_session, tmp_path):
    """Trigram-intersect + verify must expand exactly the terms a full
    dictionary regexp scan finds, and score identically."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from splade_ray.config import EngineConfig
    from splade_ray.fixtures import write_web_pages
    from splade_ray.pipelines.build import build_index
    from splade_ray.pipelines.search import IndexReader, ShardedSearcher

    corpus = str(tmp_path / "web.parquet")
    out = str(tmp_path / "idx")
    cfg = EngineConfig(shard_size=300, num_buckets=4)
    write_web_pages(corpus, 900)
    build_index(corpus, out, cfg)
    reader = IndexReader(out, cfg)
    for sub in ("000", "01", "w00", "zzznotasub", "1"):
        via_tri = reader.expand_substring(sub)
        import re

        via_rx = reader.expand_regexp(".*" + re.escape(sub) + ".*")
        np.testing.assert_array_equal(via_tri, via_rx)
        assert reader.search_substring(sub, 10) == reader._search_expanded(via_rx, 10, "exhaustive")
    ss = ShardedSearcher(out, cfg, num_actors=2)
    try:
        assert ss.search_substring("w00", 10) == reader.search_substring("w00", 10)
    finally:
        ss.shutdown()


def test_winnowing_brute_force(ray_session, tmp_path):
    """Engine selection == a literal per-doc window loop (min by
    (h44, rightmost)), including short docs and the guarantee that every
    doc with >= 1 gram gets >= 1 fingerprint."""
    import pyarrow.parquet as pq

    from splade_ray.pipelines.queries import winnowing_fps
    from splade_ray.pipelines.textops import WINNOW_WINDOW
    from splade_ray.tokenizer import Tokenizer

    rng = np.random.default_rng(9)
    words = [f"t{i:02d}" for i in range(30)]
    texts = [" ".join(rng.choice(words, size=m).tolist()) for m in [1, 2, 3, 4, 5, 9, 40, 80]]
    texts += ["", "one two"]  # 0-gram docs
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": np.full(n, "en", dtype=object),
            "source": np.full(n, "t", dtype=object),
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = winnowing_fps(str(tmp_path))
    tok = Tokenizer()
    w = WINNOW_WINDOW
    R = 0x100000001B3
    M = 1 << 64
    for d, text in enumerate(texts):
        # recompute the trigram fold from scratch (md5 of token strings)
        import hashlib as _hl

        toks = tok.tokenize(text)
        hs = [int.from_bytes(_hl.md5(t.encode()).digest()[8:16], "little") for t in toks]
        grams = [((hs[j] * R + hs[j + 1]) * R + hs[j + 2]) % M for j in range(max(len(hs) - 2, 0))]
        m = len(grams)
        row = got[got["doc_id"] == d].iloc[0]
        assert row["n_grams"] == m
        if m == 0:
            assert row["n_fps"] == 0 and row["fp_digest"] == 0
            continue
        keys = [((g % (1 << 44)) << 20) + ((1 << 20) - 1 - j) for j, g in enumerate(grams)]
        sel = set()
        windows = range(m - w + 1) if m >= w else [0]
        for i in windows:
            win = keys[i : i + w] if m >= w else keys
            kmin = min(win)
            sel.add((1 << 20) - 1 - (kmin % (1 << 20)))
        assert row["n_fps"] == len(sel) >= 1
        dig = sum(grams[j] for j in sel) % M
        dig = dig - M if dig >= (1 << 63) else dig
        assert int(row["fp_digest"]) == dig


def test_link_triangles_dense_reference(ray_session, tmp_path):
    """Bucketed wedge-closure count == a dense all-triples count on a
    small fixture graph."""
    import pyarrow.parquet as pq

    from splade_ray.pipelines.queries import link_triangles

    n = 60
    tbl = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": np.full(n, "x", dtype=object),
            "lang": np.full(n, "en", dtype=object),
            "source": np.full(n, "t", dtype=object),
            "n_chars": np.ones(n, dtype=np.int64),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = link_triangles(str(tmp_path))
    A = np.zeros((n, n), dtype=bool)
    for i in range(n):
        for j in ((i * 3 + 1) % n, (i * 7 + 2) % n):
            if i != j:
                A[min(i, j), max(i, j)] = True
    n_edges = int(A.sum())
    tri = 0
    wedges = 0
    for a in range(n):
        nb = np.flatnonzero(A[a])
        for xi in range(nb.size):
            for yi in range(xi + 1, nb.size):
                wedges += 1
                if A[nb[xi], nb[yi]]:
                    tri += 1
    assert got.iloc[0].tolist() == [n_edges, wedges, tri]


def test_shingle_tokenizer_codes_match_python_path(ray_session):
    """The vectorized shingle dictionary path must produce exactly the
    python tokenize() shingle stream, row by row."""
    from splade_ray.config import EngineConfig
    from splade_ray.tokenizer import Tokenizer

    tok = Tokenizer(EngineConfig(analyzer="shingle"))
    texts = [
        "spark join order by",
        "one",
        "",
        "a b a b a",
        "punct, only!!",
        None,
    ]
    codes, rows, vocab, dls = tok.tokenize_codes(texts)
    vlist = vocab.to_pylist()
    got_rows: dict[int, list] = {i: [] for i in range(len(texts))}
    for c, r in zip(codes, rows):
        got_rows[int(r)].append(vlist[int(c)])
    for i, t in enumerate(texts):
        assert got_rows[i] == tok.tokenize(t or ""), (i, t)
        assert dls[i] == len(got_rows[i])


def test_shingle_index_rank_identity_vs_oracle(ray_session, tmp_path):
    """A shingle-analyzed build must be rank-identical to the numpy oracle
    under the same config (the analyzer rides the shared Tokenizer, so the
    oracle shingles too)."""
    import pyarrow.parquet as pq

    from splade_ray.config import EngineConfig
    from splade_ray.fixtures import write_web_pages
    from splade_ray.oracle import build_oracle_index, oracle_search
    from splade_ray.pipelines.build import build_index
    from splade_ray.pipelines.search import IndexReader

    cfg = EngineConfig(shard_size=300, num_buckets=4, analyzer="shingle")
    corpus = str(tmp_path / "web.parquet")
    out = str(tmp_path / "idx")
    write_web_pages(corpus, 800)
    build_index(corpus, out, cfg)
    reader = IndexReader(out, cfg)
    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    for q in ("w0001 w0093 w0002", "w0042 w0042 w0042", "w0001", ""):
        got = reader.search(q, 10)
        want = oracle_search(oidx, q, 10)
        assert [d for d, *_ in got] == [d for d, *_ in want], q
        for (d1, s1, *_), (_d2, s2, *_) in zip(got, want):
            assert abs(s1 - s2) < 1e-9 * max(1.0, abs(s2))


def test_bigram_perplexity_brute_force(ray_session, tmp_path):
    """Bucketed in-bucket-count scoring == a literal dict-counted bigram LM."""
    import math

    import pyarrow.parquet as pq

    from splade_ray.pipelines.queries import BIGRAM_LM_LAMBDA, bigram_perplexity
    from splade_ray.tokenizer import Tokenizer

    rng = np.random.default_rng(3)
    words = [f"v{i:02d}" for i in range(12)]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 30)).tolist()) for _ in range(60)]
    texts += ["solo", ""]
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": np.full(n, "en", dtype=object),
            "source": np.full(n, "t", dtype=object),
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = bigram_perplexity(str(tmp_path))
    tok = Tokenizer()
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    toks_of = {}
    for d, t in enumerate(texts):
        toks = tok.tokenize(t)
        toks_of[d] = toks
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
    N = sum(uni.values())
    lam = BIGRAM_LM_LAMBDA
    for d, toks in toks_of.items():
        sub = got[got["doc_id"] == d]
        if len(toks) < 2:
            assert sub.empty
            continue
        lnps = [
            math.log(lam * bi[(a, b)] / uni[a] + (1.0 - lam) * uni[b] / N)
            for a, b in zip(toks[:-1], toks[1:])
        ]
        row = sub.iloc[0]
        assert row["n_pairs"] == len(lnps)
        ce = -sum(lnps) / len(lnps)
        assert abs(row["cross_entropy_r"] - round(ce, 6)) <= 1e-6


def test_personalized_pagerank_dense_reference(ray_session, tmp_path):
    """3 power iterations with a seed-restart vector vs a dense numpy
    replay on a small fixture."""
    import pyarrow.parquet as pq

    from splade_ray.pipelines.queries import PPR_ITERS, PPR_RESTART, personalized_pagerank

    n = 80
    langs = np.where(np.arange(n) % 3 == 0, "en", "de").astype(object)
    tbl = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": np.full(n, "x", dtype=object),
            "lang": langs,
            "source": np.full(n, "t", dtype=object),
            "n_chars": np.ones(n, dtype=np.int64),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = personalized_pagerank(str(tmp_path))
    # dense replay
    import collections

    edges = set()
    for i in range(n):
        for j in ((i * 3 + 1) % n, (i * 7 + 2) % n):
            if i != j:
                edges.add((i, j))
    deg = collections.Counter(a for a, _ in edges)
    seeds = np.flatnonzero(langs == "en")
    r0 = np.zeros(n)
    r0[seeds] = 1.0 / seeds.size
    pr = r0.copy()
    for _ in range(PPR_ITERS):
        mass = np.zeros(n)
        for a, b in edges:
            mass[b] += pr[a] / deg[a]
        pr = PPR_RESTART * r0 + (1 - PPR_RESTART) * mass
    order = np.lexsort((np.arange(n), -np.round(pr, 9)))[:50]
    ref = pd.DataFrame({"doc_id": order.astype(np.int64), "ppr_r": np.round(pr[order], 6)})
    merged = got.merge(ref, on="doc_id", suffixes=("_g", "_r"))
    assert len(merged) == 50
    np.testing.assert_allclose(merged["ppr_r_g"], merged["ppr_r_r"], atol=2e-6)


def test_gopher_rules_brute_force(ray_session, tmp_path):
    """Fused Gopher verdict vs literal per-doc recomputation, including
    empty docs, all-run docs and required-word boundaries."""
    import pyarrow.parquet as pq

    from splade_ray.pipelines.queries import gopher_rules_kept
    from splade_ray.tokenizer import Tokenizer

    rng = np.random.default_rng(17)
    words = ["the", "a", "and", "of", "to", "alpha", "beta", "gamma", "longword", "x"]
    texts = [" ".join(rng.choice(words, size=m).tolist()) for m in [0, 1, 5, 19, 20, 21, 50, 89, 90, 91, 120]]
    texts += ["x " * 40, "the " * 30, "alpha beta " * 25]
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": np.full(n, "en", dtype=object),
            "source": np.full(n, "t", dtype=object),
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = gopher_rules_kept(str(tmp_path))
    tok = Tokenizer()
    from collections import Counter

    for d, text in enumerate(texts):
        toks = tok.tokenize(text)
        nt = len(toks)
        mwl = sum(len(t) for t in toks) / nt if nt else 0.0
        req = sum(1 for t in toks if t in ("the", "a", "and", "of", "to"))
        dup = (nt - len(set(toks))) / nt if nt else 0.0
        bgs = Counter(zip(toks[:-1], toks[1:]))
        tb = max(bgs.values()) / sum(bgs.values()) if bgs else 0.0
        mr, cur = 0, 0
        prev = None
        for t in toks:
            cur = cur + 1 if t == prev else 1
            prev = t
            mr = max(mr, cur)
        kept = (
            20 <= nt <= 90 and 3.0 <= mwl <= 10.0 and req >= 2
            and dup <= 0.7 and tb <= 0.06 and mr <= 2
        )
        row = got[got["doc_id"] == d].iloc[0]
        assert row["n_tokens"] == nt
        assert abs(row["mean_wlen_r"] - round(mwl, 6)) <= 1e-6
        assert row["req_hits"] == req
        assert abs(row["dup_frac_r"] - round(dup, 6)) <= 1e-6
        assert abs(row["top_bigram_frac_r"] - round(tb, 6)) <= 1e-6
        assert row["max_run"] == mr
        assert bool(row["kept"]) == kept, (d, text[:40])


def test_knn_ivf_filtered_equals_filtered_brute_force(ray_session):
    """nprobe == n_clusters makes filter-inside-probe exactly the
    pre-filtered exhaustive ranking."""
    from splade_ray.pipelines.queries import knn_cosine_filtered, knn_ivf_filtered

    sf = "/root/testdata/sf0.001"
    a = knn_ivf_filtered(sf).reset_index(drop=True)
    b = knn_cosine_filtered(sf).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_language_confidence_consistent_with_lang_id(ray_session):
    """Detail mode must keep lang_pred identical to lang_id_preds and
    margin == score1 − score2 ≥ 0."""
    from splade_ray.pipelines.queries import doc_language_confidence, lang_id_preds

    sf = "/root/testdata/sf0.001"
    det = doc_language_confidence(sf)
    base = lang_id_preds(sf)
    m = det.merge(base, on="doc_id", suffixes=("_d", "_b"))
    col_b = [c for c in m.columns if c.startswith("lang_pred") and c.endswith("_b")]
    assert (m["lang_pred_d"] == m[col_b[0]]).all() if col_b else (det["lang_pred"] == base["lang_pred"]).all()
    assert (det["margin_r"] >= -1e-9).all()
    np.testing.assert_allclose(det["margin_r"], (det["score1_r"] - det["score2_r"]).round(6), atol=2e-6)


def test_ccnet_kept_consistent_with_buckets(ray_session):
    """The composed selection's per-lang kept counts must equal the
    head (+ en middle) bucket sizes ccnet_buckets reports."""
    from splade_ray.pipelines.queries import ccnet_buckets, ccnet_corpus_kept

    sf = "/root/testdata/sf0.001"
    kept = ccnet_corpus_kept(sf)
    buckets = ccnet_buckets(sf)
    for lang, g in kept.groupby("lang"):
        want = int(buckets.query("lang == @lang and bucket == 'head'")["n_docs"].sum())
        if lang == "en":
            want += int(buckets.query("lang == 'en' and bucket == 'middle'")["n_docs"].sum())
        assert len(g) == want, lang
    assert set(kept["bucket"]) <= {"head", "middle"}
    assert (kept.loc[kept["bucket"] == "middle", "lang"] == "en").all()


def test_knn_radius_dense_reference(ray_session):
    """Radius matches == dense cosine threshold replay; self-match at 1.0."""
    from splade_ray.pipelines.queries import KNN_RADIUS, knn_radius, _emb, _first_vecs

    sf = "/root/testdata/sf0.001"
    got = knn_radius(sf)
    ds = _emb(sf)
    df = ds.to_pandas()
    E = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    ids = df["vec_id"].to_numpy()
    order = np.argsort(ids)
    E, ids = E[order], ids[order]
    Q = E[:5]
    en = np.linalg.norm(E, axis=1)
    sims = (E @ Q.T) / (en[:, None] * en[:5][None, :])
    pairs = set()
    for qi in range(5):
        for ri in np.flatnonzero(sims[:, qi] >= KNN_RADIUS):
            pairs.add((int(ids[qi]), int(ids[ri])))
    assert set(zip(got["query_vec_id"], got["vec_id"])) == pairs
    self_rows = got[got["query_vec_id"] == got["vec_id"]]
    assert len(self_rows) == 5 and (self_rows["score_r"] == 1.0).all()


def test_label_prototypes_dense_reference(ray_session):
    """Per-label nearest-to-centroid selection == dense replay."""
    from splade_ray.pipelines.queries import label_prototypes, _emb

    sf = "/root/testdata/sf0.001"
    got = label_prototypes(sf)
    df = _emb(sf).to_pandas()
    E = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    ids = df["vec_id"].to_numpy()
    labs = df["label"].to_numpy()
    for lab in np.unique(labs):
        m = labs == lab
        c = E[m].mean(axis=0)
        sims = (E[m] @ c) / (np.linalg.norm(E[m], axis=1) * np.linalg.norm(c))
        lids = ids[m]
        order = np.lexsort((lids, -np.round(sims, 9)))[:5]
        sub = got[got["label"] == lab].sort_values("rank")
        np.testing.assert_array_equal(sub["vec_id"].to_numpy(), lids[order])


def test_association_rules_brute_force(ray_session):
    """Directed confidence/lift vs a literal set-based recount."""
    from splade_ray.pipelines.queries import FIS_ITEMS, association_rules, _docs
    from splade_ray.tokenizer import Tokenizer

    sf = "/root/testdata/sf0.001"
    got = association_rules(sf)
    docs = _docs(sf, columns=["text"]).to_pandas()["text"].tolist()
    tok = Tokenizer()
    sets = [set(tok.tokenize(t)) & set(FIS_ITEMS) for t in docs]
    n = len(sets)
    from collections import Counter

    single = Counter()
    pair = Counter()
    for s in sets:
        for a in s:
            single[a] += 1
        for a in s:
            for b in s:
                if a != b:
                    pair[(a, b)] += 1
    rules = []
    for (a, b), s in pair.items():
        if s * 1000 >= 30 * n:
            rules.append((a, b, s, s / single[a], s * n / (single[a] * single[b])))
    rules.sort(key=lambda r: (-round(r[4], 9), r[0], r[1]))
    rules = rules[:25]
    assert [(r[0], r[1], r[2]) for r in rules] == list(
        zip(got["antecedent"], got["consequent"], got["support"])
    )
    np.testing.assert_allclose(got["lift_r"], [round(r[4], 6) for r in rules], atol=2e-6)


def test_funnel_latency_brute_force(ray_session, tmp_path):
    """Latency percentiles vs literal per-user chain walk."""
    import pyarrow.parquet as pq

    from splade_ray.pipelines.queries import funnel_latency

    rng = np.random.default_rng(23)
    n = 500
    types = np.asarray(["view", "click", "purchase", "error"])[rng.integers(0, 4, n)]
    ts = pd.to_datetime("2026-02-01") + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s")
    tbl = pa.table(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 30, n).astype(np.int64),
            "event_type": types,
            "ts": pa.array(ts),
            "value": rng.normal(size=n),
            "props": np.full(n, "{}", dtype=object),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = funnel_latency(str(tmp_path))
    df = tbl.to_pandas()
    lats = []
    for _uid, g in df.groupby("user_id"):
        cur, first, ok = None, None, True
        for st in ("view", "click", "purchase"):
            t = g.loc[g["event_type"] == st, "ts"]
            if cur is not None:
                t = t[t > cur]
            if t.empty:
                ok = False
                break
            cur = t.min()
            if first is None:
                first = cur
        if ok:
            lats.append((cur - first).total_seconds())
    assert got["n_converted"].iloc[0] == len(lats)
    if lats:
        assert abs(got["p50_r"].iloc[0] - round(float(np.percentile(lats, 50)), 6)) <= 1e-6
        assert abs(got["mean_r"].iloc[0] - round(float(np.mean(lats)), 6)) <= 1e-6


def test_label_scatter_dense_reference(ray_session):
    """Scatter + separation vs dense replay."""
    from splade_ray.pipelines.queries import label_scatter, _emb

    sf = "/root/testdata/sf0.001"
    got = label_scatter(sf)
    df = _emb(sf).to_pandas()
    E = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    labs = df["label"].to_numpy()
    ul = np.unique(labs)
    cents = np.stack([E[labs == l].mean(axis=0) for l in ul])
    cn = np.linalg.norm(cents, axis=1)
    for i, l in enumerate(ul):
        m = labs == l
        en = np.linalg.norm(E[m], axis=1)
        dist = 1.0 - (E[m] @ cents[i]) / (en * cn[i])
        row = got[got["label"] == l].iloc[0]
        assert row["n_vecs"] == int(m.sum())
        assert abs(row["mean_dist_r"] - round(float(dist.mean()), 6)) <= 2e-6
        cc = (cents @ cents[i]) / (cn * cn[i])
        cc[i] = -np.inf
        j = np.lexsort((ul, -np.round(cc, 9)))[0]
        assert row["nearest_label"] == ul[j]
        assert abs(row["sep_r"] - round(1.0 - float(cc[j]), 6)) <= 2e-6


def test_colbert_maxsim_dense_reference(ray_session, tmp_path):
    """Engine MaxSim == a literal per-doc loop over hash token vectors,
    including duplicate-token invariance (max over a multiset == max
    over the set)."""
    import pyarrow.parquet as pq

    from splade_ray.pipelines import queries as q
    from splade_ray.tokenizer import Tokenizer

    texts = [
        "spark join order",
        "order order order spark",   # duplicates must not change MaxSim
        "window batch stream merge",
        "the small table",
        "",
        "zzzother words here",
    ]
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": np.full(n, "en", dtype=object),
            "source": np.full(n, "t", dtype=object),
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = q.colbert_maxsim_topk(str(tmp_path))
    tok = Tokenizer(q.DOCS_CFG)
    for qid, qtext in q.BM25_QUERIES:
        toks = tok.tokenize(qtext)
        if not toks:
            continue
        qu, qc = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        Qv = q._hash_token_vecs(qu)
        qn = np.linalg.norm(Qv, axis=1)
        scores = {}
        for d, text in enumerate(texts):
            dt = sorted(set(tok.tokenize(text)))
            if not dt:
                continue
            Dv = q._hash_token_vecs(dt)
            dn = np.linalg.norm(Dv, axis=1)
            cos = (Dv @ Qv.T) / (dn[:, None] * qn[None, :])
            scores[d] = float((cos.max(axis=0) * qc).sum())
        order = sorted(scores, key=lambda d: (-round(scores[d], 9), d))[:10]
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert sub["doc_id"].tolist() == order, qid
        for d, s in zip(sub["doc_id"], sub["score_r"]):
            assert abs(s - round(scores[d], 6)) <= 2e-6


def test_sloppy_phrase_brute_force(ray_session, tmp_path):
    """Sloppy freq == literal ordered-pair enumeration; cross-doc pairs
    (adjacent docs in the forward stream) must not leak."""
    import pyarrow.parquet as pq

    from splade_ray.config import EngineConfig
    from splade_ray.fixtures import write_web_pages
    from splade_ray.pipelines.build import build_index
    from splade_ray.pipelines.search import IndexReader
    from splade_ray.tokenizer import Tokenizer

    # doc texts engineered so "alpha" ends one doc and "beta" starts the
    # next — a cross-doc pair at distance 1 that a global window probe
    # would wrongly count
    rng = np.random.default_rng(31)
    words = ["alpha", "beta", "gamma", "pad"]
    texts = []
    for i in range(40):
        mid = " ".join(rng.choice(words, size=rng.integers(3, 10)).tolist())
        texts.append(f"{mid} alpha" if i % 2 == 0 else f"beta {mid}")
    import pyarrow as _pa

    corpus = str(tmp_path / "web.parquet")
    n = len(texts)
    _pa.parquet.write_table(
        _pa.table(
            {
                "url": [f"doc://{i:010d}" for i in range(n)],
                "warc_ts": _pa.array([pd.Timestamp("2026-01-01")] * n),
                # the engine extracts text FROM html (byte-identity contract)
                "html": [f"<html><body><p>{t}</p></body></html>".encode() for t in texts],
                "text": texts,
                "lang": ["en"] * n,
            }
        ),
        corpus,
    )
    cfg = EngineConfig(shard_size=10, num_buckets=1, store_forward=True)
    out = str(tmp_path / "idx")
    build_index(corpus, out, cfg)
    reader = IndexReader(out, cfg)
    tok = Tokenizer(cfg)
    for slop in (0, 1, 3):
        got = reader.search_sloppy("alpha", "beta", slop, 40)
        # brute force
        dls = [len(tok.tokenize(t)) for t in texts]
        avgdl = sum(dls) / n
        df = {}
        for t in texts:
            for w in set(tok.tokenize(t)):
                df[w] = df.get(w, 0) + 1
        idf = sum(
            np.log1p((n - df.get(w, 0) + 0.5) / (df.get(w, 0) + 0.5)) for w in ("alpha", "beta")
        )
        want = {}
        for d, t in enumerate(texts):
            toks = tok.tokenize(t)
            sf = 0.0
            for i, a in enumerate(toks):
                if a != "alpha":
                    continue
                for j in range(i + 1, min(i + slop + 2, len(toks))):
                    if toks[j] == "beta":
                        sf += 1.0 / (j - i)
            if sf > 0:
                norm = 0.25 + 0.75 * dls[d] / avgdl
                want[d] = idf * sf * 2.2 / (sf + 1.2 * norm)
        order = sorted(want, key=lambda d: (-want[d], d))
        assert [doc for doc, *_ in got] == [
            int(f"{u:010d}") if False else u for u in order
        ] or [int(url.removeprefix("doc://")) for _d, _s, url in got] == order
        for (_d, s, url) in got:
            assert abs(s - want[int(url.removeprefix("doc://"))]) < 1e-9


def test_soft_dedup_weight_mass_conservation(ray_session):
    """Every near-dup cluster's weights must sum to exactly 1.0 and
    singletons keep weight 1.0 — the dedup-in-expectation contract."""
    from splade_ray.pipelines.queries import dedup_clusters, soft_dedup_weights

    sf = "/root/testdata/sf0.001"
    w = soft_dedup_weights(sf)
    clusters = dedup_clusters(sf)
    merged = clusters.merge(w, on="doc_id")
    for cid, g in merged.groupby("cluster_id"):
        assert abs(g["weight_r"].sum() - 1.0) < 1e-4, cid
        assert (g["weight_r"] < 1.0).all() or len(g) == 1
    singles = w[~w["doc_id"].isin(clusters["doc_id"])]
    assert (singles["weight_r"] == 1.0).all()


def test_err_at10_hand_computed(ray_session):
    """ERR replay: literal cascade product over the run/qrels join."""
    from splade_ray.pipelines.queries import bm25_topk, boolean_and_match, err_at10

    sf = "/root/testdata/sf0.001"
    got = err_at10(sf)
    run = bm25_topk(sf)
    qrels = boolean_and_match(sf)
    rel = set(zip(qrels["query_id"], qrels["doc_id"]))
    for qid, g in run.groupby("query_id"):
        if qid not in set(qrels["query_id"]):
            assert qid not in set(got["query_id"])
            continue
        err, p_stop = 0.0, 1.0
        for r, d in zip(g.sort_values("rank")["rank"], g.sort_values("rank")["doc_id"]):
            if (qid, d) in rel:
                err += p_stop * 0.5 / r
                p_stop *= 0.5
        assert abs(got.loc[got["query_id"] == qid, "err_r"].iloc[0] - round(err, 6)) <= 1e-6


def test_pruned_index_properties(ray_session):
    """Pruning keeps exactly ceil(f·df) per query term; fraction=1.0 must
    reproduce the unpruned ranking exactly."""
    from splade_ray.pipelines.queries import (
        BM25_QUERIES,
        BM25_K,
        DOCS_CFG,
        bm25_topk_termindex,
        build_documents_index,
    )
    from splade_ray.pipelines.term_index import TermIndexReader, _topk_list, score_pruned
    import os

    sf = "/root/testdata/sf0.001"
    full = bm25_topk_termindex(sf)  # also ensures the term index exists
    base = build_documents_index(sf)
    reader = TermIndexReader(os.path.join(base, "term_index"), os.path.join(base, "stats"), DOCS_CFG)
    reader.load_doc_lengths()
    for qid, text in BM25_QUERIES:
        cand, scores = score_pruned(reader, text, 1.0)
        got = [(d, round(s, 6)) for d, s in _topk_list(cand, scores, BM25_K)]
        want = [
            (int(r.doc_id), float(r.score_r))
            for r in full[full["query_id"] == qid].sort_values("rank").itertuples(index=False)
        ]
        assert got == want, qid
        # a fraction strictly below 1 can only shrink per-doc scores
        c2, s2 = score_pruned(reader, text, 0.5)
        if c2.size and cand.size:
            m = {int(d): float(s) for d, s in zip(cand, scores)}
            for d, s in zip(c2, s2):
                assert s <= m[int(d)] + 1e-12


def test_trending_terms_brute_force(ray_session, tmp_path):
    """Log-odds drift vs literal half-split recount on an engineered
    corpus where one term only appears late."""
    import pyarrow.parquet as pq

    from splade_ray.pipelines.queries import trending_terms

    n = 100
    texts = []
    for i in range(n):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts.append(base + (" risingterm" if i >= n // 2 else ""))
    tbl = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": np.full(n, "en", dtype=object),
            "source": np.full(n, "t", dtype=object),
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = trending_terms(str(tmp_path))
    assert got.iloc[0]["term"] == "risingterm"
    assert got.iloc[0]["df_early"] == 0 and got.iloc[0]["df_late"] == 50
    lo = np.log((50 + 0.5) / (0 + 0.5)) - np.log((0 + 0.5) / (50 + 0.5))
    assert abs(got.iloc[0]["logodds_r"] - round(float(lo), 6)) <= 1e-6
    # ubiquitous terms have zero drift
    flat = got[got["term"] == "alpha"]
    if len(flat):
        assert abs(flat.iloc[0]["logodds_r"]) < 1e-9


def test_rm3_expansion_properties(ray_session):
    """RM3 must (a) never select an original query term as expansion,
    (b) reduce to weighted-original-only scoring when the interpolation
    keeps rank order on a single-term query, and (c) produce a valid
    ranking that differs from plain BM25 for at least one query (the
    expansion has to DO something on this corpus)."""
    from splade_ray.pipelines.queries import bm25_topk, rm3_topk

    sf = "/root/testdata/sf0.001"
    rm3 = rm3_topk(sf)
    plain = bm25_topk(sf)
    assert set(rm3["query_id"]) == set(plain["query_id"])
    changed = False
    for qid in rm3["query_id"].unique():
        a = rm3[rm3["query_id"] == qid].sort_values("rank")["doc_id"].tolist()
        b = plain[plain["query_id"] == qid].sort_values("rank")["doc_id"].tolist()
        assert len(a) == len(b)
        if a != b:
            changed = True
    assert changed


def test_anomaly_days_hand_computed(ray_session, tmp_path):
    """Robust z on an engineered series with one massive spike day."""
    import pyarrow.parquet as pq

    from splade_ray.pipelines.queries import anomaly_days

    days = pd.date_range("2026-03-01", periods=20, freq="D")
    counts = np.full(20, 10, dtype=np.int64)
    counts[7] = 200  # spike
    rows_ts, rows_id = [], []
    eid = 0
    for d, c in zip(days, counts):
        for _ in range(int(c)):
            rows_ts.append(d + pd.Timedelta(seconds=eid % 3600))
            rows_id.append(eid)
            eid += 1
    n = len(rows_ts)
    tbl = pa.table(
        {
            "event_id": np.asarray(rows_id, np.int64),
            "user_id": np.zeros(n, np.int64),
            "event_type": np.full(n, "view", dtype=object),
            "ts": pa.array(pd.to_datetime(rows_ts)),
            "value": np.zeros(n),
            "props": np.full(n, "{}", dtype=object),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = anomaly_days(str(tmp_path))
    assert len(out) == 20
    assert out["is_anomaly"].sum() == 1
    assert bool(out.iloc[7]["is_anomaly"])
    med, mad = 10.0, 0.0
    # MAD of the series: median(|x-10|) = 0 -> denom guard 1.0
    assert abs(out.iloc[7]["z_r"] - round((200 - med) / 1.0, 6)) <= 1e-6


def test_mrl_rescore_dense_reference(ray_session):
    """Truncated-dim coarse candidates + full-dim rescore == dense replay."""
    import ray.data as rd

    from splade_ray.pipelines.ann import truncated_rescore_topk

    E = _rand_vectors(250, 32, seed=13).astype(np.float32).astype(np.float64)
    ids = np.arange(250, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": pa.array(list(E.astype(np.float32)), type=pa.list_(pa.float32()))})
    )
    Q = E[:3]
    out = truncated_rescore_topk(ds, Q, k=5, oversample=4, coarse_dims=8)
    for qi in range(3):
        cn = np.linalg.norm(E[:, :8], axis=1)
        qn = np.linalg.norm(Q[qi, :8])
        coarse = (E[:, :8] @ Q[qi, :8]) / (cn * qn)
        cand = ids[np.lexsort((ids, -coarse))[:20]]
        fn = np.linalg.norm(E, axis=1)
        fqn = np.linalg.norm(Q[qi])
        full = (E @ Q[qi]) / (fn * fqn)
        ref = cand[np.lexsort((cand, -full[cand]))][:5]
        got = out[out["query_idx"] == qi].sort_values("rank")["vec_id"].to_numpy()
        np.testing.assert_array_equal(got, ref)


def test_clarity_focused_beats_ambiguous(ray_session, tmp_path):
    """A query whose feedback set is one tight topical cluster must score
    higher clarity than one whose feedback spans the whole corpus."""
    import pyarrow.parquet as pq

    from splade_ray.pipelines import queries as q

    # 30 docs on a tight 'quantum flux' topic, 170 generic docs that all
    # contain 'the data table' vocabulary
    texts = [f"quantum flux resonator cavity mode {i % 3}" for i in range(30)]
    texts += [f"the data table join merge scan row batch {i % 17}" for i in range(170)]
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": np.full(n, "en", dtype=object),
            "source": np.full(n, "t", dtype=object),
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    import importlib

    orig = q.BM25_QUERIES
    try:
        q.BM25_QUERIES = [("focused", "quantum flux"), ("ambiguous", "the data")]
        out = q.clarity_scores(str(tmp_path))
    finally:
        q.BM25_QUERIES = orig
    c = dict(zip(out["query_id"], out["clarity_r"]))
    assert c["focused"] > c["ambiguous"], c
