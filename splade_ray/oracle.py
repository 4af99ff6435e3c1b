"""Single-process numpy oracle for the full index-build + BM25 query path.

This is the rank-identity contract the Ray pipeline must reproduce — the
role played in the reference by the numba kernels
``_accumulate_scores`` / ``score_query_postings``
(``/root/reference/src/indexing/sparse_index.py:661-755``): score(d) =
Σ_t q_weight(t) · doc_weight(t), exhaustive accumulation, then top-k.  The
reference leaves tie order implementation-defined (``:735-748``); the oracle
(and the engine) fix it as ``(-score, doc_id)``.

Deterministic contracts encoded here (SURVEY.md §3.2, §7):
- url dedup keeps the max ``warc_ts`` row per url;
- doc ids are assigned in ``(hash_strings(url) % num_buckets, url)`` order;
- BM25 uses ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` with k1/b from
  :class:`~splade_ray.config.EngineConfig` (the reference has no BM25 —
  SURVEY.md §0);
- accumulation in float64.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .config import EngineConfig, DEFAULT_CONFIG
from .tokenizer import Tokenizer


def url_bucket(url: str, num_buckets: int) -> int:
    """Same bucket function as the engine (stages/extract.url_buckets)."""
    from .functions.hashing import hash_strings

    return int(hash_strings(np.asarray([url], dtype=object))[0] % np.uint64(num_buckets))


@dataclass
class OracleIndex:
    doc_ids: list[str]  # doc_id -> url
    dl: np.ndarray  # int32[N]
    avgdl: float
    n_docs: int
    terms: list[str]  # term_id -> term (sorted)
    term_to_id: dict = field(repr=False)
    df: np.ndarray  # int64[vocab]
    # CSC postings over the whole corpus (reference InvertedIndex shape,
    # sparse_index.py:207-215)
    term_ptr: np.ndarray  # int64[vocab+1]
    post_doc_ids: np.ndarray  # int32[nnz]
    post_weights: np.ndarray  # float64[nnz]
    config: EngineConfig = DEFAULT_CONFIG
    # per-doc token sequences (doc-id order) — the oracle's forward index,
    # kept as plain Python lists for the phrase-containment check
    tokens: list = field(default_factory=list)


def bm25_idf(df: np.ndarray, n_docs: int) -> np.ndarray:
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def bm25_weight(tf: np.ndarray, dl: np.ndarray, df_of_term: np.ndarray, n_docs: int, avgdl: float, cfg: EngineConfig) -> np.ndarray:
    idf = bm25_idf(df_of_term, n_docs)
    tf = tf.astype(np.float64)
    denom = tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl.astype(np.float64) / avgdl)
    return idf * tf * (cfg.k1 + 1.0) / denom


def dedup_assign(web_pages: pa.Table, cfg: EngineConfig) -> pa.Table:
    """url-dedup (keep max warc_ts) + deterministic doc-id assignment.

    Returns columns (doc_id:int64, url, warc_ts, text, lang) sorted by
    doc_id == (bucket, url) rank.
    """
    urls = np.asarray(web_pages["url"].to_pylist(), dtype=object)
    ts = web_pages["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    from .functions.hashing import hash_strings

    content = hash_strings(np.asarray(web_pages["text"].to_pylist(), dtype=object)).astype(np.int64)
    # keep max warc_ts per url; exact (url, ts) ties break by content hash
    # (same deterministic rule as the engine's shuffle-mode dedup)
    order = np.lexsort((content, -ts, urls))  # by url asc, ts desc, hash asc
    keep_mask = np.ones(order.size, dtype=bool)
    keep_mask[1:] = urls[order][1:] != urls[order][:-1]
    kept = order[keep_mask]
    kept_urls = urls[kept]
    buckets = (hash_strings(kept_urls) % np.uint64(cfg.num_buckets)).astype(np.int64)
    final = kept[np.lexsort((kept_urls, buckets))]
    tbl = web_pages.take(pa.array(final))
    return tbl.add_column(0, "doc_id", pa.array(np.arange(len(final), dtype=np.int64)))


def build_oracle_index(web_pages: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> OracleIndex:
    corpus = dedup_assign(web_pages, cfg)
    tok = Tokenizer(cfg)
    texts = corpus["text"].to_pylist()
    n = len(texts)
    uniq_terms, tfs, dls = tok.term_counts_batch(texts)
    avgdl = float(dls.astype(np.float64).mean()) if n else 0.0

    all_terms = sorted({t for row in uniq_terms for t in row})
    term_to_id = {t: i for i, t in enumerate(all_terms)}
    vocab = len(all_terms)

    # flat (term_id, doc_id, tf) triples
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), [len(r) for r in uniq_terms])
    flat_tids = np.asarray([term_to_id[t] for row in uniq_terms for t in row], dtype=np.int64)
    flat_tf = np.concatenate(tfs) if tfs else np.zeros(0, np.int32)

    df = np.bincount(flat_tids, minlength=vocab).astype(np.int64)
    term_ptr = np.zeros(vocab + 1, dtype=np.int64)
    np.cumsum(df, out=term_ptr[1:])

    # counting-sort scatter by term (mirrors _fill_postings,
    # sparse_index.py:591-658) — docs ascend within each term because doc_id
    # is the outer iteration order
    order = np.argsort(flat_tids, kind="stable")
    post_doc_ids = doc_rep[order].astype(np.int32)
    post_tf = flat_tf[order]
    post_dl = dls[post_doc_ids].astype(np.float64)
    post_df = df[flat_tids[order]]
    post_weights = bm25_weight(post_tf, post_dl, post_df, n, avgdl, cfg)

    return OracleIndex(
        doc_ids=corpus["url"].to_pylist(),
        dl=dls,
        avgdl=avgdl,
        n_docs=n,
        terms=all_terms,
        term_to_id=term_to_id,
        df=df,
        term_ptr=term_ptr,
        post_doc_ids=post_doc_ids,
        post_weights=post_weights,
        config=cfg,
        tokens=[tok.tokenize(t) for t in texts],
    )


def oracle_search(index: OracleIndex, query_text: str, k: int) -> list[tuple[int, float]]:
    """Exhaustive accumulate + top-k with (-score, doc_id) tie-break.

    Query side is bag-of-words counts (reference doc-only query encoding,
    splade.py:243-265): q_weight(t) = count of t in the query.
    """
    tok = Tokenizer(index.config)
    toks = tok.tokenize(query_text)
    scores = np.zeros(index.n_docs, dtype=np.float64)
    tids: dict[int, int] = {}
    for t in toks:
        tid = index.term_to_id.get(t)
        if tid is not None:
            tids[tid] = tids.get(tid, 0) + 1
    for tid in sorted(tids):
        qw = tids[tid]
        s, e = index.term_ptr[tid], index.term_ptr[tid + 1]
        scores[index.post_doc_ids[s:e]] += qw * index.post_weights[s:e]
    nz = np.nonzero(scores)[0]
    if nz.size == 0:
        return []
    k = min(k, nz.size)
    # sort by (-score, doc_id): lexsort keys are last-key-primary
    order = nz[np.lexsort((nz, -scores[nz]))][:k]
    return [(int(d), float(scores[d])) for d in order]


def oracle_prefix_search(index: OracleIndex, prefix: str, k: int) -> list[tuple[int, float]]:
    """Wildcard oracle: every indexed term starting with ``prefix``
    contributes its BM25 impact with unit query weight — the expanded-OR
    semantics of :meth:`IndexReader.search_prefix` (each term keeps its
    own idf; no blending)."""
    tok = Tokenizer(index.config)
    norm = tok.tokenize(prefix)
    if len(norm) != 1:
        raise ValueError(f"prefix must normalize to one token, got {norm!r}")
    p = norm[0]
    scores = np.zeros(index.n_docs, dtype=np.float64)
    for tid, t in enumerate(index.terms):
        if t.startswith(p):
            s, e = index.term_ptr[tid], index.term_ptr[tid + 1]
            scores[index.post_doc_ids[s:e]] += index.post_weights[s:e]
    nz = np.nonzero(scores)[0]
    if nz.size == 0:
        return []
    k = min(k, nz.size)
    order = nz[np.lexsort((nz, -scores[nz]))][:k]
    return [(int(d), float(scores[d])) for d in order]


def _levenshtein(a: str, b: str) -> int:
    """Textbook two-row classical Levenshtein (sub/ins/del, no
    transposition) — deliberately independent of the engine's vectorized
    DP so the test cross-checks two implementations."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def oracle_fuzzy_search(
    index: OracleIndex, term: str, k: int, max_edits: int = 1
) -> list[tuple[int, float]]:
    """Fuzzy oracle: every indexed term within ``max_edits`` classical
    Levenshtein distance contributes its BM25 impact with unit query
    weight — the expanded-OR semantics of
    :meth:`IndexReader.search_fuzzy`."""
    tok = Tokenizer(index.config)
    norm = tok.tokenize(term)
    if len(norm) != 1:
        raise ValueError(f"fuzzy term must normalize to one token, got {norm!r}")
    q = norm[0]
    scores = np.zeros(index.n_docs, dtype=np.float64)
    for tid, t in enumerate(index.terms):
        if abs(len(t) - len(q)) <= max_edits and _levenshtein(t, q) <= max_edits:
            s, e = index.term_ptr[tid], index.term_ptr[tid + 1]
            scores[index.post_doc_ids[s:e]] += index.post_weights[s:e]
    nz = np.nonzero(scores)[0]
    if nz.size == 0:
        return []
    k = min(k, nz.size)
    order = nz[np.lexsort((nz, -scores[nz]))][:k]
    return [(int(d), float(scores[d])) for d in order]


def oracle_regexp_search(index: OracleIndex, pattern: str, k: int) -> list[tuple[int, float]]:
    """Regexp oracle: every indexed term FULLY matching ``pattern``
    (implicit ^...$ anchoring, Lucene RegexpQuery semantics) contributes
    its BM25 impact with unit query weight — the expanded-OR semantics of
    :meth:`IndexReader.search_regexp`."""
    import re

    rx = re.compile(pattern)
    scores = np.zeros(index.n_docs, dtype=np.float64)
    for tid, t in enumerate(index.terms):
        if rx.fullmatch(t):
            s, e = index.term_ptr[tid], index.term_ptr[tid + 1]
            scores[index.post_doc_ids[s:e]] += index.post_weights[s:e]
    nz = np.nonzero(scores)[0]
    if nz.size == 0:
        return []
    k = min(k, nz.size)
    order = nz[np.lexsort((nz, -scores[nz]))][:k]
    return [(int(d), float(scores[d])) for d in order]


def oracle_phrase_search(index: OracleIndex, phrase: str, k: int) -> list[tuple[int, float]]:
    """Exact-phrase oracle: docs whose token sequence contains the phrase
    tokens consecutively, ranked by the same BM25 bag score as
    :func:`oracle_search` with (-score, doc_id) tie-break."""
    tok = Tokenizer(index.config)
    toks = tok.tokenize(phrase)
    if not toks or any(t not in index.term_to_id for t in toks):
        return []
    m = len(toks)
    scores = np.zeros(index.n_docs, dtype=np.float64)
    counts: dict[int, int] = {}
    for t in toks:
        tid = index.term_to_id[t]
        counts[tid] = counts.get(tid, 0) + 1
    for tid in sorted(counts):
        s, e = index.term_ptr[tid], index.term_ptr[tid + 1]
        scores[index.post_doc_ids[s:e]] += counts[tid] * index.post_weights[s:e]
    match = np.asarray(
        [any(dt[i : i + m] == toks for i in range(len(dt) - m + 1)) for dt in index.tokens],
        dtype=bool,
    )
    scores[~match] = 0.0
    nz = np.nonzero(scores)[0]
    if nz.size == 0:
        return []
    order = nz[np.lexsort((nz, -scores[nz]))][: min(k, nz.size)]
    return [(int(d), float(scores[d])) for d in order]


def oracle_near_search(index: OracleIndex, term_a: str, term_b: str, window: int, k: int) -> list[tuple[int, float]]:
    """Proximity oracle: docs where the two terms occur within ``window``
    token positions (any order), ranked like :func:`oracle_phrase_search`."""
    tok = Tokenizer(index.config)
    (ta,), (tb,) = tok.tokenize(term_a), tok.tokenize(term_b)
    if ta not in index.term_to_id or tb not in index.term_to_id:
        return []
    scores = np.zeros(index.n_docs, dtype=np.float64)
    for t in (ta, tb):
        tid = index.term_to_id[t]
        s, e = index.term_ptr[tid], index.term_ptr[tid + 1]
        scores[index.post_doc_ids[s:e]] += index.post_weights[s:e]
    match = np.zeros(index.n_docs, dtype=bool)
    for d, dt in enumerate(index.tokens):
        pa_ = [i for i, t in enumerate(dt) if t == ta]
        pb = [i for i, t in enumerate(dt) if t == tb]
        match[d] = any(abs(i - j) <= window for i in pa_ for j in pb)
    scores[~match] = 0.0
    nz = np.nonzero(scores)[0]
    if nz.size == 0:
        return []
    order = nz[np.lexsort((nz, -scores[nz]))][: min(k, nz.size)]
    return [(int(d), float(scores[d])) for d in order]


def oracle_span_near_search(index: OracleIndex, span: str, slop: int, k: int) -> list[tuple[int, float]]:
    """Ordered span-near oracle (SpanNearQuery(inOrder=true, slop)): docs
    with positions p1 < … < pm of the span tokens and (pm − p1) − (m−1)
    ≤ slop, ranked like :func:`oracle_phrase_search`.  Deliberately
    brute-force: itertools.product over the per-term position lists."""
    import itertools

    tok = Tokenizer(index.config)
    toks = tok.tokenize(span)
    if len(toks) < 2 or any(t not in index.term_to_id for t in toks):
        return []
    m = len(toks)
    scores = np.zeros(index.n_docs, dtype=np.float64)
    counts: dict[int, int] = {}
    for t in toks:
        tid = index.term_to_id[t]
        counts[tid] = counts.get(tid, 0) + 1
    for tid in sorted(counts):
        s, e = index.term_ptr[tid], index.term_ptr[tid + 1]
        scores[index.post_doc_ids[s:e]] += counts[tid] * index.post_weights[s:e]
    match = np.zeros(index.n_docs, dtype=bool)
    win = m - 1 + slop
    for d, dt in enumerate(index.tokens):
        pls = [[i for i, t in enumerate(dt) if t == tk] for tk in toks]
        if any(not pl for pl in pls):
            continue
        match[d] = any(
            all(c[i] < c[i + 1] for i in range(m - 1)) and c[-1] - c[0] <= win
            for c in itertools.product(*pls)
        )
    scores[~match] = 0.0
    nz = np.nonzero(scores)[0]
    if nz.size == 0:
        return []
    order = nz[np.lexsort((nz, -scores[nz]))][: min(k, nz.size)]
    return [(int(d), float(scores[d])) for d in order]


def oracle_search_all(index: OracleIndex, queries: pa.Table, k: int) -> pa.Table:
    rows_qid, rows_rank, rows_doc, rows_url, rows_score = [], [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        for rank, (doc, score) in enumerate(oracle_search(index, text, k), start=1):
            rows_qid.append(qid)
            rows_rank.append(rank)
            rows_doc.append(doc)
            rows_url.append(index.doc_ids[doc])
            rows_score.append(score)
    return pa.table(
        {
            "query_id": pa.array(rows_qid, type=pa.string()),
            "rank": pa.array(rows_rank, type=pa.int32()),
            "doc_id": pa.array(rows_doc, type=pa.int64()),
            "url": pa.array(rows_url, type=pa.string()),
            "score": pa.array(rows_score, type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Neural (hash-expansion SPLADE) oracle — deliberately slow per-row Python,
# independent of the vectorized pipeline kernels.  Scoring semantics are the
# reference's sparse dot product (`_accumulate_scores`, sparse_index.py:
# 661-686) with doc-only BoW queries (splade.py:243-265); the doc vectors
# use the engine's model definition (stages/neural.py `expand_token_hashes`
# — the model itself is shared, the *pipeline* is what this oracle checks).
# ---------------------------------------------------------------------------


def build_neural_oracle(web_pages: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> tuple[list[dict[int, float]], list[str]]:
    """Per-doc sparse vectors {term_id: weight} after max-pool + M5
    sparsify (threshold, top-k by (weight desc, tid asc), keep)."""
    from .functions.hashing import hash_strings
    from .stages.neural import expand_token_hashes

    corpus = dedup_assign(web_pages, cfg)
    tok = Tokenizer(cfg)
    vecs: list[dict[int, float]] = []
    for text in corpus["text"].to_pylist():
        tokens = sorted(set(tok.tokenize(text)))
        d: dict[int, float] = {}
        if tokens:
            hs = hash_strings(np.asarray(tokens, dtype=object), seed=cfg.neural_seed)
            for h in hs:
                tids, ws = expand_token_hashes(np.asarray([h], dtype=np.uint64), cfg)
                for tid, w in zip(tids.tolist(), ws.tolist()):
                    if w > cfg.min_weight and w > d.get(tid, 0.0):
                        d[tid] = w
        kept = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[: cfg.doc_top_k]
        # engine stores weights as float32 (weight_mode="f32") or uint8
        # impact codes (value_dtype="q8"); mirror the exact storage
        # round-trip so scores match bit-for-bit
        if cfg.neural_value_dtype == "q8":
            def store(w):
                c = min(max(round(float(np.float64(np.float32(w))) / cfg.q8_scale * 255.0), 0), 255)
                return c * (cfg.q8_scale / 255.0)
        else:
            def store(w):
                return float(np.float32(w))
        vecs.append({tid: store(w) for tid, w in kept})
    return vecs, corpus["url"].to_pylist()


def neural_oracle_search(vecs: list[dict[int, float]], urls: list[str], query_text: str, k: int, cfg: EngineConfig = DEFAULT_CONFIG) -> list[tuple[int, float, str]]:
    from .functions.hashing import hash_strings

    tok = Tokenizer(cfg)
    tokens = tok.tokenize(query_text)
    if not tokens:
        return []
    hs = hash_strings(np.asarray(tokens, dtype=object), seed=cfg.neural_seed)
    qcounts: dict[int, float] = {}
    for h in hs:
        tid = int(h % np.uint64(cfg.neural_vocab_size))
        qcounts[tid] = qcounts.get(tid, 0.0) + 1.0
    scores: dict[int, float] = {}
    for di, vec in enumerate(vecs):
        s = 0.0
        for tid, qw in qcounts.items():
            w = vec.get(tid)
            if w is not None:
                s += qw * w
        if s != 0.0:
            scores[di] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, s, urls[d]) for d, s in top]
