"""Retrieval metrics + conjunctive matching.

Reference analogue: the evaluate path — per-query top-k joined against
qrels, then MRR / nDCG / Recall / HitRate @ k via torchmetrics
(``/root/reference/src/metric/retrieval.py:59-210``, k-list ``:13``), with
queries restricted to those that have qrels
(``src/data/pd_module/retrieval.py:201-204``, M13 in SURVEY.md §2.2).

Here the run table is produced by the engine's ranked search, the qrels are
derived deterministically (conjunctive term containment — a boolean AND
over the inverted index, itself a retrieval operator), and the metrics are
vectorized pandas over the (tiny) per-query tables.  Everything is
SQL-expressible, so the whole chain is oracle-checked end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .search import IndexReader


def conjunctive_match(reader: IndexReader, text: str) -> np.ndarray:
    """Doc ids containing EVERY query term (boolean AND over postings) —
    sorted ascending.  Empty when any term is OOV or the query is empty."""
    qtids, _ = reader.encode_query(text)
    if qtids.size == 0:
        return np.zeros(0, dtype=np.int64)
    result: np.ndarray | None = None
    for sh in reader.shards:
        slices = sh._term_slices(qtids)
        if len(slices) < qtids.size:
            shard_docs = np.zeros(0, dtype=np.int64)
        else:
            shard_docs = None
            for _, s, e, _ in slices:
                ids = sh.post_local[s:e]
                shard_docs = ids if shard_docs is None else np.intersect1d(shard_docs, ids, assume_unique=True)
                if shard_docs.size == 0:
                    break
            shard_docs = sh.doc_ids[shard_docs] if shard_docs is not None and shard_docs.size else np.zeros(0, np.int64)
        result = shard_docs if result is None else np.concatenate([result, shard_docs])
    return np.sort(result) if result is not None else np.zeros(0, np.int64)


def min_should_match(reader: IndexReader, text: str, m: int) -> np.ndarray:
    """Doc ids matching at least ``m`` DISTINCT query terms — disjunctive
    boolean retrieval with a minimum_should_match floor (Lucene
    BooleanQuery OR semantics).  OOV terms can never match, so they only
    lower a doc's attainable count; ``m`` above the in-vocab distinct-term
    count yields empty.  Per shard: one concatenated-postings bincount
    (each (term, doc) posting is unique, so the count IS the distinct-term
    match count); tombstoned docs are excluded like every scored path."""
    qtids, _ = reader.encode_query(text)
    if qtids.size == 0 or m <= 0:
        return np.zeros(0, dtype=np.int64)
    out = []
    for sh in reader.shards:
        slices = sh._term_slices(qtids)
        if not slices:
            continue
        ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
        cnt = np.bincount(ids, minlength=sh.n_local)
        if sh.deleted_local.size:
            cnt[sh.deleted_local] = 0
        loc = np.flatnonzero(cnt >= m)
        if loc.size:
            out.append(sh.doc_ids[loc])
    return np.sort(np.concatenate(out)) if out else np.zeros(0, np.int64)


def retrieval_metrics(run: pd.DataFrame, qrels: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """Per-query RR@k / Recall@k / nDCG@k (binary relevance).

    ``run``: (query_id, rank, doc_id) with rank 1..k per query, ranked.
    ``qrels``: (query_id, doc_id) relevant pairs.  Queries without any
    relevant doc are dropped (reference M13).  Returns one row per kept
    query: (query_id, rr_at_k, recall_at_k, ndcg_at_k) — macro-average on
    top of this is the reference's reported number."""
    n_rel = qrels.groupby("query_id").size().rename("n_rel")
    run = run[run["rank"] <= k].merge(n_rel, on="query_id", how="inner")
    hits = run.merge(qrels.assign(rel=1), on=["query_id", "doc_id"], how="left")
    hits["rel"] = hits["rel"].fillna(0).astype(np.int64)
    hits["gain"] = hits["rel"] / np.log2(hits["rank"] + 1.0)
    hits["rr"] = np.where(hits["rel"] > 0, 1.0 / hits["rank"], 0.0)

    g = hits.groupby("query_id")
    out = pd.DataFrame(
        {
            "n_rel": g["n_rel"].first(),
            "n_hit": g["rel"].sum(),
            "dcg": g["gain"].sum(),
            "rr_at_k": g["rr"].max(),
        }
    )
    # a query WITH qrels but zero run rows must score 0, not vanish —
    # dropping it would inflate the macro-average (torchmetrics scores such
    # queries as zeros; only queries without qrels are dropped, M13)
    out = out.reindex(n_rel.index)
    out["n_rel"] = out["n_rel"].fillna(n_rel).astype(np.int64)
    out[["n_hit", "dcg", "rr_at_k"]] = out[["n_hit", "dcg", "rr_at_k"]].fillna(0.0)
    ideal_n = np.minimum(out["n_rel"].to_numpy(), k)
    max_n = int(ideal_n.max()) if len(out) else 0
    idcg_table = np.concatenate([[0.0], np.cumsum(1.0 / np.log2(np.arange(1, max_n + 1) + 1.0))])
    out["ndcg_at_k"] = out["dcg"] / idcg_table[ideal_n]
    out["recall_at_k"] = out["n_hit"] / out["n_rel"]
    out = out.reset_index()[["query_id", "rr_at_k", "recall_at_k", "ndcg_at_k"]]
    return out.sort_values("query_id", ignore_index=True)
