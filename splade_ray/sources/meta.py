"""Training-meta-row ingestion (reference M10/M11).

Reference analogue: ``_row_to_meta_item`` dispatches each row of a
training dataset over four shapes (``/root/reference/src/data/dataset/
base.py:316-399``) and aligns optional inline teacher scores
(``parse_inline_scores``, ``src/data/dataset/utils.py:60-71``):

1. ``(query, positive, negative)``  — text triplets;
2. ``(anchor, positive, negative)`` — same, anchor naming;
3. ``(query_id, positive_id[, negative_id])`` — id pairs;
4. ``(query_id, doc_ids, labels[, scores])`` — listwise: label > 0 is a
   positive, the rest negatives, each side subsampled to
   ``num_positives`` / ``num_negatives``.

Ray-Data-first differences from the reference:

- dispatch is per BATCH on the schema (columns are uniform within a
  dataset), not per row — one vectorized kernel per shape;
- the listwise subsample is keyed on ``md5(seed | qid | doc_id)`` rank
  (ties by doc_id) instead of a sequential ``random.Random`` — the
  reference's rng.sample depends on row visit order, which a distributed
  pipeline must not; the md5 key is partition-order independent AND
  reproducible by the DuckDB oracle (``md5_number_lower``).

Normalized output schema (one row per input meta row):
``query_id:str, pos_ids:list<str>, neg_ids:list<str>,
pos_scores:list<double>?, neg_scores:list<double>?, query_text:str?,
pos_texts:list<str>?, neg_texts:list<str>?``.

``flatten_meta`` explodes that to scalar rows (query_id, role, slot,
doc_id, score, text) — the join-ready/driver-checkable layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions.hashing import md5_u64

_NORM_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("pos_ids", pa.list_(pa.string())),
        ("neg_ids", pa.list_(pa.string())),
        ("pos_scores", pa.list_(pa.float64())),
        ("neg_scores", pa.list_(pa.float64())),
        ("query_text", pa.string()),
        ("pos_texts", pa.list_(pa.string())),
        ("neg_texts", pa.list_(pa.string())),
    ]
)


def _str_col(batch: pa.Table, name: str) -> pa.Array:
    return batch.column(name).cast(pa.string()).combine_chunks()


def _list_of(values: list, typ) -> pa.Array:
    return pa.array(values, type=pa.list_(typ))


def _pair_shape(batch: pa.Table, query_col: str) -> pa.Table:
    """Shapes 1/2: one positive + one negative text per row."""
    n = batch.num_rows
    names = set(batch.column_names)
    if "query_id" in names or "qid" in names:
        qid = _str_col(batch, "query_id" if "query_id" in names else "qid")
    else:
        # surrogate qid: md5 of the query text (the reference uses the row
        # INDEX, which is partition-order dependent — a distributed
        # pipeline needs a content-derived id; same rule as the TSV
        # triplet reader)
        qtexts = batch.column(query_col).cast(pa.string()).to_pylist()
        qid = pa.array(
            ["h" + str(v) for v in (md5_u64(qtexts) % np.uint64(10**12))], type=pa.string()
        )
    pos = _str_col(batch, "positive")
    neg = _str_col(batch, "negative")
    ps, ns = _inline_pair_scores(batch, n)
    return pa.table(
        {
            "query_id": qid,
            "pos_ids": _list_of([[""]] * n, pa.string()),
            "neg_ids": _list_of([[""]] * n, pa.string()),
            "pos_scores": ps,
            "neg_scores": ns,
            "query_text": _str_col(batch, query_col),
            "pos_texts": pa.ListArray.from_arrays(pa.array(np.arange(n + 1, dtype=np.int32)), pos),
            "neg_texts": pa.ListArray.from_arrays(pa.array(np.arange(n + 1, dtype=np.int32)), neg),
        },
        schema=_NORM_SCHEMA,
    )


def _id_pair_shape(batch: pa.Table) -> pa.Table:
    """Shape 3: (query_id, positive_id[, negative_id])."""
    n = batch.num_rows
    pos = pc.fill_null(_str_col(batch, "positive_id"), "")
    if "negative_id" in batch.column_names:
        neg = pc.fill_null(batch.column("negative_id").cast(pa.string()).combine_chunks(), "")
    else:
        neg = pa.array([""] * n, type=pa.string())
    ps, ns = _inline_pair_scores(batch, n)
    offs = pa.array(np.arange(n + 1, dtype=np.int32))
    return pa.table(
        {
            "query_id": _str_col(batch, "query_id"),
            "pos_ids": pa.ListArray.from_arrays(offs, pos),
            "neg_ids": pa.ListArray.from_arrays(offs, neg),
            "pos_scores": ps,
            "neg_scores": ns,
            "query_text": pa.array([None] * n, type=pa.string()),
            "pos_texts": pa.array([None] * n, type=pa.list_(pa.string())),
            "neg_texts": pa.array([None] * n, type=pa.list_(pa.string())),
        },
        schema=_NORM_SCHEMA,
    )


def _inline_pair_scores(batch: pa.Table, n: int):
    """Inline-score parsing for the pair shapes (reference
    parse_inline_scores): a LIST score column of length 2 per row aligns
    [pos, neg]; anything else → null scores."""
    names = set(batch.column_names)
    col = "score" if "score" in names else ("scores" if "scores" in names else None)
    null = pa.array([None] * n, type=pa.list_(pa.float64()))
    if col is None:
        return null, null
    arr = batch.column(col).combine_chunks()
    if not pa.types.is_list(arr.type):
        return null, null
    lens = arr.value_lengths().to_numpy(zero_copy_only=False)
    flat = arr.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.nan_to_num(lens, nan=0).astype(np.int64), out=offs[1:])
    ps, ns = [], []
    for i in range(n):
        if lens[i] == 2:
            ps.append([float(flat[offs[i]])])
            ns.append([float(flat[offs[i] + 1])])
        else:
            ps.append(None)
            ns.append(None)
    return _list_of(ps, pa.float64()), _list_of(ns, pa.float64())


def _sample_rank(qids: np.ndarray, doc_ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-(qid, doc) sampling key."""
    keys = [f"{seed}\x01{q}\x01{d}" for q, d in zip(qids, doc_ids)]
    return md5_u64(keys)


def _listwise_shape(batch: pa.Table, num_positives: int, num_negatives: int, seed: int) -> pa.Table:
    """Shape 4: (query_id, doc_ids, labels[, scores]) — vectorized over the
    exploded (row, doc) pairs; subsample by md5 rank within each side."""
    n = batch.num_rows
    qid = _str_col(batch, "query_id")
    docs_l = batch.column("doc_ids").combine_chunks()
    lens = docs_l.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    docs = np.asarray(docs_l.flatten().cast(pa.string()).to_pylist(), dtype=object)
    labels = batch.column("labels").combine_chunks().flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
    names = set(batch.column_names)
    score_col = "scores" if "scores" in names else ("score" if "score" in names else None)
    # scores aligned to the exploded doc stream: only rows whose score list
    # length matches their doc list get values (reference alignment rule)
    aligned = np.full(rows.size, np.nan)
    sc_ok = np.zeros(n, dtype=bool)
    if score_col is not None:
        sc_l = batch.column(score_col).combine_chunks()
        sc_lens = sc_l.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        sc_ok = sc_lens == lens
        sc_flat = sc_l.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
        doc_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_offs[1:])
        sc_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sc_lens, out=sc_offs[1:])
        flat_ok = sc_ok[rows]
        dst = np.nonzero(flat_ok)[0]
        if dst.size:
            src = dst - doc_offs[rows[dst]] + sc_offs[rows[dst]]
            aligned[dst] = sc_flat[src]

    qids_flat = np.asarray(qid.to_pylist(), dtype=object)[rows]
    rank_key = _sample_rank(qids_flat, docs, seed)
    is_pos = labels > 0

    def side(mask: np.ndarray, cap: int):
        r, d, s, kk = rows[mask], docs[mask], aligned[mask], rank_key[mask]
        # rank within each row by (md5 key, doc_id) and keep the first cap
        order = np.lexsort((d, kk, r))
        r, d, s = r[order], d[order], s[order]
        pos_in_row = np.arange(r.size) - np.searchsorted(r, r, side="left")
        keep = pos_in_row < cap
        return r[keep], d[keep], s[keep]

    pr, pd_, psc = side(is_pos, num_positives)
    nr, nd, nsc = side(~is_pos, num_negatives)

    def pack(r, d, s, want_scores_mask):
        counts = np.bincount(r, minlength=n)
        offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        ids_arr = pa.ListArray.from_arrays(pa.array(offs), pa.array(list(d), type=pa.string()))
        sc_rows = []
        for i in range(n):
            if want_scores_mask[i]:
                sc_rows.append([float(x) for x in s[offs[i] : offs[i + 1]]])
            else:
                sc_rows.append(None)
        return ids_arr, _list_of(sc_rows, pa.float64())

    pos_ids, pos_scores = pack(pr, pd_, psc, sc_ok)
    neg_ids, neg_scores = pack(nr, nd, nsc, sc_ok)
    return pa.table(
        {
            "query_id": qid,
            "pos_ids": pos_ids,
            "neg_ids": neg_ids,
            "pos_scores": pos_scores,
            "neg_scores": neg_scores,
            "query_text": pa.array([None] * n, type=pa.string()),
            "pos_texts": pa.array([None] * n, type=pa.list_(pa.string())),
            "neg_texts": pa.array([None] * n, type=pa.list_(pa.string())),
        },
        schema=_NORM_SCHEMA,
    )


def normalize_meta_rows(
    ds: Dataset,
    *,
    num_positives: int = 4,
    num_negatives: int = 4,
    seed: int = 13,
) -> Dataset:
    """Schema-dispatched normalization of the four meta-row shapes."""

    def dispatch(batch: pa.Table) -> pa.Table:
        names = set(batch.column_names)
        if {"query", "positive", "negative"} <= names:
            return _pair_shape(batch, "query")
        if {"anchor", "positive", "negative"} <= names:
            return _pair_shape(batch, "anchor")
        if {"query_id", "doc_ids", "labels"} <= names:
            return _listwise_shape(batch, num_positives, num_negatives, seed)
        if {"query_id", "positive_id"} <= names:
            return _id_pair_shape(batch)
        raise ValueError(f"Unsupported meta-row schema: {sorted(names)}")

    return ds.map_batches(dispatch, batch_format="pyarrow")


def flatten_meta(ds: Dataset) -> Dataset:
    """Normalized meta rows → scalar (query_id, role, slot, doc_id, score,
    text) rows — one per sampled positive/negative."""

    def flatten(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("query_id", "role", "slot", "doc_id", "score", "text")}
        for row in batch.to_pylist():
            for role, ids_k, sc_k, tx_k in (
                ("pos", "pos_ids", "pos_scores", "pos_texts"),
                ("neg", "neg_ids", "neg_scores", "neg_texts"),
            ):
                ids = row[ids_k] or []
                scs = row[sc_k]
                txs = row[tx_k]
                for slot, did in enumerate(ids):
                    out["query_id"].append(row["query_id"])
                    out["role"].append(role)
                    out["slot"].append(slot)
                    out["doc_id"].append(did)
                    out["score"].append(None if scs is None else scs[slot])
                    out["text"].append(None if txs is None else txs[slot])
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.string()),
                "role": pa.array(out["role"], type=pa.string()),
                "slot": pa.array(out["slot"], type=pa.int32()),
                "doc_id": pa.array(out["doc_id"], type=pa.string()),
                "score": pa.array(out["score"], type=pa.float64()),
                "text": pa.array(out["text"], type=pa.string()),
            }
        )

    return ds.map_batches(flatten, batch_format="pyarrow")
