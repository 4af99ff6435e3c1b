"""Corpus statistics: per-term document frequency + global N / avgdl.

Reference analogue: pass-1 of the index build — per-shard
``np.bincount(indices, minlength=vocab)`` partials summed across shards
(``/root/reference/src/indexing/sparse_index.py:621-632``).  Ray-Data form:
partial df per batch inside ``map_batches`` (one output row per distinct
term per batch — the combiner), then a ``groupby(term).sum`` over the much
smaller partials (SURVEY.md §2.5 A1).  This is what keeps the df aggregate
from shuffling one row per posting.

Term ids are assigned by sorted term order on the driver (the vocab table is
aggregate-sized, not corpus-sized).  At 10^12-doc scale the vocab table
would instead stay distributed and term ids come from feature hashing — the
posting-build and query stages only ever consume the broadcast
``term -> (id, df)`` mapping, so swapping that in is localized here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum


def df_partials(batch: pa.Table) -> pa.Table:
    """Partial document-frequency combiner: doc_terms batch → one
    (term, df) row per distinct term in the batch."""
    terms = batch.column("terms")
    flat = np.asarray(terms.combine_chunks().flatten().to_pylist(), dtype=object)
    if flat.size == 0:
        return pa.table({"term": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())})
    uniq, counts = np.unique(flat, return_counts=True)
    return pa.table({"term": pa.array(uniq, type=pa.string()), "df": pa.array(counts.astype(np.int64))})


def compute_vocab(doc_terms: Dataset) -> pd.DataFrame:
    """df aggregate → vocab DataFrame (term, term_id, df) sorted by term."""
    agg = (
        doc_terms.map_batches(df_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    vocab = agg.to_pandas()
    vocab = vocab.sort_values("term", kind="mergesort").reset_index(drop=True)
    vocab["term_id"] = np.arange(len(vocab), dtype=np.int64)
    return vocab[["term", "term_id", "df"]]


def compute_doc_stats(doc_terms: Dataset) -> dict:
    """N, avgdl, nnz via tiny aggregates (Count/Sum over int columns)."""

    def partial(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy(zero_copy_only=False)
        nnz = batch.column("terms").combine_chunks().value_lengths()
        return pa.table(
            {
                "n_docs": pa.array([len(batch)], type=pa.int64()),
                "sum_dl": pa.array([int(dl.sum())], type=pa.int64()),
                "nnz": pa.array([int(pa.compute.sum(nnz).as_py() or 0)], type=pa.int64()),
            }
        )

    parts = doc_terms.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n_docs"].sum())
    return {
        "n_docs": n,
        "avgdl": float(parts["sum_dl"].sum() / n) if n else 0.0,
        "nnz": int(parts["nnz"].sum()),
    }
