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
    (term, df) row per distinct term in the batch.  Terms are distinct
    within each row, so a flat occurrence count IS the per-batch df.
    Pure Arrow C++ (``value_counts``) — no Python-object round-trip."""
    flat = batch.column("terms").combine_chunks().flatten()
    if len(flat) == 0:
        return pa.table({"term": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())})
    vc = pa.compute.value_counts(flat)
    return pa.table({"term": vc.field("values"), "df": vc.field("counts")})


def compute_vocab(doc_terms: Dataset, distributed: bool = False) -> pd.DataFrame:
    """df aggregate → vocab DataFrame (term, term_id, df) sorted by term.

    The distributed pass is only the combiner (one (term, df) row per
    distinct term per block — bounded by vocab × blocks, not corpus size);
    the final reduce runs in pandas on the driver, which beats a Ray
    groupby shuffle by seconds of fixed cost at this output size.  Set
    ``distributed=True`` when vocab × blocks outgrows driver memory
    (billion-term vocabularies) to keep the reduce as a Ray groupby."""
    partials = doc_terms.map_batches(df_partials, batch_format="pyarrow")
    if distributed:
        vocab = (
            partials.groupby("term").aggregate(Sum("df", alias_name="df")).to_pandas()
        )
        vocab = vocab.sort_values("term", kind="mergesort").reset_index(drop=True)
    else:
        parts = partials.to_pandas()
        vocab = parts.groupby("term", sort=True, as_index=False)["df"].sum()
    vocab["term_id"] = np.arange(len(vocab), dtype=np.int64)
    return vocab[["term", "term_id", "df"]]


def compute_vocab_ids(doc_tids: Dataset) -> pd.DataFrame:
    """df aggregate for encoders that already emit integer term ids (the
    neural path): (term_id, df) sorted by term_id."""

    def partial(batch: pa.Table) -> pa.Table:
        flat = batch.column("tids").combine_chunks().flatten()
        if len(flat) == 0:
            return pa.table({"term_id": pa.array([], type=pa.int32()), "df": pa.array([], type=pa.int64())})
        vc = pa.compute.value_counts(flat)
        return pa.table({"term_id": vc.field("values"), "df": vc.field("counts")})

    parts = doc_tids.map_batches(partial, batch_format="pyarrow").to_pandas()
    vocab = parts.groupby("term_id", sort=True, as_index=False)["df"].sum()
    return vocab[["term_id", "df"]]
