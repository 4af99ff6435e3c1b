"""Doc encoding stage: text → per-doc sparse term/tf vectors (actor pool).

This is the engine's BM25 "term-impact encoder" — the CPU analogue of the
reference's SPLADE doc encoder + sparsifier
(``/root/reference/src/model/pl_module/encode.py:182-214`` →
``src/indexing/sparse_index.py:100-190``): per doc it emits the sparse
(terms, tfs) vector sorted by term, capped at ``doc_top_k`` terms
(reference ``sparse_top_k=4096``, ``config/encoding/_base.yaml:26``).  The
Arrow list columns are the CSR representation — list offsets *are* the
indptr (SURVEY.md §1.2).

A stateful callable class: the tokenizer regex is compiled once per actor
(``__init__``), batches are processed vectorized (flat tokens →
``pandas.factorize`` → segmented unique/count) — no per-row Python beyond
the regex engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..config import EngineConfig
from ..tokenizer import Tokenizer


def term_count_table(texts: list[str], tok: Tokenizer) -> tuple[pa.ListArray, pa.ListArray, np.ndarray]:
    """Vectorized batch term counting → (terms list<string>, tfs
    list<int32>, dl int32[n]).  Terms are sorted ascending within each row."""
    n = len(texts)
    flat_list, dls = tok.tokenize_flat(texts)
    counts = dls.astype(np.int64)
    flat = np.asarray(flat_list, dtype=object)
    if flat.size == 0:
        empty_off = pa.array(np.zeros(n + 1, dtype=np.int32))
        return (
            pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.string())),
            pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.int32())),
            dls,
        )
    codes, uniques = pd.factorize(flat, sort=True)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    # (row, code) pair → unique pairs + tf; uniques sorted so code order ==
    # lexicographic term order within each row
    key = rows * np.int64(len(uniques)) + codes
    uniq_keys, tf = np.unique(key, return_counts=True)
    out_rows = (uniq_keys // len(uniques)).astype(np.int64)
    out_codes = (uniq_keys % len(uniques)).astype(np.int64)
    per_row = np.bincount(out_rows, minlength=n).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(per_row, out=offsets[1:])
    terms_arr = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(np.asarray(uniques, dtype=object)[out_codes], type=pa.string())
    )
    tfs_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(tf.astype(np.int32)))
    return terms_arr, tfs_arr, dls


def apply_top_k_cap(terms: pa.ListArray, tfs: pa.ListArray, k: int) -> tuple[pa.ListArray, pa.ListArray]:
    """Keep the k highest-tf terms per row (reference sparsify semantics:
    top-k by value then re-sort by term id, sparse_index.py:144-158).
    No-op when every row is already within the cap."""
    offs = terms.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offs)
    if lens.size == 0 or lens.max() <= k:
        return terms, tfs
    term_vals = np.asarray(terms.values.to_pylist(), dtype=object)
    tf_vals = tfs.values.to_numpy(zero_copy_only=False)
    keep_terms, keep_tfs, new_lens = [], [], np.empty(lens.size, np.int64)
    for i in range(lens.size):
        s, e = offs[i], offs[i + 1]
        if e - s <= k:
            sel = np.arange(s, e)
        else:
            seg_tf = tf_vals[s:e]
            # top-k by (tf desc, term asc) then re-sort ascending by term
            part = np.lexsort((np.arange(e - s), -seg_tf))[:k]
            sel = s + np.sort(part)
        keep_terms.append(term_vals[sel])
        keep_tfs.append(tf_vals[sel])
        new_lens[i] = sel.size
    new_offs = np.zeros(lens.size + 1, dtype=np.int32)
    np.cumsum(new_lens, out=new_offs[1:])
    return (
        pa.ListArray.from_arrays(pa.array(new_offs), pa.array(np.concatenate(keep_terms), type=pa.string())),
        pa.ListArray.from_arrays(pa.array(new_offs), pa.array(np.concatenate(keep_tfs).astype(np.int32))),
    )


class EncodeStage:
    """map_batches(pyarrow) actor: corpus rows (bucket, local_idx, url,
    text, …) → (doc_id, url, dl, terms, tfs).

    ``offsets_ref`` is a ``ray.put`` handle to the per-bucket exclusive
    prefix sums — broadcast once, read per actor (not re-shipped per batch).
    """

    def __init__(self, cfg: EngineConfig, offsets_ref):
        self.cfg = cfg
        self.tok = Tokenizer(cfg)
        offsets = ray.get(offsets_ref) if isinstance(offsets_ref, ray.ObjectRef) else offsets_ref
        self.offsets = np.asarray(offsets, dtype=np.int64)  # indexed by bucket

    def __call__(self, batch: pa.Table) -> pa.Table:
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        local_idx = batch.column("local_idx").to_numpy(zero_copy_only=False)
        doc_id = self.offsets[buckets] + local_idx
        texts = batch.column("text").to_pylist()
        terms, tfs, dls = term_count_table(texts, self.tok)
        terms, tfs = apply_top_k_cap(terms, tfs, self.cfg.doc_top_k)
        return pa.table(
            {
                "doc_id": pa.array(doc_id),
                "url": batch.column("url"),
                "dl": pa.array(dls),
                "terms": terms,
                "tfs": tfs,
            }
        )
