"""Doc encoding kernels: text → per-doc sparse term/tf vectors.

This is the engine's BM25 "term-impact encoder" — the CPU analogue of the
reference's SPLADE doc encoder + sparsifier
(``/root/reference/src/model/pl_module/encode.py:182-214`` →
``src/indexing/sparse_index.py:100-190``): per doc it emits the sparse
(terms, tfs) vector sorted by term, capped at ``doc_top_k`` terms
(reference ``sparse_top_k=4096``, ``config/encoding/_base.yaml:26``).  The
Arrow list columns are the CSR representation — list offsets *are* the
indptr (SURVEY.md §1.2).

Called from the fused dedup+encode kernel (stages/dedup.py) as plain
tasks; everything stays Arrow/numpy (tokenization via
``Tokenizer.tokenize_codes`` dictionary codes — zero per-token Python
objects).  The worker-local caches at the bottom back every broadcast
(``ray.put``) consumer in the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..config import EngineConfig
from ..tokenizer import Tokenizer


def _empty_term_table(n: int, dls: np.ndarray) -> tuple[pa.ListArray, pa.ListArray, np.ndarray]:
    empty_off = pa.array(np.zeros(n + 1, dtype=np.int32))
    return (
        pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.string())),
        pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.int32())),
        dls,
    )


def term_count_table(texts, tok: Tokenizer) -> tuple[pa.ListArray, pa.ListArray, np.ndarray]:
    """Vectorized batch term counting → (terms list<string>, tfs
    list<int32>, dl int32[n]).  Terms are sorted ascending within each row.

    Accepts an Arrow string column (preferred — the whole pipeline stays
    Arrow/C++, no per-token Python objects) or a python list of strings.
    """
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        n = len(texts)
    else:
        texts = list(texts)
        n = len(texts)
    enc = tok.tokenize_codes(texts)
    if enc is None:  # non-invertible pattern: python fallback
        flat_list, dls32 = tok.tokenize_flat(texts if isinstance(texts, list) else texts.to_pylist())
        flat = np.asarray(flat_list, dtype=object)
        if flat.size == 0:
            return _empty_term_table(n, dls32.astype(np.int64))
        codes, uniques = pd.factorize(flat, sort=True)
        rows = np.repeat(np.arange(n, dtype=np.int64), dls32.astype(np.int64))
        vocab = pa.array(np.asarray(uniques, dtype=object), type=pa.string())
        # codes from factorize(sort=True) are already lexicographic ranks
        dls = dls32.astype(np.int64)
        sorted_vocab = vocab
    else:
        codes, rows, vocab, dls = enc
        if codes.size == 0:
            return _empty_term_table(n, dls)
        # lexicographic rank per dictionary code (dictionary is in
        # first-appearance order; ranking restores sorted-term layout)
        sort_idx = pa.compute.array_sort_indices(vocab).to_numpy(zero_copy_only=False).astype(np.int64)
        rank = np.empty(len(vocab), dtype=np.int64)
        rank[sort_idx] = np.arange(len(vocab), dtype=np.int64)
        sorted_vocab = vocab.take(pa.array(sort_idx))
        codes = rank[codes]

    V = max(len(vocab), 1)
    key = rows * np.int64(V) + codes
    uniq_keys, tf = np.unique(key, return_counts=True)
    out_rows = (uniq_keys // V).astype(np.int64)
    out_codes = (uniq_keys % V).astype(np.int64)
    per_row = np.bincount(out_rows, minlength=n).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(per_row, out=offsets[1:])
    terms_arr = pa.ListArray.from_arrays(pa.array(offsets), sorted_vocab.take(pa.array(out_codes)))
    tfs_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(tf.astype(np.int32)))
    return terms_arr, tfs_arr, dls


def term_hash_table(texts, tok: Tokenizer, seed: int = 0) -> tuple[pa.ListArray, pa.ListArray, np.ndarray]:
    """Hashed-vocab batch term counting → (tids list<int64>, tfs
    list<int32>, dl int64[n]).  Term id = 63-bit hash of the term (only
    per-batch UNIQUE terms are hashed); tids sorted ascending within each
    row.  No term string survives this function — the vocab_mode="hashed"
    scale path."""
    from ..functions.hashing import hash_strings

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(["" if t is None else t for t in texts], type=pa.string())
    n = len(texts)
    enc = tok.tokenize_codes(texts)
    if enc is None:
        raise NotImplementedError("vocab_mode='hashed' requires an invertible token_pattern")
    codes, rows, vocab, dls = enc
    if codes.size == 0:
        empty_off = pa.array(np.zeros(n + 1, dtype=np.int32))
        return (
            pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.int64())),
            pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.int32())),
            dls,
        )
    vh = (hash_strings(np.asarray(vocab.to_pylist(), dtype=object), seed=seed) >> np.uint64(1)).astype(np.int64)
    # rank codes by hashed id so per-row output is id-sorted (dense ranks
    # keep the (row, code) bincount key small)
    sort_idx = np.argsort(vh, kind="stable")
    rank = np.empty(vh.size, dtype=np.int64)
    rank[sort_idx] = np.arange(vh.size, dtype=np.int64)
    sorted_ids = vh[sort_idx]
    rcodes = rank[codes]
    V = vh.size
    key = rows * np.int64(V) + rcodes
    uniq_keys, tf = np.unique(key, return_counts=True)
    out_rows = (uniq_keys // V).astype(np.int64)
    out_ranks = (uniq_keys % V).astype(np.int64)
    per_row = np.bincount(out_rows, minlength=n).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(per_row, out=offsets[1:])
    tids_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(sorted_ids[out_ranks]))
    tfs_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(tf.astype(np.int32)))
    return tids_arr, tfs_arr, dls


def apply_top_k_cap(terms: pa.ListArray, tfs: pa.ListArray, k: int) -> tuple[pa.ListArray, pa.ListArray]:
    """Keep the k highest-tf terms per row (reference sparsify semantics:
    top-k by value then re-sort by term id, sparse_index.py:144-158).
    No-op when every row is already within the cap.

    Tie-break at the cap boundary: (tf desc, term ID asc) — rows arrive
    id-sorted, so position order IS id order.  NOTE the term ID is
    mode-relative: lexicographic rank under vocab_mode='sorted' but the
    63-bit hash under 'hashed', so a doc exceeding ``doc_top_k`` distinct
    terms with tf ties exactly at the boundary may keep a different term
    set in the two modes.  Each mode is individually deterministic; the
    SQL oracle applies no cap at all, so oracle rank-identity (for either
    mode) additionally assumes no doc hits the cap — true for web pages at
    the reference's doc_top_k=4096."""
    offs = terms.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offs)
    if lens.size == 0 or lens.max() <= k:
        return terms, tfs
    # index-only selection (rows over the cap are rare), then ONE Arrow
    # take — no per-posting Python objects in this hot-path helper
    tf_vals = tfs.values.to_numpy(zero_copy_only=False)
    sels, new_lens = [], np.empty(lens.size, np.int64)
    for i in range(lens.size):
        s, e = int(offs[i]), int(offs[i + 1])
        if e - s <= k:
            sel = np.arange(s, e, dtype=np.int64)
        else:
            seg_tf = tf_vals[s:e]
            # top-k by (tf desc, position asc == term asc) then re-sort
            # ascending by term
            part = np.lexsort((np.arange(e - s), -seg_tf))[:k]
            sel = s + np.sort(part)
        sels.append(sel)
        new_lens[i] = sel.size
    flat_sel = np.concatenate(sels)
    new_offs = np.zeros(lens.size + 1, dtype=np.int32)
    np.cumsum(new_lens, out=new_offs[1:])
    return (
        pa.ListArray.from_arrays(pa.array(new_offs), terms.values.take(pa.array(flat_sel))),
        pa.ListArray.from_arrays(pa.array(new_offs), pa.array(tf_vals[flat_sel].astype(np.int32))),
    )


_TOK_CACHE: dict = {}
_REF_CACHE: dict = {}
_REF_CACHE_MAX = 8  # broadcasts per build are few; bound so long-lived
# workers serving many builds don't pin every historical vocab/winner array


def cached_tokenizer(cfg: EngineConfig) -> Tokenizer:
    # key on EVERY field that changes token output — omitting one silently
    # serves a stale tokenizer to any same-worker build with a different
    # analysis config (found the hard way with analyzer="light_en")
    key = (cfg.token_pattern, cfg.lowercase, cfg.analyzer)
    tok = _TOK_CACHE.get(key)
    if tok is None:
        tok = _TOK_CACHE[key] = Tokenizer(cfg)
    return tok


def cached_ref(ref):
    """Worker-local cache of a broadcast ``ray.put`` object — tasks get the
    plasma object once per worker process, not once per batch.  LRU-bounded
    so repeated builds in one cluster session can't pin stale broadcasts
    forever."""
    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key in _REF_CACHE:
        _REF_CACHE[key] = _REF_CACHE.pop(key)  # refresh LRU position
        return _REF_CACHE[key]
    while len(_REF_CACHE) >= _REF_CACHE_MAX:
        _REF_CACHE.pop(next(iter(_REF_CACHE)))
    _REF_CACHE[key] = ray.get(ref)
    return _REF_CACHE[key]
