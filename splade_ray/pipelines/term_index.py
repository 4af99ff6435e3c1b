"""Term-partitioned posting build — the groupby(term) shuffle with
skew-aware salting (north-star layout; alternate to the doc-sharded build).

The doc-sharded layout (stages/postings.py) bounds head-term posting lists
by construction and is the default.  This module implements the classic
term-major layout the reference's single-node CSC corresponds to
(``/root/reference/src/indexing/sparse_index.py:591-658`` — one posting
list per term over the whole corpus), distributed:

1. explode doc_terms → one (term_id, salt, doc_id, tf) row per posting —
   the wide exchange doc-sharding avoids, done here deliberately;
2. **salting**: salt = hash(doc_id) % S(term) where S(term) =
   ceil(df / salt_block_postings) from the df table (A1) — head terms
   (stopwords, df ≈ N) split into up to ``max_salts`` groups so no reducer
   receives an unbounded group; tail terms keep S=1 (no overhead);
3. ``groupby(term_id, salt)`` → per-group kernel sorts by doc id and
   emits one compressed run (delta+varint doc ids, varint tfs, min/max doc
   + count metadata);
4. a term's full posting list is the k-way merge of its salted runs —
   the scorer accumulates runs directly (score order is irrelevant for
   Σ qw·w), so no merge materialization is needed.

Query scoring over this layout is rank-identical to the doc-sharded
reader (tested) — same BM25 weights, same (-score, doc_id) tie-break.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..codec import binary_concat, varint_decode, varint_encode
from ..config import EngineConfig, DEFAULT_CONFIG
from ..functions.hashing import splitmix64
from ..oracle import bm25_idf
from ..state.lineage import atomic_write_json, read_json
from ..tokenizer import Tokenizer


def _salt_counts(df: np.ndarray, cfg_block: int, max_salts: int) -> np.ndarray:
    return np.clip((df + cfg_block - 1) // cfg_block, 1, max_salts).astype(np.int64)


def explode_postings(batch: pa.Table, *, salts_ref) -> pa.Table:
    """doc_terms rows → (term_id, salt, doc_id, tf) posting rows."""
    from ..stages.encode import cached_ref

    salts = cached_ref(salts_ref)  # int64[vocab]
    tids_list = batch.column("tids").combine_chunks()
    tids = tids_list.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    tfs = batch.column("tfs").combine_chunks().flatten().to_numpy(zero_copy_only=False)
    lens = tids_list.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    doc_id = np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), lens)
    with np.errstate(over="ignore"):
        salt = (splitmix64(doc_id.astype(np.uint64)) % salts[tids].astype(np.uint64)).astype(np.int32)
    return pa.table(
        {
            "term_id": pa.array(tids.astype(np.int32)),
            "salt": pa.array(salt),
            # int64: global doc ids — this layout is the 10^12-doc design
            # point, int32 would wrap silently past 2^31 docs
            "doc_id": pa.array(doc_id.astype(np.int64)),
            "tf": pa.array(tfs.astype(np.int32)),
        }
    )


_RUN_SCHEMA = pa.schema(
    [
        ("term_id", pa.int32()),
        ("salt", pa.int32()),
        ("df", pa.int64()),
        ("min_doc", pa.int64()),
        ("max_doc", pa.int64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
    ]
)

_RUN_BUCKETS = 1024


def _run_bucket(batch: pa.Table, nbuckets: int = _RUN_BUCKETS) -> pa.Table:
    t = batch.column("term_id").to_numpy(zero_copy_only=False).astype(np.uint64)
    s = batch.column("salt").to_numpy(zero_copy_only=False).astype(np.uint64)
    b = (splitmix64(t ^ splitmix64(s)) % np.uint64(nbuckets)).astype(np.int32)
    return batch.append_column("run_bucket", pa.array(b))


def build_runs_in_bucket(group: pa.Table) -> pa.Table:
    """map_groups kernel for a COARSE run bucket: every (term_id, salt)
    run in the bucket, segmented with one lexsort.  A groupby keyed on
    (term_id, salt) itself would finalize vocab × salts groups in Python
    (the pathology the near-dup pipelines hit at pair scale); here Python
    runs once per OUTPUT run row only, for the varint encode."""
    if group.num_rows == 0:
        return _RUN_SCHEMA.empty_table()
    tid = group.column("term_id").to_numpy(zero_copy_only=False)
    salt = group.column("salt").to_numpy(zero_copy_only=False)
    doc = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    tf = group.column("tf").to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((doc, salt, tid))
    tid, salt, doc, tf = tid[order], salt[order], doc[order], tf[order]
    bounds = np.r_[0, np.nonzero((np.diff(tid) != 0) | (np.diff(salt) != 0))[0] + 1, np.int64(tid.size)]
    starts, ends = bounds[:-1], bounds[1:]
    # first delta of each run is 0 relative to min_doc (stored as int64 in
    # the run row) — absolute ids never enter the varint, so the 2^35
    # varint cap bounds RUN WIDTH, not corpus size
    deltas = np.zeros(doc.size, dtype=np.uint64)
    if doc.size > 1:
        np.subtract(doc[1:], doc[:-1], out=deltas[1:].view(np.int64), casting="unsafe")
    deltas[starts] = 0
    docs_bin = [varint_encode(deltas[s:e]) for s, e in zip(starts, ends)]
    tfs_bin = [varint_encode(tf[s:e]) for s, e in zip(starts, ends)]
    return pa.table(
        {
            "term_id": pa.array(tid[starts].astype(np.int32)),
            "salt": pa.array(salt[starts].astype(np.int32)),
            "df": pa.array((ends - starts).astype(np.int64)),
            "min_doc": pa.array(doc[starts]),
            "max_doc": pa.array(doc[ends - 1]),
            "docs": pa.array(docs_bin, type=pa.binary()),
            "tfs": pa.array(tfs_bin, type=pa.binary()),
        }
    )


def build_term_index(
    doc_terms_dir: str,
    stats_dir: str,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    salt_block_postings: int = 65536,
    max_salts: int = 32,
) -> dict:
    """Term-major index from an existing doc_terms + stats build (BM25
    mode).  Requires doc_terms with resolved doc ids (broadcast dedup)."""
    vocab = pq.read_table(os.path.join(stats_dir, "vocab.parquet"))
    meta = read_json(os.path.join(stats_dir, "meta.json"))
    terms = np.asarray(vocab.column("term").to_pylist(), dtype=object)
    df = vocab.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
    salts = _salt_counts(df, salt_block_postings, max_salts)
    salts_ref = ray.put(salts)
    vocab_ref = ray.put(terms)

    from ..stages.postings import map_term_ids

    import shutil

    os.makedirs(out_dir, exist_ok=True)
    # write_parquet appends; clear any half-written runs from a prior crash
    shutil.rmtree(os.path.join(out_dir, "runs"), ignore_errors=True)
    (
        ray.data.read_parquet(doc_terms_dir)
        .map_batches(
            map_term_ids,
            fn_kwargs={"cfg": cfg, "vocab_terms_ref": vocab_ref, "offsets_ref": None},
            batch_format="pyarrow",
            batch_size=cfg.read_batch_size,
        )
        .map_batches(explode_postings, fn_kwargs={"salts_ref": salts_ref}, batch_format="pyarrow")
        .map_batches(_run_bucket, batch_format="pyarrow")
        .groupby("run_bucket")
        .map_groups(build_runs_in_bucket, batch_format="pyarrow")
        .write_parquet(os.path.join(out_dir, "runs"))
    )
    summary = {
        "n_docs": meta["n_docs"],
        "avgdl": meta["avgdl"],
        "nnz": meta["nnz"],
        "max_salts": int(salts.max()),
        "salted_terms": int((salts > 1).sum()),
        "layout": "term-major-salted",
        # bump when the run encoding changes (2: first delta relative to
        # min_doc) so cached builds in older formats rebuild
        "format": 2,
    }
    atomic_write_json(os.path.join(out_dir, "_MANIFEST.json"), summary)
    return summary


class TermIndexReader:
    """Query-side reader over the salted term-major layout.

    Load decodes EVERY run in two vectorized passes (concatenated varint
    buffers, segment-reset cumsum for absolute doc ids — same pattern as
    the doc-sharded ShardIndex load) and ``set_doc_lengths`` precomputes
    float64 BM25 weights per posting.  Query scoring gathers the query
    terms' posting slices and accumulates with unique+bincount over the
    CANDIDATE docs only — no dense score vector over the global corpus, so
    the reader stays partition-scoped at 10^12-doc scale (each reader
    instance serves whatever runs live in its partition).  Exhaustive
    scoring only — rank-identical to the doc-sharded reader (tested)."""

    def __init__(
        self,
        term_index_dir: str,
        stats_dir: str,
        cfg: EngineConfig | None = None,
        term_range: tuple[int, int] | None = None,
    ):
        """``term_range=(lo, hi)``: load only the runs with lo <= term_id
        < hi — the term-PARTITIONED deployment, where each node owns a
        term-id range and a query fans out to the owners of its terms
        (see :func:`search_term_partitioned`)."""
        self.cfg = cfg or DEFAULT_CONFIG
        meta = read_json(os.path.join(term_index_dir, "_MANIFEST.json"))
        self.n_docs, self.avgdl = meta["n_docs"], meta["avgdl"]
        vocab = pq.read_table(os.path.join(stats_dir, "vocab.parquet"))
        self.vocab_index = pd.Index(vocab.column("term").to_pylist())
        self.df = vocab.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        runs = pq.read_table(os.path.join(term_index_dir, "runs"))
        if term_range is not None:
            lo, hi = term_range
            tid_col = runs.column("term_id")
            keep = pa.compute.and_(
                pa.compute.greater_equal(tid_col, pa.scalar(lo)), pa.compute.less(tid_col, pa.scalar(hi))
            )
            runs = runs.filter(keep)
        order = pa.compute.sort_indices(
            runs, sort_keys=[("term_id", "ascending"), ("salt", "ascending")]
        )
        runs = runs.take(order)
        run_tids = runs.column("term_id").to_numpy(zero_copy_only=False).astype(np.int64)
        run_df = runs.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        run_min = runs.column("min_doc").to_numpy(zero_copy_only=False).astype(np.int64)
        run_ptr = np.zeros(run_df.size + 1, dtype=np.int64)
        np.cumsum(run_df, out=run_ptr[1:])
        nnz = int(run_ptr[-1])
        # decode all runs at once: deltas are run-relative, so rebase each
        # run's cumsum by subtracting the cumsum just before its start and
        # adding its min_doc
        deltas = varint_decode(binary_concat(runs.column("docs").combine_chunks()), nnz).astype(np.int64)
        csum = np.cumsum(deltas)
        starts = run_ptr[:-1]
        if nnz:
            prior = np.where(starts > 0, csum[np.maximum(starts - 1, 0)], 0)
            self.post_doc = csum - np.repeat(prior, run_df) + np.repeat(run_min, run_df)
        else:
            self.post_doc = np.zeros(0, np.int64)
        self._tf = varint_decode(binary_concat(runs.column("tfs").combine_chunks()), nnz).astype(np.float64)
        # postings grouped by term: runs are term-sorted, so per-term slices
        # come from the first run of each distinct term
        change = np.ones(run_tids.size, dtype=bool)
        change[1:] = run_tids[1:] != run_tids[:-1]
        first_run = np.nonzero(change)[0]
        self.term_ids = run_tids[first_run]
        self.term_ptr = np.append(run_ptr[first_run], nnz)
        self._post_df = self.df[np.repeat(self.term_ids, np.diff(self.term_ptr))]
        self.post_w: np.ndarray | None = None
        self.tok = Tokenizer(self.cfg)

    def set_doc_lengths(self, dl: np.ndarray):
        """Precompute float64 BM25 weights per posting (identical formula
        to ShardIndex/oracle) — queries then only gather and accumulate."""
        cfg = self.cfg
        dlf = dl.astype(np.float64)
        idf = bm25_idf(self._post_df.astype(np.float64), self.n_docs)
        tf = self._tf
        self.post_w = idf * tf * (cfg.k1 + 1.0) / (
            tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dlf[self.post_doc] / self.avgdl)
        )

    def score_partial(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """(candidate doc ids, PARTIAL scores) from the runs THIS reader
        holds — the per-partition contribution of a term-partitioned
        deployment.  Score order is irrelevant for Σ qw·w, so partials from
        disjoint term ranges sum exactly to the full score."""
        assert self.post_w is not None, "call set_doc_lengths first"
        toks = self.tok.tokenize(text)
        if not toks:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        tids = self.vocab_index.get_indexer(uniq)
        known = tids >= 0
        tids, qw = tids[known].astype(np.int64), counts[known].astype(np.float64)
        if tids.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        pos = np.searchsorted(self.term_ids, tids)
        ids_parts, w_parts = [], []
        for i in range(tids.size):
            p = pos[i]
            if p < self.term_ids.size and self.term_ids[p] == tids[i]:
                s, e = self.term_ptr[p], self.term_ptr[p + 1]
                ids_parts.append(self.post_doc[s:e])
                w_parts.append(self.post_w[s:e] * qw[i])
        if not ids_parts:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        ids = np.concatenate(ids_parts)
        cand, inv = np.unique(ids, return_inverse=True)
        return cand, np.bincount(inv, weights=np.concatenate(w_parts))

    def search(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        cand, scores = self.score_partial(text)
        if cand.size == 0:
            return []
        kk = min(k, cand.size)
        order = np.lexsort((cand, -scores))[:kk]
        return [(int(cand[i]), float(scores[i])) for i in order]


def search_term_partitioned(readers: list[TermIndexReader], text: str, k: int = 10) -> list[tuple[int, float]]:
    """Scatter-gather over TERM-partitioned readers (each holding a
    disjoint term-id range): per-partition partial scores sum exactly —
    unlike doc-sharded top-k merge, the gather must ADD contributions for
    the same doc before ranking.  This is the query model of the
    term-major layout on a cluster where each node owns a term range."""
    parts = [r.score_partial(text) for r in readers]
    ids = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0, np.int64)
    if ids.size == 0:
        return []
    sc = np.concatenate([p[1] for p in parts])
    cand, inv = np.unique(ids, return_inverse=True)
    scores = np.bincount(inv, weights=sc)
    kk = min(k, cand.size)
    order = np.lexsort((cand, -scores))[:kk]
    return [(int(cand[i]), float(scores[i])) for i in order]
