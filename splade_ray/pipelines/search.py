"""Query path: BM25 top-k over the document-sharded inverted index.

Reference analogue: ``score_query_postings`` — numba exhaustive accumulate
over postings + top-k (``/root/reference/src/indexing/sparse_index.py:
661-755``), queries encoded as bag-of-words counts (doc-only mode,
``src/model/retriever/sparse/neural/splade.py:243-265``).

Engine kernels (per shard, all numpy-vectorized):

- **exhaustive**: one ``np.bincount(local_ids, weights=qw·w)`` over the
  concatenated postings of the query's terms — the vectorized equivalent of
  the reference's accumulate loop — then top-k with the deterministic
  ``(-score, doc_id)`` tie-break.
- **block-max pruned** (``method="wand"``): zone-at-a-time dynamic pruning
  with per-(term, doc-zone) max impacts; safe pruning (identical top-k,
  asserted in tests) with every step a numpy kernel.  The scale/latency
  path; the exhaustive kernel is the small-shard throughput path.

Distribution: doc shards are disjoint, so per-shard exact top-k merge is
globally exact (scatter-gather).  Two deployments:

- :class:`SearcherStage` — a ``map_batches`` actor pool where each actor
  holds the full (small) index: embarrassingly parallel over query batches;
  the single-node bench path.
- :class:`ShardedSearcher` — one ``@ray.remote`` scorer actor per shard
  pinning its partition (reference T5 pattern: mmap'd postings + reusable
  buffers, ``src/model/pl_module/retrieval.py:146-162``); the multi-node
  path where no node holds the whole index.
"""

from __future__ import annotations

import dataclasses
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..codec import binary_concat as _binary_concat, varint_decode
from ..config import EngineConfig, DEFAULT_CONFIG
from ..oracle import bm25_idf
from ..state.lineage import read_json
from ..tokenizer import Tokenizer




class ShardIndex:
    """One shard's postings, decompressed into CSC numpy arrays at load
    (reference InvertedIndex shape, sparse_index.py:207-215, but per-shard).

    Two weight modes, detected from the postings schema: ``tfs`` (varint
    term frequencies → BM25 impacts computed at load) or ``weights`` (raw
    float32 neural impacts stored as-is)."""

    def __init__(
        self,
        postings_path: str,
        docs_path: str,
        df_global: np.ndarray | None,
        n_docs: int,
        avgdl: float,
        cfg: EngineConfig,
        cf_global=None,
        sum_dl: int | None = None,
    ):
        self.cfg = cfg
        post = pq.read_table(postings_path)
        docs = pq.read_table(docs_path)
        self.doc_ids = docs.column("doc_id").to_numpy(zero_copy_only=False)
        # urls stay an Arrow StringArray: zero Python strings at load —
        # only the k returned hits per query ever materialize a str
        self.urls = docs.column("url").combine_chunks()
        self.dl = docs.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        self.n_local = len(self.doc_ids)
        if "fwd" in docs.column_names:
            # forward md5 token-hash streams (store_forward builds): one
            # flat u64 array; per-doc extents come from dl, which is the
            # exact token count of the same tokenization pass
            raw = _binary_concat(docs.column("fwd").combine_chunks())
            self.fwd_stream = np.frombuffer(raw, dtype=np.uint64)
            self.fwd_ptr = np.zeros(self.n_local + 1, dtype=np.int64)
            np.cumsum(self.dl.astype(np.int64), out=self.fwd_ptr[1:])
            assert self.fwd_ptr[-1] == self.fwd_stream.size, "fwd stream / dl mismatch"
        else:
            self.fwd_stream = None
            self.fwd_ptr = None

        self.term_ids = post.column("term_id").to_numpy(zero_copy_only=False)
        seg_lens = post.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        self.term_ptr = np.zeros(seg_lens.size + 1, dtype=np.int64)
        np.cumsum(seg_lens, out=self.term_ptr[1:])
        nnz = int(self.term_ptr[-1])

        # decode whole columns in two vectorized passes (the buffers are
        # concatenations of the per-term varint segments, value-aligned)
        deltas = varint_decode(_binary_concat(post.column("docs").combine_chunks()), nnz).astype(np.int64)
        csum = np.cumsum(deltas)
        seg_starts = self.term_ptr[:-1]
        if nnz:
            # per-segment absolute ids: csum minus the cumsum just before
            # each segment start (delta at a segment start is absolute)
            prior = np.where(seg_starts > 0, csum[np.maximum(seg_starts - 1, 0)], 0)
            self.post_local = csum - np.repeat(prior, seg_lens)
        else:
            self.post_local = np.zeros(0, np.int64)
        if cfg.scoring in ("lm_dirichlet", "lm_jm", "classic", "dfr_inl2", "ib_ll") and "tfs" not in post.column_names:
            raise ValueError(f"{cfg.scoring} scoring needs raw-tf postings (weight_mode='tf')")
        self.avgdl = float(avgdl)
        self.post_tf: np.ndarray | None = None
        if "tfs" in post.column_names:
            tf = varint_decode(_binary_concat(post.column("tfs").combine_chunks()), nnz).astype(np.float64)
            # raw tf kept (uint32, ¼ the weight array) — synonym scoring
            # blends tf ACROSS terms before saturation, which the
            # precomputed per-term impacts can't express
            self.post_tf = tf.astype(np.uint32)
            # precompute float64 BM25 weights (identical formula to the
            # oracle).  df_global: dense array indexed by tid (sorted
            # vocab) or (sorted_tids, df) for hashed-vocab term ids.
            if cfg.scoring in ("lm_dirichlet", "lm_jm"):
                # Language-model query likelihood over the SAME stored
                # raw-tf postings (the Lucene Similarity seam).
                # lm_dirichlet: w = max(0, ln(1 + tf·T/(mu·cf)) +
                #   ln(mu/(dl+mu))) — the non-negative clamp keeps every
                #   score-kernel invariant (bincount zero == unmatched).
                # lm_jm: w = ln(1 + (1-λ)·tf·T / (λ·cf·dl)) — positive for
                #   every stored posting (tf ≥ 1), so no clamp is needed.
                if cf_global is None or sum_dl is None:
                    raise ValueError(
                        f"{cfg.scoring} needs cf + sum_dl stats — rebuild the "
                        "index (vocab.parquet cf column, meta.json sum_dl)"
                    )
                if isinstance(cf_global, tuple):
                    tid_index, cfv = cf_global
                    cf_of = cfv[np.searchsorted(tid_index, self.term_ids)]
                else:
                    cf_of = cf_global[self.term_ids]
                cf_post = np.repeat(cf_of, seg_lens).astype(np.float64)
                if cfg.scoring == "lm_jm":
                    lam = float(cfg.lam)
                    self.post_w = np.log1p(
                        (1.0 - lam) * tf * float(sum_dl)
                        / (lam * cf_post * self.dl[self.post_local])
                    )
                else:
                    mu = float(cfg.mu)
                    w = np.log1p(tf * float(sum_dl) / (mu * cf_post)) + np.log(
                        mu / (self.dl[self.post_local] + mu)
                    )
                    self.post_w = np.maximum(w, 0.0)
            elif cfg.scoring == "classic":
                # Lucene ClassicSimilarity (pre-8.0 TFIDFSimilarity), the
                # third plug on the READ-time Similarity seam:
                # w = sqrt(tf) · idf² / sqrt(dl) with
                # idf = 1 + ln((N+1)/(df+1)).  idf appears SQUARED because
                # Lucene multiplies the query weight (idf·boost) by the
                # doc-side weight (tf_norm·idf·lengthNorm); the lossy
                # byte-encoded norm of historical Lucene is deliberately
                # NOT reproduced (exact 1/sqrt(dl), documented contract).
                if isinstance(df_global, tuple):
                    tid_index, dfv = df_global
                    df_of = dfv[np.searchsorted(tid_index, self.term_ids)]
                else:
                    df_of = df_global[self.term_ids]
                idf_c = 1.0 + np.log(
                    (float(n_docs) + 1.0) / (np.repeat(df_of, seg_lens).astype(np.float64) + 1.0)
                )
                self.post_w = np.sqrt(tf) * idf_c * idf_c / np.sqrt(self.dl[self.post_local])
            elif cfg.scoring == "dfr_inl2":
                # Lucene DFRSimilarity I(n)L2 (BasicModelIn + AfterEffectL +
                # NormalizationH2), the fourth plug on the READ-time seam:
                # tfn = tf·log2(1 + c·avgdl/dl)  (H2 length normalization),
                # inf = tfn·log2((N+1)/(df+0.5)) (I(n) basic model),
                # w = inf/(tfn+1)                 (Laplace after-effect).
                # Positive for every stored posting, so no clamp is needed.
                if isinstance(df_global, tuple):
                    tid_index, dfv = df_global
                    df_of = dfv[np.searchsorted(tid_index, self.term_ids)]
                else:
                    df_of = df_global[self.term_ids]
                tfn = tf * np.log2(1.0 + float(cfg.dfr_c) * avgdl / self.dl[self.post_local])
                inf = tfn * np.log2(
                    (float(n_docs) + 1.0) / (np.repeat(df_of, seg_lens).astype(np.float64) + 0.5)
                )
                self.post_w = inf / (tfn + 1.0)
            elif cfg.scoring == "ib_ll":
                # Lucene IBSimilarity (DistributionLL + LambdaDF +
                # NormalizationH2), the fifth plug on the READ-time seam:
                # tfn = tf·log2(1 + c·avgdl/dl)  (H2, shared with DFR),
                # λ_w = (df+1)/(N+1)             (LambdaDF),
                # w = ln(1 + tfn/λ_w)            (log-logistic -log P).
                # Positive for every stored posting, so no clamp is needed.
                if isinstance(df_global, tuple):
                    tid_index, dfv = df_global
                    df_of = dfv[np.searchsorted(tid_index, self.term_ids)]
                else:
                    df_of = df_global[self.term_ids]
                tfn = tf * np.log2(1.0 + float(cfg.dfr_c) * avgdl / self.dl[self.post_local])
                lam_w = (np.repeat(df_of, seg_lens).astype(np.float64) + 1.0) / (float(n_docs) + 1.0)
                self.post_w = np.log1p(tfn / lam_w)
            else:
                if isinstance(df_global, tuple):
                    tid_index, dfv = df_global
                    df_of = dfv[np.searchsorted(tid_index, self.term_ids)]
                else:
                    df_of = df_global[self.term_ids]
                idf = bm25_idf(np.repeat(df_of, seg_lens).astype(np.float64), n_docs)
                self.post_w = idf * tf * (cfg.k1 + 1.0) / (
                    tf + cfg.k1 * (1.0 - cfg.b + cfg.b * self.dl[self.post_local] / avgdl)
                )
        elif "weights_q8" in post.column_names:
            # quantized impact mode: dequantize uint8 codes (fixed scale)
            raw = _binary_concat(post.column("weights_q8").combine_chunks())
            codes = np.frombuffer(raw, dtype=np.uint8)
            self.post_w = codes.astype(np.float64) * (cfg.q8_scale / 255.0)
        else:
            # neural impact mode: stored weights ARE the impacts
            raw = _binary_concat(post.column("weights").combine_chunks())
            self.post_w = np.frombuffer(raw, dtype=np.float32).astype(np.float64)
        # per-(term, doc-zone) max impacts: CSR over terms, straight off the
        # list columns (list offsets ARE the indptr) — no load-time loops
        zi = post.column("zone_ids").combine_chunks()
        self.zone_ptr = zi.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        self.zone_zid = zi.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        self.zone_max = post.column("zone_maxs").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        self.zone_docs = int(cfg.zone_docs)
        if cfg.scoring in ("lm_dirichlet", "lm_jm", "classic", "dfr_inl2", "ib_ll") and nnz:
            # stored zone maxima are BM25 impacts; re-derive them from the
            # recomputed similarity's weights so block-max WAND stays an
            # exact upper bound.  (term-segment, zone) runs are contiguous — postings
            # within a segment ascend by doc id — so one reduceat suffices.
            # zones are LOCAL doc-index ranges (build side: p_local // zone_docs)
            zid_post = self.post_local // self.zone_docs
            seg_id = np.repeat(np.arange(seg_lens.size), seg_lens)
            newgrp = np.ones(nnz, dtype=bool)
            newgrp[1:] = (zid_post[1:] != zid_post[:-1]) | (seg_id[1:] != seg_id[:-1])
            starts = np.flatnonzero(newgrp)
            assert starts.size == self.zone_zid.size, "zone layout / postings mismatch"
            self.zone_max = np.maximum.reduceat(self.post_w, starts)
        self.deleted_local = np.zeros(0, np.int64)

    def mask_deletes(self, del_urls: pa.Array) -> int:
        """Tombstone semantics (Lucene-style): zero the deleted docs'
        posting weights — they can never score, so every path (exhaustive's
        nonzero filter, WAND's recomputed zone bounds, phrase/near's
        candidate AND) excludes them exactly — while the GLOBAL statistics
        (df/idf/avgdl/n_docs) stay those of the build until a segment merge
        rewrites the index.  Returns the number of local docs deleted."""
        mask = pa.compute.is_in(self.urls, value_set=del_urls)
        local = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
        if local.size == 0:
            return 0
        self.deleted_local = np.union1d(self.deleted_local, local.astype(np.int64))
        hit = np.isin(self.post_local, self.deleted_local)
        self.post_w[hit] = 0.0
        if self.post_tf is not None:
            self.post_tf[hit] = 0
        nnz = self.post_w.size
        if nnz:
            # recompute zone maxima over the zeroed weights (same kernel as
            # the consolidated recompute path) so WAND bounds stay tight
            zone = self.post_local // self.zone_docs
            change = np.zeros(nnz, dtype=bool)
            change[self.term_ptr[:-1][np.diff(self.term_ptr) > 0]] = True
            change[1:] |= np.diff(zone) != 0
            zstarts = np.nonzero(change)[0]
            self.zone_max = np.maximum.reduceat(self.post_w, zstarts)
            self.zone_zid = zone[zstarts]
            self.zone_ptr = np.searchsorted(zstarts, self.term_ptr).astype(np.int64)
        return int(local.size)

    @classmethod
    def consolidated(cls, shards: list["ShardIndex"], cfg: EngineConfig) -> "ShardIndex":
        """Merge several loaded shards (ascending, disjoint doc ranges) into
        one in-memory CSC — the per-node *serving view*.  One stable argsort
        by term re-groups the posting runs (within a term, shard order ==
        ascending doc order, so runs concatenate without a per-posting
        sort); zone bounds are recomputed over consolidated positions.
        Querying one merged view replaces a per-shard Python loop with
        single numpy kernels over the node's whole partition."""
        self = cls.__new__(cls)
        self.cfg = cfg
        self.doc_ids = np.concatenate([s.doc_ids for s in shards])
        self.urls = pa.concat_arrays([s.urls for s in shards])
        self.dl = np.concatenate([s.dl for s in shards])
        self.n_local = int(self.doc_ids.size)
        if all(s.fwd_stream is not None for s in shards):
            self.fwd_stream = np.concatenate([s.fwd_stream for s in shards])
            self.fwd_ptr = np.zeros(self.n_local + 1, dtype=np.int64)
            np.cumsum(self.dl.astype(np.int64), out=self.fwd_ptr[1:])
        else:
            self.fwd_stream = None
            self.fwd_ptr = None
        doc_offs = np.cumsum([0] + [s.n_local for s in shards][:-1])
        self.deleted_local = np.concatenate(
            [s.deleted_local + off for s, off in zip(shards, doc_offs)]
        ).astype(np.int64)

        # merged vocab rows + per-(shard, term) run lengths — all O(nnz
        # posting runs), never a dense (n_shards x n_terms) matrix, so
        # memory stays proportional to the postings themselves even for a
        # wide (hashed-id) vocab
        all_tids = np.unique(np.concatenate([s.term_ids for s in shards]))
        n_terms = all_tids.size
        L_sum = np.zeros(n_terms, dtype=np.int64)
        shard_rows = []
        for s in shards:
            rows = np.searchsorted(all_tids, s.term_ids)
            shard_rows.append(rows)
            L_sum[rows] += np.diff(s.term_ptr)
        self.term_ids = all_tids
        self.term_ptr = np.zeros(n_terms + 1, dtype=np.int64)
        np.cumsum(L_sum, out=self.term_ptr[1:])

        nnz = int(self.term_ptr[-1])
        self.post_local = np.empty(nnz, dtype=np.int64)
        self.post_w = np.empty(nnz, dtype=np.float64)
        self.avgdl = shards[0].avgdl if shards else 0.0
        with_tf = all(s.post_tf is not None for s in shards)
        self.post_tf = np.empty(nnz, dtype=np.uint32) if with_tf else None
        run_off = np.zeros(n_terms, dtype=np.int64)  # filled-so-far per term
        for si, s in enumerate(shards):
            rows = shard_rows[si]
            seg_lens = np.diff(s.term_ptr)
            dest_start = self.term_ptr[rows] + run_off[rows]
            snnz = s.post_local.size
            idx = (
                np.arange(snnz, dtype=np.int64)
                - np.repeat(s.term_ptr[:-1], seg_lens)
                + np.repeat(dest_start, seg_lens)
            )
            self.post_local[idx] = s.post_local + doc_offs[si]
            self.post_w[idx] = s.post_w
            if with_tf:
                self.post_tf[idx] = s.post_tf
            run_off[rows] += seg_lens

        # zone bounds: when every shard's doc offset is zone-aligned
        # (shard_size % zone_docs == 0 — true for full shards), shard zones
        # shift whole and the per-shard zone CSRs scatter-merge directly;
        # otherwise recompute from the merged postings (rare path)
        self.zone_docs = int(cfg.zone_docs)
        aligned = all(o % self.zone_docs == 0 for o in doc_offs)
        if nnz and aligned:
            Z_sum = np.zeros(n_terms, dtype=np.int64)
            for si, s in enumerate(shards):
                Z_sum[shard_rows[si]] += np.diff(s.zone_ptr)
            self.zone_ptr = np.zeros(n_terms + 1, dtype=np.int64)
            np.cumsum(Z_sum, out=self.zone_ptr[1:])
            zn = int(self.zone_ptr[-1])
            self.zone_zid = np.empty(zn, dtype=np.int64)
            self.zone_max = np.empty(zn, dtype=np.float64)
            zrun_off = np.zeros(n_terms, dtype=np.int64)
            for si, s in enumerate(shards):
                rows = shard_rows[si]
                zlens = np.diff(s.zone_ptr)
                dest = self.zone_ptr[rows] + zrun_off[rows]
                sz = s.zone_zid.size
                idx = (
                    np.arange(sz, dtype=np.int64)
                    - np.repeat(s.zone_ptr[:-1], zlens)
                    + np.repeat(dest, zlens)
                )
                self.zone_zid[idx] = s.zone_zid + doc_offs[si] // self.zone_docs
                self.zone_max[idx] = s.zone_max
                zrun_off[rows] += zlens
        elif nnz:
            zone = self.post_local // self.zone_docs
            change = np.zeros(nnz, dtype=bool)
            change[self.term_ptr[:-1][np.diff(self.term_ptr) > 0]] = True
            change[1:] |= np.diff(zone) != 0
            zstarts = np.nonzero(change)[0]
            self.zone_max = np.maximum.reduceat(self.post_w, zstarts)
            self.zone_zid = zone[zstarts]
            self.zone_ptr = np.searchsorted(zstarts, self.term_ptr).astype(np.int64)
        else:
            self.zone_max = np.zeros(0, np.float64)
            self.zone_zid = np.zeros(0, np.int64)
            self.zone_ptr = np.zeros(n_terms + 1, np.int64)
        return self

    def _term_slices(self, qtids: np.ndarray) -> list[tuple[int, int, int, int]]:
        """(query-term position, start, end, term row) for terms present."""
        pos = np.searchsorted(self.term_ids, qtids)
        out = []
        for i, tid in enumerate(qtids):
            p = pos[i]
            if p < self.term_ids.size and self.term_ids[p] == tid:
                out.append((i, int(self.term_ptr[p]), int(self.term_ptr[p + 1]), int(p)))
        return out

    def _topk_from_scores(self, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        nz = np.nonzero(scores)[0]
        if nz.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        kk = min(k, nz.size)
        if nz.size > kk:
            # partition for the kth score, then keep every candidate >= it so
            # the (-score, doc_id) tie-break is exact at the boundary
            part = np.argpartition(-scores[nz], kk - 1)[:kk]
            kth = scores[nz[part]].min()
            cand = nz[scores[nz] >= kth]
        else:
            cand = nz
        order = cand[np.lexsort((cand, -scores[cand]))][:kk]
        return self.doc_ids[order], scores[order]

    def score_exhaustive(
        self, qtids: np.ndarray, qweights: np.ndarray, k: int, allow: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k (global doc ids, float64 scores): one bincount over
        the concatenated postings of the query's terms — the vectorized
        form of the reference's accumulate loop (sparse_index.py:661-686).

        ``allow``: optional local boolean mask (len n_local) — docs outside
        it score 0 and so never reach the top-k (filtered search / the
        Lucene live-docs shape: the filter is checked inside the scorer,
        before top-k selection)."""
        slices = self._term_slices(qtids)
        if not slices:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        ids = np.concatenate([self.post_local[s:e] for _, s, e, _ in slices])
        w = np.concatenate([self.post_w[s:e] * qweights[i] for i, s, e, _ in slices])
        scores = np.bincount(ids, weights=w, minlength=self.n_local)
        if allow is not None:
            scores = np.where(allow, scores, 0.0)
        return self._topk_from_scores(scores, k)

    def score_bool_prefix(
        self, qtids: np.ndarray, qweights: np.ndarray, prefix_tids: np.ndarray, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """``match_bool_prefix`` scoring (ES): the full terms contribute
        their standard BM25 bag; the trailing prefix clause is Lucene's
        default constant-score rewrite — exactly +1.0 for any doc
        containing AT LEAST one term of the expansion, regardless of tf
        or how many expansion terms it holds.  A prefix-only doc still
        matches (score exactly 1.0)."""
        scores = np.zeros(self.n_local, np.float64)
        slices = self._term_slices(qtids)
        if slices:
            ids = np.concatenate([self.post_local[s:e] for _, s, e, _ in slices])
            w = np.concatenate([self.post_w[s:e] * qweights[i] for i, s, e, _ in slices])
            scores = np.bincount(ids, weights=w, minlength=self.n_local)
        p_slices = self._term_slices(prefix_tids)
        if p_slices:
            pids = np.concatenate([self.post_local[s:e] for _, s, e, _ in p_slices])
            hit = np.zeros(self.n_local, bool)
            hit[pids] = True
            scores[hit] += 1.0
        return self._topk_from_scores(scores, k)

    def score_synonyms(
        self, groups: list[np.ndarray], idfs: np.ndarray, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lucene SynonymQuery scoring: each group of synonym term ids acts
        as ONE pseudo-term — per doc its tf is the SUM of the members' tfs,
        saturated once through the BM25 tf norm under the group's blended
        idf (caller passes idf(max df), Lucene's blend).  Needs the raw tf
        sidecar — blending happens BEFORE saturation, which precomputed
        per-term impacts can't express.  Deleted docs' tfs are zeroed by
        mask_deletes, so the nonzero top-k filter stays exact."""
        if self.post_tf is None:
            raise ValueError("synonym scoring needs raw-tf postings (weight_mode='tf')")
        k1, b = float(self.cfg.k1), float(self.cfg.b)
        norm = k1 * (1.0 - b + b * self.dl / self.avgdl)
        scores = np.zeros(self.n_local, dtype=np.float64)
        for tids, idf in zip(groups, idfs):
            slices = self._term_slices(np.asarray(tids, dtype=np.int64))
            if not slices:
                continue
            ids = np.concatenate([self.post_local[s:e] for _, s, e, _ in slices])
            tfv = np.concatenate([self.post_tf[s:e] for _, s, e, _ in slices]).astype(np.float64)
            tfd = np.bincount(ids, weights=tfv, minlength=self.n_local)
            m = tfd > 0
            scores[m] += float(idf) * tfd[m] * (k1 + 1.0) / (tfd[m] + norm[m])
        return self._topk_from_scores(scores, k)

    def score_dismax(
        self, qtids: np.ndarray, qweights: np.ndarray, k: int, tie: float = 0.0
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lucene DisjunctionMaxQuery scoring: per doc, the MAX single-term
        contribution plus ``tie`` × the sum of the others —
        score = max + tie·(sum − max).  One extra maximum.at scatter next
        to the existing bincount; contributions are ≥ 0 (tombstoned
        postings are zeroed), so the zero-initialized max array and the
        nonzero top-k filter stay exact."""
        slices = self._term_slices(qtids)
        if not slices:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        ids = np.concatenate([self.post_local[s:e] for _, s, e, _ in slices])
        w = np.concatenate([self.post_w[s:e] * qweights[i] for i, s, e, _ in slices])
        ssum = np.bincount(ids, weights=w, minlength=self.n_local)
        smax = np.zeros(self.n_local, dtype=np.float64)
        np.maximum.at(smax, ids, w)
        scores = smax + tie * (ssum - smax)
        return self._topk_from_scores(scores, k)

    def score_excluding(
        self, qtids: np.ndarray, qweights: np.ndarray, k: int, ex_tids: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k with a must_not clause (Lucene BooleanQuery MUST_NOT):
        docs carrying ANY excluded term are masked out of the score vector
        before selection.  The exclusion set comes from the shard's OWN
        postings — one concatenated-postings unique, no doc attribute or
        driver-side set needed — and never affects surviving docs' scores."""
        slices = self._term_slices(qtids)
        if not slices:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        ids = np.concatenate([self.post_local[s:e] for _, s, e, _ in slices])
        w = np.concatenate([self.post_w[s:e] * qweights[i] for i, s, e, _ in slices])
        scores = np.bincount(ids, weights=w, minlength=self.n_local)
        ex = self._term_slices(ex_tids)
        if ex:
            ex_ids = np.unique(np.concatenate([self.post_local[s:e] for _, s, e, _ in ex]))
            scores[ex_ids] = 0.0
        return self._topk_from_scores(scores, k)

    def score_after(
        self, qtids: np.ndarray, qweights: np.ndarray, k: int, after_score: float, after_doc: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k strictly AFTER a (score, doc_id) cursor in the
        (-score, doc_id) total order — the deep-pagination kernel
        (Elasticsearch search_after shape): docs at or before the cursor
        are masked out of the score vector before top-k selection, so page
        N+1 never re-materializes pages 1..N on the driver."""
        slices = self._term_slices(qtids)
        if not slices:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        ids = np.concatenate([self.post_local[s:e] for _, s, e, _ in slices])
        w = np.concatenate([self.post_w[s:e] * qweights[i] for i, s, e, _ in slices])
        scores = np.bincount(ids, weights=w, minlength=self.n_local)
        keep = (scores < after_score) | ((scores == after_score) & (self.doc_ids > after_doc))
        scores = np.where(keep, scores, 0.0)
        return self._topk_from_scores(scores, k)

    def phrase_topk(self, qtids: np.ndarray, qweights: np.ndarray, h_seq: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Exact phrase top-k within this shard: boolean-AND candidates
        from the inverted postings, adjacency verified against the forward
        md5 streams (one vectorized window-compare over the candidates'
        streams only), BM25-scored over the phrase bag.

        ``qtids``/``qweights`` are the phrase's UNIQUE term ids + counts;
        ``h_seq`` the md5 hash of each phrase token in order."""
        matched = self._phrase_match_locals(qtids, h_seq)
        if matched.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        return self._restricted_bag_topk(self._term_slices(qtids), qweights, matched, k)

    def _phrase_match_locals(self, qtids: np.ndarray, h_seq: np.ndarray) -> np.ndarray:
        """Local ids of docs whose forward stream holds the phrase tokens
        CONSECUTIVELY: boolean-AND candidates from the postings, then one
        vectorized window-compare over the candidates' md5 streams.  The
        matching half of :meth:`phrase_topk`, shared with the
        query_string composer."""
        if self.fwd_stream is None:
            raise ValueError("phrase search requires an index built with store_forward=True")
        slices = self._term_slices(qtids)
        if len(slices) < qtids.size:  # a phrase term has no postings here
            return np.zeros(0, np.int64)
        cand = self._and_candidates(slices, qtids.size)
        if cand.size == 0:
            return cand
        # windows of length m over each candidate's stream, all at once
        m = h_seq.size
        starts, cidx = self._candidate_windows(cand, m)
        if starts.size == 0:
            return np.zeros(0, np.int64)
        ok = self.fwd_stream[starts] == h_seq[0]
        for j in range(1, m):
            if not ok.any():
                break
            ok &= self.fwd_stream[starts + j] == h_seq[j]
        return cand[np.unique(cidx[ok])]

    def phrase_prefix_topk(
        self,
        variants: list[tuple[np.ndarray, np.ndarray]],
        head_tids: np.ndarray,
        head_qw: np.ndarray,
        k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """match_phrase_prefix within this shard: a doc matches when ANY
        expansion variant (head tokens + one expansion term) occurs
        consecutively; matched docs rank by the BM25 bag score of the HEAD
        terms (the deterministic scoring contract the SQL oracle replays).
        ``variants`` = (unique term ids, md5 sequence) per expansion."""
        mask = np.zeros(self.n_local, dtype=bool)
        for qtids, h_seq in variants:
            mask[self._phrase_match_locals(qtids, h_seq)] = True
        matched = np.flatnonzero(mask)
        if matched.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        return self._restricted_bag_topk(self._term_slices(head_tids), head_qw, matched, k)

    def _qs_clause(self, c: dict) -> tuple[np.ndarray, np.ndarray]:
        """(score vector, match mask) over local docs for ONE query_string
        clause.  Term clauses match when the doc holds ALL the clause's
        tokens (single-token clauses: tf > 0); phrase clauses additionally
        verify consecutiveness against the forward streams.  The vector is
        the BM25 bag score of the clause's terms, zeroed outside the mask
        (Lucene: a clause scores only where it matches)."""
        qtids, qw = c["qtids"], c["qw"]
        slices = self._term_slices(qtids)
        vec = np.zeros(self.n_local, dtype=np.float64)
        if slices:
            ids = np.concatenate([self.post_local[s:e] for _, s, e, _ in slices])
            w = np.concatenate([self.post_w[s:e] * qw[i] for i, s, e, _ in slices])
            vec = np.bincount(ids, weights=w, minlength=self.n_local).astype(np.float64)
        if c.get("h_seq") is not None:
            mask = np.zeros(self.n_local, dtype=bool)
            mask[self._phrase_match_locals(qtids, c["h_seq"])] = True
        elif qtids.size <= 1:
            mask = vec > 0.0
        else:  # multi-token bare clause: conjunctive bag over its tokens
            mask = np.zeros(self.n_local, dtype=bool)
            if len(slices) == qtids.size:
                mask[self._and_candidates(slices, qtids.size)] = True
        return np.where(mask, vec, 0.0), mask

    def score_query_string(self, spec: list[dict], k: int) -> tuple[np.ndarray, np.ndarray]:
        """Lucene ``query_string`` composition over this shard: MUST /
        SHOULD / MUST_NOT clauses of term and phrase kind with per-clause
        boosts.  Match set = AND of must masks (when musts exist, shoulds
        are optional — the Lucene BooleanQuery contract) else OR of should
        masks; must_not masks subtract and never score.  Score = Σ
        boost·clause_bm25 over the must+should clauses the doc matches."""
        scores = np.zeros(self.n_local, dtype=np.float64)
        must: np.ndarray | None = None
        should = np.zeros(self.n_local, dtype=bool)
        has_should = False
        excl = np.zeros(self.n_local, dtype=bool)
        for c in spec:
            if c["role"] == "not":
                excl |= self._qs_clause(c)[1]
                continue
            vec, mask = self._qs_clause(c)
            scores += vec * float(c["boost"])
            if c["role"] == "must":
                must = mask if must is None else (must & mask)
            else:
                has_should = True
                should |= mask
        if must is not None:
            allow = must
        elif has_should:
            allow = should
        else:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        if excl.any():
            allow = allow & ~excl
        return self._topk_from_scores(np.where(allow, scores, 0.0), k)

    def _and_candidates(self, slices, n_terms: int) -> np.ndarray:
        """Local ids of docs holding ALL ``n_terms`` query terms (per-term
        posting locals are distinct, so a full AND hit accumulates exactly
        n_terms)."""
        cnt = np.zeros(self.n_local, dtype=np.int64)
        for _i, s, e, _p in slices:
            cnt[self.post_local[s:e]] += 1
        if self.deleted_local.size:
            cnt[self.deleted_local] = 0  # tombstoned docs never match
        return np.flatnonzero(cnt == n_terms)

    def _candidate_windows(self, cand: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
        """(global stream positions of every length-``m`` window start in the
        candidates' streams, owning candidate row) — one flat gather."""
        lens = self.fwd_ptr[cand + 1] - self.fwd_ptr[cand]
        nwin = np.maximum(lens - m + 1, 0)
        tot = int(nwin.sum())
        if tot == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        csum = np.cumsum(nwin)
        starts = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(csum - nwin, nwin)
            + np.repeat(self.fwd_ptr[cand], nwin)
        )
        return starts, np.repeat(np.arange(cand.size, dtype=np.int64), nwin)

    def _restricted_bag_topk(self, slices, qweights: np.ndarray, matched: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """BM25 bag score over the query terms, restricted to ``matched``
        local docs; (-score, doc) tie-break."""
        if matched.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        ids = np.concatenate([self.post_local[s:e] for _, s, e, _ in slices])
        w = np.concatenate([self.post_w[s:e] * qweights[i] for i, s, e, _ in slices])
        scores = np.bincount(ids, weights=w, minlength=self.n_local)
        mscores = scores[matched]
        kk = min(k, matched.size)
        order = np.lexsort((matched, -mscores))[:kk]
        return self.doc_ids[matched[order]], mscores[order]

    def near_topk(self, qtids: np.ndarray, qweights: np.ndarray, h_a: int, h_b: int, window: int, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Proximity (NEAR) top-k: docs where tokens ``h_a`` and ``h_b``
        (md5 hashes, distinct) occur within ``window`` token positions of
        each other, BM25-bag-ranked.  The minimal |i-j| between two label
        sets is always achieved by an adjacent pair in merged position
        order, so the verify is one diff over the candidates' merged
        occurrence lists."""
        if self.fwd_stream is None:
            raise ValueError("near search requires an index built with store_forward=True")
        slices = self._term_slices(qtids)
        if len(slices) < qtids.size:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        cand = self._and_candidates(slices, qtids.size)
        if cand.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        pos, cidx = self._candidate_windows(cand, 1)  # every token position
        tok = self.fwd_stream[pos]
        keep = (tok == np.uint64(h_a)) | (tok == np.uint64(h_b))
        pos, cidx, tok = pos[keep], cidx[keep], tok[keep]
        if pos.size < 2:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        # pos ascends within each candidate by construction
        same = cidx[1:] == cidx[:-1]
        cross = tok[1:] != tok[:-1]
        near = same & cross & (pos[1:] - pos[:-1] <= window)
        matched = cand[np.unique(cidx[:-1][near])]
        return self._restricted_bag_topk(slices, qweights, matched, k)

    def sloppy_topk(
        self,
        qtids: np.ndarray,
        h_a: int,
        h_b: int,
        slop: int,
        k: int,
        idf_sum: float,
        avgdl: float,
        k1: float,
        b: float,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Sloppy-phrase top-k (the Lucene ``SloppyPhraseScorer`` shape
        for a two-term phrase): matches are ORDERED position pairs
        (p_a < p_b ≤ p_a + slop + 1); the phrase frequency weights each
        match by 1/(p_b − p_a) — closer pairs contribute more — and the
        doc scores with one BM25 saturation of that weighted frequency:
        ``(idf_a + idf_b) · sf·(k1+1)/(sf + k1·((1−b)+b·dl/avgdl))``.

        Vectorized: the AND-candidates' merged occurrence stream splits
        into the a/b position lists, two ``searchsorted`` probes bound
        each a-occurrence's admissible b-window, pairs expand by
        repeat+arange, and a candidate-equality mask kills pairs that
        would cross a doc boundary (global stream positions are close
        across adjacent docs)."""
        if self.fwd_stream is None:
            raise ValueError("sloppy search requires an index built with store_forward=True")
        slices = self._term_slices(qtids)
        if len(slices) < qtids.size:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        cand = self._and_candidates(slices, qtids.size)
        if cand.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        pos, cidx = self._candidate_windows(cand, 1)  # every token position
        tok = self.fwd_stream[pos]
        am = tok == np.uint64(h_a)
        bm = tok == np.uint64(h_b)
        apos, acid = pos[am], cidx[am]
        bpos, bcid = pos[bm], cidx[bm]
        if apos.size == 0 or bpos.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        # bpos ascends globally (stream order), so window probes are global
        lo = np.searchsorted(bpos, apos, side="right")
        hi = np.searchsorted(bpos, apos + np.int64(slop + 1), side="right")
        cnt = hi - lo
        tot = int(cnt.sum())
        if tot == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        rep_a = np.repeat(np.arange(apos.size), cnt)
        excl = np.r_[0, np.cumsum(cnt)[:-1]]
        flat_b = np.repeat(lo, cnt) + (np.arange(tot) - np.repeat(excl, cnt))
        ok = bcid[flat_b] == acid[rep_a]  # no cross-doc pairs
        rep_a, flat_b = rep_a[ok], flat_b[ok]
        if rep_a.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        dist = (bpos[flat_b] - apos[rep_a]).astype(np.float64)
        sf = np.zeros(cand.size, dtype=np.float64)
        np.add.at(sf, acid[rep_a], 1.0 / dist)
        matched = np.flatnonzero(sf > 0)
        norm = (1.0 - b) + b * self.dl[cand[matched]] / avgdl
        sfm = sf[matched]
        scores = idf_sum * sfm * (k1 + 1.0) / (sfm + k1 * norm)
        kk = min(k, matched.size)
        local = cand[matched]
        order = np.lexsort((local, -scores))[:kk]
        return self.doc_ids[local[order]], scores[order]

    def span_near_topk(
        self, qtids: np.ndarray, qweights: np.ndarray, h_seq: np.ndarray, slop: int, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Ordered span-near top-k (Lucene ``SpanNearQuery(inOrder=true,
        slop)``, reference query surface: sparse retrieval only — this is
        engine-parity beyond it): docs containing the span terms at
        positions p1 < … < pm with (pm − p1) − (m−1) ≤ slop,
        BM25-bag-ranked like :meth:`phrase_topk` (slop=0 ≡ exact phrase on
        repeat-free spans).

        Vectorized chain DP over the candidates' merged occurrence
        streams: for each occurrence of span term j, the latest admissible
        chain start is the strict-prefix max of term j−1's chain starts
        within the same candidate.  Global stream positions ascend across
        the occurrence list, so the per-candidate reset is one
        ``cidx·BIG`` offset on a single ``np.maximum.accumulate`` — no
        per-candidate loop."""
        if self.fwd_stream is None:
            raise ValueError("span-near search requires an index built with store_forward=True")
        m = int(h_seq.size)
        slices = self._term_slices(qtids)
        if len(slices) < qtids.size:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        cand = self._and_candidates(slices, qtids.size)
        if cand.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        pos, cidx = self._candidate_windows(cand, 1)  # every token position
        tok = self.fwd_stream[pos]
        keep = np.isin(tok, h_seq)
        pos, cidx, tok = pos[keep].astype(np.int64), cidx[keep], tok[keep]
        if pos.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        NEG = np.int64(-(1 << 62))
        BIG = np.int64(self.fwd_stream.size + 1)
        base = cidx * BIG
        # chain[i] = latest valid span start over chains ending at
        # occurrence i of term j (NEG = no chain)
        chain = np.where(tok == h_seq[0], pos, NEG)
        for j in range(1, m):
            v = np.where((tok == h_seq[j - 1]) & (chain > NEG // 2), chain + base, NEG)
            acc = np.maximum.accumulate(v)
            prev = np.empty_like(acc)
            prev[0] = NEG
            prev[1:] = acc[:-1]  # strict: an earlier occurrence only
            start = prev - base  # a leak from an earlier candidate goes < 0
            chain = np.where((tok == h_seq[j]) & (prev > NEG // 2) & (start >= 0), start, NEG)
        ok = (chain > NEG // 2) & (pos - chain <= np.int64(m - 1 + slop))
        matched = cand[np.unique(cidx[ok])]
        return self._restricted_bag_topk(slices, qweights, matched, k)

    def span_first_topk(
        self, qtids: np.ndarray, qweights: np.ndarray, h_term: int, end: int, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lucene ``SpanFirstQuery`` top-k: docs whose token stream holds
        the term at some position < ``end`` (a title/lead-paragraph
        restriction), BM25-bag-ranked with the usual (-score, doc)
        tie-break.  Candidates come from the inverted postings; the verify
        reads ONLY the first min(end, len) positions of each candidate's
        forward stream — one flat gather, no per-candidate loop."""
        if self.fwd_stream is None:
            raise ValueError("span-first search requires an index built with store_forward=True")
        slices = self._term_slices(qtids)
        if len(slices) < qtids.size:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        cand = self._and_candidates(slices, qtids.size)
        if cand.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        lens = self.fwd_ptr[cand + 1] - self.fwd_ptr[cand]
        nwin = np.minimum(lens, np.int64(end))
        tot = int(nwin.sum())
        if tot == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        csum = np.cumsum(nwin)
        starts = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(csum - nwin, nwin)
            + np.repeat(self.fwd_ptr[cand], nwin)
        )
        cidx = np.repeat(np.arange(cand.size, dtype=np.int64), nwin)
        ok = self.fwd_stream[starts] == np.uint64(h_term)
        matched = cand[np.unique(cidx[ok])]
        return self._restricted_bag_topk(slices, qweights, matched, k)

    def span_not_topk(
        self,
        qtids: np.ndarray,
        qweights: np.ndarray,
        h_seq: np.ndarray,
        h_excl: int,
        slop: int,
        k: int,
        contain: bool = False,
        score_tids: np.ndarray | None = None,
        score_weights: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lucene ``SpanNotQuery`` top-k: docs holding at least one ordered
        span-near match of the include terms (positions p1 < … < pm with
        (pm − p1) − (m−1) ≤ slop, as :meth:`span_near_topk`) where NO
        occurrence of the exclude term falls inside that span's positions
        [p1, pm].  A doc with every include span poisoned by the exclude
        term does not match.  BM25-bag-ranked over the INCLUDE terms only.

        ``contain=True`` flips the filter into Lucene's
        ``SpanContainingQuery``: the span must HOLD at least one occurrence
        of the (little) term inside [p1, pm] — same DP, same searchsorted
        probes, inverted survival test.

        ``score_tids``/``score_weights`` override the RANKING bag (the
        match set is still driven by ``qtids``/``h_seq``): with
        ``contain=True`` and the little term as the scoring bag this is
        Lucene's ``SpanWithinQuery`` — the little span is returned (and
        scored) where it occurs inside a big span.

        Same chain DP as :meth:`span_near_topk`, but instead of stopping at
        "some chain completed", every completed span (start=chain, end=pos)
        is checked against the candidate's exclude occurrences with two
        ``np.searchsorted`` probes over the base-offset position keys — the
        occurrence stream is globally ascending, so per-candidate ranges
        never interleave and no per-span loop is needed."""
        if self.fwd_stream is None:
            raise ValueError("span-not search requires an index built with store_forward=True")
        m = int(h_seq.size)
        slices = self._term_slices(qtids)
        if len(slices) < qtids.size:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        cand = self._and_candidates(slices, qtids.size)
        if cand.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        pos, cidx = self._candidate_windows(cand, 1)  # every token position
        tok = self.fwd_stream[pos]
        keep = np.isin(tok, np.append(h_seq, np.uint64(h_excl)))
        pos, cidx, tok = pos[keep].astype(np.int64), cidx[keep], tok[keep]
        if pos.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        NEG = np.int64(-(1 << 62))
        BIG = np.int64(self.fwd_stream.size + 1)
        base = cidx * BIG
        chain = np.where(tok == h_seq[0], pos, NEG)
        for j in range(1, m):
            v = np.where((tok == h_seq[j - 1]) & (chain > NEG // 2), chain + base, NEG)
            acc = np.maximum.accumulate(v)
            prev = np.empty_like(acc)
            prev[0] = NEG
            prev[1:] = acc[:-1]  # strict: an earlier occurrence only
            start = prev - base  # a leak from an earlier candidate goes < 0
            chain = np.where((tok == h_seq[j]) & (prev > NEG // 2) & (start >= 0), start, NEG)
        ok = (chain > NEG // 2) & (pos - chain <= np.int64(m - 1 + slop))
        if not ok.any():
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        # exclude-overlap check: span survives iff no exclude occurrence has
        # a base-offset key in [start_key, end_key]
        ekeys = (pos + base)[tok == np.uint64(h_excl)]  # ascending by construction
        start_key = chain[ok] + base[ok]
        end_key = pos[ok] + base[ok]
        if contain:
            # Containment is monotone in span width, so per completed end
            # the WIDEST admissible span decides: its start is the SMALLEST
            # include-start position >= pos - (m-1+slop) (any first-term
            # occurrence at or before the DP's max start chains to this end
            # through the same intermediates, so only the slop bound binds).
            t1keys = (pos + base)[tok == h_seq[0]]
            lo_key = np.maximum(end_key - np.int64(m - 1 + slop), base[ok])
            idx = np.minimum(np.searchsorted(t1keys, lo_key, side="left"), t1keys.size - 1)
            wide_start = t1keys[idx]
            clean = np.searchsorted(ekeys, wide_start, side="left") != np.searchsorted(
                ekeys, end_key, side="right"
            )
        else:
            clean = np.searchsorted(ekeys, start_key, side="left") == np.searchsorted(
                ekeys, end_key, side="right"
            )
        matched = cand[np.unique(cidx[ok][clean])]
        if matched.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        if score_tids is not None:
            sslices = self._term_slices(score_tids)
            if len(sslices) < score_tids.size:
                return np.zeros(0, np.int64), np.zeros(0, np.float64)
            return self._restricted_bag_topk(sslices, score_weights, matched, k)
        return self._restricted_bag_topk(slices, qweights, matched, k)

    def intervals_topk(
        self, qtids: np.ndarray, qweights: np.ndarray, h_terms: np.ndarray, max_gaps: int, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Unordered interval match (ES ``intervals`` query,
        ``all_of(ordered: false, max_gaps)``): docs holding ALL m
        (distinct) terms inside one window in ANY order with total
        internal gaps ≤ ``max_gaps`` — positions p_1..p_m with
        (max−min+1) − m ≤ max_gaps — BM25-bag-ranked like
        :meth:`span_near_topk` (which is the ordered=true half).

        Vectorized minimal-cover sweep: at each occurrence (a window END)
        the latest occurrence of every term so far is a segmented
        per-candidate running max, so the tightest window ending there is
        [min_j last_j, pos]; a doc matches iff ANY ending position yields
        width − m ≤ max_gaps.  Same ``cidx·BIG`` offset trick as the span
        chain DP — no per-candidate loop."""
        if self.fwd_stream is None:
            raise ValueError("intervals search requires an index built with store_forward=True")
        m = int(h_terms.size)
        if np.unique(h_terms).size != m:
            raise ValueError("intervals contract covers distinct terms only")
        slices = self._term_slices(qtids)
        if len(slices) < qtids.size:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        cand = self._and_candidates(slices, qtids.size)
        if cand.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        pos, cidx = self._candidate_windows(cand, 1)  # every token position
        tok = self.fwd_stream[pos]
        keep = np.isin(tok, h_terms)
        pos, cidx, tok = pos[keep].astype(np.int64), cidx[keep], tok[keep]
        if pos.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        NEG = np.int64(-(1 << 62))
        BIG = np.int64(self.fwd_stream.size + 1)
        base = cidx * BIG
        wmin: np.ndarray | None = None
        for j in range(m):
            acc = np.maximum.accumulate(np.where(tok == h_terms[j], pos + base, NEG))
            last = acc - base  # < 0 ⇒ latest occurrence is NEG or an earlier candidate's
            wmin = last if wmin is None else np.minimum(wmin, last)
        ok = (wmin >= 0) & (pos - wmin + 1 - np.int64(m) <= np.int64(max_gaps))
        matched = cand[np.unique(cidx[ok])]
        return self._restricted_bag_topk(slices, qweights, matched, k)

    def score_boosting(
        self,
        qtids: np.ndarray,
        qweights: np.ndarray,
        neg_tids: np.ndarray,
        negative_boost: float,
        k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lucene/ES ``boosting`` query: the positive clause's BM25 bag
        score, MULTIPLIED by ``negative_boost`` on docs that match ANY
        negative-clause term (demotion, not exclusion — contrast
        :meth:`IndexReader.search_not`).  Multiplicative on a zero-safe
        score vector, so tombstoned / unmatched docs stay out of the
        top-k."""
        slices = self._term_slices(qtids)
        if not slices:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        ids = np.concatenate([self.post_local[s:e] for _, s, e, _ in slices])
        w = np.concatenate([self.post_w[s:e] * qweights[i] for i, s, e, _ in slices])
        scores = np.bincount(ids, weights=w, minlength=self.n_local)
        neg = self._term_slices(neg_tids)
        if neg:
            neg_ids = np.unique(np.concatenate([self.post_local[s:e] for _, s, e, _ in neg]))
            scores[neg_ids] *= float(negative_boost)
        return self._topk_from_scores(scores, k)

    def _gather_zones(self, slices, zones: np.ndarray, qweights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(local ids, query-weighted impacts) of every posting inside
        ``zones`` — one searchsorted + flat gather per query term for ALL
        zones at once (no per-chunk loop)."""
        pl, pw = self.post_local, self.post_w
        zd = self.zone_docs
        lo_doc, hi_doc = zones * zd, (zones + 1) * zd
        ids_parts, w_parts = [], []
        for i, s, e, _ in slices:
            seg = pl[s:e]
            lo = np.searchsorted(seg, lo_doc) + s
            hi = np.searchsorted(seg, hi_doc) + s
            lens = hi - lo
            tot = int(lens.sum())
            if tot == 0:
                continue
            csum = np.cumsum(lens)
            idx = np.arange(tot, dtype=np.int64) - np.repeat(csum - lens, lens) + np.repeat(lo, lens)
            ids_parts.append(pl[idx])
            w_parts.append(pw[idx] * qweights[i])
        if not ids_parts:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        return np.concatenate(ids_parts), np.concatenate(w_parts)

    def score_wand(
        self,
        qtids: np.ndarray,
        qweights: np.ndarray,
        k: int,
        top_zones: int = 32,
        fallback_frac: float = 0.5,
        min_zone_mult: float = 4.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Block-max pruned top-k (two-phase vectorized WAND variant).

        Zones are aligned doc-id ranges, so a doc's *entire* score lies
        within its zone — scoring a zone over all query terms yields exact
        scores.  Phase 1 exact-scores the ``top_zones`` zones with the
        highest upper bounds (ub(z) = Σ_t qw_t · zone_max_t[z], the
        block-max WAND bound) to establish the kth-score threshold; phase 2
        scores only the remaining zones whose ub can still beat it — in ONE
        vectorized gather, not a zone-at-a-time walk.  When the bound
        distribution is flat (pruning keeps > ``fallback_frac`` of the
        zones), it scores everything — degenerating to the exhaustive
        kernel plus a small bound-evaluation overhead instead of a slow
        chunked walk.  Identical top-k to exhaustive (tested).

        ``min_zone_mult``: pruning is only ECONOMICAL when phase 1 touches
        a small fraction of the shard — the candidate-scoped zone gather
        costs ~2× the dense bincount per posting touched (measured,
        BENCH r4), so a shard with fewer than ``min_zone_mult·top_zones``
        zones answers exhaustively without computing any bounds.  Pass 0
        to force the pruning path (tests)."""
        nzones = (self.n_local + self.zone_docs - 1) // self.zone_docs
        if nzones <= min_zone_mult * top_zones:
            return self.score_exhaustive(qtids, qweights, k)
        slices = self._term_slices(qtids)
        if not slices:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)

        # zone upper bounds summed across query terms
        z_parts, ub_parts = [], []
        for i, _, _, p in slices:
            zs, ze = self.zone_ptr[p], self.zone_ptr[p + 1]
            z_parts.append(self.zone_zid[zs:ze])
            ub_parts.append(self.zone_max[zs:ze] * qweights[i])
        allz = np.concatenate(z_parts)
        uz, inv = np.unique(allz, return_inverse=True)
        ub = np.bincount(inv, weights=np.concatenate(ub_parts))
        order = np.argsort(-ub, kind="stable")
        uz, ub = uz[order], ub[order]

        # flatness pre-check: the threshold can never exceed ub[0], so when
        # the median zone bound is already within 15% of the best, pruning
        # cannot discard a useful fraction — skip the bound machinery and
        # answer exhaustively (costs only the ub computation above)
        if uz.size > top_zones and ub[uz.size // 2] >= 0.85 * ub[0]:
            return self.score_exhaustive(qtids, qweights, k)

        # phase 1: exact scores of the best-bounded zones, candidate-scoped
        # (unique+bincount over <= top_zones·zone_docs docs — no dense
        # vector, no corpus-wide nonzero scan, so an eventual fallback has
        # wasted almost nothing)
        ids1, w1 = self._gather_zones(slices, uz[:top_zones], qweights)
        sel = None
        if uz.size > top_zones and ids1.size:
            cand, inv1 = np.unique(ids1, return_inverse=True)
            csc = np.bincount(inv1, weights=w1)
            if cand.size >= k:
                t = csc[np.argpartition(-csc, k - 1)[:k]].min()
                # ub >= t keeps boundary ties exact under (-score, doc_id)
                sel = ub[top_zones:] >= t
        if uz.size > top_zones:
            if sel is None or int(sel.sum()) > fallback_frac * (uz.size - top_zones):
                # flat bound distribution: pruning keeps most zones, and the
                # zone-indexed gather costs more than the plain contiguous
                # slices — answer with the exhaustive kernel instead
                return self.score_exhaustive(qtids, qweights, k)
            ids2, w2 = self._gather_zones(slices, uz[top_zones:][sel], qweights)
            ids1, w1 = np.concatenate([ids1, ids2]), np.concatenate([w1, w2])
        scores = np.bincount(ids1, weights=w1, minlength=self.n_local)
        return self._topk_from_scores(scores, k)


# Lucene query_string mini-syntax: optional +/- sign, quoted phrase or bare
# term, optional ^boost.  (AND/OR connectives are out of scope — the
# default_operator=OR grammar with explicit +/- occurrence flags.)
_QS_CLAUSE_RE = re.compile(r'([+\-]?)(?:"([^"]*)"|([^\s"]+?))(?:\^(\d+(?:\.\d+)?))?(?=\s|$)')


def parse_query_string(qstring: str) -> list[tuple[str, str, str, float]]:
    """Parse a Lucene ``query_string`` expression into (role, kind, text,
    boost) clauses — role ∈ {must, should, not}, kind ∈ {term, phrase}.
    Supported syntax: ``+required``, ``-prohibited``, bare optional terms,
    ``"quoted phrases"`` and ``clause^2.5`` boosts, whitespace-separated."""
    out = []
    for m in _QS_CLAUSE_RE.finditer(qstring):
        sign, phrase, term, boost = m.groups()
        role = {"+": "must", "-": "not"}.get(sign, "should")
        kind = "term" if phrase is None else "phrase"
        out.append((role, kind, phrase if term is None else term, float(boost or 1.0)))
    return out


class IndexReader:
    """Loads index metadata + all shards of an index directory.

    ``consolidate``: merge loaded shards into one CSC serving view when the
    postings fit ``consolidate_budget_bytes`` (estimated from nnz; the
    merge transiently holds both views, so the budget covers 2x) — the
    single-node fast path.  Past the budget the per-shard list is kept;
    the multi-node deployment (:class:`ShardedSearcher`) never consolidates
    across nodes at all."""

    def __init__(
        self,
        index_dir: str,
        cfg: EngineConfig | None = None,
        shard_ids: list[int] | None = None,
        consolidate: bool = True,
        consolidate_budget_bytes: int = 8 << 30,
        deletes: list[str] | None = None,
        global_stats: dict | None = None,
    ):
        """``deletes``: urls to tombstone at load (Lucene semantics — docs
        excluded from every result, global stats unchanged until merge).
        When None, the index's ``deletes.json`` (written by
        :func:`apply_deletes`) is honored if present.

        ``global_stats``: override the corpus-level stats this segment
        scores with — ``{"n_docs", "avgdl", "sum_dl", "df", "cf"?}`` with
        ``df``/``cf`` dense arrays ALIGNED to this index's own (sorted)
        vocab term ids.  This is the federation seam
        (:class:`FederatedReader`): a segment scoring under the UNION
        corpus stats is score-identical to the physically merged build."""
        stats_dir = os.path.join(index_dir, "stats")
        meta = read_json(os.path.join(stats_dir, "meta.json"))
        self.n_docs = meta["n_docs"]
        self.avgdl = meta["avgdl"]
        self.encoder = meta.get("encoder", "bm25")
        self.vocab_mode = meta.get("vocab_mode", "sorted")
        self.sum_dl = meta.get("sum_dl")
        self.cf = None
        if self.encoder == "bm25" and self.vocab_mode == "hashed":
            vocab = pq.read_table(os.path.join(stats_dir, "vocab.parquet"))
            tid_index = vocab.column("term_id").to_numpy(zero_copy_only=False).astype(np.int64)
            dfv = vocab.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
            self.vocab_index, self.df = None, (tid_index, dfv)
            if "cf" in vocab.column_names:
                self.cf = (tid_index, vocab.column("cf").to_numpy(zero_copy_only=False).astype(np.int64))
        elif self.encoder == "bm25":
            vocab = pq.read_table(os.path.join(stats_dir, "vocab.parquet"))
            self.vocab_index = pd.Index(vocab.column("term").to_pylist())
            self.df = vocab.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
            if "cf" in vocab.column_names:
                self.cf = vocab.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            self.vocab_index, self.df = None, None
        if global_stats is not None:
            if self.vocab_index is None:
                raise ValueError("global_stats override needs a sorted-vocab bm25 index")
            self.n_docs = int(global_stats["n_docs"])
            self.avgdl = float(global_stats["avgdl"])
            self.sum_dl = int(global_stats["sum_dl"])
            self.df = np.asarray(global_stats["df"], dtype=np.int64)
            if global_stats.get("cf") is not None:
                self.cf = np.asarray(global_stats["cf"], dtype=np.int64)
        self.cfg = cfg or DEFAULT_CONFIG
        self.tok = Tokenizer(self.cfg)

        pdir = os.path.join(index_dir, "postings")
        all_ids = sorted(
            int(m.group(1))
            for f in os.listdir(pdir)
            if (m := re.match(r"shard-(\d+)\.postings\.parquet$", f))
        )
        if shard_ids is not None:
            all_ids = [s for s in all_ids if s in set(shard_ids)]

        def _load(s: int) -> ShardIndex:
            return ShardIndex(
                os.path.join(pdir, f"shard-{s:05d}.postings.parquet"),
                os.path.join(pdir, f"shard-{s:05d}.docs.parquet"),
                self.df,
                self.n_docs,
                self.avgdl,
                self.cfg,
                cf_global=self.cf,
                sum_dl=self.sum_dl,
            )

        if len(all_ids) > 1:
            # parquet reads and the varint/bincount decode kernels release
            # the GIL, so shard loads thread well (measured ~4x at 285
            # shards); order is preserved (doc ids ascend across shards)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(all_ids))) as ex:
                self.shards = list(ex.map(_load, all_ids))
        else:
            self.shards = [_load(s) for s in all_ids]
        if deletes is None:
            deletes = (read_json(os.path.join(index_dir, "deletes.json")) or {}).get("urls")
        if deletes:
            del_arr = pa.array(sorted(set(deletes)), type=pa.string())
            for sh in self.shards:
                sh.mask_deletes(del_arr)
        if consolidate and len(self.shards) > 1:
            # ~24 B per posting (local id int64 + weight f64 + zone slack),
            # x2 for the transient original+merged views during the merge
            est = sum(s.post_w.size for s in self.shards) * 24 * 2
            if est <= consolidate_budget_bytes:
                self.shards = [ShardIndex.consolidated(self.shards, self.cfg)]
        # positional url lookup: doc_ids ascend within and across shards
        # (doc-sharded contract), so searchsorted over the concatenated id
        # array replaces the old per-doc Python dict (no |docs| dict
        # entries, no Python strings — urls stay Arrow until a hit returns)
        if self.shards:
            self._doc_index = np.concatenate([sh.doc_ids for sh in self.shards])
            self._url_arr = pa.concat_arrays([sh.urls for sh in self.shards])
        else:
            self._doc_index = np.zeros(0, np.int64)
            self._url_arr = pa.array([], type=pa.string())

    def url_of(self, doc_id: int) -> str:
        i = int(np.searchsorted(self._doc_index, doc_id))
        if i >= self._doc_index.size or self._doc_index[i] != doc_id:
            raise KeyError(doc_id)
        return self._url_arr[i].as_py()

    def encode_query(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Bag-of-words query encoding (reference doc-only mode,
        splade.py:243-265): q_weight(t) = term count; unknown terms dropped
        (empty-postings path).  Neural indexes hash straight to term ids."""
        if self.encoder == "neural":
            from ..stages.neural import encode_query_bow

            return encode_query_bow(text, self.tok, self.cfg)
        if self.vocab_mode == "hashed":
            from ..functions.hashing import hash_strings

            toks = self.tok.tokenize(text)
            if not toks:
                return np.zeros(0, np.int64), np.zeros(0, np.float64)
            h = (hash_strings(np.asarray(toks, dtype=object)) >> np.uint64(1)).astype(np.int64)
            tid_index = self.df[0]
            idx = np.minimum(np.searchsorted(tid_index, h), max(tid_index.size - 1, 0))
            known = tid_index[idx] == h if tid_index.size else np.zeros(h.size, bool)
            h = h[known]
            if h.size == 0:
                return np.zeros(0, np.int64), np.zeros(0, np.float64)
            uniq, counts = np.unique(h, return_counts=True)
            return uniq, counts.astype(np.float64)
        toks = self.tok.tokenize(text)
        if not toks:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        tids = self.vocab_index.get_indexer(np.asarray(toks, dtype=object))
        tids = tids[tids >= 0]
        if tids.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        uniq, counts = np.unique(tids, return_counts=True)
        return uniq.astype(np.int64), counts.astype(np.float64)

    def search(self, text: str, k: int = 10, method: str = "exhaustive") -> list[tuple[int, float, str]]:
        if method == "phrase":
            return self.search_phrase(text, k)
        qtids, qw = self.encode_query(text)
        if qtids.size == 0:
            return []
        cands: list[tuple[np.ndarray, np.ndarray]] = []
        for sh in self.shards:
            fn = sh.score_wand if method == "wand" else sh.score_exhaustive
            cands.append(fn(qtids, qw, k))
        docs = np.concatenate([c[0] for c in cands]) if cands else np.zeros(0, np.int64)
        scores = np.concatenate([c[1] for c in cands]) if cands else np.zeros(0)
        if docs.size == 0:
            return []
        order = np.lexsort((docs, -scores))[:k]
        return [(int(docs[i]), float(scores[i]), self.url_of(int(docs[i]))) for i in order]

    def search_after(
        self, text: str, k: int = 10, after: tuple[float, int] | None = None
    ) -> list[tuple[int, float, str]]:
        """Deep pagination: the top-k strictly after the ``(score, doc_id)``
        cursor in the (-score, doc_id) total order (pass the last hit of
        the previous page).  ``after=None`` degrades to :meth:`search`.
        Per shard the cursor is applied INSIDE the scorer, so no page is
        ever re-collected — the search_after contract."""
        if after is None:
            return self.search(text, k)
        qtids, qw = self.encode_query(text)
        if qtids.size == 0:
            return []
        a_s, a_d = float(after[0]), int(after[1])
        cands = [sh.score_after(qtids, qw, k, a_s, a_d) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def search_not(
        self, text: str, k: int = 10, exclude_terms: list[str] | None = None
    ) -> list[tuple[int, float, str]]:
        """Boolean must_not top-k (Lucene ``must`` ⊕ ``must_not``): BM25
        over the query text, excluding every doc that contains ANY of
        ``exclude_terms``.  Exclusion is resolved per shard from its own
        postings (one unique over the excluded terms' doc lists) — no
        attribute column, no driver-side doc set — and excluded terms
        never contribute to scores (Lucene must_not is non-scoring)."""
        qtids, qw = self.encode_query(text)
        if qtids.size == 0:
            return []
        ex_tids = np.zeros(0, np.int64)
        if exclude_terms:
            ex, _ = self.encode_query(" ".join(exclude_terms))
            ex_tids = ex
        cands = [sh.score_excluding(qtids, qw, k, ex_tids) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def _expand_synonym_groups(
        self, groups: list[list[str]]
    ) -> tuple[list[np.ndarray], np.ndarray]:
        """Per synonym group: vocab term ids of its members (OOV dropped)
        + the blended idf — Lucene SynonymQuery uses idf(max docFreq of
        the members).  Groups with no indexed member are dropped."""
        if self.vocab_index is None or self.df is None:
            raise ValueError("synonym queries need the sorted-string vocab + df stats")
        g_tids, g_idf = [], []
        for terms in groups:
            toks = [n for t in terms for n in self.tok.tokenize(t)]
            if not toks:
                continue
            tids = self.vocab_index.get_indexer(np.asarray(toks, dtype=object))
            tids = np.unique(tids[tids >= 0])
            if tids.size == 0:
                continue
            dfb = float(self.df[tids].max())
            g_tids.append(tids.astype(np.int64))
            g_idf.append(float(bm25_idf(np.asarray([dfb]), self.n_docs)[0]))
        return g_tids, np.asarray(g_idf, dtype=np.float64)

    def search_synonyms(self, groups: list[list[str]], k: int = 10) -> list[tuple[int, float, str]]:
        """Synonym retrieval (Lucene SynonymQuery): each group of terms
        scores as ONE pseudo-term — member tfs SUM before the BM25
        saturation, under idf(max member df) — and group scores add.
        Exhaustive only: blended-tf bounds aren't decomposable over the
        stored per-term zone maxima, so WAND is out of scope (Lucene
        likewise gives SynonymQuery its own scorer)."""
        g_tids, g_idf = self._expand_synonym_groups(groups)
        if not g_tids:
            return []
        cands = [sh.score_synonyms(g_tids, g_idf, k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def explain(self, text: str, doc_id: int) -> list[tuple[str, float, int, int, float, float]]:
        """Lucene ``explain`` shape: the per-term BM25 score breakdown of
        one (query, doc) pair — (term, qtf, tf, df, idf, contribution)
        rows, term-ascending.  Served off the stored postings: the doc's
        row in each query term's posting run is one searchsorted (postings
        ascend by doc id within a term run); tf comes from the raw-tf
        sidecar.  Terms the doc lacks contribute a (tf=0, contribution=0)
        row — the full explanation, not just the hits."""
        if self.vocab_index is None or self.df is None:
            raise ValueError("explain needs the sorted-string vocab + df stats")
        toks = self.tok.tokenize(text)
        if not toks:
            return []
        # locate the owning shard + local position
        sh = None
        for cand in self.shards:
            pos = int(np.searchsorted(cand.doc_ids, doc_id))
            if pos < cand.doc_ids.size and cand.doc_ids[pos] == doc_id:
                sh, local = cand, pos
                break
        if sh is None:
            raise KeyError(f"doc_id {doc_id} not in the loaded shards")
        if sh.post_tf is None:
            raise ValueError("explain needs raw-tf postings (weight_mode='tf')")
        qtf: dict[str, int] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0) + 1
        out = []
        for term in sorted(qtf):
            tid = int(self.vocab_index.get_indexer([term])[0])
            if tid < 0:
                out.append((term, float(qtf[term]), 0, 0, 0.0, 0.0))
                continue
            df = int(self.df[tid])
            idf = float(bm25_idf(np.asarray([float(df)]), self.n_docs)[0])
            slices = sh._term_slices(np.asarray([tid], dtype=np.int64))
            tf, contrib = 0, 0.0
            if slices:
                _, s, e, _ = slices[0]
                p = s + int(np.searchsorted(sh.post_local[s:e], local))
                if p < e and sh.post_local[p] == local:
                    tf = int(sh.post_tf[p])
                    contrib = float(qtf[term] * sh.post_w[p])
            out.append((term, float(qtf[term]), tf, df, idf, contrib))
        return out

    def term_stats(self, terms: list[str]) -> list[tuple[str, int, int]]:
        """Lucene TermStatistics off the STORED index: (term, docFreq,
        totalTermFreq) per normalized input term — df from the vocab, cf
        from the stats stage's fused collection-frequency pass.  Terms
        absent from the dictionary report (0, 0), Lucene's contract.
        Pure dictionary lookups; postings are never touched."""
        if self.vocab_index is None or self.df is None:
            raise ValueError("term_stats needs the sorted-string vocab + df stats")
        out = []
        for t in terms:
            norm = self.tok.tokenize(t)
            if len(norm) != 1:
                raise ValueError(f"term must normalize to one token, got {norm!r}")
            tid = int(self.vocab_index.get_indexer([norm[0]])[0])
            if tid < 0:
                out.append((norm[0], 0, 0))
            else:
                cf = int(self.cf[tid]) if self.cf is not None else 0
                out.append((norm[0], int(self.df[tid]), cf))
        return out

    def collection_stats(self) -> dict[str, float]:
        """Lucene CollectionStatistics off the stored meta: docCount,
        sumTotalTermFreq (sum_dl), avgdl, distinct-term count and total
        postings (nnz)."""
        return {
            "n_docs": int(self.n_docs),
            "sum_dl": int(self.sum_dl) if self.sum_dl is not None else None,
            "avgdl": float(self.avgdl),
            "n_terms": int(len(self.vocab_index)) if self.vocab_index is not None else None,
            "nnz": int(self.df.sum()) if isinstance(self.df, np.ndarray) else None,
        }

    def search_sorted_by_dl(self, text: str, k: int = 10) -> list[tuple[int, int, str]]:
        """Sort-by-field retrieval (Lucene SortField over a numeric
        doc-value): docs matching ANY query term, ordered by document
        length DESC (doc_id ASC ties) instead of relevance — dl is the
        one numeric doc-value the index itself stores.  Each shard returns
        its local top-k only (match set never leaves the shard)."""
        qtids, _qw = self.encode_query(text)
        if qtids.size == 0:
            return []
        cands: list[tuple[np.ndarray, np.ndarray]] = []
        for sh in self.shards:
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            local = np.unique(np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices]))
            if sh.deleted_local.size:
                local = np.setdiff1d(local, sh.deleted_local, assume_unique=True)
            if local.size == 0:
                continue
            dl = sh.dl[local]
            kk = min(k, local.size)
            top = np.lexsort((sh.doc_ids[local], -dl))[:kk]
            cands.append((sh.doc_ids[local[top]], dl[top]))
        if not cands:
            return []
        d = np.concatenate([c[0] for c in cands])
        v = np.concatenate([c[1] for c in cands])
        order = np.lexsort((d, -v))[:k]
        return [(int(d[i]), int(v[i]), self.url_of(int(d[i]))) for i in order]

    def search_index_ordered(self, text: str, k: int = 10) -> tuple[list[int], int]:
        """Early-terminated retrieval on an INDEX-SORTED build (Lucene
        index sorting): when internal doc-id order IS the sort order
        (the corpus adapter assigned url ranks by the sort key), the
        first ``k`` matching internal ids are the exact global top-k —
        no scoring, no full postings scan.

        Shards partition ascending doc ranges, so they are walked in
        order and the walk stops as soon as ``k`` matches are found —
        typically inside the FIRST shard (the whole point of index
        sorting: the best docs are physically first).  Within a shard a
        k-way merge over the query terms' doc-sorted postings advances
        one match at a time; postings past the k-th match are never
        visited.  Returns (matched internal doc ids in index order,
        postings_touched) — the counter is the early-termination
        evidence the bench records."""
        qtids, _qw = self.encode_query(text)
        if qtids.size == 0:
            return [], 0
        if not self._ordered_layout_ok():
            raise ValueError(
                "search_index_ordered needs shards covering ascending "
                "disjoint doc-id ranges (a num_buckets=1 index-sorted "
                "build); this index's shard layout does not guarantee "
                "that, so 'first k in index order' would be wrong"
            )
        return _ordered_walk(self.shards, qtids, k)

    def _ordered_layout_ok(self) -> bool:
        """True iff shards cover strictly ascending disjoint doc-id ranges
        (each shard internally sorted) — the precondition of the ordered
        walk.  Checked directly from the loaded layout (stronger than a
        manifest flag: covers merged/bucketed indexes too) and cached."""
        ok = getattr(self, "_ordered_ok", None)
        if ok is None:
            ok = True
            prev_max = -1
            for sh in self.shards:
                ids = sh.doc_ids
                if ids.size == 0:
                    continue
                if int(ids[0]) <= prev_max or (ids.size > 1 and not bool(np.all(ids[1:] > ids[:-1]))):
                    ok = False
                    break
                prev_max = int(ids[-1])
            self._ordered_ok = ok
        return ok

    def search_dismax(self, text: str, k: int = 10, tie: float = 0.0) -> list[tuple[int, float, str]]:
        """Disjunction-max top-k (Lucene DisjunctionMaxQuery): each doc
        scores its BEST single query-term contribution plus ``tie`` × the
        rest, instead of the BM25 sum — the field-disjunction shape that
        stops multi-term coordination from drowning out a strong single
        match.  Exact per shard (the kernel sees every posting), merged
        with the standard (-score, doc_id) tie-break."""
        qtids, qw = self.encode_query(text)
        if qtids.size == 0:
            return []
        cands = [sh.score_dismax(qtids, qw, k, tie) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def search_filtered(self, text: str, k: int = 10, allow_urls=None) -> list[tuple[int, float, str]]:
        """Filtered top-k: BM25 over only the docs whose url passes the
        metadata predicate — the standard filtered-search serving feature.
        ``allow_urls`` is an Arrow string array / list of allowed urls (the
        broadcast-lookup shape: one ``is_in`` over each shard's Arrow url
        column, no Python strings; at cluster scale the same mask would be
        a precomputed per-shard doc-attribute bitmap).  Scoring uses the
        exhaustive kernel — safe block-max pruning under an arbitrary
        filter needs filter-aware zone bounds, so WAND is out of scope for
        filtered queries (Lucene likewise checks live-docs inside the
        scorer)."""
        qtids, qw = self.encode_query(text)
        if qtids.size == 0:
            return []
        if not isinstance(allow_urls, pa.Array):
            allow_urls = pa.array(sorted(allow_urls), type=pa.string())
        cands = []
        for sh in self.shards:
            allow = pa.compute.is_in(sh.urls, value_set=allow_urls).to_numpy(zero_copy_only=False)
            cands.append(sh.score_exhaustive(qtids, qw, k, allow=allow))
        return self._merge_shard_topk(cands, k)

    def expand_prefix(self, prefix: str) -> np.ndarray:
        """Term-id range of vocab terms starting with ``prefix`` — the
        sorted-string vocab IS the term dictionary, so wildcard expansion
        (Lucene PrefixQuery) is two binary searches returning a CONTIGUOUS
        id range; no per-term lookup, no postings touched until scoring."""
        if self.vocab_index is None:
            raise ValueError(
                "prefix queries need the sorted-string vocab "
                "(encoder='bm25', vocab_mode='sorted')"
            )
        norm = self.tok.tokenize(prefix)
        if len(norm) != 1:
            raise ValueError(f"prefix must normalize to one token, got {norm!r}")
        p = norm[0]
        lo = int(self.vocab_index.searchsorted(p, side="left"))
        hi = int(self.vocab_index.searchsorted(p + "\U0010ffff", side="left"))
        return np.arange(lo, hi, dtype=np.int64)

    def _search_expanded(self, qtids: np.ndarray, k: int, method: str) -> list[tuple[int, float, str]]:
        """Score an expanded-OR term-id set (unit query weight, per-term
        idf) through the unchanged kernels — shared by every dictionary
        expansion (prefix / fuzzy / regexp)."""
        if qtids.size == 0:
            return []
        qw = np.ones(qtids.size, np.float64)
        cands = []
        for sh in self.shards:
            fn = sh.score_wand if method == "wand" else sh.score_exhaustive
            cands.append(fn(qtids, qw, k))
        return self._merge_shard_topk(cands, k)

    def search_prefix(self, prefix: str, k: int = 10, method: str = "exhaustive") -> list[tuple[int, float, str]]:
        """Wildcard top-k (``pre*``): the query expands to every vocab term
        with the prefix, each with unit query weight and its OWN idf
        (expanded-OR semantics), and scores through the unchanged BM25
        kernels — exhaustive or block-max pruned."""
        return self._search_expanded(self.expand_prefix(prefix), k, method)

    def total_hits(self, text: str, threshold: int = 1000) -> tuple[int, str, int]:
        """ES ``track_total_hits``: the disjunctive match count, counted
        EXACTLY up to ``threshold`` — returns ``(count, 'eq', shards)``
        when the true count is at most the threshold, else
        ``(threshold, 'gte', shards)`` with counting terminated early:
        shards are visited in doc order and a shard is never OPENED once
        the accumulated count strictly exceeds the threshold (the
        collector's early-termination contract — on a 10^10-doc index a
        common term stops after the first few shards).  ``shards`` is the
        number of shards actually visited (the termination evidence)."""
        qtids, _ = self.encode_query(text)
        if qtids.size == 0:
            return 0, "eq", 0
        total, visited = 0, 0
        for sh in self.shards:
            if total > threshold:
                break
            visited += 1
            slices = sh._term_slices(qtids)
            if slices:
                ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
                total += int(np.unique(ids).size)
        if total > threshold:
            return threshold, "gte", visited
        return total, "eq", visited

    def search_bool_prefix(self, text: str, k: int = 10) -> list[tuple[int, float, str]]:
        """``match_bool_prefix`` top-k (ES): every token but the LAST is a
        should-clause term scored by the standard BM25 bag; the last token
        becomes a PrefixQuery under Lucene's default constant-score
        rewrite, adding exactly 1.0 to any doc containing a term with that
        prefix (prefix-only docs still match).  Unlike
        :meth:`search_phrase_prefix` there is NO position constraint —
        the clauses are independent.  Tie-break (-score, doc_id)."""
        toks = self.tok.tokenize(text)
        if not toks:
            return []
        full, last = toks[:-1], toks[-1]
        if full:
            qtids, qw = self.encode_query(" ".join(full))
        else:
            qtids, qw = np.zeros(0, np.int64), np.zeros(0, np.float64)
        prefix_tids = self.expand_prefix(last)
        if qtids.size == 0 and prefix_tids.size == 0:
            return []
        cands = [sh.score_bool_prefix(qtids, qw, prefix_tids, k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def _vocab_codepoints(self) -> tuple[np.ndarray, np.ndarray]:
        """The sorted vocab as a padded (V, maxlen) uint32 codepoint matrix
        + per-term lengths, built ONCE per reader (numpy 'U' view — no
        per-term Python).  This is the fuzzy-expansion working set; it
        scales with the VOCAB, not the corpus."""
        cached = getattr(self, "_vocab_cp", None)
        if cached is None:
            arr = np.asarray(self.vocab_index.to_numpy(), dtype="U")
            maxlen = max(arr.dtype.itemsize // 4, 1)
            mat = np.ascontiguousarray(arr).view(np.uint32).reshape(len(arr), maxlen)
            lens = (mat != 0).sum(axis=1).astype(np.int64)
            cached = self._vocab_cp = (mat, lens)
        return cached

    def expand_fuzzy(self, term: str, max_edits: int = 1) -> np.ndarray:
        """Term ids of vocab terms within Levenshtein distance
        ``max_edits`` of ``term`` (Lucene FuzzyQuery expansion; classical
        distance — sub/ins/del, no transposition — so DuckDB's
        ``levenshtein`` replays it).  The DP runs VECTORIZED across every
        length-banded candidate at once: O(|term|·maxlen) numpy mins over
        the candidate axis, no per-term Python.  At a 10^9-term dictionary
        the band filter becomes a length+first-char bucket (or a
        Levenshtein automaton walk over the sorted dictionary, Lucene's
        trick); the kernel below is unchanged either way."""
        if self.vocab_index is None:
            raise ValueError(
                "fuzzy queries need the sorted-string vocab "
                "(encoder='bm25', vocab_mode='sorted')"
            )
        norm = self.tok.tokenize(term)
        if len(norm) != 1:
            raise ValueError(f"fuzzy term must normalize to one token, got {norm!r}")
        q = norm[0]
        qc = np.array([ord(ch) for ch in q], dtype=np.uint32)
        L = qc.size
        mat, lens = self._vocab_codepoints()
        cand = np.flatnonzero(np.abs(lens - L) <= max_edits)
        if cand.size == 0:
            return np.zeros(0, np.int64)
        clens = lens[cand]
        Lc = int(clens.max())
        sub = mat[cand, :Lc]
        # row DP over query chars; each cell is a candidate-axis vector
        prev = np.broadcast_to(np.arange(Lc + 1, dtype=np.int64), (cand.size, Lc + 1)).copy()
        for i in range(1, L + 1):
            cur = np.empty_like(prev)
            cur[:, 0] = i
            for j in range(1, Lc + 1):
                cost = (sub[:, j - 1] != qc[i - 1]).astype(np.int64)
                cur[:, j] = np.minimum(
                    np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), prev[:, j - 1] + cost
                )
            prev = cur
        dist = prev[np.arange(cand.size), clens]
        return cand[dist <= max_edits].astype(np.int64)

    def search_fuzzy(
        self, term: str, k: int = 10, max_edits: int = 1, method: str = "exhaustive"
    ) -> list[tuple[int, float, str]]:
        """Fuzzy top-k (Lucene FuzzyQuery shape): the term expands to every
        vocab term within ``max_edits`` Levenshtein distance, each scored
        with unit query weight and its OWN idf through the unchanged BM25
        kernels — identical expanded-OR semantics to :meth:`search_prefix`."""
        return self._search_expanded(self.expand_fuzzy(term, max_edits), k, method)

    def expand_regexp(self, pattern: str) -> np.ndarray:
        """Term ids of vocab terms FULLY matching ``pattern`` (Lucene
        RegexpQuery semantics: implicit ^...$ anchoring).  One
        compiled-regex scan over the sorted dictionary — the working set is
        the VOCAB, not the corpus.  At a 10^9-term dictionary this becomes
        a literal-prefix seek that bounds the scan range + an automaton
        walk (Lucene's trick); the scoring kernel below is unchanged."""
        if self.vocab_index is None:
            raise ValueError(
                "regexp queries need the sorted-string vocab "
                "(encoder='bm25', vocab_mode='sorted')"
            )
        hit = self.vocab_index.str.fullmatch(pattern)
        return np.flatnonzero(np.asarray(hit, dtype=bool)).astype(np.int64)

    def search_regexp(self, pattern: str, k: int = 10, method: str = "exhaustive") -> list[tuple[int, float, str]]:
        """Regexp top-k (Lucene RegexpQuery shape): the pattern expands to
        every fully-matching vocab term, each with unit query weight and
        its OWN idf — identical expanded-OR semantics to
        :meth:`search_prefix` / :meth:`search_fuzzy`."""
        return self._search_expanded(self.expand_regexp(pattern), k, method)

    def expand_wildcard(self, pattern: str) -> np.ndarray:
        """Term ids of vocab terms matching a Lucene ``WildcardQuery``
        pattern (``*`` = any sequence, ``?`` = exactly one char).  The
        literal prefix before the first wildcard bounds the dictionary
        scan to a CONTIGUOUS sorted-vocab range (two binary searches —
        the prefix-seek Lucene performs on its FST), then one compiled
        fnmatch-regex pass verifies the bounded slice.  The working set is
        a vocab RANGE, never the corpus — at a 10^9-term dictionary the
        range seek is what keeps ``ab*c?`` from scanning every term."""
        if self.vocab_index is None:
            raise ValueError(
                "wildcard queries need the sorted-string vocab "
                "(encoder='bm25', vocab_mode='sorted')"
            )
        import re as _re

        pat = pattern.lower()
        lit = _re.split(r"[*?]", pat, maxsplit=1)[0]
        lo = int(self.vocab_index.searchsorted(lit, side="left")) if lit else 0
        hi = (
            int(self.vocab_index.searchsorted(lit + "\U0010ffff", side="left"))
            if lit
            else len(self.vocab_index)
        )
        if lo >= hi:
            return np.zeros(0, np.int64)
        # Lucene WildcardQuery semantics: ONLY * and ? are special; every
        # other char (incl. '[', regex metachars) is literal — so translate
        # by hand rather than fnmatch.translate, whose [seq] classes would
        # diverge from both Lucene and the SQL LIKE oracle.
        rx = "".join(
            ".*" if c == "*" else "." if c == "?" else _re.escape(c) for c in pat
        )
        sl = self.vocab_index[lo:hi]
        hit = np.asarray(sl.str.fullmatch(rx), dtype=bool)
        return (np.flatnonzero(hit) + lo).astype(np.int64)

    def search_wildcard(self, pattern: str, k: int = 10, method: str = "exhaustive") -> list[tuple[int, float, str]]:
        """Wildcard top-k (Lucene WildcardQuery): ``*``/``?`` glob over
        the term dictionary, expanded-OR semantics identical to
        :meth:`search_prefix` / :meth:`search_regexp` — each matched term
        carries unit query weight and its OWN idf."""
        return self._search_expanded(self.expand_wildcard(pattern), k, method)

    def _trigram_dictionary(self) -> dict[str, np.ndarray]:
        """Char-trigram → sorted term-id postings over the VOCAB (the ES
        ``wildcard`` field / ngram-analyzer acceleration structure for
        infix matching).  Built once per reader and cached; the one-time
        build is vocab-bounded (a leading-wildcard ``*sub*`` otherwise
        scans the whole dictionary on every query).  At a 10^9-term
        dictionary this map is itself a small inverted index (≤ 46k ascii
        trigram keys) whose lists shard with the vocab."""
        cached = getattr(self, "_tri_dict", None)
        if cached is not None:
            return cached
        if self.vocab_index is None:
            raise ValueError(
                "substring queries need the sorted-string vocab "
                "(encoder='bm25', vocab_mode='sorted')"
            )
        tri: dict[str, list[int]] = {}
        for tid, term in enumerate(self.vocab_index):
            if len(term) < 3:
                continue
            for j in range(len(term) - 2):
                tri.setdefault(term[j : j + 3], []).append(tid)
        out = {g: np.unique(np.asarray(ids, dtype=np.int64)) for g, ids in tri.items()}
        self._tri_dict = out
        return out

    def expand_substring(self, sub: str) -> np.ndarray:
        """Term ids of vocab terms CONTAINING ``sub`` (ES ``wildcard``
        field semantics for ``*sub*``): candidates come from intersecting
        the substring's trigram postings in the cached trigram dictionary
        (rarest list first), then one vectorized containment pass verifies
        only the candidates — the dictionary is never linearly scanned for
        patterns of length ≥ 3.  Shorter needles (no full trigram) fall
        back to the bounded full-vocab scan the regexp path uses."""
        if self.vocab_index is None:
            raise ValueError(
                "substring queries need the sorted-string vocab "
                "(encoder='bm25', vocab_mode='sorted')"
            )
        sub = sub.lower()
        if len(sub) < 3:
            hit = np.asarray(self.vocab_index.str.contains(sub, regex=False), dtype=bool)
            return np.flatnonzero(hit).astype(np.int64)
        tri = self._trigram_dictionary()
        grams = [sub[j : j + 3] for j in range(len(sub) - 2)]
        lists = []
        for g in grams:
            ids = tri.get(g)
            if ids is None or ids.size == 0:
                return np.zeros(0, np.int64)
            lists.append(ids)
        lists.sort(key=len)
        cand = lists[0]
        for ids in lists[1:]:
            cand = cand[np.isin(cand, ids, assume_unique=True)]
            if cand.size == 0:
                return np.zeros(0, np.int64)
        # trigram containment is necessary, not sufficient ("abcab" has the
        # grams of "abcabc" minus order) — verify the bounded candidate set
        sl = self.vocab_index[cand]
        hit = np.asarray(sl.str.contains(sub, regex=False), dtype=bool)
        return cand[hit].astype(np.int64)

    def search_substring(self, sub: str, k: int = 10, method: str = "exhaustive") -> list[tuple[int, float, str]]:
        """Infix top-k (ES ``wildcard`` field ``*sub*`` shape): the needle
        expands through the trigram dictionary to every containing vocab
        term, each with unit query weight and its OWN idf — expanded-OR
        semantics identical to :meth:`search_prefix` etc., but the
        dictionary lookup is index-accelerated instead of a full scan."""
        return self._search_expanded(self.expand_substring(sub), k, method)

    def search_boosting(
        self, positive: str, negative: str, negative_boost: float = 0.5, k: int = 10
    ) -> list[tuple[int, float, str]]:
        """Boosting-query top-k (Lucene ``BoostingQuery`` / ES
        ``boosting``): docs matching the positive clause rank by its BM25
        bag score, DEMOTED by ``negative_boost`` (multiplied, not
        excluded) when they also match any negative-clause term.  An OOV
        negative demotes nothing; tie-break (-score, doc_id) as always."""
        qtids, qw = self.encode_query(positive)
        if qtids.size == 0:
            return []
        neg_tids, _ = self.encode_query(negative)
        cands = [sh.score_boosting(qtids, qw, neg_tids, negative_boost, k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def scores_for_docs(self, text: str, doc_ids) -> dict[int, float]:
        """Exact per-doc scores of ``text`` under THIS reader's similarity
        for an explicit doc set — the rescore primitive (ES ``rescore``
        runs a second query over the top-window docs only): per shard one
        bincount over the query postings, then a gather of the requested
        docs.  Unmatched or unknown docs score 0.0; tombstoned docs 0.0."""
        qtids, qw = self.encode_query(text)
        docs = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
        out = {int(d): 0.0 for d in docs}
        if qtids.size == 0 or docs.size == 0:
            return out
        for sh in self.shards:
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
            w = np.concatenate([sh.post_w[s:e] * qw[i] for i, s, e, _ in slices])
            scores = np.bincount(ids, weights=w, minlength=sh.n_local)
            if sh.deleted_local.size:
                scores[sh.deleted_local] = 0.0
            for loc in np.flatnonzero(np.isin(sh.doc_ids, docs)):
                out[int(sh.doc_ids[loc])] = float(scores[loc])
        return out

    def suggest_completion(self, prefix: str, k: int = 10) -> list[tuple[str, int, int]]:
        """Completion suggester (ES ``completion`` over the term
        dictionary): vocab terms starting with ``prefix`` ranked by
        collection frequency desc (cf is the popularity weight), term asc
        tie-break.  Two binary searches on the sorted vocab + one top-k
        over the contiguous id range — postings never touched.  Returns
        (term, cf, df) rows."""
        if self.cf is None or self.vocab_index is None:
            raise ValueError("suggest_completion needs the sorted vocab with cf stats")
        tids = self.expand_prefix(prefix)
        if tids.size == 0:
            return []
        cf = np.asarray(self.cf)[tids]
        order = np.lexsort((tids, -cf))[: min(k, tids.size)]
        picked = tids[order]
        return [(str(self.vocab_index[int(t)]), int(np.asarray(self.cf)[int(t)]), int(self.df[int(t)])) for t in picked]

    def suggest_spelling(self, term: str, k: int = 10, max_edits: int = 2) -> list[tuple[str, int, int]]:
        """Term suggester / did-you-mean (ES ``term`` suggester,
        ``suggest_mode=always``): vocab candidates within ``max_edits``
        classical Levenshtein edits (sub/ins/del — DuckDB-replayable),
        the exact term excluded, ranked by (distance asc, df desc, term
        asc).  Distances come from nested :meth:`expand_fuzzy` rings, so
        the vectorized DP kernel is reused unchanged.  Returns (term,
        distance, df) rows."""
        if self.vocab_index is None:
            raise ValueError("suggest_spelling needs the sorted-string vocab")
        rings = [set(self.expand_fuzzy(term, e).tolist()) for e in range(max_edits + 1)]
        cands = sorted(rings[-1] - rings[0])  # distance >= 1 only
        if not cands:
            return []
        rows = []
        for tid in cands:
            dist = next(e for e in range(1, max_edits + 1) if tid in rings[e])
            rows.append((str(self.vocab_index[int(tid)]), dist, int(self.df[int(tid)])))
        rows.sort(key=lambda r: (r[1], -r[2], r[0]))
        return rows[:k]

    def _vocab_hash_map(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted md5 hashes of the vocab, permutation back to term ids) —
        built once per reader, vocab-bounded."""
        from ..functions.hashing import md5_u64

        vh = getattr(self, "_vocab_hash", None)
        if vh is None:
            hv = md5_u64(list(self.vocab_index))
            perm = np.argsort(hv, kind="stable")
            vh = self._vocab_hash = (hv[perm], perm)
        return vh

    def term_vectors(self, doc_ids: list[int]) -> list[tuple[int, str, int, int]]:
        """Term-vectors API (ES ``_termvectors`` / Lucene TermVectors):
        (doc_id, term, tf, df) rows for the requested docs, sorted by
        (doc_id, term).  k-bounded: only the requested docs' forward md5
        streams are decoded (one run-length pass per shard owner), hashes
        map to vocab terms through the cached vocab-hash table; df is the
        stored global stat.  Unknown doc ids are skipped (ES semantics:
        found=false).  Requires ``store_forward=True`` + sorted vocab."""
        if self.vocab_index is None:
            raise ValueError("term_vectors needs the sorted-string vocab")
        docs = np.unique(np.asarray(doc_ids, dtype=np.int64))
        hv_sorted, perm = self._vocab_hash_map()
        rows: list[tuple[int, str, int, int]] = []
        for sh in self.shards:
            if sh.fwd_stream is None:
                raise ValueError("term_vectors requires an index built with store_forward=True")
            loc = np.flatnonzero(np.isin(sh.doc_ids, docs))
            if loc.size == 0:
                continue
            pos, cidx = sh._candidate_windows(loc, 1)
            if pos.size == 0:
                continue
            order = np.lexsort((sh.fwd_stream[pos], cidx))
            tok, ci = sh.fwd_stream[pos][order], cidx[order]
            first = np.ones(tok.size, dtype=bool)
            first[1:] = (tok[1:] != tok[:-1]) | (ci[1:] != ci[:-1])
            starts = np.flatnonzero(first)
            tfs = np.diff(np.append(starts, tok.size))
            utok, uci = tok[starts], ci[starts]
            idx = np.minimum(np.searchsorted(hv_sorted, utok), hv_sorted.size - 1)
            known = hv_sorted[idx] == utok
            tids = perm[idx[known]]
            gdocs = sh.doc_ids[loc[uci[known]]]
            gtfs = tfs[known]
            for d, tid, tf in zip(gdocs, tids, gtfs):
                rows.append((int(d), str(self.vocab_index[int(tid)]), int(tf), int(self.df[int(tid)])))
        rows.sort(key=lambda r: (r[0], r[1]))
        return rows

    def mlt_terms(self, text: str, max_terms: int = 5) -> np.ndarray:
        """Lucene MoreLikeThis term selection: tokenize the seed text and
        keep the ``max_terms`` vocab terms with the highest tf·idf in the
        seed (idf = the index's BM25 idf off the global df vector), ties
        broken by term asc — fully deterministic so a SQL window function
        replays it.  Needs the sorted-string vocab (df aligned to it)."""
        if self.vocab_index is None or self.df is None:
            raise ValueError("more_like_this needs the sorted-string vocab + df stats")
        toks = self.tok.tokenize(text)
        if not toks:
            return np.zeros(0, np.int64)
        tids = self.vocab_index.get_indexer(np.asarray(toks, dtype=object))
        tids = tids[tids >= 0]
        if tids.size == 0:
            return np.zeros(0, np.int64)
        uniq, counts = np.unique(tids, return_counts=True)
        df = self.df[uniq].astype(np.float64)
        idf = np.log1p((self.n_docs - df + 0.5) / (df + 0.5))
        sc = counts.astype(np.float64) * idf
        # uniq is ascending term-id == ascending term (sorted vocab): the
        # lexsort secondary key IS the term-asc tie-break
        order = np.lexsort((uniq, -sc))[:max_terms]
        return np.sort(uniq[order]).astype(np.int64)

    def more_like_this(
        self, text: str, k: int = 10, max_terms: int = 5, exclude_url: str | None = None
    ) -> list[tuple[int, float, str]]:
        """More-like-this: the seed text reduces to its ``max_terms``
        highest-tf·idf terms, which run as a unit-weight BoW query through
        the unchanged BM25 kernels; ``exclude_url`` (normally the seed
        itself) is dropped from the merged ranking (fetched k+1 deep so the
        page stays full) — the Lucene MoreLikeThis serving shape."""
        qtids = self.mlt_terms(text, max_terms)
        if qtids.size == 0:
            return []
        qw = np.ones(qtids.size, np.float64)
        kk = k + (1 if exclude_url is not None else 0)
        cands = [sh.score_exhaustive(qtids, qw, kk) for sh in self.shards]
        merged = self._merge_shard_topk(cands, kk)
        if exclude_url is not None:
            merged = [r for r in merged if r[2] != exclude_url][:k]
        return merged

    def search_phrase(self, text: str, k: int = 10) -> list[tuple[int, float, str]]:
        """Exact-phrase top-k (requires a ``store_forward=True`` build):
        docs whose token stream contains the query tokens CONSECUTIVELY,
        ranked by the same BM25 bag score / (-score, doc) tie-break as
        :meth:`search`.  An OOV phrase token ⇒ no match anywhere ⇒ []."""
        from ..functions.hashing import md5_u64

        toks = self.tok.tokenize(text)
        if not toks:
            return []
        qtids, qw = self.encode_query(text)
        if qtids.size == 0 or int(qw.sum()) != len(toks):
            return []  # at least one phrase token is OOV
        h_seq = md5_u64(toks)
        cands = [sh.phrase_topk(qtids, qw, h_seq, k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def search_query_string(self, qstring: str, k: int = 10) -> list[tuple[int, float, str]]:
        """Lucene/ES ``query_string`` retrieval: ``+must``, ``-must_not``,
        bare should terms, ``"quoted phrases"`` and ``^boost`` factors,
        composed onto the existing BM25 / phrase kernels per shard.

        Contract: docs must satisfy every must clause (when none exist, at
        least one should clause) and no must_not clause; the score is the
        boost-weighted sum of the BM25 bag scores of the must+should
        clauses the doc matches, (-score, doc_id) ties.  A clause with an
        OOV token can never match: as a must that empties the result, as a
        should it's dropped, as a must_not it excludes nothing.  Phrase
        clauses need ``store_forward=True`` builds."""
        spec = self.build_query_string_spec(qstring)
        if spec is None:
            return []
        cands = [sh.score_query_string(spec, k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def build_query_string_spec(self, qstring: str) -> list[dict] | None:
        """Parse + vocab-encode a query_string into the shard kernels'
        clause spec (query-side state only — shared by the local and the
        scatter-gather serving paths).  None ⇔ the query can match nothing
        (an OOV must clause, or no scoring clause survives)."""
        from ..functions.hashing import md5_u64

        spec = []
        for role, kind, text, boost in parse_query_string(qstring):
            toks = self.tok.tokenize(text)
            if not toks:
                continue
            qtids, qw = self.encode_query(text)
            known_all = qtids.size > 0 and int(qw.sum()) == len(toks)
            if not known_all:
                if role == "must":
                    return None  # an unmatchable must clause empties the query
                continue  # OOV should never matches; OOV must_not excludes nothing
            spec.append(
                {
                    "role": role,
                    "qtids": qtids,
                    "qw": qw,
                    "boost": boost,
                    "h_seq": md5_u64(toks) if kind == "phrase" else None,
                }
            )
        return spec if any(c["role"] != "not" for c in spec) else None

    def search_phrase_prefix(
        self, text: str, k: int = 10, max_expansions: int = 50
    ) -> list[tuple[int, float, str]]:
        """match_phrase_prefix (ES search-as-you-type): the LAST token is
        a prefix; it expands to the first ``max_expansions`` vocab terms
        with that prefix IN TERM ORDER (the ES cap), and a doc matches
        when the head tokens + any expansion occur consecutively (forward
        streams verify, per variant).  Matched docs rank by the BM25 bag
        score of the HEAD terms — a deterministic scoring contract the
        SQL oracle replays exactly (ES's own phrase-freq scoring is
        expansion-dependent).  OOV head ⇒ no match anywhere ⇒ []."""
        from ..functions.hashing import md5_u64

        toks = self.tok.tokenize(text)
        if len(toks) < 2:
            raise ValueError("phrase_prefix takes >= 1 head token + a prefix")
        head, pre = toks[:-1], toks[-1]
        exp_tids = self.expand_prefix(pre)[:max_expansions]
        if exp_tids.size == 0:
            return []
        head_tids, head_qw = self.encode_query(" ".join(head))
        if head_tids.size == 0 or int(head_qw.sum()) != len(head):
            return []  # an OOV head token can never match
        variants = []
        for tid in exp_tids:
            term = str(self.vocab_index[int(tid)])
            seq = head + [term]
            qtids, _qw = self.encode_query(" ".join(seq))
            variants.append((qtids, md5_u64(seq)))
        cands = [sh.phrase_prefix_topk(variants, head_tids, head_qw, k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def search_near(self, term_a: str, term_b: str, window: int, k: int = 10) -> list[tuple[int, float, str]]:
        """Proximity top-k (requires ``store_forward=True``): docs where
        the two (distinct, single-token) terms occur within ``window``
        token positions, BM25-bag-ranked with the usual tie-break."""
        from ..functions.hashing import md5_u64

        ta, tb = self.tok.tokenize(term_a), self.tok.tokenize(term_b)
        if len(ta) != 1 or len(tb) != 1 or ta[0] == tb[0]:
            raise ValueError("near search takes two distinct single-token terms")
        qtids, qw = self.encode_query(f"{ta[0]} {tb[0]}")
        if qtids.size < 2:
            return []  # a term is OOV — no doc can satisfy the AND
        h = md5_u64([ta[0], tb[0]])
        cands = [sh.near_topk(qtids, qw, int(h[0]), int(h[1]), window, k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def search_sloppy(self, term_a: str, term_b: str, slop: int, k: int = 10) -> list[tuple[int, float, str]]:
        """Sloppy-phrase top-k (requires ``store_forward=True``): ordered
        pairs ``a … b`` within ``slop`` insertions, each weighted by
        1/distance into ONE saturated phrase frequency — the Lucene
        ``PhraseQuery(slop)`` scoring shape, vs :meth:`search_near`'s
        binary-match bag ranking.  idf is the summed per-term idf over
        the reader's global stats."""
        from ..functions.hashing import md5_u64

        ta, tb = self.tok.tokenize(term_a), self.tok.tokenize(term_b)
        if len(ta) != 1 or len(tb) != 1 or ta[0] == tb[0]:
            raise ValueError("sloppy search takes two distinct single-token terms")
        qtids, _qw = self.encode_query(f"{ta[0]} {tb[0]}")
        if qtids.size < 2:
            return []  # a term is OOV — no doc can satisfy the AND
        df = self.df[qtids].astype(np.float64)
        idf_sum = float(np.log1p((self.n_docs - df + 0.5) / (df + 0.5)).sum())
        h = md5_u64([ta[0], tb[0]])
        cands = [
            sh.sloppy_topk(
                qtids, int(h[0]), int(h[1]), slop, k, idf_sum, self.avgdl, self.cfg.k1, self.cfg.b
            )
            for sh in self.shards
        ]
        return self._merge_shard_topk(cands, k)

    def search_span_near(self, text: str, slop: int, k: int = 10) -> list[tuple[int, float, str]]:
        """Ordered span-near top-k (requires ``store_forward=True``): the
        query tokens must appear IN ORDER with at most ``slop`` extra
        positions across the whole span; BM25-bag-ranked with the usual
        (-score, doc) tie-break.  ``slop=0`` ≡ :meth:`search_phrase` on
        repeat-free spans; an OOV span token ⇒ no match anywhere ⇒ []."""
        from ..functions.hashing import md5_u64

        toks = self.tok.tokenize(text)
        if len(toks) < 2:
            raise ValueError("span-near search needs at least two tokens")
        qtids, qw = self.encode_query(text)
        if qtids.size == 0 or int(qw.sum()) != len(toks):
            return []  # at least one span token is OOV
        h_seq = md5_u64(toks)
        cands = [sh.span_near_topk(qtids, qw, h_seq, slop, k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def search_span_not(
        self, text: str, exclude: str, slop: int, k: int = 10
    ) -> list[tuple[int, float, str]]:
        """Span-not top-k (Lucene ``SpanNotQuery``, requires
        ``store_forward=True``): ordered span-near of the query tokens
        (slop as :meth:`search_span_near`) with NO occurrence of the
        (single-token) exclude term inside the matching span's positions;
        BM25-bag-ranked over the include terms with the usual (-score, doc)
        tie-break.  An OOV include token ⇒ no match anywhere ⇒ []; an OOV
        exclude term excludes nothing (≡ plain span-near)."""
        from ..functions.hashing import md5_u64

        toks = self.tok.tokenize(text)
        if len(toks) < 2:
            raise ValueError("span-not search needs at least two include tokens")
        etoks = self.tok.tokenize(exclude)
        if len(etoks) != 1:
            raise ValueError(f"span-not takes one exclude term, got {etoks!r}")
        if etoks[0] in toks:
            raise ValueError("exclude term must differ from every include token")
        qtids, qw = self.encode_query(text)
        if qtids.size == 0 or int(qw.sum()) != len(toks):
            return []  # at least one include token is OOV
        h_seq = md5_u64(toks)
        h_excl = int(md5_u64(etoks)[0])
        cands = [sh.span_not_topk(qtids, qw, h_seq, h_excl, slop, k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def search_span_containing(
        self, text: str, little: str, slop: int, k: int = 10
    ) -> list[tuple[int, float, str]]:
        """Span-containing top-k (Lucene ``SpanContainingQuery``): the BIG
        span is the ordered span-near of the query tokens (slop as
        :meth:`search_span_near`), and a doc matches iff at least one big
        span HOLDS an occurrence of the (single-token) ``little`` term
        inside its positions; BM25-bag-ranked over the big terms.  An OOV
        little term can be contained nowhere ⇒ []."""
        from ..functions.hashing import md5_u64

        toks = self.tok.tokenize(text)
        if len(toks) < 2:
            raise ValueError("span-containing needs at least two big tokens")
        ltoks = self.tok.tokenize(little)
        if len(ltoks) != 1:
            raise ValueError(f"span-containing takes one little term, got {ltoks!r}")
        if ltoks[0] in toks:
            raise ValueError("little term must differ from every big token")
        qtids, qw = self.encode_query(text)
        if qtids.size == 0 or int(qw.sum()) != len(toks):
            return []  # at least one big token is OOV
        h_seq = md5_u64(toks)
        h_little = int(md5_u64(ltoks)[0])
        cands = [
            sh.span_not_topk(qtids, qw, h_seq, h_little, slop, k, contain=True)
            for sh in self.shards
        ]
        return self._merge_shard_topk(cands, k)

    def search_span_within(
        self, text: str, little: str, slop: int, k: int = 10
    ) -> list[tuple[int, float, str]]:
        """Span-within top-k (Lucene ``SpanWithinQuery``, the dual of
        :meth:`search_span_containing`): the match set is docs where the
        (single-token) ``little`` term occurs inside an ordered span-near
        match of the big ``text`` tokens — identical to span-containing —
        but the RETURNED query is the little span, so ranking is BM25 on
        the little term (the big span is pure containment context).  OOV
        little ⇒ []; OOV big token ⇒ no enclosing span ⇒ []."""
        from ..functions.hashing import md5_u64

        toks = self.tok.tokenize(text)
        if len(toks) < 2:
            raise ValueError("span-within needs at least two big tokens")
        ltoks = self.tok.tokenize(little)
        if len(ltoks) != 1:
            raise ValueError(f"span-within takes one little term, got {ltoks!r}")
        if ltoks[0] in toks:
            raise ValueError("little term must differ from every big token")
        qtids, qw = self.encode_query(text)
        if qtids.size == 0 or int(qw.sum()) != len(toks):
            return []  # at least one big token is OOV
        stids, sw = self.encode_query(ltoks[0])
        if stids.size == 0:
            return []  # OOV little term matches nowhere
        h_seq = md5_u64(toks)
        h_little = int(md5_u64(ltoks)[0])
        cands = [
            sh.span_not_topk(
                qtids, qw, h_seq, h_little, slop, k, contain=True,
                score_tids=stids, score_weights=sw,
            )
            for sh in self.shards
        ]
        return self._merge_shard_topk(cands, k)

    def search_intervals(self, text: str, max_gaps: int, k: int = 10) -> list[tuple[int, float, str]]:
        """Unordered interval top-k (ES ``intervals`` / ``all_of(ordered:
        false, max_gaps)``, requires ``store_forward=True``): all query
        tokens (distinct) within one window in any order, total internal
        gaps ≤ ``max_gaps``; BM25-bag-ranked with the usual (-score, doc)
        tie-break.  An OOV token ⇒ all_of can never match ⇒ []."""
        from ..functions.hashing import md5_u64

        toks = self.tok.tokenize(text)
        if len(toks) < 2:
            raise ValueError("intervals search needs at least two tokens")
        if len(set(toks)) != len(toks):
            raise ValueError("intervals contract covers distinct terms only")
        qtids, qw = self.encode_query(text)
        if qtids.size == 0 or int(qw.sum()) != len(toks):
            return []  # at least one interval token is OOV
        h_terms = md5_u64(toks)
        cands = [sh.intervals_topk(qtids, qw, h_terms, max_gaps, k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def search_span_first(self, term: str, end: int, k: int = 10) -> list[tuple[int, float, str]]:
        """Span-first top-k (Lucene ``SpanFirstQuery``, requires
        ``store_forward=True``): docs where the (single-token) term occurs
        at a token position strictly below ``end`` — the "match in the
        title / lead" restriction — BM25-ranked on the term with the usual
        (-score, doc) tie-break.  OOV term ⇒ no match anywhere ⇒ []."""
        from ..functions.hashing import md5_u64

        toks = self.tok.tokenize(term)
        if len(toks) != 1:
            raise ValueError(f"span-first takes one term, got {toks!r}")
        qtids, qw = self.encode_query(toks[0])
        if qtids.size == 0:
            return []
        h = int(md5_u64(toks)[0])
        cands = [sh.span_first_topk(qtids, qw, h, int(end), k) for sh in self.shards]
        return self._merge_shard_topk(cands, k)

    def significant_terms(
        self, text: str, k_docs: int = 50, k_terms: int = 10
    ) -> list[tuple[str, int, int, float]]:
        """Significant-terms aggregation (ES ``significant_text`` with a
        top-hits sampler): terms over-represented in the query's top
        ``k_docs`` BM25 hits vs the whole corpus, JLH-scored
        ((fg% − bg%)·fg%/bg%, positive scores only), top ``k_terms`` by
        (−jlh, term).  Returns (term, fg_df, bg_df, jlh) rows.

        Distributed shape: the foreground is k-bounded — each shard owner
        gathers only ITS members of the top-doc set from the forward md5
        streams and ships (hash, fg_df) partials; hashes map back to vocab
        term ids through one cached md5 pass over the vocab (vocab-bounded,
        never corpus-bounded).  Requires ``store_forward=True`` and a
        sorted (string) vocab."""
        fgset = self._foreground_terms(text, k_docs)
        if fgset is None:
            return []
        tids, fg_arr, n_fg = fgset
        fg = fg_arr.astype(np.float64)
        bg = self.df[tids].astype(np.float64)
        fgp, bgp = fg / n_fg, bg / float(self.n_docs)
        jlh = (fgp - bgp) * fgp / bgp
        keep = jlh > 0
        terms = self.vocab_index[tids[keep]]
        rows = sorted(
            zip(terms, fg_arr[keep], bg[keep], jlh[keep]),
            key=lambda r: (-r[3], r[0]),
        )[:k_terms]
        return [(str(t), int(f), int(b), float(j)) for t, f, b, j in rows]

    def _foreground_terms(self, text: str, k_docs: int) -> tuple[np.ndarray, np.ndarray, float] | None:
        """(vocab tids, per-term distinct-doc counts, sample size) over the
        query's top ``k_docs`` hits — the shared foreground gather of the
        sampled-aggregation family (significant_terms / rare_terms).
        k-bounded: only the top docs' forward streams are decoded, one
        run-length pass per shard owner, hashes map back through the
        cached vocab-hash table.  None when the query matches nothing."""
        if self.vocab_index is None:
            raise ValueError("sampled term aggregations need a sorted-vocab BM25 index")
        top = self.search(text, k_docs)
        if not top:
            return None
        docs = np.asarray(sorted(d for d, _s, _u in top), dtype=np.int64)
        parts = []
        for sh in self.shards:
            if sh.fwd_stream is None:
                raise ValueError("sampled term aggregations require an index built with store_forward=True")
            loc = np.flatnonzero(np.isin(sh.doc_ids, docs))
            if loc.size == 0:
                continue
            pos, cidx = sh._candidate_windows(loc, 1)
            if pos.size == 0:
                continue
            # distinct (doc, hash) pairs only: fg_df counts DOCS, not tokens
            order = np.lexsort((sh.fwd_stream[pos], cidx))
            tok, ci = sh.fwd_stream[pos][order], cidx[order]
            first = np.ones(tok.size, dtype=bool)
            first[1:] = (tok[1:] != tok[:-1]) | (ci[1:] != ci[:-1])
            parts.append(tok[first])
        if not parts:
            return None
        hashes, fg_df = np.unique(np.concatenate(parts), return_counts=True)
        hv_sorted, perm = self._vocab_hash_map()
        idx = np.minimum(np.searchsorted(hv_sorted, hashes), hv_sorted.size - 1)
        known = hv_sorted[idx] == hashes
        return perm[idx[known]], fg_df[known], float(docs.size)

    def rare_terms(self, text: str, k_docs: int = 50, max_df: int = 50, k_terms: int = 10) -> list[tuple[str, int, int]]:
        """Rare-terms aggregation (ES ``rare_terms``, sampler-bounded like
        :meth:`significant_terms`): terms of the query's top ``k_docs``
        hits whose GLOBAL df is at most ``max_df``, ranked by (df asc,
        term asc).  Returns (term, bg_df, fg_df) rows — the long-tail dual
        of a terms aggregation (which surfaces heads)."""
        fgset = self._foreground_terms(text, k_docs)
        if fgset is None:
            return []
        tids, fg_df, _n_fg = fgset
        bg = self.df[tids]
        keep = bg <= max_df
        terms = self.vocab_index[tids[keep]]
        rows = sorted(zip(terms, bg[keep], fg_df[keep]), key=lambda r: (r[1], r[0]))[:k_terms]
        return [(str(t), int(b), int(f)) for t, b, f in rows]

    def _merge_shard_topk(self, cands: list[tuple[np.ndarray, np.ndarray]], k: int) -> list[tuple[int, float, str]]:
        docs = np.concatenate([c[0] for c in cands]) if cands else np.zeros(0, np.int64)
        scores = np.concatenate([c[1] for c in cands]) if cands else np.zeros(0)
        if docs.size == 0:
            return []
        order = np.lexsort((docs, -scores))[:k]
        return [(int(docs[i]), float(scores[i]), self.url_of(int(docs[i]))) for i in order]


class FederatedReader:
    """Query-time federation over multiple segment indexes (the ES
    cross-index / Lucene MultiReader shape with ``dfs_query_then_fetch``
    statistics): the union df/cf/n_docs/sum_dl are one vocab-bounded
    merge of the per-segment vocab tables, each segment then scores under
    the GLOBAL stats via :class:`IndexReader`'s ``global_stats`` seam.
    Because BM25 weights depend only on (tf, dl, global df, n_docs,
    avgdl), the merged top-k is rank- AND score-identical to a single
    build (or a physical :func:`~splade_ray.pipelines.merge.merge_segments`)
    of the union corpus — federation is the query-time dual of the
    physical merge, so segments can be searched the moment they land,
    no merge required."""

    def __init__(
        self,
        index_dirs: list[str],
        cfg: EngineConfig | None = None,
        deletes: list[list[str] | None] | None = None,
    ):
        """``deletes``: optional per-segment tombstone url lists applied at
        load (Lucene upsert semantics: a re-crawled url's STALE version is
        tombstoned in its old segment while the new revision lives in a
        later segment; union statistics stay frozen over both versions
        until a physical merge purges the tombstones)."""
        if not index_dirs:
            raise ValueError("federated search needs at least one segment index")
        if deletes is not None and len(deletes) != len(index_dirs):
            raise ValueError("deletes must have one (possibly None) entry per segment")
        vocabs, metas = [], []
        for d in index_dirs:
            stats_dir = os.path.join(d, "stats")
            meta = read_json(os.path.join(stats_dir, "meta.json"))
            if meta.get("encoder", "bm25") != "bm25" or meta.get("vocab_mode", "sorted") != "sorted":
                raise ValueError("federated search needs sorted-vocab bm25 segments")
            if meta.get("sum_dl") is None:
                raise ValueError(
                    "federated search needs sum_dl in every segment's meta "
                    "(weight_mode='tf' builds) for exact global avgdl"
                )
            metas.append(meta)
            vocabs.append(pq.read_table(os.path.join(stats_dir, "vocab.parquet")))
        n_docs = int(sum(m["n_docs"] for m in metas))
        sum_dl = int(sum(m["sum_dl"] for m in metas))
        avgdl = sum_dl / n_docs
        # union df/cf: one Arrow concat + group_by-sum (vocab-bounded, no
        # per-term Python — at vocab_mode="hashed" scale the dict loop this
        # replaces was seconds of driver time per open), then a vectorized
        # hash-gather back to each segment's vocab order
        with_cf = all("cf" in v.column_names for v in vocabs)
        cols = ["term", "df"] + (["cf"] if with_cf else [])
        union = pa.concat_tables([v.select(cols) for v in vocabs])
        aggs = [("df", "sum")] + ([("cf", "sum")] if with_cf else [])
        merged = union.group_by("term").aggregate(aggs)
        union_index = pd.Index(merged.column("term").to_pylist())
        m_df = merged.column("df_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        m_cf = (
            merged.column("cf_sum").to_numpy(zero_copy_only=False).astype(np.int64)
            if with_cf
            else None
        )
        self.readers = []
        for i, (d, v) in enumerate(zip(index_dirs, vocabs)):
            pos = union_index.get_indexer(v.column("term").to_pylist())
            gs = {
                "n_docs": n_docs,
                "avgdl": avgdl,
                "sum_dl": sum_dl,
                "df": m_df[pos],
                "cf": m_cf[pos] if with_cf else None,
            }
            self.readers.append(
                IndexReader(d, cfg, global_stats=gs, deletes=(deletes[i] if deletes else None))
            )
        self.n_docs = n_docs
        self.avgdl = avgdl

    @classmethod
    def from_generation(cls, root: str, cfg: "EngineConfig | None" = None, gen: int | None = None) -> "FederatedReader":
        """Open the index view committed as generation ``gen`` of ``root``
        (default: latest) — the ES point-in-time read path: the manifest
        (``state/generations.py``, Lucene ``segments_N``) names immutable
        segments + tombstones, so a reader pinned to an old generation is
        isolated from every later upsert/delete/merge commit no matter
        when it is constructed."""
        from ..state.generations import read_generation

        m = read_generation(root, gen)
        deletes = m.get("deletes")
        if deletes is not None and all(d is None for d in deletes):
            deletes = None
        return cls(m["segments"], cfg, deletes=deletes)

    def search(self, text: str, k: int = 10, method: str = "exhaustive") -> list[tuple[int, float, str]]:
        """Merged top-k across all segments, usual (-score, doc)
        tie-break (doc ids are globally unique via doc_id_base).  Ranks,
        scores and urls are identical to the single build; the internal
        doc-id VALUES are per-build labels (Lucene semantics) — they
        coincide with the single build's only when each segment's
        doc_id_base equals the previous segments' deduplicated doc count
        (ties still order identically either way, because doc ids stay
        url-monotonic across ordered segments)."""
        hits = [h for r in self.readers for h in r.search(text, k, method=method)]
        hits.sort(key=lambda h: (-h[1], h[0]))
        return hits[:k]

    def search_filtered(self, text: str, k: int = 10, allow_urls=None) -> list[tuple[int, float, str]]:
        """Filtered federation (ES filtered-alias serving): each segment
        applies the allow mask inside its own scorer (live-docs shape,
        segment statistics unchanged), then the usual merged top-k."""
        hits = [h for r in self.readers for h in r.search_filtered(text, k, allow_urls=allow_urls)]
        hits.sort(key=lambda h: (-h[1], h[0]))
        return hits[:k]


class SearcherStage:
    """map_batches(pyarrow) actor-pool stage over a queries Dataset:
    (query_id, text) → top-k rows (query_id, rank, doc_id, url, score).
    Each actor loads the index once (``__init__``)."""

    def __init__(self, index_dir: str, k: int = 10, method: str = "exhaustive", cfg: EngineConfig | None = None):
        self.reader = IndexReader(index_dir, cfg)
        self.k = k
        self.method = method

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, urls, scores = [], [], [], [], []
        for qid, text in zip(batch.column("query_id").to_pylist(), batch.column("text").to_pylist()):
            for rank, (doc, score, url) in enumerate(self.reader.search(text, self.k, self.method), 1):
                qids.append(qid)
                ranks.append(rank)
                docs.append(doc)
                urls.append(url)
                scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.string()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def apply_deletes(index_dir: str, urls: list[str]) -> int:
    """Record tombstone deletes for an index: merges ``urls`` into the
    index's ``deletes.json`` (atomic write).  Every subsequent
    :class:`IndexReader` / :class:`ShardedSearcher` load excludes them from
    all results; global statistics stay those of the build until a segment
    merge rewrites the index (standard tombstone semantics).  Returns the
    total tombstone count."""
    from ..state.lineage import atomic_write_json

    path = os.path.join(index_dir, "deletes.json")
    cur = (read_json(path) or {}).get("urls", [])
    merged = sorted(set(cur) | set(urls))
    atomic_write_json(path, {"urls": merged})
    return len(merged)


def _ordered_walk(shards, qtids: np.ndarray, k: int) -> tuple[list[int], int]:
    """First ``k`` matching internal doc ids in index order via a k-way
    posting merge that never visits postings past the k-th match.  Shards
    are walked in doc-range order; shared by the local reader and the
    shard-owner actors (each actor walks only its own shards, so its
    result is ≤ k ids and the driver merge is k·|actors| cells)."""
    out: list[int] = []
    touched = 0
    for sh in shards:
        slices = sh._term_slices(qtids)
        if not slices:
            continue
        del_mask = None
        if sh.deleted_local.size:
            del_mask = np.zeros(sh.n_local, dtype=bool)
            del_mask[sh.deleted_local] = True
        ptrs = [s for _, s, e, _ in slices]
        ends = [e for _, s, e, _ in slices]
        while len(out) < k:
            nxt = -1
            for j in range(len(ptrs)):
                if ptrs[j] < ends[j]:
                    d0 = int(sh.post_local[ptrs[j]])
                    if nxt < 0 or d0 < nxt:
                        nxt = d0
            if nxt < 0:
                break
            for j in range(len(ptrs)):
                if ptrs[j] < ends[j] and int(sh.post_local[ptrs[j]]) == nxt:
                    ptrs[j] += 1
                    touched += 1
            if del_mask is not None and del_mask[nxt]:
                continue
            out.append(int(sh.doc_ids[nxt]))
        if len(out) >= k:
            break
    return out[:k], touched


def best_snippet_window(th: np.ndarray, qh: np.ndarray, W: int) -> tuple[int, int, int]:
    """Best W-token window over one doc's md5 token stream: (start, end,
    n_hits) with the most query-term occurrence positions inside the
    window, earliest start on ties — the exact rule of the
    ``search_snippets`` pipeline (queries.py), shared by the sharded
    serving path so both produce identical windows."""
    n = th.size
    if qh.size:
        ins = np.searchsorted(qh, th)
        ishit = (qh[np.minimum(ins, qh.size - 1)] == th).astype(np.int64)
    else:
        ishit = np.zeros(n, np.int64)
    csum = np.concatenate(([0], np.cumsum(ishit)))
    n_starts = max(n - W + 1, 1)
    wsum = csum[np.minimum(np.arange(n_starts) + W, n)] - csum[:n_starts]
    s = int(np.argmax(wsum)) if n else 0  # first max → earliest tie
    return s, min(s + W, n), int(wsum[s]) if n else 0


@ray.remote
class ShardScorerActor:
    """Pins one (or a few) shard partitions; serves scatter-gather scoring.
    Reference T5 pattern (pinned postings + reusable buffers).

    ``corpus_path`` (optional) points at the corpus parquet the index was
    built from (url, text, ...): snippet requests then fetch ONLY the
    local top-k candidates' rows via a url-predicate parquet read — the
    k-bounded point lookup a doc-partitioned serving node does against
    its own document store."""

    def __init__(
        self,
        index_dir: str,
        shard_ids: list[int],
        cfg_kwargs: dict | None = None,
        corpus_path: str | None = None,
    ):
        cfg = EngineConfig(**(cfg_kwargs or {}))
        self.reader = IndexReader(index_dir, cfg, shard_ids=shard_ids)
        self.corpus_path = corpus_path
        self.tok = Tokenizer(cfg)

    def score(self, qtids: np.ndarray, qw: np.ndarray, k: int, method: str = "exhaustive"):
        cands_d, cands_s, cands_u = [], [], []
        for sh in self.reader.shards:
            fn = sh.score_wand if method == "wand" else sh.score_exhaustive
            d, s = fn(qtids, qw, k)
            cands_d.append(d)
            cands_s.append(s)
            cands_u.extend(self.reader.url_of(int(x)) for x in d)
        d = np.concatenate(cands_d) if cands_d else np.zeros(0, np.int64)
        s = np.concatenate(cands_s) if cands_s else np.zeros(0)
        return d, s, cands_u

    def mscore(self, encoded: list[tuple[np.ndarray, np.ndarray]], k: int, method: str = "exhaustive"):
        """Multi-search scatter leg (ES ``_msearch``): ONE RPC carries the
        whole encoded query batch; the actor scores every query over its
        pinned shards in a single visit, so per-query cost amortizes the
        actor hop and the postings stay hot across the batch.  Returns one
        (docs, scores, urls) triple per query, each ≤ k per shard."""
        return [self.score(qtids, qw, k, method) for qtids, qw in encoded]

    def score_query_string(self, spec: list[dict], k: int):
        """query_string scatter leg: the driver parses/encodes ONCE, each
        pinned shard composes the clause masks locally (phrase verify
        included when the shard stores forward streams) and ships ≤ k
        candidates."""
        cands_d, cands_s, cands_u = [], [], []
        for sh in self.reader.shards:
            d, s = sh.score_query_string(spec, k)
            cands_d.append(d)
            cands_s.append(s)
            cands_u.extend(self.reader.url_of(int(x)) for x in d)
        d = np.concatenate(cands_d) if cands_d else np.zeros(0, np.int64)
        s = np.concatenate(cands_s) if cands_s else np.zeros(0)
        return d, s, cands_u

    def score_after(self, qtids: np.ndarray, qw: np.ndarray, k: int, after_score: float, after_doc: int):
        """Deep-pagination scatter leg: each pinned shard masks its own
        docs at-or-before the (score, doc_id) cursor BEFORE top-k, so the
        actor ships at most k candidates per shard regardless of page
        depth — pages 1..N never cross the network again."""
        cands_d, cands_s, cands_u = [], [], []
        for sh in self.reader.shards:
            d, s = sh.score_after(qtids, qw, k, after_score, after_doc)
            cands_d.append(d)
            cands_s.append(s)
            cands_u.extend(self.reader.url_of(int(x)) for x in d)
        d = np.concatenate(cands_d) if cands_d else np.zeros(0, np.int64)
        s = np.concatenate(cands_s) if cands_s else np.zeros(0)
        return d, s, cands_u

    def score_synonyms(self, groups: list[np.ndarray], idfs: np.ndarray, k: int):
        """SynonymQuery scatter leg: blended-tf scoring over each pinned
        shard — the driver ships the expanded group tids + blended idfs."""
        cands_d, cands_s, cands_u = [], [], []
        for sh in self.reader.shards:
            d, s = sh.score_synonyms(groups, idfs, k)
            cands_d.append(d)
            cands_s.append(s)
            cands_u.extend(self.reader.url_of(int(x)) for x in d)
        d = np.concatenate(cands_d) if cands_d else np.zeros(0, np.int64)
        s = np.concatenate(cands_s) if cands_s else np.zeros(0)
        return d, s, cands_u

    def score_dismax(self, qtids: np.ndarray, qw: np.ndarray, k: int, tie: float):
        """DisMax scatter leg: each pinned shard returns its local
        max+tie·rest top-k — exact under scatter-gather because the score
        is per-doc and every doc lives in exactly one shard."""
        cands_d, cands_s, cands_u = [], [], []
        for sh in self.reader.shards:
            d, s = sh.score_dismax(qtids, qw, k, tie)
            cands_d.append(d)
            cands_s.append(s)
            cands_u.extend(self.reader.url_of(int(x)) for x in d)
        d = np.concatenate(cands_d) if cands_d else np.zeros(0, np.int64)
        s = np.concatenate(cands_s) if cands_s else np.zeros(0)
        return d, s, cands_u

    def score_phrase(self, qtids: np.ndarray, qw: np.ndarray, h_seq: np.ndarray, k: int):
        cands_d, cands_s, cands_u = [], [], []
        for sh in self.reader.shards:
            d, s = sh.phrase_topk(qtids, qw, h_seq, k)
            cands_d.append(d)
            cands_s.append(s)
            cands_u.extend(self.reader.url_of(int(x)) for x in d)
        d = np.concatenate(cands_d) if cands_d else np.zeros(0, np.int64)
        s = np.concatenate(cands_s) if cands_s else np.zeros(0)
        return d, s, cands_u

    def _attr_for_shards(self, attr_col: str) -> list[np.ndarray]:
        """Per-shard doc-attribute arrays (aligned to local doc order),
        loaded ONCE per actor from a column-pruned corpus read and cached —
        the per-shard attribute column a facet module keeps alongside
        postings (at cluster scale this is a co-located sidecar file, not
        a corpus-wide read)."""
        if self.corpus_path is None:
            raise ValueError("facet serving needs corpus_path")
        cache = getattr(self, "_attr_cache", None)
        if cache is None:
            cache = self._attr_cache = {}
        if attr_col not in cache:
            tbl = pq.read_table(self.corpus_path, columns=["url", attr_col])
            cu = np.asarray(tbl.column("url").to_pylist(), dtype=object)
            ca = np.asarray(tbl.column(attr_col).to_pylist(), dtype=object)
            order = np.argsort(cu)
            cu, ca = cu[order], ca[order]
            per_shard = []
            for sh in self.reader.shards:
                su = np.asarray(sh.urls.to_pylist(), dtype=object)
                pos = np.minimum(np.searchsorted(cu, su), max(cu.size - 1, 0))
                if cu.size == 0 or not (cu[pos] == su).all():
                    raise KeyError(
                        f"facet corpus {self.corpus_path} is missing indexed "
                        f"url(s): index/corpus mismatch"
                    )
                per_shard.append(ca[pos])
            cache[attr_col] = per_shard
        return cache[attr_col]

    def facet_counts(self, qtids: np.ndarray, m: int, attr_col: str = "lang") -> dict[str, int]:
        """Per-facet counts of THIS actor's docs matching >= m distinct
        query terms (the disjunctive match set): one concatenated-postings
        bincount per shard, tombstone-aware, then a unique-count over the
        matched docs' attribute values.  The driver sums |facets| cells per
        actor — match sets never leave the shard owners."""
        attrs = self._attr_for_shards(attr_col)
        out: dict[str, int] = {}
        for sh, attr in zip(self.reader.shards, attrs):
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
            cnt = np.bincount(ids, minlength=sh.n_local)
            if sh.deleted_local.size:
                cnt[sh.deleted_local] = 0
            matched = cnt >= m
            if matched.any():
                vals, c = np.unique(attr[matched].astype(str), return_counts=True)
                for v, k in zip(vals, c):
                    out[str(v)] = out.get(str(v), 0) + int(k)
        return out

    def histogram_counts(self, qtids: np.ndarray, m: int, attr_col: str, width: int) -> dict[int, int]:
        """Histogram aggregation (ES ``histogram``) over the disjunctive
        match set (docs matching >= ``m`` distinct query terms): per-shard
        ``floor(value / width)`` bucket counts off the numeric doc-value
        sidecar, tombstone-aware.  The driver sums |buckets| cells per
        actor — the match set never leaves the shard owners."""
        attrs = self._attr_for_shards(attr_col)
        out: dict[int, int] = {}
        for sh, attr in zip(self.reader.shards, attrs):
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
            cnt = np.bincount(ids, minlength=sh.n_local)
            if sh.deleted_local.size:
                cnt[sh.deleted_local] = 0
            matched = cnt >= m
            if matched.any():
                buckets = np.asarray(attr[matched], dtype=np.int64) // np.int64(width)
                b, c = np.unique(buckets, return_counts=True)
                for bi, ci in zip(b, c):
                    out[int(bi)] = out.get(int(bi), 0) + int(ci)
        return out

    def score_collapse(self, qtids: np.ndarray, qw: np.ndarray, attr_col: str) -> dict:
        """Field collapsing (Lucene grouping / ES ``collapse``): this
        actor's best-scoring doc PER attribute value over its full match
        set — one lexsort by (value, -score, doc_id) per shard, first row
        of each value group wins.  The driver merges |values| cells per
        actor; the match set never leaves the shard owners."""
        attrs = self._attr_for_shards(attr_col)
        out: dict[str, tuple[float, int]] = {}
        for sh, attr in zip(self.reader.shards, attrs):
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
            w = np.concatenate([sh.post_w[s:e] * qw[i] for i, s, e, _ in slices])
            scores = np.bincount(ids, weights=w, minlength=sh.n_local)
            nz = np.flatnonzero(scores)
            if nz.size == 0:
                continue
            vals = np.asarray([str(v) for v in attr[nz]], dtype=object)
            docs, sc = sh.doc_ids[nz], scores[nz]
            # winner election on the 6-decimal score (the repo-wide compare
            # precision) with doc-id tie-break, so engine and SQL oracle
            # agree even when two docs tie at 6 decimals but differ at fp
            # epsilon (ADVICE r3: block_join winning-child asymmetry)
            order = np.lexsort((docs, -np.round(sc, 6), vals))
            sv = vals[order]
            first = np.ones(sv.size, dtype=bool)
            first[1:] = sv[1:] != sv[:-1]
            for i in np.flatnonzero(first):
                j = order[i]
                cand = (float(sc[j]), int(docs[j]))
                prev = out.get(sv[i])
                if prev is None or (-round(cand[0], 6), cand[1]) < (-round(prev[0], 6), prev[1]):
                    out[sv[i]] = cand
        return {v: (s, d, self.reader.url_of(d)) for v, (s, d) in out.items()}

    def score_diversified(
        self, qtids: np.ndarray, qw: np.ndarray, attr_col: str, per_value: int = 2
    ) -> dict:
        """Diversity-capped candidates (ES ``diversified_sampler``): this
        actor's top ``per_value`` scoring docs PER attribute value over its
        full match set.  Each value's GLOBAL top ``per_value`` docs are
        necessarily inside some owner's local top ``per_value`` for that
        value, so the driver merge over |values|·per_value cells per actor
        is exact — the match set never leaves the shard owners."""
        attrs = self._attr_for_shards(attr_col)
        out: dict[str, list[tuple[float, int]]] = {}
        for sh, attr in zip(self.reader.shards, attrs):
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
            w = np.concatenate([sh.post_w[s:e] * qw[i] for i, s, e, _ in slices])
            scores = np.bincount(ids, weights=w, minlength=sh.n_local)
            nz = np.flatnonzero(scores)
            if nz.size == 0:
                continue
            vals = np.asarray([str(v) for v in attr[nz]], dtype=object)
            docs, sc = sh.doc_ids[nz], scores[nz]
            # repo-wide 6-decimal compare with doc-id tie-break (same
            # election as score_collapse / the SQL oracles)
            order = np.lexsort((docs, -np.round(sc, 6), vals))
            sv = vals[order]
            starts = np.r_[0, np.flatnonzero(sv[1:] != sv[:-1]) + 1, sv.size]
            for gi in range(starts.size - 1):
                lo, hi = starts[gi], min(starts[gi] + per_value, starts[gi + 1])
                cand = out.setdefault(sv[lo], [])
                cand.extend((float(sc[order[i]]), int(docs[order[i]])) for i in range(lo, hi))
        for v, cand in out.items():
            cand.sort(key=lambda sd: (-round(sd[0], 6), sd[1]))
            del cand[per_value:]
        return {
            v: [(s, d, self.reader.url_of(d)) for s, d in cand] for v, cand in out.items()
        }

    def score_boosted(
        self,
        qtids: np.ndarray,
        qw: np.ndarray,
        k: int,
        attr_col: str,
        boost: float,
        pivot: float,
        feature: str = "rank_log1p",
        origin: float = 0.0,
    ):
        """Static-signal scoring functions over a numeric doc-value,
        applied to matched docs inside the shard owner before local top-k
        (the modifier never creates a match — zero scores stay zero, so
        tombstones and the nonzero filter are untouched):

        - ``rank_log1p`` (Lucene FeatureField / ES rank_feature):
          score += boost·ln(1 + attr/pivot)
        - ``distance`` (ES distance_feature on a numeric field):
          score += boost·pivot/(pivot + |attr − origin|)
        - ``fvf_log1p_mul`` (ES function_score field_value_factor,
          modifier=log1p, boost_mode=multiply):
          score *= boost·ln(1 + attr/pivot)
        - ``saturation`` (ES rank_feature, saturation function — the
          rank_feature default): score += boost·attr/(attr + pivot)
        """
        attrs = self._attr_for_shards(attr_col)
        cands_d, cands_s, cands_u = [], [], []
        for sh, attr in zip(self.reader.shards, attrs):
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
            w = np.concatenate([sh.post_w[s:e] * qw[i] for i, s, e, _ in slices])
            scores = np.bincount(ids, weights=w, minlength=sh.n_local)
            m = scores > 0
            fa = np.asarray(attr, dtype=np.float64)
            if feature == "rank_log1p":
                scores[m] += boost * np.log1p(fa[m] / pivot)
            elif feature == "distance":
                scores[m] += boost * pivot / (pivot + np.abs(fa[m] - origin))
            elif feature == "fvf_log1p_mul":
                scores[m] *= boost * np.log1p(fa[m] / pivot)
            elif feature == "saturation":
                scores[m] += boost * (fa[m] / (fa[m] + pivot))
            else:
                raise ValueError(f"unknown boost feature: {feature!r}")
            d, s = sh._topk_from_scores(scores, k)
            cands_d.append(d)
            cands_s.append(s)
            cands_u.extend(self.reader.url_of(int(x)) for x in d)
        d = np.concatenate(cands_d) if cands_d else np.zeros(0, np.int64)
        s = np.concatenate(cands_s) if cands_s else np.zeros(0)
        return d, s, cands_u

    def score_terms_set(self, qtids: np.ndarray, k: int, attr_col: str, mod: int):
        """``terms_set`` scatter leg (ES terms_set with a per-DOC
        ``minimum_should_match_field``): a doc matches when it contains at
        least ``required`` DISTINCT of the query terms, where ``required =
        1 + (doc_value mod ``mod``)`` — the corpus carries no native
        msm field, so the per-doc minimum is synthesized from the numeric
        doc-value sidecar (the SQL oracle replays the same expression).
        Matched docs score the unit-weight expanded-OR BM25 bag (each term
        its own idf), computed and top-k'd inside the shard owner."""
        attrs = self._attr_for_shards(attr_col)
        qw = np.ones(qtids.size, np.float64)
        cands_d, cands_s, cands_u = [], [], []
        for sh, attr in zip(self.reader.shards, attrs):
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
            cnt = np.bincount(ids, minlength=sh.n_local)
            if sh.deleted_local.size:
                cnt[sh.deleted_local] = 0
            required = 1 + (np.asarray(attr, dtype=np.int64) % np.int64(mod))
            w = np.concatenate([sh.post_w[s:e] * qw[i] for i, s, e, _ in slices])
            scores = np.bincount(ids, weights=w, minlength=sh.n_local)
            d, s = sh._topk_from_scores(np.where(cnt >= required, scores, 0.0), k)
            cands_d.append(d)
            cands_s.append(s)
            cands_u.extend(self.reader.url_of(int(x)) for x in d)
        d = np.concatenate(cands_d) if cands_d else np.zeros(0, np.int64)
        s = np.concatenate(cands_s) if cands_s else np.zeros(0)
        return d, s, cands_u

    def adjacency_counts(self, filter_tids: list[np.ndarray], ms: np.ndarray) -> np.ndarray:
        """Adjacency-matrix aggregation (ES ``adjacency_matrix``): for M
        named boolean filters (filter i = "matches >= ms[i] distinct terms
        of filter_tids[i]"), the M×M matrix of co-match doc counts over
        THIS actor's shards.  One bincount per (shard, filter) builds an
        n_local×M boolean match matrix; the pairwise counts are one
        M×M matmul — the driver sums M² cells per actor, the match sets
        never leave the shard owners."""
        m_filters = len(filter_tids)
        out = np.zeros((m_filters, m_filters), dtype=np.int64)
        for sh in self.reader.shards:
            mat = np.zeros((sh.n_local, m_filters), dtype=np.int64)
            for fi, (tids, need) in enumerate(zip(filter_tids, ms)):
                slices = sh._term_slices(np.asarray(tids, dtype=np.int64))
                if not slices:
                    continue
                ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
                cnt = np.bincount(ids, minlength=sh.n_local)
                if sh.deleted_local.size:
                    cnt[sh.deleted_local] = 0
                mat[:, fi] = cnt >= int(need)
            out += mat.T @ mat
        return out

    def score_top_hits(self, qtids: np.ndarray, qw: np.ndarray, attr_col: str, n: int) -> dict:
        """Top-hits-per-bucket (ES ``terms`` agg + ``top_hits``): this
        actor's ``n`` best-scoring docs PER attribute value — one lexsort
        by (value, −score, doc) per shard, segmented rank < n filter.  The
        driver merges ≤ n·|values| cells per actor; the match set never
        leaves the shard owners."""
        attrs = self._attr_for_shards(attr_col)
        out: dict[str, list[tuple[float, int]]] = {}
        for sh, attr in zip(self.reader.shards, attrs):
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
            w = np.concatenate([sh.post_w[s:e] * qw[i] for i, s, e, _ in slices])
            scores = np.bincount(ids, weights=w, minlength=sh.n_local)
            nz = np.flatnonzero(scores)
            if nz.size == 0:
                continue
            vals = np.asarray([str(v) for v in attr[nz]], dtype=object)
            docs, sc = sh.doc_ids[nz], scores[nz]
            order = np.lexsort((docs, -sc, vals))
            sv = vals[order]
            grp_start = np.flatnonzero(np.r_[True, sv[1:] != sv[:-1]])
            seg_len = np.diff(np.append(grp_start, sv.size))
            ranks = np.arange(sv.size, dtype=np.int64) - np.repeat(grp_start, seg_len)
            for i in np.flatnonzero(ranks < n):
                j = order[i]
                out.setdefault(sv[i], []).append((float(sc[j]), int(docs[j])))
        return out

    def index_ordered(self, qtids: np.ndarray, k: int):
        """First-k index-order matches among THIS actor's shards: the walk
        stops at the actor-local k-th match, so at most k ids (plus the
        postings_touched counter) ever leave the owner."""
        return _ordered_walk(self.reader.shards, qtids, k)

    def score_decay(
        self, qtids: np.ndarray, qw: np.ndarray, k: int, attr_col: str, origin: float, scale: float
    ):
        """Function-score gauss decay (ES ``function_score`` /
        ``gauss``): matched docs' BM25 scores MULTIPLY by
        ``exp(−(attr − origin)² / (2·σ²))`` with ``σ = scale /
        sqrt(2·ln(1/0.5))`` (ES's decay=0.5-at-scale parametrization).
        Multiplicative, so zero stays zero and tombstones are untouched."""
        attrs = self._attr_for_shards(attr_col)
        sigma2 = scale * scale / (2.0 * np.log(2.0))
        cands_d, cands_s, cands_u = [], [], []
        for sh, attr in zip(self.reader.shards, attrs):
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
            w = np.concatenate([sh.post_w[s:e] * qw[i] for i, s, e, _ in slices])
            scores = np.bincount(ids, weights=w, minlength=sh.n_local)
            fa = np.asarray(attr, dtype=np.float64)
            scores *= np.exp(-((fa - origin) ** 2) / (2.0 * sigma2))
            d, s = sh._topk_from_scores(scores, k)
            cands_d.append(d)
            cands_s.append(s)
            cands_u.extend(self.reader.url_of(int(x)) for x in d)
        d = np.concatenate(cands_d) if cands_d else np.zeros(0, np.int64)
        s = np.concatenate(cands_s) if cands_s else np.zeros(0)
        return d, s, cands_u

    def score_function_score(
        self,
        qtids: np.ndarray,
        qw: np.ndarray,
        k: int,
        functions: list[dict],
        max_boost: float,
        min_score: float,
    ):
        """Multi-function ``function_score`` (ES): each function carries an
        optional doc-value filter; per matched doc the APPLICABLE function
        values combine with ``score_mode=sum`` (1.0 when none apply — ES's
        empty-functions neutral), the combined factor is capped at
        ``max_boost`` BEFORE ``boost_mode=multiply``, and hits under
        ``min_score`` are dropped inside the shard owner.  Function kinds:
        ``fvf`` (weight·ln(1 + attr/div)), ``gauss`` (weight·exp(−(attr −
        origin)²/(2σ²)), decay-0.5-at-scale σ), ``weight`` (a constant).
        Filters: ``(col, 'eq'|'prefix', value)`` over doc-value columns."""
        attr_cols = {f["attr"] for f in functions if "attr" in f} | {
            f["filter"][0] for f in functions if f.get("filter")
        }
        attrs = {c: self._attr_for_shards(c) for c in attr_cols}
        cands_d, cands_s, cands_u = [], [], []
        for si, sh in enumerate(self.reader.shards):
            slices = sh._term_slices(qtids)
            if not slices:
                continue
            ids = np.concatenate([sh.post_local[s:e] for _, s, e, _ in slices])
            w = np.concatenate([sh.post_w[s:e] * qw[i] for i, s, e, _ in slices])
            scores = np.bincount(ids, weights=w, minlength=sh.n_local)
            factor = np.zeros(sh.n_local, dtype=np.float64)
            applied = np.zeros(sh.n_local, dtype=bool)
            for f in functions:
                if f.get("filter"):
                    col, op, val = f["filter"]
                    fv = np.asarray(attrs[col][si], dtype=str)
                    if op == "eq":
                        m = fv == val
                    elif op == "prefix":
                        m = np.char.startswith(fv, val)
                    else:  # pragma: no cover - spec typo guard
                        raise ValueError(f"unknown filter op {op!r}")
                else:
                    m = np.ones(sh.n_local, dtype=bool)
                if f["kind"] == "fvf":
                    a = np.asarray(attrs[f["attr"]][si], dtype=np.float64)
                    v = f["weight"] * np.log1p(a / f["div"])
                elif f["kind"] == "gauss":
                    a = np.asarray(attrs[f["attr"]][si], dtype=np.float64)
                    sigma2 = f["scale"] * f["scale"] / (2.0 * np.log(1.0 / f["decay"]))
                    v = f["weight"] * np.exp(-((a - f["origin"]) ** 2) / (2.0 * sigma2))
                else:  # constant weight
                    v = np.full(sh.n_local, f["weight"])
                factor[m] += v[m]
                applied |= m
            factor[~applied] = 1.0
            scores *= np.minimum(factor, max_boost)
            scores[scores < min_score] = 0.0
            d, s = sh._topk_from_scores(scores, k)
            cands_d.append(d)
            cands_s.append(s)
            cands_u.extend(self.reader.url_of(int(x)) for x in d)
        d = np.concatenate(cands_d) if cands_d else np.zeros(0, np.int64)
        s = np.concatenate(cands_s) if cands_s else np.zeros(0)
        return d, s, cands_u

    def score_snippets(self, qtids: np.ndarray, qw: np.ndarray, qh: np.ndarray, k: int, W: int, method: str = "exhaustive"):
        """Local top-k + best-window snippets for THIS actor's shards.
        Texts come from a url-IN-candidates parquet read (k-bounded rows;
        row groups without matches are pruned by column statistics)."""
        if self.corpus_path is None:
            raise ValueError("ShardScorerActor needs corpus_path for snippet serving")
        from ..functions.hashing import md5_u64

        d, s, urls = self.score(qtids, qw, k, method)
        if d.size == 0:
            return d, s, [], [], [], []
        # keep only the local top-k — snippets for docs that cannot reach
        # the global top-k are wasted fetches
        order = np.lexsort((d, -s))[:k]
        d, s = d[order], s[order]
        urls = [urls[i] for i in order]
        import pyarrow.dataset as pads

        tbl = pq.read_table(
            self.corpus_path, columns=["url", "text"], filters=pads.field("url").isin(urls)
        )
        text_of = dict(zip(tbl.column("url").to_pylist(), tbl.column("text").to_pylist()))
        missing = [u for u in urls if u not in text_of]
        if missing:
            # a top-k url absent from the corpus parquet means the index and
            # corpus_path have diverged (stale cache / rebuilt index) — fail
            # loudly rather than serve an empty snippet for a real hit
            raise KeyError(
                f"snippet corpus {self.corpus_path} is missing {len(missing)} "
                f"indexed url(s), e.g. {missing[0]!r}: index/corpus mismatch"
            )
        starts, hits, snips = [], [], []
        for u in urls:
            toks = self.tok.tokenize(text_of[u] or "")
            th = md5_u64(toks) if toks else np.zeros(0, np.uint64)
            st, en, nh = best_snippet_window(th, qh, W)
            starts.append(st)
            hits.append(nh)
            snips.append(" ".join(toks[st:en]))
        return d, s, urls, starts, hits, snips


class ShardedSearcher:
    """Driver-side scatter-gather over per-shard scorer actors — the
    multi-node deployment shape (each actor would be scheduled on the node
    owning its partition).

    ``replication > 1`` spawns that many identical scorer actors per shard
    group (on a real cluster: replicas pinned to distinct nodes); a query
    fans out to each group's primary and fails over per group to the next
    replica on ``RayActorError`` (ES replica-shard promotion), so results
    are identical whether or not a replica died."""

    def __init__(
        self,
        index_dir: str,
        cfg: EngineConfig = DEFAULT_CONFIG,
        num_actors: int | None = None,
        corpus_path: str | None = None,
        replication: int = 1,
    ):
        self.cfg = cfg
        pdir = os.path.join(index_dir, "postings")
        shard_ids = sorted(
            int(m.group(1))
            for f in os.listdir(pdir)
            if (m := re.match(r"shard-(\d+)\.postings\.parquet$", f))
        )
        n = num_actors or min(len(shard_ids), 8)
        groups = [shard_ids[i::n] for i in range(n) if shard_ids[i::n]]
        # actors must score under the SAME config the index was built with
        # (k1/b/zone_docs) — a default-config actor would misread zone ids
        # and diverge from the local reader
        cfg_kwargs = dataclasses.asdict(cfg)
        if corpus_path is None:
            # the documents-index adapter caches its corpus inside index_dir
            cand = os.path.join(index_dir, "corpus_input.parquet")
            corpus_path = cand if os.path.exists(cand) else None
        self.replica_groups = [
            [
                ShardScorerActor.remote(index_dir, g, cfg_kwargs, corpus_path)
                for _ in range(max(1, replication))
            ]
            for g in groups
        ]
        self.actors = [reps[0] for reps in self.replica_groups]
        # query-side state (vocab) loaded once locally, no shards
        self.reader = IndexReader(index_dir, cfg, shard_ids=[])

    def _scatter(self, make_fut):
        """Call ``make_fut(actor)`` on each group's primary; on actor death
        retry the SAME call on the group's next live replica.  Exhausting a
        group's replicas re-raises (data loss is loud, never silent)."""
        futs = [(gi, 0, make_fut(reps[0])) for gi, reps in enumerate(self.replica_groups)]
        out = []
        for gi, ri, fut in futs:
            while True:
                try:
                    out.append(ray.get(fut))
                    break
                except ray.exceptions.RayActorError:
                    ri += 1
                    if ri >= len(self.replica_groups[gi]):
                        raise
                    fut = make_fut(self.replica_groups[gi][ri])
        return out

    def search(self, text: str, k: int = 10, method: str = "exhaustive") -> list[tuple[int, float, str]]:
        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        if method == "phrase":
            toks = self.reader.tok.tokenize(text)
            if int(qw.sum()) != len(toks):  # OOV phrase token
                return []
            from ..functions.hashing import md5_u64

            h_seq = md5_u64(toks)
            parts = self._scatter(lambda a: a.score_phrase.remote(qtids, qw, h_seq, k))
        else:
            parts = self._scatter(lambda a: a.score.remote(qtids, qw, k, method))
        docs, scores, urls = [], [], []
        for d, s, u in parts:
            docs.append(d)
            scores.append(s)
            urls.extend(u)
        if not docs:  # empty index: zero shards, zero actors
            return []
        d = np.concatenate(docs)
        s = np.concatenate(scores)
        if d.size == 0:
            return []
        order = np.lexsort((d, -s))[:k]
        urls_arr = np.asarray(urls, dtype=object)
        return [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]

    def msearch(
        self, texts: list[str], k: int = 10, method: str = "exhaustive"
    ) -> list[list[tuple[int, float, str]]]:
        """Batched multi-search (ES ``_msearch``): every query is encoded
        once on the driver, then the WHOLE batch rides ONE RPC per shard
        group (with replica failover) — Q queries cost Q·shards scoring
        but only |groups| network round-trips, the amortization a serving
        tier relies on for bulk evaluation / offline rerank feeds.
        Results are rank-identical to Q independent :meth:`search` calls
        (pinned by pytest)."""
        encoded = [self.reader.encode_query(t) for t in texts]
        live = [i for i, (qt, _) in enumerate(encoded) if qt.size > 0]
        out: list[list[tuple[int, float, str]]] = [[] for _ in texts]
        if not live:
            return out
        batch = [encoded[i] for i in live]
        parts = self._scatter(lambda a: a.mscore.remote(batch, k, method))
        for bi, qi in enumerate(live):
            docs, scores, urls = [], [], []
            for per_query in parts:  # one entry per shard group
                d, s, u = per_query[bi]
                docs.append(d)
                scores.append(s)
                urls.extend(u)
            if not docs:
                continue
            d = np.concatenate(docs)
            s = np.concatenate(scores)
            if d.size == 0:
                continue
            order = np.lexsort((d, -s))[:k]
            urls_arr = np.asarray(urls, dtype=object)
            out[qi] = [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]
        return out

    def search_query_string(self, qstring: str, k: int = 10) -> list[tuple[int, float, str]]:
        """query_string over the actor shards: parse/encode once on the
        driver, scatter the clause spec, gather ≤ k candidates per group
        (with replica failover) — identical results to
        :meth:`IndexReader.search_query_string`."""
        spec = self.reader.build_query_string_spec(qstring)
        if spec is None:
            return []
        parts = self._scatter(lambda a: a.score_query_string.remote(spec, k))
        docs, scores, urls = [], [], []
        for d, s, u in parts:
            docs.append(d)
            scores.append(s)
            urls.extend(u)
        if not docs:
            return []
        d = np.concatenate(docs)
        s = np.concatenate(scores)
        if d.size == 0:
            return []
        order = np.lexsort((d, -s))[:k]
        urls_arr = np.asarray(urls, dtype=object)
        return [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]

    def search_collapse(self, text: str, k: int = 10, attr_col: str = "source") -> list[tuple[str, int, float, str]]:
        """Field collapsing (Lucene grouping / ES ``collapse``): the single
        best-scoring doc per ``attr_col`` value, values ranked by their
        winner's (-score, doc_id), top ``k`` values.  Shard owners each
        ship |values| cells; the match set itself never crosses the
        network.  Returns (value, doc_id, score, url) rows."""
        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        futs = [a.score_collapse.remote(qtids, qw, attr_col) for a in self.actors]
        best: dict[str, tuple[float, int, str]] = {}
        for part in ray.get(futs):
            for v, (s, d, u) in part.items():
                prev = best.get(v)
                # 6-decimal compare with doc-id tie-break, matching the
                # per-shard election and the SQL oracles
                if prev is None or (-round(s, 6), d) < (-round(prev[0], 6), prev[1]):
                    best[v] = (s, d, u)
        ranked = sorted(best.items(), key=lambda kv: (-round(kv[1][0], 6), kv[1][1]))[:k]
        return [(v, d, s, u) for v, (s, d, u) in ranked]

    def search_diversified(
        self, text: str, k: int = 10, attr_col: str = "source", per_value: int = 2
    ) -> list[tuple[int, float, str, str]]:
        """Diversified top-k (ES ``diversified_sampler`` + top hits): at
        most ``per_value`` docs per ``attr_col`` value survive, survivors
        ranked by (-score, doc_id), top ``k``.  Shard owners each ship
        ≤ |values|·per_value cells; the driver re-elects per value then
        ranks — exact, because a value's global top ``per_value`` is a
        subset of the union of local top ``per_value`` sets.  Returns
        (doc_id, score, url, value) rows."""
        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        futs = [a.score_diversified.remote(qtids, qw, attr_col, per_value) for a in self.actors]
        best: dict[str, list[tuple[float, int, str]]] = {}
        for part in ray.get(futs):
            for v, cand in part.items():
                best.setdefault(v, []).extend(cand)
        rows = []
        for v, cand in best.items():
            cand.sort(key=lambda c: (-round(c[0], 6), c[1]))
            rows.extend((d, s, u, v) for s, d, u in cand[:per_value])
        rows.sort(key=lambda r: (-round(r[1], 6), r[0]))
        return rows[:k]

    def search_collapse_inner(
        self, text: str, n_groups: int = 3, per_value: int = 2, attr_col: str = "source"
    ) -> list[tuple[str, int, int, int, float, str]]:
        """Field collapsing WITH inner_hits (ES ``collapse.inner_hits``):
        groups ranked by their winner's (-score, doc_id), top ``n_groups``
        groups each expanded to their own top ``per_value`` docs.  The
        exactness argument is :meth:`search_diversified`'s — a value's
        global top ``per_value`` is a subset of the union of the local top
        ``per_value`` sets, so shard owners ship ≤ |values|·per_value cells
        and the match set never crosses the network.  Returns
        (value, group_rank, inner_rank, doc_id, score, url) rows."""
        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        futs = [a.score_diversified.remote(qtids, qw, attr_col, per_value) for a in self.actors]
        pool: dict[str, list[tuple[float, int, str]]] = {}
        for part in ray.get(futs):
            for v, cand in part.items():
                pool.setdefault(v, []).extend(cand)
        groups = []
        for v, cand in pool.items():
            cand.sort(key=lambda c: (-round(c[0], 6), c[1]))
            groups.append((v, cand[:per_value]))
        groups.sort(key=lambda g: (-round(g[1][0][0], 6), g[1][0][1]))
        rows = []
        for grank, (v, cand) in enumerate(groups[:n_groups], 1):
            rows.extend(
                (v, grank, irank, d, s, u) for irank, (s, d, u) in enumerate(cand, 1)
            )
        return rows

    def search_boosted(
        self,
        text: str,
        k: int = 10,
        attr_col: str = "n_chars",
        boost: float = 0.5,
        pivot: float = 1000.0,
        feature: str = "rank_log1p",
        origin: float = 0.0,
    ) -> list[tuple[int, float, str]]:
        """Static-signal retrieval (Lucene FeatureField / ES
        distance_feature / function_score field_value_factor, selected by
        ``feature`` — see :meth:`ShardScorerActor.score_boosted`): BM25
        with the doc-value modifier applied inside each shard owner before
        local top-k."""
        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        futs = [
            a.score_boosted.remote(qtids, qw, k, attr_col, boost, pivot, feature, origin)
            for a in self.actors
        ]
        docs, scores, urls = [], [], []
        for d, s, u in ray.get(futs):
            docs.append(d)
            scores.append(s)
            urls.extend(u)
        if not docs:
            return []
        d = np.concatenate(docs)
        s = np.concatenate(scores)
        if d.size == 0:
            return []
        order = np.lexsort((d, -s))[:k]
        urls_arr = np.asarray(urls, dtype=object)
        return [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]

    def search_terms_set(
        self, terms: list[str], k: int = 10, attr_col: str = "n_chars", mod: int = 3
    ) -> list[tuple[int, float, str]]:
        """``terms_set`` retrieval (ES terms_set query with a per-doc
        ``minimum_should_match_field``): docs containing at least
        ``1 + (doc_value mod mod)`` DISTINCT of ``terms`` rank by the
        unit-weight expanded-OR BM25 bag over the term set.  The driver
        encodes the term set once; each shard owner applies ITS docs'
        minima and ships ≤ k candidates."""
        tids = []
        for t in terms:
            q, _ = self.reader.encode_query(t)
            if q.size:
                tids.append(int(q[0]))
        qtids = np.unique(np.asarray(tids, dtype=np.int64))
        if qtids.size == 0:
            return []
        futs = [a.score_terms_set.remote(qtids, k, attr_col, mod) for a in self.actors]
        docs, scores, urls = [], [], []
        for d, s, u in ray.get(futs):
            docs.append(d)
            scores.append(s)
            urls.extend(u)
        if not docs:
            return []
        d = np.concatenate(docs)
        s = np.concatenate(scores)
        if d.size == 0:
            return []
        order = np.lexsort((d, -s))[:k]
        urls_arr = np.asarray(urls, dtype=object)
        return [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]

    def search_synonyms(self, groups: list[list[str]], k: int = 10) -> list[tuple[int, float, str]]:
        """SynonymQuery top-k on the sharded path: the driver expands the
        groups on its local vocab (tids + blended idfs) and scatter-gathers
        — semantics identical to :meth:`IndexReader.search_synonyms`."""
        g_tids, g_idf = self.reader._expand_synonym_groups(groups)
        if not g_tids:
            return []
        futs = [a.score_synonyms.remote(g_tids, g_idf, k) for a in self.actors]
        docs, scores, urls = [], [], []
        for d, s, u in ray.get(futs):
            docs.append(d)
            scores.append(s)
            urls.extend(u)
        if not docs:
            return []
        d = np.concatenate(docs)
        s = np.concatenate(scores)
        if d.size == 0:
            return []
        order = np.lexsort((d, -s))[:k]
        urls_arr = np.asarray(urls, dtype=object)
        return [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]

    def search_dismax(self, text: str, k: int = 10, tie: float = 0.0) -> list[tuple[int, float, str]]:
        """DisMax top-k on the sharded path — semantics identical to
        :meth:`IndexReader.search_dismax` (per-doc score, so the
        scatter-gather merge is exact)."""
        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        futs = [a.score_dismax.remote(qtids, qw, k, tie) for a in self.actors]
        docs, scores, urls = [], [], []
        for d, s, u in ray.get(futs):
            docs.append(d)
            scores.append(s)
            urls.extend(u)
        if not docs:
            return []
        d = np.concatenate(docs)
        s = np.concatenate(scores)
        if d.size == 0:
            return []
        order = np.lexsort((d, -s))[:k]
        urls_arr = np.asarray(urls, dtype=object)
        return [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]

    def search_after(
        self, text: str, k: int = 10, after: tuple[float, int] | None = None
    ) -> list[tuple[int, float, str]]:
        """Deep pagination on the sharded serving path: the driver fans
        the (score, doc_id) cursor out to every shard owner, each owner
        returns its local top-k strictly after the cursor, the driver
        merges — semantics identical to :meth:`IndexReader.search_after`.
        ``after=None`` degrades to :meth:`search`."""
        if after is None:
            return self.search(text, k)
        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        a_s, a_d = float(after[0]), int(after[1])
        futs = [a.score_after.remote(qtids, qw, k, a_s, a_d) for a in self.actors]
        docs, scores, urls = [], [], []
        for d, s, u in ray.get(futs):
            docs.append(d)
            scores.append(s)
            urls.extend(u)
        if not docs:
            return []
        d = np.concatenate(docs)
        s = np.concatenate(scores)
        if d.size == 0:
            return []
        order = np.lexsort((d, -s))[:k]
        urls_arr = np.asarray(urls, dtype=object)
        return [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]

    def _scatter_expanded(self, qtids: np.ndarray, k: int, method: str) -> list[tuple[int, float, str]]:
        """Scatter-gather an expanded-OR term-id set (unit weights) to the
        shard owners — shared by every dictionary expansion."""
        if qtids.size == 0:
            return []
        qw = np.ones(qtids.size, np.float64)
        futs = [a.score.remote(qtids, qw, k, method) for a in self.actors]
        docs, scores, urls = [], [], []
        for d, s, u in ray.get(futs):
            docs.append(d)
            scores.append(s)
            urls.extend(u)
        if not docs:
            return []
        d = np.concatenate(docs)
        s = np.concatenate(scores)
        if d.size == 0:
            return []
        order = np.lexsort((d, -s))[:k]
        urls_arr = np.asarray(urls, dtype=object)
        return [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]

    def search_index_ordered(self, text: str, k: int = 10) -> list[int]:
        """Early-terminated sort-by-field retrieval on the sharded path
        (index-sorted builds): every owner walks its own doc-range shards
        and stops at its local k-th match, the driver merges ≤ k internal
        ids per actor by id (= index order) — identical results to
        :meth:`IndexReader.search_index_ordered`, with per-owner early
        termination."""
        qtids, _qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        futs = [a.index_ordered.remote(qtids, k) for a in self.actors]
        ids = sorted(i for part, _t in ray.get(futs) for i in part)
        return ids[:k]

    def search_prefix(self, prefix: str, k: int = 10, method: str = "exhaustive") -> list[tuple[int, float, str]]:
        """Wildcard top-k on the sharded path: the driver expands the
        prefix on its local vocab (two binary searches) and scatter-gathers
        the contiguous term-id range to the shard owners — identical
        semantics to :meth:`IndexReader.search_prefix`."""
        return self._scatter_expanded(self.reader.expand_prefix(prefix), k, method)

    def search_fuzzy(
        self, term: str, k: int = 10, max_edits: int = 1, method: str = "exhaustive"
    ) -> list[tuple[int, float, str]]:
        """Fuzzy top-k on the sharded path: the driver expands the term on
        its local vocab (vectorized Levenshtein DP) and scatter-gathers the
        expanded term-id set to the shard owners — identical semantics to
        :meth:`IndexReader.search_fuzzy`."""
        return self._scatter_expanded(self.reader.expand_fuzzy(term, max_edits), k, method)

    def search_regexp(self, pattern: str, k: int = 10, method: str = "exhaustive") -> list[tuple[int, float, str]]:
        """Regexp top-k on the sharded path: the driver expands the pattern
        on its local vocab (one compiled-regex dictionary scan) and
        scatter-gathers the matching term-id set — identical semantics to
        :meth:`IndexReader.search_regexp`."""
        return self._scatter_expanded(self.reader.expand_regexp(pattern), k, method)

    def search_substring(self, sub: str, k: int = 10, method: str = "exhaustive") -> list[tuple[int, float, str]]:
        """Infix top-k on the sharded path: the driver expands the needle
        through its trigram dictionary (intersect + verify, no full vocab
        scan) and scatter-gathers the term-id set — identical semantics to
        :meth:`IndexReader.search_substring`."""
        return self._scatter_expanded(self.reader.expand_substring(sub), k, method)

    def snippets(self, text: str, k: int = 5, W: int = 12, method: str = "exhaustive"):
        """Top-k + best-W-token-window snippets, served ENTIRELY by the
        shard actors: each owner scores its shards and fetches only its
        own local-top-k candidates' texts (k-bounded point reads), the
        driver merges per-shard results — no :class:`IndexReader` over the
        whole index, no corpus scan.  Window rule identical to the
        ``search_snippets`` pipeline (shared ``best_snippet_window``).

        Returns [(doc_id, score, url, start_tok, n_hits, snippet)] in
        (-score, doc_id) order."""
        from ..functions.hashing import md5_u64

        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        toks = self.reader.tok.tokenize(text)
        qh = np.unique(md5_u64(toks)) if toks else np.zeros(0, np.uint64)
        futs = [a.score_snippets.remote(qtids, qw, qh, k, W, method) for a in self.actors]
        docs, scores, urls, starts, hits, snips = [], [], [], [], [], []
        for d, s, u, st, nh, sn in ray.get(futs):
            docs.append(d)
            scores.append(s)
            urls.extend(u)
            starts.extend(st)
            hits.extend(nh)
            snips.extend(sn)
        if not docs:
            return []
        d = np.concatenate(docs)
        if d.size == 0:
            return []
        s = np.concatenate(scores)
        order = np.lexsort((d, -s))[:k]
        return [
            (int(d[i]), float(s[i]), str(urls[i]), int(starts[i]), int(hits[i]), str(snips[i]))
            for i in order
        ]

    def facets(self, text: str, m: int = 1, attr_col: str = "lang") -> dict[str, int]:
        """Faceted match-set counts served by the shard owners: each actor
        counts its own matched docs per facet value (>= m distinct query
        terms) and the driver sums |facets| cells per actor — the match
        set itself never crosses the network."""
        qtids, _ = self.reader.encode_query(text)
        if qtids.size == 0:
            return {}
        futs = [a.facet_counts.remote(qtids, m, attr_col) for a in self.actors]
        total: dict[str, int] = {}
        for part in ray.get(futs):
            for k, v in part.items():
                total[k] = total.get(k, 0) + v
        return total

    def search_top_hits(self, text: str, attr_col: str = "lang", n: int = 3) -> list[tuple[str, int, int, float]]:
        """Top-hits-per-bucket: for each ``attr_col`` value, the ``n``
        best-scoring matched docs ((−score, doc) order).  Returns (value,
        rank, doc_id, score) rows, values sorted ascending."""
        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        futs = [a.score_top_hits.remote(qtids, qw, attr_col, n) for a in self.actors]
        merged: dict[str, list[tuple[float, int]]] = {}
        for part in ray.get(futs):
            for v, hits in part.items():
                merged.setdefault(v, []).extend(hits)
        rows = []
        for v in sorted(merged):
            best = sorted(merged[v], key=lambda h: (-h[0], h[1]))[:n]
            rows.extend((v, r, d, s) for r, (s, d) in enumerate(best, 1))
        return rows

    def search_decay(
        self, text: str, k: int = 10, attr_col: str = "n_chars", origin: float = 1000.0, scale: float = 500.0
    ) -> list[tuple[int, float, str]]:
        """Function-score retrieval with a gauss decay on a numeric
        doc-value (ES ``function_score``/``gauss``): BM25 × exp(−(attr −
        origin)²/(2σ²)), decay 0.5 at ``scale`` from ``origin``, applied
        inside each shard owner before local top-k."""
        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        futs = [a.score_decay.remote(qtids, qw, k, attr_col, origin, scale) for a in self.actors]
        docs, scores, urls = [], [], []
        for d, s, u in ray.get(futs):
            docs.append(d)
            scores.append(s)
            urls.extend(u)
        if not docs:
            return []
        d = np.concatenate(docs)
        s = np.concatenate(scores)
        if d.size == 0:
            return []
        order = np.lexsort((d, -s))[:k]
        urls_arr = np.asarray(urls, dtype=object)
        return [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]

    def search_function_score(
        self,
        text: str,
        k: int,
        functions: list[dict],
        max_boost: float = 3.0,
        min_score: float = 0.0,
    ) -> list[tuple[int, float, str]]:
        """Multi-function ``function_score`` retrieval: shard owners apply
        the filtered functions (score_mode=sum, factor capped at
        ``max_boost``, boost_mode=multiply, ``min_score`` cut) to their OWN
        matched docs before local top-k — only ≤k candidates per actor
        reach the merge."""
        qtids, qw = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        futs = [
            a.score_function_score.remote(qtids, qw, k, functions, max_boost, min_score)
            for a in self.actors
        ]
        docs, scores, urls = [], [], []
        for d, s, u in ray.get(futs):
            docs.append(d)
            scores.append(s)
            urls.extend(u)
        if not docs:
            return []
        d = np.concatenate(docs)
        s = np.concatenate(scores)
        if d.size == 0:
            return []
        order = np.lexsort((d, -s))[:k]
        urls_arr = np.asarray(urls, dtype=object)
        return [(int(d[i]), float(s[i]), str(urls_arr[i])) for i in order]

    def adjacency_matrix(self, filters: list[tuple[str, str, int]]) -> list[tuple[str, str, int]]:
        """Adjacency-matrix aggregation over named boolean filters
        (``(name, text, min_should_match)`` triples): (name_a, name_b,
        n_docs) rows for every a <= b pair with a nonzero intersection —
        the ES ``adjacency_matrix`` response shape (diagonal = per-filter
        counts).  Each actor ships M² cells.  A filter with any OOV-only
        text matches nothing."""
        names, tid_sets, ms = [], [], []
        for name, text, m in filters:
            qtids, _ = self.reader.encode_query(text)
            names.append(name)
            tid_sets.append(qtids)
            ms.append(max(1, int(m)))
        futs = [a.adjacency_counts.remote(tid_sets, np.asarray(ms)) for a in self.actors]
        total = sum(ray.get(futs))
        rows = []
        for i, na in enumerate(names):
            for j in range(i, len(names)):
                c = int(total[i, j])
                if c > 0:
                    rows.append((na, names[j], c))
        return rows

    def histogram(self, text: str, attr_col: str = "n_chars", width: int = 200, m: int = 1) -> list[tuple[int, int]]:
        """Histogram aggregation (ES ``histogram``) over the disjunctive
        match set, served by the shard owners: each actor buckets its own
        matched docs by ``floor(doc_value / width)`` and the driver sums
        |buckets| cells per actor.  Returns (bucket_lo, n_docs) rows in
        bucket order."""
        qtids, _ = self.reader.encode_query(text)
        if qtids.size == 0:
            return []
        futs = [a.histogram_counts.remote(qtids, m, attr_col, width) for a in self.actors]
        total: dict[int, int] = {}
        for part in ray.get(futs):
            for b, c in part.items():
                total[b] = total.get(b, 0) + c
        return [(b * width, total[b]) for b in sorted(total)]

    def shutdown(self):
        for reps in getattr(self, "replica_groups", [self.actors]):
            for a in reps:
                ray.kill(a)
        self.replica_groups = []
        self.actors = []
