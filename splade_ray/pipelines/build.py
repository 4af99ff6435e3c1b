"""End-to-end streaming inverted-index build (SURVEY.md §7 steps 1-4).

Pipeline (each stage a Ray Data transform; every arrow is streamed with
backpressure, never materialized on the driver):

1. ``read_parquet`` (column-pruned: html never read when absent, html
   projected away right after extraction) → :class:`ExtractStage`
   → ``groupby(bucket).map_groups(dedup_assign_group)``
   → ``write_parquet(corpus/)``            [stage ``corpus``]
2. per-bucket counts (tiny aggregate) → exclusive prefix sum on the driver
   → ``ray.put`` broadcast                  [doc-id offsets]
3. corpus → :class:`EncodeStage` (actor pool) → ``write_parquet(doc_terms/)``
                                              [stage ``doc_terms``]
4. df aggregate (partial combiner + small groupby) → vocab + global stats
   → ``stats/``                             [stage ``stats``]
5. doc_terms → :class:`MapTermIdsStage` → ``groupby(shard)``
   → :func:`build_shard_index` (per-shard counting-sort kernel, compressed
   write, lineage record) → ``postings/`` + ``postings/_LINEAGE.json``
                                              [stage ``postings``]

Every stage directory carries ``_SUCCESS.json``; re-running with the same
config skips completed stages, and the postings stage skips valid shards
(per-partition checkpoint resume, north rule).

Reference lifecycle being re-expressed: encode (``script/encode.py:38-69``)
+ index (``script/index.py:54-128``) — see SURVEY.md §3.1-3.2.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig, DEFAULT_CONFIG
from ..stages.dedup import dedup_assign_group
from ..stages.encode import EncodeStage
from ..stages.extract import ExtractStage
from ..stages.neural import NeuralEncodeStage
from ..stages.postings import MapTermIdsStage, add_shard_column, build_shard_index
from ..stages.stats import compute_doc_stats, compute_vocab, compute_vocab_ids
from ..state.lineage import StageGuard, atomic_write_json, config_hash, read_json
from ..util import pool_size


def _corpus_columns(input_paths) -> list[str]:
    import pyarrow.parquet as pq

    path = input_paths[0] if isinstance(input_paths, (list, tuple)) else input_paths
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
        path = files[0]
    names = set(pq.read_schema(path).names)
    cols = [c for c in ("url", "warc_ts", "html", "text", "lang") if c in names]
    if "html" in names and "text" in names:
        # production reads would drop `text` and extract from html alone;
        # keeping both here feeds the byte-identity verification
        pass
    return cols


class IndexBuilder:
    def __init__(
        self,
        out_dir: str,
        cfg: EngineConfig = DEFAULT_CONFIG,
        verify_extraction: bool = False,
        doc_id_base: int = 0,
    ):
        """``doc_id_base``: first doc id of this segment — incremental
        builds (new crawl batches) continue numbering from the previous
        segment's total; segments over disjoint inputs then merge via
        :mod:`splade_ray.pipelines.merge` (term-run merge, north rule)."""
        self.out_dir = out_dir
        self.cfg = cfg.validate()
        self.cfg_hash = config_hash(cfg) + (f"+base{doc_id_base}" if doc_id_base else "")
        self.verify_extraction = verify_extraction
        self.doc_id_base = int(doc_id_base)
        self.timings: dict[str, float] = {}

    # ---------- stage 1: extract + dedup + local idx ----------
    def build_corpus(self, input_paths) -> str:
        corpus_dir = os.path.join(self.out_dir, "corpus")
        guard = StageGuard(corpus_dir, self.cfg_hash)
        if guard.done():
            return corpus_dir
        t0 = time.perf_counter()
        cols = _corpus_columns(input_paths)
        ds = ray.data.read_parquet(input_paths, columns=cols)
        ds = ds.map_batches(
            ExtractStage(self.cfg, verify=self.verify_extraction),
            batch_format="pyarrow",
            batch_size=self.cfg.read_batch_size,
        )
        deduped = ds.groupby("bucket").map_groups(dedup_assign_group, batch_format="pyarrow")
        deduped.write_parquet(corpus_dir)
        self.timings["corpus"] = time.perf_counter() - t0
        guard.commit()
        return corpus_dir

    # ---------- stage 2+3: doc ids + encode ----------
    def build_doc_terms(self) -> str:
        corpus_dir = os.path.join(self.out_dir, "corpus")
        dt_dir = os.path.join(self.out_dir, "doc_terms")
        guard = StageGuard(dt_dir, self.cfg_hash)
        if guard.done():
            return dt_dir
        t0 = time.perf_counter()
        corpus = ray.data.read_parquet(corpus_dir)
        counts = (
            ray.data.read_parquet(corpus_dir, columns=["bucket"]).groupby("bucket").count().to_pandas()
        )
        counts = counts.sort_values("bucket")
        offsets = np.zeros(self.cfg.num_buckets, dtype=np.int64)
        csum = np.concatenate([[0], np.cumsum(counts["count()"].to_numpy())[:-1]])
        offsets[counts["bucket"].to_numpy()] = csum
        offsets += self.doc_id_base
        offsets_ref = ray.put(offsets)

        stage_cls = NeuralEncodeStage if self.cfg.encoder == "neural" else EncodeStage
        corpus.map_batches(
            stage_cls,
            fn_constructor_args=(self.cfg, offsets_ref),
            batch_format="pyarrow",
            batch_size=self.cfg.read_batch_size,
            concurrency=pool_size(),
        ).write_parquet(dt_dir)
        self.timings["doc_terms"] = time.perf_counter() - t0
        guard.commit(n_docs=int(counts["count()"].sum()))
        return dt_dir

    # ---------- stage 4: stats ----------
    def build_stats(self) -> str:
        dt_dir = os.path.join(self.out_dir, "doc_terms")
        stats_dir = os.path.join(self.out_dir, "stats")
        guard = StageGuard(stats_dir, self.cfg_hash)
        if guard.done():
            return stats_dir
        t0 = time.perf_counter()
        if self.cfg.encoder == "neural":
            vocab = compute_vocab_ids(ray.data.read_parquet(dt_dir, columns=["tids"]))
        else:
            vocab = compute_vocab(ray.data.read_parquet(dt_dir, columns=["terms"]))
        meta = compute_doc_stats(
            ray.data.read_parquet(dt_dir, columns=["dl"]), nnz=int(vocab["df"].sum())
        )
        meta["encoder"] = self.cfg.encoder
        os.makedirs(stats_dir, exist_ok=True)
        vocab_tbl = pa.Table.from_pandas(vocab, preserve_index=False)
        import pyarrow.parquet as pq

        pq.write_table(vocab_tbl, os.path.join(stats_dir, "vocab.parquet"))
        atomic_write_json(os.path.join(stats_dir, "meta.json"), meta)
        self.timings["stats"] = time.perf_counter() - t0
        guard.commit(**meta, vocab_size=len(vocab))
        return stats_dir

    # ---------- stage 5: postings ----------
    def build_postings(self) -> str:
        dt_dir = os.path.join(self.out_dir, "doc_terms")
        stats_dir = os.path.join(self.out_dir, "stats")
        postings_dir = os.path.join(self.out_dir, "postings")
        guard = StageGuard(postings_dir, self.cfg_hash)
        if guard.done():
            return postings_dir
        t0 = time.perf_counter()
        import pyarrow.parquet as pq

        meta = read_json(os.path.join(stats_dir, "meta.json"))
        doc_terms = ray.data.read_parquet(dt_dir)
        if self.cfg.encoder == "neural":
            stats_ref = ray.put({"n_docs": meta["n_docs"]})
            kernel = functools.partial(
                build_shard_index,
                postings_dir=postings_dir,
                cfg=self.cfg,
                stats_ref=stats_ref,
                weight_mode="f32",
            )
            sharded = doc_terms.map_batches(
                add_shard_column,
                fn_kwargs={"shard_size": self.cfg.shard_size},
                batch_format="pyarrow",
                batch_size=self.cfg.read_batch_size,
            )
        else:
            vocab = pq.read_table(os.path.join(stats_dir, "vocab.parquet"))
            terms = vocab.column("term").to_pylist()
            df = vocab.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
            vocab_terms_ref = ray.put(np.asarray(terms, dtype=object))
            stats_ref = ray.put({"df": df, "n_docs": meta["n_docs"], "avgdl": meta["avgdl"]})
            kernel = functools.partial(
                build_shard_index, postings_dir=postings_dir, cfg=self.cfg, stats_ref=stats_ref
            )
            sharded = doc_terms.map_batches(
                MapTermIdsStage,
                fn_constructor_args=(self.cfg, vocab_terms_ref),
                batch_format="pyarrow",
                batch_size=self.cfg.read_batch_size,
                concurrency=pool_size(),
            )
        lineage = sharded.groupby("shard").map_groups(kernel, batch_format="pyarrow")
        lineage_df = lineage.to_pandas()
        self.timings["postings"] = time.perf_counter() - t0
        atomic_write_json(
            os.path.join(postings_dir, "_LINEAGE.json"),
            {"shards": lineage_df.sort_values("part_id").to_dict("records")},
        )
        guard.commit(
            n_shards=int(len(lineage_df)),
            nnz=int(lineage_df["nnz"].sum()),
            skipped_shards=int(lineage_df["skipped"].sum()),
        )
        return postings_dir

    def build(self, input_paths) -> dict:
        t0 = time.perf_counter()
        self.build_corpus(input_paths)
        self.build_doc_terms()
        self.build_stats()
        self.build_postings()
        total = time.perf_counter() - t0
        meta = read_json(os.path.join(self.out_dir, "stats", "meta.json")) or {}
        summary = {
            "out_dir": self.out_dir,
            "config_hash": self.cfg_hash,
            "wall_time_s": round(total, 3),
            "timings": {k: round(v, 3) for k, v in self.timings.items()},
            **meta,
        }
        atomic_write_json(os.path.join(self.out_dir, "_MANIFEST.json"), summary)
        return summary




def build_index(
    input_paths,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    verify_extraction: bool = False,
    doc_id_base: int = 0,
) -> dict:
    return IndexBuilder(out_dir, cfg, verify_extraction, doc_id_base=doc_id_base).build(input_paths)
