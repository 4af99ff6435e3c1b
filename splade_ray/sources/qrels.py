"""Qrels ingestion (reference M8).

Reference analogue: qrels loading with fallback column-name resolution —
query id from ``query-id|query_id|qid|_id``, doc id from
``corpus-id|doc_id|pid|docid``, relevance from ``score|relevance|rel``
(``/root/reference/src/data/pd_module/retrieval.py:179-200``) — plus the
TREC 4-column text format (``qid 0 docid rel``).  IDs normalize to str
(``src/data/dataset/base.py:110-121``); rows with relevance <= 0 drop.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset

_QID_COLS = ("query-id", "query_id", "qid", "_id")
_DOC_COLS = ("corpus-id", "doc_id", "pid", "docid")
_REL_COLS = ("score", "relevance", "rel")


def _resolve(cols, candidates, what: str) -> str:
    for c in candidates:
        if c in cols:
            return c
    raise ValueError(f"no {what} column among {candidates}; have {list(cols)}")


def normalize_qrels(batch: pd.DataFrame) -> pd.DataFrame:
    """map_batches kernel: any qrels-shaped frame → (query_id: str,
    doc_id: str, relevance: float), positive relevance only."""
    q = _resolve(batch.columns, _QID_COLS, "query-id")
    d = _resolve(batch.columns, _DOC_COLS, "doc-id")
    r = _resolve(batch.columns, _REL_COLS, "relevance")
    out = pd.DataFrame(
        {
            "query_id": batch[q].astype(str),
            "doc_id": batch[d].astype(str),
            "relevance": batch[r].astype(float),
        }
    )
    return out[out["relevance"] > 0].reset_index(drop=True)


def read_qrels(path: str) -> Dataset:
    """Parquet/TSV-with-header qrels → normalized Dataset."""
    if path.endswith(".parquet"):
        ds = ray.data.read_parquet(path)
    else:
        from pyarrow import csv as pacsv

        ds = ray.data.read_csv(path, parse_options=pacsv.ParseOptions(delimiter="\t"))
    return ds.map_batches(normalize_qrels, batch_format="pandas")


def read_trec_qrels(path: str) -> Dataset:
    """TREC format: whitespace-separated ``qid iter docid rel`` lines, no
    header; malformed lines drop."""

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        parts = batch["text"].str.split()
        ok = parts.str.len() >= 4
        p = parts[ok]
        out = pd.DataFrame(
            {
                "query_id": p.str[0].astype(str),
                "doc_id": p.str[2].astype(str),
                "relevance": pd.to_numeric(p.str[3], errors="coerce"),
            }
        )
        return out[out["relevance"] > 0].reset_index(drop=True)

    return ray.data.read_text(path).map_batches(parse, batch_format="pandas")
