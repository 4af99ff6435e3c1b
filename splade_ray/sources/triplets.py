"""Training-triplet ingestion (reference S2/M9/K6).

Reference analogue: the local TSV triplet reader —
``qid\\tquery\\tpos\\tneg`` or 3-column ``query\\tpos\\tneg`` lines, with
malformed lines skipped (``/root/reference/src/data/dataset/base.py:
281-308`` + parser ``src/data/dataset/utils.py:39-57``) — and the seeded
pos/neg sampling used to build training rows (``utils.py:74-79``).

Ray-Data form: ``read_text`` → vectorized ``map_batches`` parse (pandas
``str.split`` on the whole batch, not per-row Python), then per-row
deterministic sampling keyed on a hash of the row content (``splitmix64``)
— determinism without global RNG state, so results are independent of
partitioning and task order (SURVEY.md K6 contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset

from ..functions.hashing import md5_u64


def parse_triplet_lines(batch: pd.DataFrame) -> pd.DataFrame:
    """(text) → (query_id, query, pos, neg); 3-column lines get a
    deterministic surrogate qid (hash of the query); malformed lines
    (fewer than 3 columns) are dropped, mirroring the reference's
    skip-and-continue behavior."""
    parts = batch["text"].str.split("\t")
    n_cols = parts.str.len()
    keep4 = n_cols >= 4
    keep3 = n_cols == 3
    out = []
    if keep4.any():
        p4 = parts[keep4]
        out.append(
            pd.DataFrame(
                {
                    "query_id": p4.str[0],
                    "query": p4.str[1],
                    "pos": p4.str[2],
                    "neg": p4.str[3],
                }
            )
        )
    if keep3.any():
        p3 = parts[keep3]
        q = p3.str[0]
        qid = pd.Series(md5_u64(q.tolist()) % np.uint64(10**12)).astype(str)
        qid.index = q.index
        out.append(pd.DataFrame({"query_id": "h" + qid, "query": q, "pos": p3.str[1], "neg": p3.str[2]}))
    if not out:
        return pd.DataFrame({"query_id": [], "query": [], "pos": [], "neg": []}, dtype=str)
    return pd.concat(out).sort_index()


def read_triplets(path: str) -> Dataset:
    return ray.data.read_text(path).map_batches(parse_triplet_lines, batch_format="pandas")


def sample_training_pairs(ds: Dataset, keep_fraction: float = 0.5, seed: int = 10) -> Dataset:
    """Seeded per-row subsampling (K6): keep a row iff
    md5_u64(query_id ++ query ++ seed) < fraction·2^64 — deterministic per
    row, independent of partitioning/order, and SQL-reproducible
    (``md5_number_lower`` in the DuckDB oracle computes the same hash)."""
    threshold = np.uint64(int(keep_fraction * float(2**64 - 1)))

    def keep(batch: pa.Table) -> pa.Table:
        key = [
            f"{q}\x01{t}\x01{seed}"
            for q, t in zip(batch.column("query_id").to_pylist(), batch.column("query").to_pylist())
        ]
        h = md5_u64(key)
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")
