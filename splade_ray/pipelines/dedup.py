"""Deduplication family over document tables (training-data pipeline ops).

Not present in the reference (its only set-ops are tiny in-memory dedups,
SURVEY.md §2.7); these are the web-scale operators a Common-Crawl pipeline
needs, each expressed Ray-Data-first:

- exact: content-hash partition (``groupby(hash)``) + per-distinct-text min
  id — the hash-shuffle + per-group-first pattern;
- MinHash + LSH: shingle → k-permutation minhash (one string-hash pass,
  k cheap re-mixes) → band explode → ``groupby(band)`` candidate pairs →
  exact n-gram Jaccard verify;
- SimHash: 64-bit weighted-bit signature; near-dup candidates via 16-bit
  band buckets, verified by Hamming distance;
- embedding cosine near-dup: random-hyperplane signatures → band buckets →
  cosine verify.

Scale notes: every candidate-generation step is a bounded groupby on a
band/bucket key (heavily skewed buckets = exact-dup clusters, bounded by
cluster size, the data's own skew).  The verify step here broadcasts a
doc→features map (fine below ~10M candidates); at 10^12 scale it becomes a
co-partitioned join on doc_id — the candidate-pair schema is already keyed
for it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..util import pool_size
from ..functions.hashing import hash_strings, hash_tokens_to_u64, shingle_hashes, splitmix64
from ..tokenizer import Tokenizer


# ---------------------------------------------------------------- exact dedup
def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = hash_strings(batch.column(text_col).to_pylist())
    return batch.append_column("content_hash", pa.array(h.astype(np.int64)))


def exact_dedup(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """One row per distinct text, keeping the min id (hash-partition +
    per-group first).  Collision-proof: groups are bucketed by 64-bit hash
    but winners are chosen per distinct text within the group."""

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col, kind="mergesort").groupby(text_col, as_index=False, sort=False).first()

    hashed = ds.map_batches(lambda b: add_content_hash(b, text_col), batch_format="pyarrow")
    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas").drop_columns(["content_hash"])


# ---------------------------------------------------------------- minhash/LSH
class MinHashStage:
    """map_batches(pyarrow) actor: (id, text) → (id, sig list<int64>).
    One FNV pass per token, then ``num_perm`` splitmix re-mixes (vectorized
    over all shingles of a doc)."""

    def __init__(self, num_perm: int = 128, shingle_n: int = 3, text_col: str = "text", id_col: str = "doc_id"):
        self.num_perm = num_perm
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col
        self.tok = Tokenizer()
        self.seeds = np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    def signature(self, text: str) -> np.ndarray:
        """Single-doc reference path (tests); the batch path below is the
        vectorized equivalent (identical values)."""
        toks = self.tok.tokenize(text or "")
        th = hash_strings(toks)
        sh = shingle_hashes(th, self.shingle_n)
        if sh.size == 0:
            return np.full(self.num_perm, np.iinfo(np.int64).max, dtype=np.int64)
        sig = np.empty(self.num_perm, dtype=np.int64)
        for k in range(self.num_perm):
            sig[k] = hash_tokens_to_u64(sh, int(self.seeds[k])).min().astype(np.int64)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        h, rows, dls = self.tok.tokenize_hashes(batch.column(self.text_col))
        nsh = self.shingle_n
        sig = np.full((n_rows, self.num_perm), np.iinfo(np.int64).max, dtype=np.int64)
        if h.size >= nsh:
            # rolling shingles over the FLAT hash stream, then mask windows
            # that cross a row boundary — per-doc values are identical to
            # shingle_hashes on that doc's own tokens
            acc = shingle_hashes(h, nsh)
            valid = rows[: h.size - nsh + 1] == rows[nsh - 1 :]
            sh, srows = acc[valid], rows[: h.size - nsh + 1][valid]
            if sh.size:
                bounds = np.r_[0, np.nonzero(np.diff(srows))[0] + 1]
                urows = srows[bounds]
                for k in range(self.num_perm):
                    m = hash_tokens_to_u64(sh, int(self.seeds[k]))
                    sig[urows, k] = np.minimum.reduceat(m, bounds).astype(np.int64)
        offsets = np.arange(0, (n_rows + 1) * self.num_perm, self.num_perm, dtype=np.int32)
        col = pa.ListArray.from_arrays(pa.array(offsets), pa.array(sig.ravel()))
        return pa.table({self.id_col: batch.column(self.id_col), "sig": col})


def explode_bands(batch: pa.Table, bands: int, rows_per_band: int, id_col: str = "doc_id") -> pa.Table:
    sig = batch.column("sig").combine_chunks()
    flat = sig.flatten().to_numpy(zero_copy_only=False).reshape(len(batch), -1)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    band_hashes = np.empty((len(batch), bands), dtype=np.int64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            seg = flat[:, b * rows_per_band : (b + 1) * rows_per_band].astype(np.uint64)
            acc = np.zeros(len(batch), dtype=np.uint64)
            for j in range(rows_per_band):
                acc = splitmix64(acc ^ seg[:, j])
            band_hashes[:, b] = acc.astype(np.int64)
    return pa.table(
        {
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), len(batch))),
            "band_hash": pa.array(band_hashes.reshape(-1)),
            id_col: pa.array(np.repeat(ids, bands)),
        }
    )


def candidate_pairs_from_bucket(group: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    ids = np.sort(group[id_col].to_numpy())
    if ids.size < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    a, b = np.triu_indices(ids.size, k=1)
    return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})


def minhash_lsh_pairs(
    ds: Dataset,
    *,
    num_perm: int = 128,
    bands: int = 16,
    threshold: float = 0.7,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Near-duplicate pairs with exact n-gram Jaccard >= threshold.

    Returns a (id_a, id_b, jaccard) DataFrame — candidate sets are
    pair-scale, not corpus-scale, so a driver DataFrame is the right size.
    """
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency or pool_size(),
    )
    banded = sigs.map_batches(
        lambda b: explode_bands(b, bands, rows_per_band, id_col), batch_format="pyarrow"
    )
    pairs = (
        banded.groupby(["band_id", "band_hash"])
        .map_groups(lambda g: candidate_pairs_from_bucket(g, id_col), batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    pairs = pairs.drop_duplicates(ignore_index=True)

    # exact verify: broadcast doc -> sorted unique shingle hashes
    needed = set(pairs["id_a"]) | set(pairs["id_b"])
    needed_ref = ray.put(needed)

    def shingle_sets(batch: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        tok = Tokenizer()
        ids, shl = [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            if i in want:
                th = hash_strings(tok.tokenize(t or ""))
                shl.append(np.unique(shingle_hashes(th, shingle_n)).astype(np.int64))
                ids.append(i)
        offs = np.zeros(len(ids) + 1, dtype=np.int32)
        if ids:
            np.cumsum([len(s) for s in shl], out=offs[1:])
        flat = np.concatenate(shl) if shl else np.zeros(0, np.int64)
        return pa.table({id_col: pa.array(ids, type=pa.int64()), "shingles": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat))})

    sets_df = ds.map_batches(shingle_sets, batch_format="pyarrow").to_pandas()
    lookup = {i: np.asarray(s) for i, s in zip(sets_df[id_col], sets_df["shingles"])}
    jac = np.empty(len(pairs), dtype=np.float64)
    for i, (a, b) in enumerate(zip(pairs["id_a"], pairs["id_b"])):
        sa, sb = lookup.get(a), lookup.get(b)
        if sa is None or sb is None or sa.size + sb.size == 0:
            jac[i] = 0.0
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        jac[i] = inter / (sa.size + sb.size - inter)
    pairs["jaccard"] = jac
    out = pairs[pairs["jaccard"] >= threshold].sort_values(["id_a", "id_b"], ignore_index=True)
    return out


# ------------------------------------------------------------------- simhash
class SimHashStage:
    """map_batches(pyarrow): (id, text) → (id, simhash int64).  64-bit
    weighted-bit signature, vectorized per batch with segmented reduceat."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = Tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_texts = batch.num_rows
        th, _rows, dls = self.tok.tokenize_hashes(batch.column(self.text_col))
        seg_starts = np.zeros(n_texts, dtype=np.int64)
        if n_texts > 1:
            seg_starts[1:] = np.cumsum(dls[:-1].astype(np.int64))
        out = np.zeros(n_texts, dtype=np.uint64)
        votes = np.zeros((n_texts, 64), dtype=np.int64)
        if th.size:
            # reduceat quirk: empty segments echo the element at the index
            # (and a trailing start == len raises) — clip, then zero them
            safe_starts = np.minimum(seg_starts, th.size - 1)
            for bit in range(64):
                bits = ((th >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
                sums = np.add.reduceat(bits, safe_starts)
                sums[dls == 0] = 0
                votes[:, bit] = sums
        for bit in range(64):
            out |= (votes[:, bit] > 0).astype(np.uint64) << np.uint64(bit)
        return pa.table({self.id_col: batch.column(self.id_col), "simhash": pa.array(out.astype(np.int64))})


def simhash_signatures(ds: Dataset, text_col: str = "text", id_col: str = "doc_id", concurrency: int | None = None) -> Dataset:
    return ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency or pool_size(),
    )


def simhash_near_dup_pairs(ds: Dataset, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """Candidate generation: 4 bands of 16 bits (any pair with Hamming <= 3
    must agree on >= 1 band); verify by popcount."""
    sigs = simhash_signatures(ds, text_col, id_col)

    def bands(batch: pa.Table) -> pa.Table:
        h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        parts = [((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64) for b in range(4)]
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), len(ids))),
                "band_hash": pa.array(np.stack(parts, axis=1).reshape(-1)),
                id_col: pa.array(np.repeat(ids, 4)),
                "simhash": pa.array(np.repeat(h.astype(np.int64), 4)),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if ids.size < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        a, b = np.triu_indices(ids.size, k=1)
        x = hs[a] ^ hs[b]
        ham = np.zeros(x.size, dtype=np.int64)
        while True:
            nz = x != 0
            if not nz.any():
                break
            ham[nz] += 1
            x = x & (x - np.uint64(1))
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b], "hamming": ham})

    out = (
        sigs.map_batches(bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    out = out[out["hamming"] <= max_hamming].drop_duplicates(["id_a", "id_b"], ignore_index=True)
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


# ------------------------------------------------- embedding cosine near-dup
def embedding_near_dup_pairs(
    ds: Dataset,
    *,
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 7,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Random-hyperplane LSH buckets → exact cosine verify (pairs with
    cosine >= threshold).  Planes are broadcast once via ``ray.put``."""
    first = ds.take(1)[0]
    dim = len(first[emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        emb = np.stack([np.asarray(v, dtype=np.float64) for v in batch.column(emb_col).to_pylist()])
        bits = (emb @ P) > 0
        code = np.zeros(len(batch), dtype=np.int64)
        for j in range(P.shape[1]):
            code |= bits[:, j].astype(np.int64) << j
        norm = np.linalg.norm(emb, axis=1)
        norm[norm == 0] = 1.0
        unit = emb / norm[:, None]
        offs = np.arange(0, (len(batch) + 1) * P.shape[0], P.shape[0], dtype=np.int32)
        return pa.table(
            {
                "bucket": pa.array(code),
                id_col: batch.column(id_col),
                "unit": pa.ListArray.from_arrays(pa.array(offs), pa.array(unit.reshape(-1))),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        if ids.size < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        U = np.stack([np.asarray(u) for u in g["unit"]])
        sims = U @ U.T
        a, b = np.triu_indices(ids.size, k=1)
        cos = sims[a, b]
        keep = cos >= threshold
        return pd.DataFrame({"id_a": ids[a][keep], "id_b": ids[b][keep], "cosine": cos[keep]})

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    return out.drop_duplicates(["id_a", "id_b"], ignore_index=True).sort_values(["id_a", "id_b"], ignore_index=True)
