"""Deterministic synthetic web-pages corpus + query set (FIXTURES.md).

No external data: rows are generated counter-based (splitmix64 hash of
``(seed, row, position)`` → uniform → inverse-CDF Zipf), so row *i* is a pure
function of *i* and the seed — chunk-size invariant.  The 2k-row pytest
corpus, the 50k-row oracle corpus, and the 500k-row bench corpus are all
prefixes of the same deterministic stream.

Schema matches BASELINE.json ``input_hint``:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.  ~3% of rows re-crawl an earlier url with a later
``warc_ts`` and fresh content (dedup fixture); token frequencies are
Zipf-distributed over a ~5k-word vocabulary so head terms exercise
posting-list skew.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 5000
_EPOCH_US = np.int64(1704067200) * 1_000_000  # 2024-01-01T00:00:00Z in micros
_DAY_US = np.int64(86400) * 1_000_000


def vocabulary() -> list[str]:
    """~5k-word synthetic vocabulary; tokens survive the engine tokenizer
    ([a-z0-9]+ on lowercased text) unchanged."""
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


def _zipf_cdf(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    p /= p.sum()
    return np.cumsum(p)


# same mixing kernel as the engine's hashing module — one definition so
# fixture determinism can never desynchronize from engine hashing
from .functions.hashing import splitmix64 as _splitmix64


def _uniform(key: int, idx: np.ndarray) -> np.ndarray:
    """Deterministic uniforms in [0,1) for each index."""
    h = _splitmix64(idx.astype(np.uint64) ^ _splitmix64(np.full(idx.shape, key, np.uint64)))
    return h.astype(np.float64) / np.float64(2**64)


def generate_web_pages_chunk(start: int, count: int, seed: int = 42) -> pa.Table:
    """Rows [start, start+count) of the deterministic corpus stream."""
    vocab = np.asarray(vocabulary(), dtype=object)
    cdf = _zipf_cdf(VOCAB_SIZE)
    idx = np.arange(start, start + count, dtype=np.int64)

    # doc lengths 10..300
    dls = (10 + _uniform(seed * 11 + 1, idx) * 291).astype(np.int64)
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(dls, out=offsets[1:])
    total = int(offsets[-1])

    # token at (row, pos): hash key mixes the row id into the position stream
    row_per_tok = np.repeat(idx, dls)
    pos_per_tok = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], dls)
    tok_u = _uniform(seed * 11 + 2, row_per_tok * np.int64(1_000_003) + pos_per_tok)
    token_ids = np.searchsorted(cdf, tok_u, side="right")

    lang_u = _uniform(seed * 11 + 3, idx)
    langs = np.where(lang_u < 0.95, "en", np.where(lang_u < 0.98, "de", "ko")).astype(object)

    is_dup = (idx % 33 == 0) & (idx > 0)
    # deterministic earlier row for a re-crawl
    base_row = np.where(idx > 0, (idx * 7919) % np.maximum(idx, 1), 0)
    src_row = np.where(is_dup, base_row, idx)

    urls = np.asarray(
        [f"https://site{int(r) % 97}.example/p/{int(r)}" for r in src_row], dtype=object
    )
    ts = _EPOCH_US + idx * 1_000_000 + np.where(is_dup, _DAY_US, 0)

    texts = np.empty(count, dtype=object)
    htmls = np.empty(count, dtype=object)
    words = vocab[token_ids]
    for i in range(count):
        t = " ".join(words[offsets[i] : offsets[i + 1]])
        texts[i] = t
        title = f"page {int(src_row[i])}"
        htmls[i] = (
            f"<html><head><title>{title}</title></head><body><p>{t}</p></body></html>"
        ).encode("utf-8")

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def write_web_pages(path: str, n: int, seed: int = 42, chunk: int = 50_000) -> str:
    """Write the n-row corpus.  A ``*.parquet`` path gets one file with many
    row groups; any other path becomes a DIRECTORY of one file per chunk —
    ray.data.read_parquet parallelizes by file, so the directory form is
    what benchmarks should read (a single file reads as ONE task)."""
    if path.endswith(".parquet"):
        writer = None
        try:
            for start in range(0, n, chunk):
                tbl = generate_web_pages_chunk(start, min(chunk, n - start), seed)
                if writer is None:
                    writer = pq.ParquetWriter(path, tbl.schema)
                writer.write_table(tbl, row_group_size=8192)
        finally:
            if writer is not None:
                writer.close()
        return path
    os.makedirs(path, exist_ok=True)
    chunk = min(chunk, 8192)  # file == read-task granularity
    for start in range(0, n, chunk):
        tbl = generate_web_pages_chunk(start, min(chunk, n - start), seed)
        pq.write_table(tbl, os.path.join(path, f"part-{start:010d}.parquet"))
    return path


def generate_queries(num: int = 200, seed: int = 43) -> pa.Table:
    """Fixed query set: 2-8 tokens, mixing head and tail terms; ~5% of
    queries include an out-of-corpus term (empty-postings path, reference
    sparse_index.py:705-714)."""
    vocab = np.asarray(vocabulary(), dtype=object)
    cdf = _zipf_cdf(VOCAB_SIZE, s=0.7)  # flatter: queries hit tails too
    qids = [f"q{i}" for i in range(num)]
    texts = []
    for i in range(num):
        qlen = 2 + int(_uniform(seed * 13 + 1, np.asarray([i]))[0] * 7)
        pos = np.arange(qlen, dtype=np.int64)
        u = _uniform(seed * 13 + 2, np.int64(i) * np.int64(1_000_003) + pos)
        toks = list(vocab[np.searchsorted(cdf, u, side="right")])
        if i % 20 == 7:
            toks.append(f"zzzoov{i}")
        texts.append(" ".join(toks))
    return pa.table({"query_id": pa.array(qids), "text": pa.array(texts)})
