"""Extract + project stage (per-batch, stateless tasks).

Reference analogue: title+text concat at corpus load
(``/root/reference/src/data/dataset/base.py:495-508``) generalized to
html→text extraction per BASELINE.json ``input_hint``.  The per-row
invariant — extracted text byte-identical to the table's ``text`` column —
is enforced here when ``verify`` is on.

The html binary column is projected away immediately after extraction so the
wide payload never enters a shuffle (SURVEY.md §7 "never shuffle html").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig
from ..tokenizer import extract_text_batch


def url_buckets(urls: pa.Array, num_buckets: int) -> pa.Array:
    """Vectorized bucket assignment: hash_strings (pandas C siphash kernel)
    mod num_buckets — one C call per batch instead of a per-url Python
    zlib.crc32 loop (the allocator stampede ROUND_NOTES documents).  The
    numpy oracle (oracle.url_bucket) uses the identical function."""
    from ..functions.hashing import hash_strings

    h = hash_strings(np.asarray(urls.to_pylist(), dtype=object))
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


class ExtractStage:
    """map_batches(pyarrow) fn: (url, warc_ts, html, lang[, text]) →
    ([bucket,] url, warc_ts, text, lang).  ``compute_bucket=False`` skips
    the bucket hash for the broadcast-dedup path, which never shuffles by
    bucket (ids come from the winner table)."""

    def __init__(self, cfg: EngineConfig, verify: bool = False, compute_bucket: bool = True):
        self.cfg = cfg
        self.verify = verify
        self.compute_bucket = compute_bucket

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "html" in batch.column_names:
            text = extract_text_batch(batch.column("html").combine_chunks())
            if self.verify and "text" in batch.column_names:
                eq = pc.equal(text, batch.column("text"))
                if not pc.all(eq).as_py():
                    bad = batch.column("url").filter(pc.invert(eq)).slice(0, 3).to_pylist()
                    raise ValueError(f"extracted text != text column for urls {bad}")
        else:
            text = batch.column("text")
        cols = {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "text": text,
            "lang": batch.column("lang"),
        }
        if self.compute_bucket:
            bucket = url_buckets(batch.column("url").combine_chunks(), self.cfg.num_buckets)
            cols = {"bucket": bucket, **cols}
        return pa.table(
            cols
        )
