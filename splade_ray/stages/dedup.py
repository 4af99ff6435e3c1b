"""Url dedup + deterministic local-index assignment (grouped stage).

Contract (SURVEY.md §3.2, mirrored by the oracle): one doc per url keeping
the max ``warc_ts`` row; global doc ids are the rank in
``(bucket = crc32(url) % num_buckets, url)`` order, realized as
``offset[bucket] + local_idx`` where ``local_idx`` is the url rank within
the bucket and the offsets are an exclusive prefix sum of per-bucket counts
computed on the driver (a tiny aggregate — the reference's equivalent
contract is rank-major/shard-major/row-minor position,
``src/indexing/sparse_index.py:642-656``).

The groupby(bucket) shuffle this rides on is the same exchange that dedup
needs anyway (all recrawls of a url share its bucket), so id assignment
costs no extra shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def dedup_assign_group(group: pa.Table) -> pa.Table:
    """map_groups(pyarrow) over one bucket: drop url recrawls (keep max
    warc_ts), sort by url, emit local_idx."""
    urls = np.asarray(group.column("url").to_pylist(), dtype=object)
    ts = group.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((-ts, urls))  # url asc, warc_ts desc
    keep = np.ones(order.size, dtype=bool)
    keep[1:] = urls[order][1:] != urls[order][:-1]
    final = order[keep]
    out = group.take(pa.array(final))
    return out.append_column(
        "local_idx", pa.array(np.arange(final.size, dtype=np.int64))
    )
