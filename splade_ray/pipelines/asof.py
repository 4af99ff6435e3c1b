"""Event-stream join family — as-of (backward + forward) and trailing
range joins, operators Ray Data has no primitive for.  Backward as-of:
match each left row with the latest right row at or before it; forward:
the earliest at or after (a negation reduction to the same kernel);
range (counting form): how many right rows fall in the trailing window.

Reference has no analogue (its joins are qrels/score lookups); this is the
standard event-stream enrichment op (trade ⋈ quote, purchase ⋈ last
click).  Ray-Data-first shape: both sides are tagged and unioned, the
exchange is ONE groupby on ~1k coarse key-hash buckets (never on the raw
key — Ray finalizes each group in Python, and keys are corpus-count), and
the per-bucket kernel is one lexsort + a prefix-maximum scan:

- sort (key, ts, side, id) with right rows ordered before left rows at
  equal ts (ties are inclusive: right.ts == left.ts matches) and right
  rows of equal ts ordered by id so the prefix max elects the max id;
- ``last_right[i] = max position of a right row at or before i`` via
  ``np.maximum.accumulate``; a match is valid iff it falls inside the
  same key segment.

Skew: a hot key lands in one bucket, bounded by that key's own row count
— the same skew the sessionize groupby carries; salt the key upstream if
a single key outgrows a worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .dedup import _PAIR_BUCKETS
from ..functions.hashing import splitmix64

_ASOF_SCHEMA = pa.schema(
    [
        ("left_id", pa.int64()),
        ("key", pa.int64()),
        ("left_ts", pa.int64()),
        ("right_id", pa.int64()),
        ("right_ts", pa.int64()),
    ]
)


def _tag(
    batch: pa.Table,
    side: int | None,
    key: str,
    ts: str,
    id_col: str,
    nbuckets: int,
    side_col: str | None = None,
) -> pa.Table:
    k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
    t = batch.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    i = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = (splitmix64(k.astype(np.uint64)) % np.uint64(nbuckets)).astype(np.int32)
    if side_col is None:
        s = np.full(k.size, side, dtype=np.int8)
    else:
        s = batch.column(side_col).to_numpy(zero_copy_only=False).astype(np.int8)
    return pa.table(
        {
            "key": pa.array(k),
            "ts_us": pa.array(t),
            "rid": pa.array(i),
            "side": pa.array(s),
            "key_bucket": pa.array(bucket),
        }
    )


def _tagged(
    left: Dataset,
    right: Dataset | None,
    key: str,
    ts: str,
    id_col: str,
    nbuckets: int,
    side_col: str | None,
) -> Dataset:
    """Two-dataset form: tag each side and union.  Single-dataset form
    (``right is None``): ``left`` already carries ``side_col`` (1 = left
    row, 0 = right row) — ONE scan instead of two over a shared source,
    and no union operator."""
    if right is None:
        if side_col is None:
            raise ValueError("single-dataset form requires side_col")
        return left.map_batches(
            _tag,
            fn_kwargs={"side": None, "key": key, "ts": ts, "id_col": id_col,
                       "nbuckets": nbuckets, "side_col": side_col},
            batch_format="pyarrow",
        )
    return left.map_batches(
        _tag, fn_kwargs={"side": 1, "key": key, "ts": ts, "id_col": id_col, "nbuckets": nbuckets},
        batch_format="pyarrow",
    ).union(
        right.map_batches(
            _tag, fn_kwargs={"side": 0, "key": key, "ts": ts, "id_col": id_col, "nbuckets": nbuckets},
            batch_format="pyarrow",
        )
    )


def _asof_bucket(g: pa.Table) -> pa.Table:
    if g.num_rows == 0:
        return _ASOF_SCHEMA.empty_table()
    key = g.column("key").to_numpy(zero_copy_only=False)
    ts = g.column("ts_us").to_numpy(zero_copy_only=False)
    rid = g.column("rid").to_numpy(zero_copy_only=False)
    side = g.column("side").to_numpy(zero_copy_only=False)
    # primary key, then ts; right (side 0) before left at equal ts so the
    # prefix max sees it; equal-ts right rows ascending by id → max id wins
    order = np.lexsort((rid, side, ts, key))
    key, ts, rid, side = key[order], ts[order], rid[order], side[order]
    n = key.size
    pos = np.arange(n, dtype=np.int64)
    right_pos = np.where(side == 0, pos, np.int64(-1))
    last_right = np.maximum.accumulate(right_pos)
    # segment starts per key → a match must not cross into another key
    seg_start = np.zeros(n, dtype=np.int64)
    starts = np.r_[0, np.nonzero(np.diff(key))[0] + 1]
    seg_start[starts] = starts
    seg_start = np.maximum.accumulate(seg_start)
    is_left = side == 1
    cand = last_right[is_left]
    valid = cand >= seg_start[is_left]
    li = np.nonzero(is_left)[0][valid]
    cand = cand[valid]
    return pa.table(
        {
            "left_id": pa.array(rid[li]),
            "key": pa.array(key[li]),
            "left_ts": pa.array(ts[li]),
            "right_id": pa.array(rid[cand]),
            "right_ts": pa.array(ts[cand]),
        }
    )


_RANGE_SCHEMA = pa.schema([("left_id", pa.int64()), ("key", pa.int64()), ("n_right", pa.int64())])


def _range_bucket(g: pa.Table, window_us: int) -> pa.Table:
    """Per coarse bucket: for every left row, COUNT right rows of the same
    key with ts in (left_ts - window, left_ts].  Same merge discipline as
    the as-of kernel, but each left row contributes TWO probes (window
    start exclusive / end inclusive); the count is the difference of the
    right-row prefix sums at the probes — one lexsort, no per-row scans."""
    if g.num_rows == 0:
        return _RANGE_SCHEMA.empty_table()
    key = g.column("key").to_numpy(zero_copy_only=False)
    ts = g.column("ts_us").to_numpy(zero_copy_only=False)
    rid = g.column("rid").to_numpy(zero_copy_only=False)
    side = g.column("side").to_numpy(zero_copy_only=False)
    is_left = side == 1
    lk, lt, lid = key[is_left], ts[is_left], rid[is_left]
    rk, rt = key[~is_left], ts[~is_left]
    nl = lk.size
    # probes: index i in [0, nl) = window end (ts=t, inclusive), i+nl =
    # window start (ts=t-w, also "count <= this ts" → the difference is
    # the half-open (t-w, t] window)
    pk = np.concatenate([lk, lk])
    pt = np.concatenate([lt, lt - np.int64(window_us)])
    mk = np.concatenate([rk, pk])
    mt = np.concatenate([rt, pt])
    probe = np.concatenate([np.zeros(rk.size, np.int8), np.ones(2 * nl, np.int8)])
    order = np.lexsort((probe, mt, mk))  # right rows before probes at equal ts → inclusive
    mk_s, probe_s = mk[order], probe[order]
    prefix = np.cumsum(probe_s == 0)
    seg_base = np.zeros(mk_s.size, dtype=np.int64)
    starts = np.r_[0, np.nonzero(np.diff(mk_s))[0] + 1]
    seg_base[starts] = prefix[starts] - (probe_s[starts] == 0)
    seg_base = np.maximum.accumulate(seg_base)
    inkey = prefix - seg_base  # right rows of MY key at or before me
    inv = np.empty(order.size, dtype=np.int64)
    inv[order] = np.arange(order.size)
    probe_counts = inkey[inv[rk.size :]]
    n_right = probe_counts[:nl] - probe_counts[nl:]
    return pa.table({"left_id": pa.array(lid), "key": pa.array(lk), "n_right": pa.array(n_right.astype(np.int64))})


def range_join_count(
    left: Dataset,
    right: Dataset | None = None,
    *,
    key: str,
    ts: str,
    id_col: str,
    window_us: int,
    nbuckets: int = _PAIR_BUCKETS,
    side_col: str | None = None,
) -> Dataset:
    """Trailing-window range join, counting form: for every left row the
    number of right rows of the same ``key`` with ``ts`` in
    ``(left.ts - window_us, left.ts]``.  Every left row is emitted
    (count 0 when the window is empty) — LEFT-join semantics.  Pass
    ``right=None`` with ``side_col`` when both streams come from one
    source (one scan, no union)."""
    tagged = _tagged(left, right, key, ts, id_col, nbuckets, side_col)
    return tagged.groupby("key_bucket").map_groups(
        lambda g: _range_bucket(g, window_us), batch_format="pyarrow"
    )


def asof_join_backward(
    left: Dataset,
    right: Dataset | None = None,
    *,
    key: str,
    ts: str,
    id_col: str,
    nbuckets: int = _PAIR_BUCKETS,
    side_col: str | None = None,
) -> Dataset:
    """For every left row, the latest right row of the same ``key`` with
    ``right.ts <= left.ts`` (inclusive; ties elect the max ``id_col``).
    Left rows with no prior right row are dropped (inner as-of).  Returns
    (left_id, key, left_ts, right_id, right_ts) with timestamps as int64
    of the input unit; join wider payloads back by id afterwards.  Pass
    ``right=None`` with ``side_col`` when both streams come from one
    source (one scan, no union)."""
    tagged = _tagged(left, right, key, ts, id_col, nbuckets, side_col)
    return tagged.groupby("key_bucket").map_groups(_asof_bucket, batch_format="pyarrow")


def _negate(batch: pa.Table) -> pa.Table:
    return batch.set_column(
        batch.schema.get_field_index("ts_us"),
        "ts_us",
        pa.compute.negate(batch.column("ts_us")),
    ).set_column(
        batch.schema.get_field_index("rid"),
        "rid",
        pa.compute.negate(batch.column("rid")),
    )


def asof_join_forward(
    left: Dataset,
    right: Dataset | None = None,
    *,
    key: str,
    ts: str,
    id_col: str,
    nbuckets: int = _PAIR_BUCKETS,
    side_col: str | None = None,
) -> Dataset:
    """For every left row, the EARLIEST right row of the same ``key`` with
    ``right.ts >= left.ts`` (inclusive; ties elect the min ``id_col``).
    Pure reduction to the backward kernel: negate ts and id after tagging
    (largest -ts <= -left_ts == smallest ts >= left_ts; the backward
    max-(-id) election == min-id), then un-negate on the way out — the
    tested kernel runs unchanged."""
    tagged = _tagged(left, right, key, ts, id_col, nbuckets, side_col).map_batches(
        _negate, batch_format="pyarrow"
    )
    out = tagged.groupby("key_bucket").map_groups(_asof_bucket, batch_format="pyarrow")

    def unnegate(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in batch.column_names:
            col = batch.column(name)
            cols[name] = pa.compute.negate(col) if name != "key" else col
        return pa.table(cols)

    return out.map_batches(unnegate, batch_format="pyarrow")
