"""Exact distributed quantiles over a Dataset column — no global sort.

Iterative histogram refinement (distributed selection by counting): each
round is ONE streaming ``map_batches`` pass that emits a fixed-size
(``buckets``-cell) count partial per (block, target) over the current
candidate range; the driver reduces targets × buckets cells, narrows each
target rank to its owning bucket, and repeats only for still-unresolved
targets.  When a target's bucket holds ≤ ``gather_limit`` values they are
fetched with ONE range-filtered pass and the order statistic is selected
exactly (``np.partition``).  Per-round network is O(buckets) per block —
never the data — so a 100-TB column costs ~2-4 streaming scans instead of
an all-to-all sort.

Semantics: ``percentile_disc`` — the value at 1-indexed rank
``max(1, ceil(q·n))`` (DuckDB ``quantile_disc``), NaNs ignored.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _col_f64(batch: pa.Table, column: str) -> np.ndarray:
    a = batch.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
    return a[~np.isnan(a)]


def exact_percentiles(
    ds,
    column: str,
    qs: list[float],
    buckets: int = 1024,
    gather_limit: int = 1_000_000,
    max_rounds: int = 12,
) -> list[tuple[float, float]]:
    """Exact (q, value) pairs for every q in ``qs`` over ``ds[column]``."""
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("quantiles must lie in [0, 1]")

    def minmax(batch: pa.Table) -> pa.Table:
        a = _col_f64(batch, column)
        return pa.table(
            {
                "n": pa.array([a.size], pa.int64()),
                "lo": pa.array([float(a.min()) if a.size else math.inf]),
                "hi": pa.array([float(a.max()) if a.size else -math.inf]),
            }
        )

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    # zero-row inputs produce zero partial blocks (Ray Data skips empty
    # blocks through map operators), losing the columns entirely
    n = int(mm["n"].sum()) if "n" in mm.columns else 0
    if n == 0:
        raise ValueError(f"column {column!r} has no non-null values")
    glo, ghi = float(mm["lo"].min()), float(mm["hi"].max())
    # 1-indexed target ranks (percentile_disc)
    targets = [
        {"q": q, "rank": max(1, math.ceil(q * n)), "lo": glo, "hi": ghi, "value": None}
        for q in qs
    ]

    for _round in range(max_rounds):
        live = [t for t in targets if t["value"] is None]
        if not live:
            break
        ranges = [(t["lo"], t["hi"]) for t in live]

        def hist(batch: pa.Table, ranges=ranges, buckets=buckets) -> pa.Table:
            a = _col_f64(batch, column)
            rows = []
            for ti, (lo, hi) in enumerate(ranges):
                edges = np.linspace(lo, hi, buckets + 1)
                inr = a[(a >= lo) & (a <= hi)]
                idx = np.clip(np.searchsorted(edges, inr, side="right") - 1, 0, buckets - 1)
                rows.append((ti, int((a < lo).sum()), np.bincount(idx, minlength=buckets).astype(np.int64)))
            return pa.table(
                {
                    "ti": pa.array([r[0] for r in rows], pa.int64()),
                    "n_less": pa.array([r[1] for r in rows], pa.int64()),
                    "counts": pa.array([r[2] for r in rows], pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
        for ti, t in enumerate(live):
            sub = parts[parts["ti"] == ti]
            counts = np.sum(np.stack(sub["counts"].to_numpy()), axis=0)
            less_here = int(sub["n_less"].sum())
            # rank within [lo, hi]
            r = t["rank"] - less_here
            csum = np.cumsum(counts)
            b = int(np.searchsorted(csum, r, side="left"))
            edges = np.linspace(t["lo"], t["hi"], buckets + 1)
            blo = float(edges[b])
            bhi = float(edges[b + 1]) if b + 1 < buckets else t["hi"]
            in_bucket = int(counts[b])
            rank_in_bucket = r - (int(csum[b - 1]) if b > 0 else 0)
            if in_bucket <= gather_limit or blo == bhi or _round == max_rounds - 1:
                t["value"] = _gather_select(ds, column, blo, bhi, b == buckets - 1, rank_in_bucket)
            else:
                t["lo"], t["hi"] = blo, bhi

    for t in targets:
        if t["value"] is None:  # pragma: no cover — max_rounds guard above resolves all
            raise RuntimeError("quantile refinement did not converge")
    return [(t["q"], t["value"]) for t in targets]


def grouped_exact_percentiles(
    ds,
    group_col: str,
    column: str,
    qs: list[float],
    buckets: int = 1024,
    gather_limit: int = 1_000_000,
    max_rounds: int = 12,
) -> list[tuple[str, float, float]]:
    """Exact (group, q, value) triples for every group value of
    ``ds[group_col]`` × every q in ``qs`` — the grouped flavor of
    :func:`exact_percentiles` (ES ``boxplot`` / ``percentiles`` under a
    ``terms`` bucket, exact).  Same shape: each round is ONE streaming
    pass emitting fixed-size count partials per (block, live target);
    per-round network is O(|groups|·|qs|·buckets) per block, never the
    data.  Groups are assumed agg-bounded (a terms-bucket cardinality,
    not a per-doc key)."""
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("quantiles must lie in [0, 1]")

    def minmax(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.select([group_col, column]).to_pandas()
        df[column] = df[column].astype("float64")
        df = df[~df[column].isna()]
        g = df.groupby(group_col)[column]
        out = g.agg(n="size", lo="min", hi="max").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if mm.empty or "n" not in mm.columns:
        raise ValueError(f"column {column!r} has no non-null values")
    agg = mm.groupby(group_col).agg(n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    targets = []
    for gval, row in agg.iterrows():
        for q in qs:
            targets.append(
                {
                    "g": gval,
                    "q": q,
                    "rank": max(1, math.ceil(q * int(row["n"]))),
                    "lo": float(row["lo"]),
                    "hi": float(row["hi"]),
                    "value": None,
                }
            )

    # small-group fast path: every group whose values fit gather_limit is
    # fetched ONCE (one shared filtered pass for all of them) and ALL its
    # target ranks are selected driver-side — refinement rounds are only
    # for groups too big to gather (the 100-TB path)
    small = {g for g, row in agg.iterrows() if int(row["n"]) <= gather_limit}
    if small:
        def pick_small(batch: pa.Table, small=small) -> pa.Table:
            gv = batch.column(group_col).to_numpy(zero_copy_only=False)
            av = batch.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
            keep = ~np.isnan(av) & np.isin(gv, list(small))
            return pa.table(
                {"g": pa.array(gv[keep].astype(str)), "v": pa.array(av[keep], pa.float64())}
            )

        vals = ds.map_batches(pick_small, batch_format="pyarrow").to_pandas()
        for g, sub in vals.groupby("g"):
            a = sub["v"].to_numpy()
            for t in targets:
                if t["g"] == g:
                    t["value"] = float(np.partition(a, t["rank"] - 1)[t["rank"] - 1])

    for _round in range(max_rounds):
        live = [t for t in targets if t["value"] is None]
        if not live:
            break
        spec = [(t["g"], t["lo"], t["hi"]) for t in live]

        def hist(batch: pa.Table, spec=spec, buckets=buckets) -> pa.Table:
            gv = batch.column(group_col).to_numpy(zero_copy_only=False)
            av = batch.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
            keep = ~np.isnan(av)
            gv, av = gv[keep], av[keep]
            rows = []
            for ti, (g, lo, hi) in enumerate(spec):
                a = av[gv == g]
                edges = np.linspace(lo, hi, buckets + 1)
                inr = a[(a >= lo) & (a <= hi)]
                idx = np.clip(np.searchsorted(edges, inr, side="right") - 1, 0, buckets - 1)
                rows.append((ti, int((a < lo).sum()), np.bincount(idx, minlength=buckets).astype(np.int64)))
            return pa.table(
                {
                    "ti": pa.array([r[0] for r in rows], pa.int64()),
                    "n_less": pa.array([r[1] for r in rows], pa.int64()),
                    "counts": pa.array([r[2] for r in rows], pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
        for ti, t in enumerate(live):
            sub = parts[parts["ti"] == ti]
            counts = np.sum(np.stack(sub["counts"].to_numpy()), axis=0)
            less_here = int(sub["n_less"].sum())
            r = t["rank"] - less_here
            csum = np.cumsum(counts)
            b = int(np.searchsorted(csum, r, side="left"))
            edges = np.linspace(t["lo"], t["hi"], buckets + 1)
            blo = float(edges[b])
            bhi = float(edges[b + 1]) if b + 1 < buckets else t["hi"]
            in_bucket = int(counts[b])
            rank_in_bucket = r - (int(csum[b - 1]) if b > 0 else 0)
            if in_bucket <= gather_limit or blo == bhi or _round == max_rounds - 1:
                t["value"] = _gather_select(
                    ds, column, blo, bhi, b == buckets - 1, rank_in_bucket,
                    group=(group_col, t["g"]),
                )
            else:
                t["lo"], t["hi"] = blo, bhi

    for t in targets:
        if t["value"] is None:  # pragma: no cover — max_rounds guard above resolves all
            raise RuntimeError("grouped quantile refinement did not converge")
    return [(t["g"], t["q"], t["value"]) for t in targets]


def _gather_select(
    ds, column: str, lo: float, hi: float, last: bool, rank: int,
    group: tuple[str, object] | None = None,
) -> float:
    """Fetch the (bounded) bucket's values with one filtered pass and
    select the ``rank``-th smallest exactly.  Buckets are [lo, hi) except
    the last, which is [lo, hi]."""

    def pick(batch: pa.Table) -> pa.Table:
        a = batch.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(a)
        if group is not None:
            gcol, gval = group
            keep &= batch.column(gcol).to_numpy(zero_copy_only=False) == gval
        a = a[keep]
        m = (a >= lo) & ((a <= hi) if last else (a < hi))
        return pa.table({"v": pa.array(a[m], pa.float64())})

    vals = ds.map_batches(pick, batch_format="pyarrow").to_pandas()["v"].to_numpy()
    if not (1 <= rank <= vals.size):
        raise RuntimeError(f"bucket gather mismatch: rank {rank} of {vals.size} values")
    return float(np.partition(vals, rank - 1)[rank - 1])
