"""Backward as-of join + trailing-window range join vs brute force.

The bucketed kernels (`pipelines/asof.py`) must agree with an O(n·m)
per-key scan on a seeded random event stream that includes the edge
cases: equal-ts ties (inclusive, max-id election), left rows with no
prior right row (dropped for as-of, count 0 for range), keys present on
only one side, and window boundaries (right.ts == left.ts - window is
OUT of the half-open window; right.ts == left.ts is IN).
"""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from splade_ray.pipelines.asof import asof_join_backward, asof_join_forward, range_join_count

WINDOW_US = 50


@pytest.fixture(scope="module")
def streams():
    rng = np.random.default_rng(7)
    n_left, n_right = 400, 1200
    # small ts range forces many equal-ts collisions; keys 0..19 plus a
    # left-only key (99) and a right-only key (98)
    left = pd.DataFrame(
        {
            "id": np.arange(n_left, dtype=np.int64),
            "k": np.r_[rng.integers(0, 20, n_left - 5), [99] * 5].astype(np.int64),
            "t": rng.integers(0, 300, n_left).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "id": np.arange(10_000, 10_000 + n_right, dtype=np.int64),
            "k": np.r_[rng.integers(0, 20, n_right - 5), [98] * 5].astype(np.int64),
            "t": rng.integers(0, 300, n_right).astype(np.int64),
        }
    )
    return left, right


def brute_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for lid, k, t in left.itertuples(index=False):
        cand = right[(right.k == k) & (right.t <= t)]
        if len(cand):
            best = cand.sort_values(["t", "id"]).iloc[-1]
            rows.append((lid, k, t, best.id, best.t))
    return pd.DataFrame(
        rows, columns=["left_id", "key", "left_ts", "right_id", "right_ts"]
    ).sort_values("left_id", ignore_index=True)


def brute_range(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for lid, k, t in left.itertuples(index=False):
        n = int(((right.k == k) & (right.t > t - WINDOW_US) & (right.t <= t)).sum())
        rows.append((lid, k, n))
    return pd.DataFrame(rows, columns=["left_id", "key", "n_right"]).sort_values(
        "left_id", ignore_index=True
    )


def test_asof_matches_brute(streams):
    left, right = streams
    got = (
        asof_join_backward(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(7),
            key="k",
            ts="t",
            id_col="id",
            nbuckets=13,
        )
        .to_pandas()
        .sort_values("left_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, brute_asof(left, right), check_dtype=False)


def brute_asof_fwd(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for lid, k, t in left.itertuples(index=False):
        cand = right[(right.k == k) & (right.t >= t)]
        if len(cand):
            best = cand.sort_values(["t", "id"]).iloc[0]
            rows.append((lid, k, t, best.id, best.t))
    return pd.DataFrame(
        rows, columns=["left_id", "key", "left_ts", "right_id", "right_ts"]
    ).sort_values("left_id", ignore_index=True)


def test_asof_forward_matches_brute(streams):
    left, right = streams
    got = (
        asof_join_forward(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(7),
            key="k",
            ts="t",
            id_col="id",
            nbuckets=13,
        )
        .to_pandas()
        .sort_values("left_id", ignore_index=True)
    )
    got = got[["left_id", "key", "left_ts", "right_id", "right_ts"]]
    pd.testing.assert_frame_equal(got, brute_asof_fwd(left, right), check_dtype=False)


def test_range_count_matches_brute(streams):
    left, right = streams
    got = (
        range_join_count(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(7),
            key="k",
            ts="t",
            id_col="id",
            window_us=WINDOW_US,
            nbuckets=13,
        )
        .to_pandas()
        .sort_values("left_id", ignore_index=True)
    )
    want = brute_range(left, right)
    # every left row must be present (LEFT semantics), including key 99
    assert len(got) == len(left)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_range_window_boundaries():
    left = pd.DataFrame({"id": [1], "k": [5], "t": [100]})
    right = pd.DataFrame(
        {
            "id": [20, 21, 22, 23],
            "k": [5, 5, 5, 5],
            # t-w = 50: exactly-at-start is OUT, start+1 and end are IN
            "t": [50, 51, 100, 101],
        }
    )
    got = range_join_count(
        rd.from_pandas(left),
        rd.from_pandas(right),
        key="k",
        ts="t",
        id_col="id",
        window_us=WINDOW_US,
    ).to_pandas()
    assert got.n_right.tolist() == [2]
