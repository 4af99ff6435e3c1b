"""Distributed connected components (large-star/small-star) vs the driver
min-label path — identical cluster assignment on every graph shape."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from splade_ray.pipelines import dedup
from splade_ray.pipelines.dedup import (
    _connected_components_driver,
    connected_components,
    connected_components_distributed,
)


def _random_pairs(seed: int, n_nodes: int, n_edges: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id_a": rng.integers(0, n_nodes, n_edges),
            "id_b": rng.integers(0, n_nodes, n_edges),
        }
    )


def _assert_same(got: pd.DataFrame, want: pd.DataFrame):
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_distributed_matches_driver_random(ray_session, seed):
    # includes self-loops and duplicate/reversed edges by construction
    pairs = _random_pairs(seed, n_nodes=400, n_edges=600)
    want = _connected_components_driver(pairs)
    got = connected_components(pairs, mode="distributed", nbuckets=16)
    _assert_same(got, want)


def test_distributed_long_chain(ray_session):
    # path graph: worst-case diameter exercises multiple star rounds
    n = 3000
    pairs = pd.DataFrame({"id_a": np.arange(1, n), "id_b": np.arange(n - 1)})
    want = _connected_components_driver(pairs)
    got = connected_components(pairs, mode="distributed", nbuckets=8)
    _assert_same(got, want)
    assert (got["cluster_id"] == 0).all() and (got["cluster_size"] == n).all()


def test_distributed_edge_cases(ray_session):
    # empty input
    empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64)})
    got = connected_components(empty, mode="distributed")
    assert list(got.columns) == ["doc_id", "cluster_id", "cluster_size"] and got.empty
    # single pair + a self-loop singleton
    pairs = pd.DataFrame({"id_a": [7, 3], "id_b": [2, 3]})
    want = _connected_components_driver(pairs)
    got = connected_components(pairs, mode="distributed", nbuckets=4)
    _assert_same(got, want)
    assert got.set_index("doc_id")["cluster_size"].to_dict() == {2: 2, 3: 1, 7: 2}


def test_dataset_in_dataset_out(ray_session):
    pairs = _random_pairs(11, n_nodes=300, n_edges=400)
    out = connected_components_distributed(rd.from_pandas(pairs).repartition(4), nbuckets=8)
    got = out.to_pandas().sort_values("doc_id", ignore_index=True)
    _assert_same(got[["doc_id", "cluster_id", "cluster_size"]], _connected_components_driver(pairs))


def test_auto_mode_routes_large_graphs_distributed(ray_session, monkeypatch):
    """A graph past driver_pair_limit must take the distributed path and
    return the identical clustering (VERDICT round-2 item #1)."""
    pairs = _random_pairs(7, n_nodes=1_200_000, n_edges=1_000_000)
    want = _connected_components_driver(pairs)

    def _no_driver(_):
        raise AssertionError("driver path used for a past-limit graph")

    monkeypatch.setattr(dedup, "_connected_components_driver", _no_driver)
    got = connected_components(pairs, mode="auto", driver_pair_limit=500_000)
    _assert_same(got, want)
