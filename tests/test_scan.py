"""Distributed ordered prefix sum / token-budget packing vs numpy."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from splade_ray.pipelines.scan import ordered_prefix_sum, pack_bins


def _ds(keys, vals, blocks=7):
    t = pa.table({"k": pa.array(keys, type=pa.int64()), "v": pa.array(vals)})
    return rd.from_arrow(t).repartition(blocks)


def test_prefix_sum_matches_numpy(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.permutation(500).astype(np.int64)
    vals = rng.integers(0, 100, 500).astype(np.int64)
    out = ordered_prefix_sum(_ds(keys, vals), "v", "k", out_col="cum").to_pandas().sort_values("k")
    order = np.argsort(keys)
    np.testing.assert_array_equal(out["cum"].to_numpy(), np.cumsum(vals[order]))


def test_prefix_sum_float_and_single_block(ray_session):
    keys = np.arange(20, dtype=np.int64)
    vals = np.linspace(0.5, 10.0, 20)
    out = ordered_prefix_sum(_ds(keys, vals, blocks=1), "v", "k").to_pandas().sort_values("k")
    np.testing.assert_allclose(out["cum"].to_numpy(), np.cumsum(vals), rtol=1e-12)


def test_prefix_sum_duplicate_keys_guarded(ray_session):
    """With duplicate order keys the scan either raises (duplicates span a
    block boundary — per-row values would depend on block split) or yields
    a scan consistent with SOME ordering of the equal keys: the running
    total at each key boundary is exact."""
    keys = np.repeat(np.arange(50, dtype=np.int64), 2)
    vals = np.arange(100, dtype=np.int64)
    try:
        out = ordered_prefix_sum(_ds(keys, vals, blocks=8), "v", "k").to_pandas()
    except Exception as ex:  # noqa: BLE001
        assert "ambiguous" in str(ex)
        return
    per_key = out.groupby("k")["cum"].max().sort_index().to_numpy()
    order = np.argsort(keys, kind="stable")
    expected = np.cumsum(vals[order])[1::2]  # inclusive total at each key boundary
    np.testing.assert_array_equal(per_key, expected)


def test_pack_bins_sequential_fill(ray_session):
    keys = np.arange(10, dtype=np.int64)
    vals = np.full(10, 30, dtype=np.int64)  # 30 tokens each, capacity 100
    out = pack_bins(_ds(keys, vals, blocks=3), "v", "k", capacity=100).to_pandas().sort_values("k")
    # exclusive cumsum: 0,30,...,270 -> bins 0,0,0,0(90//100=0),1,1,1,2,2,2
    assert out["bin_id"].tolist() == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]


def test_segmented_rank_matches_pandas(ray_session):
    from splade_ray.pipelines.scan import segmented_rank

    rng = np.random.default_rng(13)
    n = 800
    segs = rng.choice(["en", "de", "fr", "ja"], size=n)
    keys = rng.permutation(n * 5)[:n].astype(np.int64)  # unique within any segment
    t = pa.table({"seg": pa.array(segs.tolist()), "k": pa.array(keys)})
    out = (
        segmented_rank(rd.from_arrow(t).repartition(9), "seg", "k")
        .to_pandas()
        .sort_values(["seg", "k"], ignore_index=True)
    )
    import pandas as pd

    want = pd.DataFrame({"seg": segs, "k": keys}).sort_values(
        ["seg", "k"], ignore_index=True
    )
    want["rnk"] = want.groupby("seg").cumcount() + 1
    assert out["rnk"].tolist() == want["rnk"].tolist()
    assert out["k"].tolist() == want["k"].tolist()


def test_segmented_rank_single_segment_and_tiny(ray_session):
    from splade_ray.pipelines.scan import segmented_rank

    t = pa.table({"seg": pa.array(["x", "x", "x"]), "k": pa.array([30, 10, 20], type=pa.int64())})
    out = segmented_rank(rd.from_arrow(t), "seg", "k").to_pandas().sort_values("k")
    assert out["rnk"].tolist() == [1, 2, 3]
