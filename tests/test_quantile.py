"""Exact distributed quantiles (histogram-refinement selection) vs numpy
order statistics — incl. forced recursion, duplicate-heavy data (bucket
width collapse), and the rank edge cases q=0 / q=1 / tiny n."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.pipelines.quantile import exact_percentiles


def _want(vals: np.ndarray, q: float) -> float:
    s = np.sort(vals)
    return float(s[max(1, math.ceil(q * s.size)) - 1])


def _check(vals: np.ndarray, qs, **kw):
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(5)
    got = exact_percentiles(ds, "x", qs, **kw)
    for q, v in got:
        assert v == _want(vals, q), (q, v, _want(vals, q))


def test_quantiles_forced_recursion(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.normal(1000.0, 250.0, size=20_000)
    _check(vals, [0.0, 0.01, 0.5, 0.9, 0.999, 1.0], buckets=16, gather_limit=25)


def test_quantiles_duplicate_heavy(ray_session):
    """90% of the mass is ONE value: the owning bucket never shrinks below
    gather_limit by splitting, so the blo == bhi width-collapse (or the
    max_rounds guard) must terminate with the exact answer."""
    rng = np.random.default_rng(11)
    vals = np.concatenate([np.full(18_000, 42.0), rng.uniform(0, 100, 2_000)])
    rng.shuffle(vals)
    _check(vals, [0.1, 0.5, 0.9], buckets=8, gather_limit=100, max_rounds=6)


def test_quantiles_tiny_and_integer(ray_session):
    _check(np.asarray([5.0]), [0.0, 0.5, 1.0], buckets=4, gather_limit=1)
    _check(np.arange(10, dtype=np.float64), [0.25, 0.26, 0.5], buckets=4, gather_limit=2)


def test_quantiles_validation(ray_session):
    ds = rd.from_arrow(pa.table({"x": pa.array([1.0])}))
    with pytest.raises(ValueError):
        exact_percentiles(ds, "x", [])
    with pytest.raises(ValueError):
        exact_percentiles(ds, "x", [1.5])
    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    with pytest.raises(ValueError):
        exact_percentiles(empty, "x", [0.5])


def _want_grouped(groups: np.ndarray, vals: np.ndarray, qs):
    out = {}
    for g in np.unique(groups):
        a = np.sort(vals[groups == g])
        for q in qs:
            out[(g, q)] = float(a[max(1, math.ceil(q * a.size)) - 1])
    return out


def _check_grouped(groups, vals, qs, **kw):
    from splade_ray.pipelines.quantile import grouped_exact_percentiles

    ds = rd.from_arrow(
        pa.table({"g": pa.array(groups.astype(str)), "x": pa.array(vals, pa.float64())})
    ).repartition(5)
    got = grouped_exact_percentiles(ds, "g", "x", qs, **kw)
    want = _want_grouped(groups.astype(str), vals, qs)
    assert len(got) == len(want)
    for g, q, v in got:
        assert v == want[(g, q)], (g, q, v, want[(g, q)])


def test_grouped_quantiles_small_group_fast_path(ray_session):
    rng = np.random.default_rng(3)
    groups = rng.integers(0, 4, size=5_000)
    vals = rng.normal(100.0 * groups, 25.0, size=5_000)
    _check_grouped(groups, vals, [0.0, 0.25, 0.5, 0.75, 1.0])


def test_grouped_quantiles_forced_refinement(ray_session):
    """gather_limit below every group size forces the histogram-refinement
    rounds (the 100-TB path) for all targets — values must still be the
    exact per-group order statistics."""
    rng = np.random.default_rng(5)
    groups = rng.integers(0, 3, size=9_000)
    vals = rng.uniform(0, 1e6, size=9_000)
    _check_grouped(groups, vals, [0.1, 0.5, 0.9], buckets=16, gather_limit=50)


def test_grouped_quantiles_skewed_sizes(ray_session):
    """One giant group above gather_limit + one tiny group below it: the
    fast path and the refinement path coexist in one call."""
    rng = np.random.default_rng(9)
    groups = np.r_[np.zeros(8_000, dtype=np.int64), np.ones(40, dtype=np.int64)]
    vals = np.r_[rng.normal(0, 1, 8_000), rng.normal(50, 1, 40)]
    order = rng.permutation(groups.size)
    _check_grouped(groups[order], vals[order], [0.25, 0.5, 0.75], buckets=32, gather_limit=500)
