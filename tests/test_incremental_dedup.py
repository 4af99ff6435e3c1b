"""Incremental-crawl dedup: broadcast, shuffle and bloom modes must elect
the exact same kept set, and all must match a brute-force pandas truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def sf_dir():
    import os

    path = "/root/testdata/sf0.001"
    if not os.path.isdir(path):
        pytest.skip("testdata not present")
    return path


@pytest.fixture(scope="module")
def corpus():
    """120 docs; ids < 96 are the existing corpus, >= 96 the new batch.
    Planted: new docs duplicating existing texts (dropped), new docs
    duplicating each other (min-id kept), and fresh texts (kept)."""
    rng = np.random.default_rng(7)
    texts = [f"existing page {i} body {rng.integers(1_000_000)}" for i in range(96)]
    new_texts = []
    for j in range(24):
        if j % 4 == 0:
            new_texts.append(texts[j])  # dup of existing
        elif j % 4 == 1:
            new_texts.append(f"fresh page {j // 4}")  # unique fresh
        else:
            new_texts.append(f"batch dup {j // 4}")  # pairs within batch
    return pd.DataFrame(
        {"doc_id": np.arange(120, dtype=np.int64), "text": texts + new_texts}
    )


def _truth(corpus: pd.DataFrame, cut: int = 96) -> list[int]:
    old = set(corpus.loc[corpus.doc_id < cut, "text"])
    new = corpus[corpus.doc_id >= cut]
    cand = new[~new.text.isin(old)]
    return sorted(cand.groupby("text")["doc_id"].min())


@pytest.mark.parametrize("mode", ["broadcast", "shuffle", "bloom"])
def test_incremental_dedup_matches_truth(ray_session, corpus, mode):
    import ray.data as rd

    from splade_ray.pipelines.dedup import incremental_dedup

    cut = 96
    tbl = pa.Table.from_pandas(corpus, preserve_index=False)
    existing = rd.from_arrow(tbl).filter(expr=f"doc_id < {cut}").repartition(4)
    new = rd.from_arrow(tbl).filter(expr=f"doc_id >= {cut}").repartition(3)
    out = incremental_dedup(existing, new, mode=mode).to_pandas()
    assert sorted(out["doc_id"]) == _truth(corpus, cut)


def test_incremental_dedup_auto_switch(ray_session, corpus):
    """auto picks broadcast under the limit and shuffle above it; both
    give the identical kept set (the contract the oracle pins)."""
    import ray.data as rd

    from splade_ray.pipelines.dedup import incremental_dedup

    cut = 96
    tbl = pa.Table.from_pandas(corpus, preserve_index=False)
    existing = rd.from_arrow(tbl).filter(expr=f"doc_id < {cut}")
    new = rd.from_arrow(tbl).filter(expr=f"doc_id >= {cut}")
    lo = incremental_dedup(
        existing, new, mode="auto", existing_rows=cut, broadcast_row_limit=10_000
    ).to_pandas()
    hi = incremental_dedup(
        existing, new, mode="auto", existing_rows=cut, broadcast_row_limit=1
    ).to_pandas()
    assert sorted(lo["doc_id"]) == sorted(hi["doc_id"]) == _truth(corpus, cut)


def test_query_wrapper_modes_agree(ray_session, sf_dir):
    """The contract query gives the same frame under forced broadcast and
    forced shuffle on the real sf tables."""
    from splade_ray.pipelines.queries import incremental_dedup_kept

    b = incremental_dedup_kept(sf_dir, mode="broadcast")
    s = incremental_dedup_kept(sf_dir, mode="shuffle")
    bl = incremental_dedup_kept(sf_dir, mode="bloom")
    pd.testing.assert_frame_equal(b, s)
    pd.testing.assert_frame_equal(b, bl)
    assert len(b) > 0
