"""Hashed-vocab mode (vocab_mode="hashed"): feature-hashed term ids — no
term strings anywhere past the tokenizer — must be rank-identical to the
sorted-vocab build and the numpy oracle (identical df per term, identical
BM25 weights; only the term-id values differ)."""

import numpy as np
import pytest

from splade_ray.config import EngineConfig
from splade_ray.fixtures import generate_queries
from splade_ray.oracle import build_oracle_index, oracle_search
from splade_ray.pipelines.search import IndexReader


@pytest.fixture(scope="module")
def hashed_built(ray_session, web_pages_path, tmp_path_factory):
    from splade_ray.pipelines.build import build_index

    cfg = EngineConfig(shard_size=500, num_buckets=16, zone_docs=125, vocab_mode="hashed").validate()
    out = str(tmp_path_factory.mktemp("hidx") / "idx")
    build_index(web_pages_path, out, cfg, verify_extraction=True)
    return IndexReader(out, cfg), cfg


def test_hashed_stats_match_oracle(hashed_built, oracle_index):
    reader, _ = hashed_built
    assert reader.vocab_mode == "hashed"
    assert reader.n_docs == oracle_index.n_docs
    assert reader.avgdl == pytest.approx(oracle_index.avgdl, rel=1e-12)
    # same vocab size and same multiset of dfs (ids differ, terms don't)
    tid_index, dfv = reader.df
    assert tid_index.size == len(oracle_index.terms)
    assert sorted(dfv.tolist()) == sorted(oracle_index.df.tolist())


def test_hashed_rank_identity(hashed_built, oracle_index):
    reader, _ = hashed_built
    for text in generate_queries(60)["text"].to_pylist():
        expected = oracle_search(oracle_index, text, 10)
        got = reader.search(text, 10, method="exhaustive")
        wnd = reader.search(text, 10, method="wand")
        assert [d for d, _ in expected] == [d for d, _, _ in got] == [d for d, _, _ in wnd], text
        for (_, es), (_, gs, _) in zip(expected, got):
            assert gs == pytest.approx(es, rel=1e-9)


def test_hashed_oov_and_empty(hashed_built):
    reader, _ = hashed_built
    assert reader.search("", 10) == []
    assert reader.search("zzznotaword", 10) == []
