"""Index sorting + early-terminated sort-by-field retrieval."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.config import EngineConfig


@pytest.fixture(scope="module")
def sorted_corpus(tmp_path_factory):
    """600 docs whose url order IS the sort order (index sorting): doc i's
    url rank = i.  Every 3rd doc contains 'common'; all contain filler."""
    rng = np.random.default_rng(3)
    texts = []
    for i in range(600):
        words = [f"w{int(rng.integers(50)):03d}" for _ in range(12)]
        if i % 3 == 0:
            words[0] = "common"
        if i % 7 == 0:
            words[1] = "rare" if i < 50 else words[1]
        texts.append(" ".join(words))
    tbl = pa.table(
        {
            "url": pa.array([f"doc://{i:06d}" for i in range(600)]),
            "warc_ts": pa.array(np.zeros(600, dtype=np.int64), type=pa.timestamp("us")),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 600),
        }
    )
    path = str(tmp_path_factory.mktemp("sorted") / "corpus.parquet")
    pq.write_table(tbl, path)
    return path, texts


@pytest.fixture(scope="module")
def sorted_index(ray_session, sorted_corpus, tmp_path_factory):
    from splade_ray.pipelines.build import build_index

    cfg = EngineConfig(shard_size=128, num_buckets=1, zone_docs=64)
    out = str(tmp_path_factory.mktemp("sidx") / "idx")
    build_index(sorted_corpus[0], out, cfg)
    return out, cfg


def test_index_ordered_walk_matches_brute_force(sorted_index, sorted_corpus):
    from splade_ray.pipelines.search import IndexReader

    index_dir, cfg = sorted_index
    _, texts = sorted_corpus
    reader = IndexReader(index_dir, cfg)
    for query, k in [("common", 10), ("common w000", 7), ("rare", 10), ("zzznope", 5)]:
        terms = set(query.split())
        expect = [i for i, t in enumerate(texts) if terms & set(t.split())][:k]
        got, touched = reader.search_index_ordered(query, k)
        assert got == expect, query
        if len(got) == k:
            # early termination: the walk never visits postings past the
            # k-th match — a tiny fraction of the term's full df
            total = sum(
                e - s
                for sh in reader.shards
                for _, s, e, _ in sh._term_slices(reader.encode_query(query)[0])
            )
            assert touched <= len(terms) * (k + 1)
            assert touched < total, (query, touched, total)


def test_index_ordered_sharded_equals_local(sorted_index):
    from splade_ray.pipelines.search import IndexReader, ShardedSearcher

    index_dir, cfg = sorted_index
    reader = IndexReader(index_dir, cfg)
    ss = ShardedSearcher(index_dir, cfg, num_actors=3)
    try:
        for query in ["common", "common w000", "rare", "zzznope"]:
            local, _ = reader.search_index_ordered(query, 10)
            assert ss.search_index_ordered(query, 10) == local, query
    finally:
        ss.shutdown()


def test_index_ordered_skips_tombstones(sorted_index, sorted_corpus):
    from splade_ray.pipelines.search import IndexReader, apply_deletes

    index_dir, cfg = sorted_index
    _, texts = sorted_corpus
    base = IndexReader(index_dir, cfg).search_index_ordered("common", 5)[0]
    assert base[0] == 0
    apply_deletes(index_dir, ["doc://000000"])
    try:
        reader = IndexReader(index_dir, cfg)
        got, _ = reader.search_index_ordered("common", 5)
        assert 0 not in got
        assert got[0] == 3  # next 'common' doc in index order
    finally:
        import os

        os.remove(os.path.join(index_dir, "deletes.json"))


def test_index_ordered_rejects_non_ascending_layout(built_index):
    """An index whose shards do NOT cover ascending disjoint doc ranges
    (e.g. a merge that reordered segments) must be REFUSED by the ordered
    walk instead of returning a wrong 'first k in sort order' (ADVICE
    r3).  Simulated by reversing a real multi-shard reader's shard list —
    the exact layout an out-of-order segment merge would load."""
    from splade_ray.pipelines.search import IndexReader

    index_dir, cfg = built_index
    reader = IndexReader(index_dir, cfg, consolidate=False)
    assert len(reader.shards) > 1
    assert reader._ordered_layout_ok()
    reader.shards = list(reversed(reader.shards))
    reader._ordered_ok = None  # drop the cached verdict
    assert not reader._ordered_layout_ok()
    with pytest.raises(ValueError, match="ascending"):
        reader.search_index_ordered("w0001", 5)
