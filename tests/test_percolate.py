"""Percolator (reverse search): broadcast query set, one streaming
map_batches pass — vs a brute-force per-doc token-set check."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from splade_ray.config import EngineConfig
from splade_ray.fixtures import write_web_pages
from splade_ray.oracle import build_oracle_index
from splade_ray.pipelines.percolate import PercQuery, PercolatorStage, percolate


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("perc") / "web.parquet")
    write_web_pages(p, 600)
    return p


def _doc_tokens(corpus):
    cfg = EngineConfig()
    oidx = build_oracle_index(pq.read_table(corpus), cfg)
    # oracle index is dedup'd; percolate runs over the raw extracted text —
    # use url→tokens off the oracle's own per-doc token lists
    return oidx


def test_percolate_matches_brute_force(corpus):
    oidx = _doc_tokens(corpus)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(oidx.n_docs, dtype=np.int64)),
            "text": pa.array([" ".join(t) for t in oidx.tokens]),
        }
    )
    queries = [
        PercQuery("a", "w0001 w0093", "all"),
        PercQuery("b", "w0042", "all"),
        PercQuery("c", "w0001 zzznotaword", "all"),
        PercQuery("d", "w0005 w0077", "any"),
        PercQuery("e", "zzznotaword w0010", "any"),
    ]
    got = (
        percolate(rd.from_arrow(docs).repartition(4), queries)
        .to_pandas()
        .sort_values(["query_id", "doc_id"], ignore_index=True)
    )
    want = []
    for q in queries:
        terms = set(q.text.split())
        for d, toks in enumerate(oidx.tokens):
            ts = set(toks)
            hit = terms <= ts if q.kind == "all" else bool(terms & ts)
            if hit:
                want.append((q.query_id, d))
    want.sort()
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert len(want) > 10  # the fixture must actually produce matches
    assert not any(q == "c" for q, _ in want)  # OOV conjunct never fires


def test_percolate_edge_batches():
    stage = PercolatorStage([PercQuery("q", "alpha beta", "all")])
    empty = stage(pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    assert empty.num_rows == 0
    blank = stage(pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["", "!!!"])}))
    assert blank.num_rows == 0
    hit = stage(pa.table({"doc_id": pa.array([7], pa.int64()), "text": pa.array(["beta gamma alpha"])}))
    assert hit.to_pydict() == {"query_id": ["q"], "doc_id": [7]}


def test_percolate_rejects_bad_queries():
    with pytest.raises(ValueError):
        PercolatorStage([])
    with pytest.raises(ValueError):
        PercolatorStage([PercQuery("q", "!!!", "all")])
    with pytest.raises(ValueError):
        PercolatorStage([PercQuery("q", "ok", "weird")])
