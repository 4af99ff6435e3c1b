"""Qrels ingestion (reference M8 fallback column resolution + TREC)."""

import pandas as pd
import pytest

from splade_ray.sources.qrels import normalize_qrels, read_trec_qrels


@pytest.mark.parametrize(
    "cols",
    [
        {"query-id": ["q1"], "corpus-id": ["d1"], "score": [2]},
        {"qid": ["q1"], "doc_id": ["d1"], "relevance": [2]},
        {"_id": ["q1"], "pid": ["d1"], "rel": [2]},
    ],
)
def test_fallback_column_resolution(cols):
    out = normalize_qrels(pd.DataFrame(cols))
    assert out.iloc[0].tolist() == ["q1", "d1", 2.0]


def test_nonpositive_relevance_dropped_and_ids_stringified():
    df = pd.DataFrame({"qid": [1, 2], "docid": [10, 20], "score": [0, 3]})
    out = normalize_qrels(df)
    assert len(out) == 1
    assert out.iloc[0].tolist() == ["2", "20", 3.0]


def test_missing_column_raises():
    with pytest.raises(ValueError, match="query-id"):
        normalize_qrels(pd.DataFrame({"doc_id": ["d"], "rel": [1]}))


def test_trec_format(ray_session, tmp_path):
    p = tmp_path / "qrels.trec"
    p.write_text("q1 0 d7 1\nq1 0 d9 0\nmalformed\nq2 0 d3 2\n")
    out = read_trec_qrels(str(p)).to_pandas().sort_values("query_id", ignore_index=True)
    assert out["query_id"].tolist() == ["q1", "q2"]
    assert out["doc_id"].tolist() == ["d7", "d3"]


def test_tsv_with_header(ray_session, tmp_path):
    from splade_ray.sources.qrels import read_qrels

    p = tmp_path / "qrels.tsv"
    p.write_text("query-id\tcorpus-id\tscore\nq1\td5\t1\nq2\td6\t0\n")
    out = read_qrels(str(p)).to_pandas()
    assert out["query_id"].tolist() == ["q1"]
    assert out["doc_id"].tolist() == ["d5"]
