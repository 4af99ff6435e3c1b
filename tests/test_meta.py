"""Meta-row ingestion (M10/M11): the four reference shapes, inline-score
alignment, and partition-order independence of the md5-keyed subsample."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from splade_ray.sources.meta import flatten_meta, normalize_meta_rows


def _norm(tbl: pa.Table, **kw):
    # collect via Arrow: Ray's Dataset.to_pandas TensorArray conversion
    # rejects ragged list columns, but plain pa.Table.to_pandas is fine
    import ray

    ds = normalize_meta_rows(rd.from_arrow(tbl), **kw)
    return pa.concat_tables(ray.get(ds.to_arrow_refs())).to_pandas()


def test_text_triplet_shape():
    t = pa.table(
        {
            "query": ["what is ray", "what is arrow"],
            "positive": ["ray is a framework", "arrow is a format"],
            "negative": ["unrelated", "also unrelated"],
        }
    )
    out = _norm(t).sort_values("query_text", ignore_index=True)
    assert list(out["query_text"]) == ["what is arrow", "what is ray"]
    assert out["pos_texts"][0] == ["arrow is a format"]
    assert out["neg_texts"][1] == ["unrelated"]
    # content-derived surrogate qids: stable across runs and partitioning
    assert all(q.startswith("h") for q in out["query_id"])
    assert out["pos_scores"].isna().all()


def test_anchor_shape_with_qid_and_inline_scores():
    t = pa.table(
        {
            "qid": ["q7"],
            "anchor": ["anchor text"],
            "positive": ["pos text"],
            "negative": ["neg text"],
            "scores": [[3.5, -1.25]],
        }
    )
    out = _norm(t)
    assert out["query_id"][0] == "q7"
    assert out["pos_scores"][0] == [3.5]
    assert out["neg_scores"][0] == [-1.25]


def test_id_pair_shape_missing_negative():
    t = pa.table(
        {
            "query_id": ["a", "b"],
            "positive_id": ["d1", "d2"],
            "negative_id": ["d9", None],
        }
    )
    out = _norm(t).sort_values("query_id", ignore_index=True)
    assert out["pos_ids"][0] == ["d1"]
    assert out["neg_ids"][0] == ["d9"]
    assert out["neg_ids"][1] == [""]  # None -> "" like the reference
    assert out["query_text"].isna().all()


def test_listwise_sampling_caps_and_score_alignment():
    t = pa.table(
        {
            "query_id": ["q1", "q2"],
            "doc_ids": [[f"d{i}" for i in range(10)], ["x1", "x2"]],
            "labels": [[1.0] * 6 + [0.0] * 4, [0.0, 1.0]],
            # q1 aligned; q2 misaligned (wrong length) -> null scores
            "scores": [[float(i) for i in range(10)], [9.9]],
        }
    )
    out = _norm(t, num_positives=2, num_negatives=3, seed=5).set_index("query_id")
    assert len(out.loc["q1", "pos_ids"]) == 2
    assert len(out.loc["q1", "neg_ids"]) == 3
    # aligned scores follow their sampled docs
    for did, sc in zip(out.loc["q1", "pos_ids"], out.loc["q1", "pos_scores"]):
        assert sc == float(did.removeprefix("d"))
    assert out.loc["q2", "pos_ids"] == ["x2"]
    assert out.loc["q2", "pos_scores"] is None or np.all(np.isnan(out.loc["q2", "pos_scores"]))


def test_listwise_partition_independent():
    n = 40
    t = pa.table(
        {
            "query_id": [f"q{i % 4}" for i in range(n)],
            "doc_ids": [[f"d{i}a", f"d{i}b", f"d{i}c"] for i in range(n)],
            "labels": [[1.0, 0.0, 0.0]] * n,
        }
    )
    a = flatten_meta(normalize_meta_rows(rd.from_arrow(t), seed=3)).to_pandas()
    b = flatten_meta(normalize_meta_rows(rd.from_arrow(t).repartition(7), seed=3)).to_pandas()
    key = ["query_id", "role", "slot", "doc_id"]
    pa_ = a.sort_values(key, ignore_index=True)[key]
    pb_ = b.sort_values(key, ignore_index=True)[key]
    assert pa_.equals(pb_)


def test_unknown_shape_raises():
    t = pa.table({"foo": [1], "bar": [2]})
    with pytest.raises(Exception):
        _norm(t)
