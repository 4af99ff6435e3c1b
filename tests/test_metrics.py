"""Retrieval metrics (reference A5 semantics: binary relevance, macro
per-query) — hand-computed cases."""

import numpy as np
import pandas as pd
import pytest

from splade_ray.pipelines.metrics import retrieval_metrics


def test_metrics_hand_case():
    # q1: rel docs {1, 3, 9}; ranking [2, 1, 3] → first rel at rank 2
    # q2: rel docs {7};      ranking [7]        → perfect
    # q3: no rels            → dropped (M13)
    run = pd.DataFrame(
        {
            "query_id": ["q1", "q1", "q1", "q2", "q3"],
            "rank": [1, 2, 3, 1, 1],
            "doc_id": [2, 1, 3, 7, 5],
        }
    )
    qrels = pd.DataFrame({"query_id": ["q1", "q1", "q1", "q2"], "doc_id": [1, 3, 9, 7]})
    out = retrieval_metrics(run, qrels, k=10)
    assert out["query_id"].tolist() == ["q1", "q2"]
    q1 = out.iloc[0]
    assert q1["rr_at_k"] == pytest.approx(0.5)
    assert q1["recall_at_k"] == pytest.approx(2 / 3)
    dcg = 1 / np.log2(3) + 1 / np.log2(4)
    idcg = 1 + 1 / np.log2(3) + 1 / np.log2(4)
    assert q1["ndcg_at_k"] == pytest.approx(dcg / idcg)
    q2 = out.iloc[1]
    assert q2["rr_at_k"] == q2["recall_at_k"] == q2["ndcg_at_k"] == pytest.approx(1.0)


def test_metrics_k_cutoff():
    run = pd.DataFrame({"query_id": ["q"] * 3, "rank": [1, 2, 3], "doc_id": [5, 6, 7]})
    qrels = pd.DataFrame({"query_id": ["q"], "doc_id": [7]})
    out = retrieval_metrics(run, qrels, k=2)  # relevant doc is below the cutoff
    assert out["rr_at_k"].iloc[0] == 0.0
    assert out["recall_at_k"].iloc[0] == 0.0
    assert out["ndcg_at_k"].iloc[0] == 0.0


def test_metrics_zero_fill_for_missing_run():
    """A query that HAS qrels but produced no run rows scores 0 across the
    board (torchmetrics semantics) instead of being dropped — dropping it
    would inflate the macro-average."""
    import numpy as np
    import pandas as pd

    from splade_ray.pipelines.metrics import retrieval_metrics

    run = pd.DataFrame({"query_id": ["q1", "q1"], "rank": [1, 2], "doc_id": [10, 11]})
    qrels = pd.DataFrame({"query_id": ["q1", "q2"], "doc_id": [10, 99]})
    out = retrieval_metrics(run, qrels, k=10).set_index("query_id")
    assert list(out.index) == ["q1", "q2"]
    assert out.loc["q2", "rr_at_k"] == 0.0
    assert out.loc["q2", "recall_at_k"] == 0.0
    assert out.loc["q2", "ndcg_at_k"] == 0.0
    assert out.loc["q1", "rr_at_k"] == 1.0
