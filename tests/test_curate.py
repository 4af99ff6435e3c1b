"""Resumable curated-corpus writer: written partitions match the filter,
resume skips completed partitions, and the resume pushdown rebuilds only
what's missing."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.pipelines.curate import _lineage_path, curate_corpus, read_curated
from splade_ray.state.lineage import read_json


@pytest.fixture()
def corpus(tmp_path):
    # docs engineered so some pass the default thresholds and some fail
    good = "quick brown fox jumps over lazy dog near old stone bridge the town square today market river garden " * 2
    texts, ids = [], []
    for i in range(40):
        if i % 4 == 0:
            texts.append("spam spam spam spam spam")  # fails run/stopword checks
        else:
            texts.append(good + f"tail{i} extra words here and there for variety number {i}")
        ids.append(i)
    path = str(tmp_path / "documents.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)}), path
    )
    return path


def test_curate_write_resume(ray_session, corpus, tmp_path):
    out = str(tmp_path / "curated")
    s1 = curate_corpus(corpus, out, n_partitions=8)
    assert s1["built"] + (8 - len(set(i % 8 for i in range(40)))) >= 0
    assert s1["skipped"] == 0
    t1 = read_curated(out).to_pandas().sort_values("doc_id", ignore_index=True)
    assert len(t1) == s1["rows_kept"] > 0
    # every kept doc passes the thresholds; every dropped doc is the spam one
    assert all(i % 4 != 0 for i in t1["doc_id"])

    # full re-run: everything skipped, output identical
    s2 = curate_corpus(corpus, out, n_partitions=8)
    assert s2["built"] == 0 and s2["skipped"] == 8
    assert read_curated(out).to_pandas().sort_values("doc_id", ignore_index=True).equals(t1)

    # delete one partition's file + lineage → only that partition rebuilds
    victim = int(t1["doc_id"].iloc[0]) % 8
    os.remove(os.path.join(out, "parts", f"part-{victim:05d}.parquet"))
    os.remove(_lineage_path(out, victim))
    s3 = curate_corpus(corpus, out, n_partitions=8)
    assert s3["built"] == 1 and s3["skipped"] == 7
    assert read_curated(out).to_pandas().sort_values("doc_id", ignore_index=True).equals(t1)

    # changed config → different hash → full rebuild
    s4 = curate_corpus(corpus, out, n_partitions=8, min_tokens=1)
    assert s4["skipped"] == 0
    assert s4["rows_kept"] >= s1["rows_kept"]


def test_curate_empty_partitions_recorded(ray_session, tmp_path):
    # every doc fails the filter → all partitions record rows=0, resume skips
    path = str(tmp_path / "documents.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], type=pa.int64()), "text": pa.array(["x x x", "y y"])}),
        path,
    )
    out = str(tmp_path / "curated")
    s1 = curate_corpus(path, out, n_partitions=4)
    assert s1["rows_kept"] == 0
    for pid in range(4):
        assert read_json(_lineage_path(out, pid))["rows"] == 0
    s2 = curate_corpus(path, out, n_partitions=4)
    assert s2["skipped"] == 4 and s2["built"] == 0
