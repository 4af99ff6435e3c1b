"""SemDeDup: within-cluster cosine dedup vs a brute-force reference."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def vec_table():
    """3 well-separated direction clusters, with planted near-duplicates
    (same direction + tiny jitter) and exact duplicates."""
    rng = np.random.default_rng(42)
    base = np.array(
        [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 0.0]]
    )
    rows, ids = [], []
    vid = 0
    for c in range(3):
        for i in range(20):
            jitter = rng.normal(0, 2.0, 4)  # far apart in cosine
            rows.append(base[c] * (1 + 0.1 * i) + jitter)
            ids.append(vid)
            vid += 1
    # planted near-dups: tiny jitter on an existing vector
    for src in (3, 25, 47):
        rows.append(np.asarray(rows[src]) * 1.001 + rng.normal(0, 1e-4, 4))
        ids.append(vid)
        vid += 1
    # exact duplicate
    rows.append(np.asarray(rows[10]))
    ids.append(vid)
    M = np.asarray(rows, dtype=np.float32)
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in M], type=pa.list_(pa.float32())),
        }
    )


def test_semdedup_matches_brute_force(ray_session, vec_table):
    import ray.data as rd

    from splade_ray.pipelines.ann import _as_matrix, _kmeans_dists, kmeans_assign
    from splade_ray.pipelines.dedup import semdedup

    ds = rd.from_arrow(vec_table).repartition(4)
    out = semdedup(ds, k=3, iters=3, threshold=0.98)
    assert list(out["vec_id"]) == vec_table["vec_id"].to_pylist()

    # brute-force reference: same fit (engine's own kmeans), numpy drop rule
    _, cent = kmeans_assign(ds, k=3, iters=3, return_centroids=True)
    X = _as_matrix(vec_table["embedding"])
    cl, _ = _kmeans_dists(X, cent)
    U = X / np.linalg.norm(X, axis=1)[:, None]
    n = X.shape[0]
    kept_ref = np.ones(n, dtype=np.int64)
    for j in range(n):
        for i in range(j):
            if cl[i] == cl[j] and float(U[i] @ U[j]) >= 0.98:
                kept_ref[j] = 0
                break
    assert list(out["cluster"]) == list(cl.astype(np.int64))
    assert list(out["kept"]) == list(kept_ref)
    # the planted duplicates (copies of earlier ids) were dropped
    kept = dict(zip(out["vec_id"], out["kept"]))
    assert kept[60] == 0 and kept[61] == 0 and kept[62] == 0 and kept[63] == 0
    # the earliest vector of each cluster has no earlier neighbor -> kept
    assert kept[0] == 1
    # every cluster retains at least one representative
    for c in np.unique(cl):
        assert out[(out["cluster"] == c) & (out["kept"] == 1)].shape[0] >= 1
