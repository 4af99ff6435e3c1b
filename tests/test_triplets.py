"""Triplet TSV ingestion (reference S2/M9 parse semantics + K6 seeded
sampling determinism)."""

import pytest


@pytest.fixture(scope="module")
def triplet_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("trip") / "triplets.tsv"
    lines = [
        "q1\twhat is spark\tpos text one\tneg text one",
        "q2\thash join\tpos two\tneg two",
        "three col query\tpos three\tneg three",  # 3-col variant
        "malformed line without tabs",  # dropped
        "only\ttwo",  # dropped
        "q5\tlast query\tpos five\tneg five",
    ]
    p.write_text("\n".join(lines))
    return str(p)


def test_parse_semantics(ray_session, triplet_file):
    from splade_ray.sources.triplets import read_triplets

    df = read_triplets(triplet_file).to_pandas().sort_values("query", ignore_index=True)
    assert len(df) == 4  # two malformed lines dropped
    assert set(df["query_id"][df["query"] == "what is spark"]) == {"q1"}
    # 3-column line gets a deterministic surrogate qid
    surrogate = df[df["query"] == "three col query"]["query_id"].iloc[0]
    assert surrogate.startswith("h")
    df2 = read_triplets(triplet_file).to_pandas()
    assert (df2[df2["query"] == "three col query"]["query_id"] == surrogate).all()


def test_seeded_sampling_deterministic_and_partition_invariant(ray_session, triplet_file):
    import ray.data

    from splade_ray.sources.triplets import read_triplets, sample_training_pairs

    ds = read_triplets(triplet_file)
    a = sorted(sample_training_pairs(ds, 0.5, seed=3).to_pandas()["query"])
    b = sorted(sample_training_pairs(ds.repartition(3), 0.5, seed=3).to_pandas()["query"])
    assert a == b  # partitioning must not change the sample
    c = sorted(sample_training_pairs(ds, 0.5, seed=4).to_pandas()["query"])
    assert a != c or len(a) == 0  # a different seed draws a different sample
