"""Neural (SPLADE-style hash-expansion) encoder plugin: sparsify semantics,
determinism, and end-to-end rank-identity vs the per-row Python oracle."""

import dataclasses

import numpy as np
import pyarrow.parquet as pq
import pytest

from splade_ray.config import EngineConfig
from splade_ray.fixtures import generate_queries
from splade_ray.stages.neural import encode_docs, encode_query_bow, sparsify_rows
from splade_ray.tokenizer import Tokenizer


def test_sparsify_topk_and_threshold():
    rows = np.array([0, 0, 0, 1, 1, 2])
    tids = np.array([5, 3, 9, 1, 2, 7])
    w = np.array([0.5, 0.9, 0.2, 0.0, 0.4, 0.8])
    offs, t, ww = sparsify_rows(rows, tids, w, n_rows=3, top_k=2, min_weight=0.0)
    # row 0: top-2 by weight = (3,0.9),(5,0.5) → tid order 3,5
    # row 1: 0.0 dropped by threshold → only (2,0.4)
    # row 2: (7,0.8)
    assert offs.tolist() == [0, 2, 3, 4]
    assert t.tolist() == [3, 5, 2, 7]
    assert ww.tolist() == [0.9, 0.5, 0.4, 0.8]


def test_sparsify_tie_break_prefers_lower_tid():
    rows = np.array([0, 0, 0])
    tids = np.array([9, 4, 6])
    w = np.array([0.5, 0.5, 0.5])
    offs, t, _ = sparsify_rows(rows, tids, w, 1, top_k=2, min_weight=0.0)
    assert t.tolist() == [4, 6]


def test_encode_docs_deterministic_and_sorted():
    cfg = EngineConfig(encoder="neural")
    tok = Tokenizer(cfg)
    texts = ["the quick brown fox", "jumps over the lazy dog", ""]
    a_tids, a_w, a_dl = encode_docs(texts, tok, cfg)
    b_tids, b_w, b_dl = encode_docs(texts, tok, cfg)
    assert a_tids.equals(b_tids) and a_w.equals(b_w)
    assert a_dl.tolist() == [4, 5, 0]
    for row in a_tids.to_pylist():
        assert row == sorted(row)
    # repeated tokens are max-pool no-ops
    c_tids, c_w, _ = encode_docs(["fox fox fox"], tok, cfg)
    d_tids, d_w, _ = encode_docs(["fox"], tok, cfg)
    assert c_tids.to_pylist() == d_tids.to_pylist()
    assert c_w.to_pylist() == d_w.to_pylist()


def test_query_bow_counts():
    cfg = EngineConfig(encoder="neural")
    tok = Tokenizer(cfg)
    tids, counts = encode_query_bow("dog cat dog", tok, cfg)
    assert tids.size == 2
    assert sorted(counts.tolist()) == [1.0, 2.0]
    assert tids.tolist() == sorted(tids.tolist())


@pytest.fixture(scope="module")
def neural_built(ray_session, web_pages_path, tmp_path_factory):
    from splade_ray.pipelines.build import build_index
    from splade_ray.pipelines.search import IndexReader

    cfg = EngineConfig(shard_size=500, num_buckets=16, encoder="neural").validate()
    out = str(tmp_path_factory.mktemp("nidx") / "idx")
    build_index(web_pages_path, out, cfg)
    return IndexReader(out, cfg), cfg


@pytest.fixture(scope="module")
def neural_oracle(web_pages_path):
    from splade_ray.oracle import build_neural_oracle

    cfg = EngineConfig(shard_size=500, num_buckets=16, encoder="neural").validate()
    return build_neural_oracle(pq.read_table(web_pages_path), cfg)


def test_neural_rank_identity(neural_built, neural_oracle):
    from splade_ray.oracle import neural_oracle_search

    reader, cfg = neural_built
    vecs, urls = neural_oracle
    assert reader.encoder == "neural"
    for text in generate_queries(40)["text"].to_pylist():
        expected = neural_oracle_search(vecs, urls, text, 10, cfg)
        got = reader.search(text, 10, method="exhaustive")
        assert [d for d, _, _ in expected] == [d for d, _, _ in got], text
        for (_, es, _), (_, gs, _) in zip(expected, got):
            assert gs == pytest.approx(es, rel=1e-6)  # f32 storage round-trip


def test_neural_wand_equals_exhaustive(neural_built):
    reader, _ = neural_built
    for text in generate_queries(30)["text"].to_pylist():
        ex = reader.search(text, 10, method="exhaustive")
        wd = reader.search(text, 10, method="wand")
        assert [d for d, _, _ in ex] == [d for d, _, _ in wd], text


@pytest.fixture(scope="module")
def neural_q8_built(ray_session, web_pages_path, tmp_path_factory):
    from splade_ray.pipelines.build import build_index
    from splade_ray.pipelines.search import IndexReader

    cfg = EngineConfig(shard_size=500, num_buckets=16, encoder="neural", neural_value_dtype="q8").validate()
    out = str(tmp_path_factory.mktemp("nq8idx") / "idx")
    build_index(web_pages_path, out, cfg)
    return IndexReader(out, cfg), cfg


def test_neural_q8_rank_identity(neural_q8_built, web_pages_path):
    """Quantized-impact postings (value_dtype='q8'): scoring is exact
    w.r.t. the dequantized weights, which the oracle mirrors."""
    from splade_ray.oracle import build_neural_oracle, neural_oracle_search

    reader, cfg = neural_q8_built
    vecs, urls = build_neural_oracle(pq.read_table(web_pages_path), cfg)
    for text in generate_queries(30)["text"].to_pylist():
        expected = neural_oracle_search(vecs, urls, text, 10, cfg)
        got = reader.search(text, 10, method="exhaustive")
        wnd = reader.search(text, 10, method="wand")
        assert [d for d, _, _ in expected] == [d for d, _, _ in got] == [d for d, _, _ in wnd], text
        for (_, es, _), (_, gs, _) in zip(expected, got):
            assert gs == pytest.approx(es, rel=1e-9)


def test_torch_backend_importable_without_torch():
    """The torch backend class is importable (and raises a CLEAR error at
    construction) in environments without torch/transformers."""
    import importlib.util

    import pytest

    from splade_ray.stages.neural import TorchSpladeBackend

    if importlib.util.find_spec("torch") is not None:
        pytest.skip("torch present: covered by test_torch_backend_end_to_end")
    with pytest.raises(ImportError, match="torch"):
        TorchSpladeBackend(model_name="x")


def test_torch_backend_end_to_end():
    """Exercised only where torch + transformers are installed: the torch
    backend must produce sparsified rows in the same output layout and the
    build must run end-to-end under neural_backend='torch'."""
    import importlib.util

    import pytest

    if importlib.util.find_spec("torch") is None or importlib.util.find_spec("transformers") is None:
        pytest.skip("torch/transformers not installed in this container")
    import dataclasses

    from splade_ray.config import EngineConfig
    from splade_ray.stages.neural import NeuralEncodeStage

    cfg = dataclasses.replace(
        EngineConfig(encoder="neural"), neural_backend="torch", neural_model_name="distilbert-base-uncased"
    )
    stage = NeuralEncodeStage(cfg)
    import pyarrow as pa_

    out = stage(
        pa_.table({"doc_id": [0, 1], "url": ["u0", "u1"], "text": ["hello world", "ray data splade"]})
    )
    assert out.num_rows == 2
    assert out.column("tids").type == pa_.list_(pa_.int32())
    assert all(len(r) > 0 for r in out.column("tids").to_pylist())


def test_torch_backend_checkpoint_roundtrip(tmp_path):
    """Checkpoint load must round-trip a state dict in BOTH the raw and
    the Lightning-style `{"state_dict": {"model.<k>": v}}` shapes (the
    reference's encode.py loads the latter), and fail LOUDLY on a
    checkpoint sharing no parameter names.  Runs wherever torch +
    transformers exist; skipped in this container."""
    import importlib.util

    import pytest

    if importlib.util.find_spec("torch") is None or importlib.util.find_spec("transformers") is None:
        pytest.skip("torch/transformers not installed in this container")
    import torch

    from splade_ray.stages.neural import TorchSpladeBackend

    name = "distilbert-base-uncased"
    base = TorchSpladeBackend(model_name=name)
    # perturb one weight so a successful load is observable
    sd = {k: v.clone() for k, v in base.model.state_dict().items()}
    probe = next(k for k, v in sd.items() if v.dtype.is_floating_point)
    sd[probe] = sd[probe] + 1.0

    raw_path = str(tmp_path / "raw.pt")
    torch.save(sd, raw_path)
    b1 = TorchSpladeBackend(model_name=name, checkpoint_path=raw_path)
    assert torch.allclose(b1.model.state_dict()[probe], sd[probe])

    pl_path = str(tmp_path / "lightning.ckpt")
    torch.save({"state_dict": {f"model.{k}": v for k, v in sd.items()}}, pl_path)
    b2 = TorchSpladeBackend(model_name=name, checkpoint_path=pl_path)
    assert torch.allclose(b2.model.state_dict()[probe], sd[probe])

    bad_path = str(tmp_path / "bad.pt")
    torch.save({"not_a_param": torch.zeros(3)}, bad_path)
    with pytest.raises(ValueError, match="shares no parameter names"):
        TorchSpladeBackend(model_name=name, checkpoint_path=bad_path)
