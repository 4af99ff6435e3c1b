"""light_en analysis chain (Lucene Analyzer seam): tokenizer path parity
and end-to-end rank identity of an analyzed index vs the numpy oracle."""

import numpy as np
import pyarrow as pa
import pytest

from splade_ray.config import EngineConfig
from splade_ray.oracle import build_oracle_index, oracle_search
from splade_ray.tokenizer import LIGHT_EN_RULES, STOP_WORDS, Tokenizer


def test_analyzer_paths_agree():
    """Python per-token, flat, and Arrow vocab-level chains are identical."""
    cfg = EngineConfig(analyzer="light_en")
    tok = Tokenizer(cfg)
    texts = [
        "The queries and joins are joining the TABLES!",
        "classes of sses status using this misses, was willed",
        "",
        "a an is the to was",  # fully stopped / stem-proof
        "merging streams joined 1990s merge",
    ]
    py = [tok.tokenize(t) for t in texts]
    codes, rows, vocab, dls = tok.tokenize_codes(pa.array(texts))
    v = vocab.to_pylist()
    arrow = [[] for _ in texts]
    for c, r in zip(codes, rows):
        arrow[r].append(v[c])
    assert py == arrow
    assert list(dls) == [len(x) for x in py]
    flat, cnts = tok.tokenize_flat(texts)
    assert flat == [t for row in py for t in row]
    assert list(cnts) == [len(x) for x in py]


def test_stem_rules_fixed_points():
    """Stop filter runs BEFORE stemming; doc/query inflections conflate."""
    tok = Tokenizer(EngineConfig(analyzer="light_en"))
    cases = {
        "queries": "query",
        "query": "query",
        "tables": "tabl",
        "table": "tabl",
        "merging": "merg",
        "merge": "merg",
        "joins": "join",
        "joined": "join",
        "joining": "join",
        "classes": "class",
        "status": "status",  # trailing-s kept after u/s
        "hash": "hash",
    }
    for w, want in cases.items():
        assert tok.tokenize(w) == [want], w
    for w in sorted(STOP_WORDS):
        assert tok.tokenize(w) == [], w
    # standard analyzer is untouched
    assert Tokenizer(EngineConfig()).tokenize("The joins") == ["the", "joins"]


def test_rules_are_sql_replayable_literals():
    """No rule may contain a single quote (they are embedded verbatim in
    the DuckDB oracle's string literals)."""
    for pat, rep in LIGHT_EN_RULES:
        assert "'" not in pat and "'" not in rep


@pytest.fixture(scope="module")
def analyzed_index(ray_session, web_pages_path, tmp_path_factory):
    from splade_ray.pipelines.build import build_index

    cfg = EngineConfig(shard_size=500, num_buckets=16, zone_docs=125, analyzer="light_en")
    out = str(tmp_path_factory.mktemp("aidx") / "idx")
    build_index(web_pages_path, out, cfg)
    return out, cfg


def test_analyzed_rank_identity(analyzed_index, web_pages_path):
    import pyarrow.parquet as pq

    from splade_ray.pipelines.search import IndexReader

    index_dir, cfg = analyzed_index
    oracle = build_oracle_index(pq.read_table(web_pages_path), cfg)
    reader = IndexReader(index_dir, cfg)
    assert reader.n_docs == oracle.n_docs
    assert reader.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    # stop words never enter the postings
    assert not (set(reader.vocab_index) & STOP_WORDS)
    queries = [
        "the sparks joins tables",
        "merging streams in windows",
        "a customer valued orders",
        "hashes and sorted queries",
        "the a an to",  # fully stopped -> empty result
        "zzznotawords spark",
    ]
    for text in queries:
        expected = oracle_search(oracle, text, 10)
        got = reader.search(text, 10, method="exhaustive")
        assert [d for d, _ in expected] == [d for d, _, _ in got], text
        for (_, es), (_, gs, _) in zip(expected, got):
            assert gs == pytest.approx(es, rel=1e-9)
        wand = reader.search(text, 10, method="wand")
        assert [(d, s) for d, s, _ in wand] == [(d, s) for d, s, _ in got], text


def test_analyzed_dl_excludes_stopwords(analyzed_index, web_pages_path):
    """dl stored in the analyzed index counts post-analysis tokens only."""
    import os

    import pyarrow.parquet as pq

    index_dir, cfg = analyzed_index
    tok = Tokenizer(cfg)
    src = pq.read_table(web_pages_path, columns=["url", "text"])
    # fixture recrawls: keep one row per url like the dedup stage does
    texts = {}
    for u, t in zip(src["url"].to_pylist(), src["text"].to_pylist()):
        texts[u] = t  # dedup winner has identical text for fixture recrawls
    docs = []
    pdir = os.path.join(index_dir, "postings")
    for f in sorted(os.listdir(pdir)):
        if f.endswith(".docs.parquet"):
            docs.append(pq.read_table(os.path.join(pdir, f), columns=["url", "dl"]))
    tbl = pa.concat_tables(docs)
    urls = tbl["url"].to_pylist()
    dls = tbl["dl"].to_numpy(zero_copy_only=False)
    sample = np.linspace(0, len(urls) - 1, 50).astype(int)
    for i in sample:
        assert dls[i] == len(tok.tokenize(texts[urls[i]])), urls[i]
