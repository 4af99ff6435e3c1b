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
def inflected_corpus(tmp_path_factory):
    """Synthetic corpus WITH stopwords and inflections (the fixture web
    pages use a w#### vocabulary on which light_en is a no-op)."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    content = [
        "join", "joins", "joined", "joining", "merge", "merges", "merging",
        "table", "tables", "query", "queries", "hash", "hashes", "sort",
        "sorted", "stream", "streams", "window", "windows", "value", "valued",
        "class", "classes", "status", "spark",
    ]
    stops = sorted(STOP_WORDS)
    rows = []
    for i in range(300):
        n = int(rng.integers(5, 40))
        words = [
            content[int(rng.integers(len(content)))]
            if rng.random() > 0.35
            else stops[int(rng.integers(len(stops)))]
            for _ in range(n)
        ]
        rows.append(" ".join(words))
    urls = [f"doc://{i:06d}" for i in range(300)]
    tbl = pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array(np.zeros(300, dtype=np.int64), type=pa.timestamp("us")),
            "text": pa.array(rows),
            "lang": pa.array(["en"] * 300),
        }
    )
    path = str(tmp_path_factory.mktemp("inflected") / "corpus.parquet")
    pq.write_table(tbl, path)
    return path


@pytest.fixture(scope="module")
def analyzed_index(ray_session, inflected_corpus, tmp_path_factory):
    from splade_ray.pipelines.build import build_index

    cfg = EngineConfig(shard_size=64, num_buckets=4, zone_docs=32, analyzer="light_en")
    out = str(tmp_path_factory.mktemp("aidx") / "idx")
    build_index(inflected_corpus, out, cfg)
    return out, cfg


def test_analyzed_rank_identity(analyzed_index, inflected_corpus):
    import pyarrow.parquet as pq

    from splade_ray.pipelines.search import IndexReader

    index_dir, cfg = analyzed_index
    oracle = build_oracle_index(pq.read_table(inflected_corpus), cfg)
    reader = IndexReader(index_dir, cfg)
    assert reader.n_docs == oracle.n_docs == 300
    assert reader.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    # stop words never enter the postings; inflections conflate
    vocab = set(reader.vocab_index)
    assert not (vocab & STOP_WORDS)
    assert "joins" not in vocab and "join" in vocab
    assert "tables" not in vocab and "tabl" in vocab  # table/tables -> tabl
    queries = [
        "the sparks joins tables",
        "merging streams in windows",
        "a valued query",
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
    assert reader.search("the a an to", 10) == []


def test_analyzed_dl_excludes_stopwords(analyzed_index, inflected_corpus):
    """dl stored in the analyzed index counts post-analysis tokens only."""
    import os

    import pyarrow.parquet as pq

    index_dir, cfg = analyzed_index
    tok = Tokenizer(cfg)
    src = pq.read_table(inflected_corpus, columns=["url", "text"])
    texts = dict(zip(src["url"].to_pylist(), src["text"].to_pylist()))
    docs = []
    pdir = os.path.join(index_dir, "postings")
    for f in sorted(os.listdir(pdir)):
        if f.endswith(".docs.parquet"):
            docs.append(pq.read_table(os.path.join(pdir, f), columns=["url", "dl"]))
    tbl = pa.concat_tables(docs)
    urls = tbl["url"].to_pylist()
    dls = tbl["dl"].to_numpy(zero_copy_only=False)
    assert len(urls) == 300
    for u, d in zip(urls, dls):
        assert d == len(tok.tokenize(texts[u])), u
        assert d <= len(Tokenizer(EngineConfig()).tokenize(texts[u]))
