"""Fixture determinism + extraction byte-identity + tokenizer semantics."""

import numpy as np
import pyarrow as pa

from splade_ray.fixtures import generate_queries, generate_web_pages_chunk
from splade_ray.tokenizer import Tokenizer, extract_text_batch, extract_text_from_html


def test_chunk_invariance():
    whole = generate_web_pages_chunk(0, 200)
    parts = pa.concat_tables(
        [generate_web_pages_chunk(0, 57), generate_web_pages_chunk(57, 100), generate_web_pages_chunk(157, 43)]
    )
    assert whole.equals(parts)


def test_determinism_across_calls():
    assert generate_web_pages_chunk(100, 50).equals(generate_web_pages_chunk(100, 50))
    assert generate_queries(20).equals(generate_queries(20))


def test_dedup_fixture_present():
    t = generate_web_pages_chunk(0, 2000)
    urls = t["url"].to_pylist()
    assert len(set(urls)) < len(urls)  # recrawls exist
    # recrawls carry a later warc_ts than the original
    ts = t["warc_ts"].cast(pa.int64()).to_pylist()
    by_url = {}
    dup_seen = 0
    for u, s in zip(urls, ts):
        if u in by_url:
            dup_seen += 1
            assert s != by_url[u]
        by_url[u] = s
    assert dup_seen > 10


def test_extract_byte_identity():
    """The per-row invariant from BASELINE.json input_hint."""
    t = generate_web_pages_chunk(0, 500)
    extracted = extract_text_batch(t["html"].combine_chunks())
    assert extracted.to_pylist() == t["text"].to_pylist()


def test_extract_malformed_html():
    assert extract_text_from_html(b"<html>no body here") == ""
    assert extract_text_from_html(b"") == ""


def test_tokenizer_matches_sql_semantics():
    tok = Tokenizer()
    assert tok.tokenize("Hello, World! a1-b2") == ["hello", "world", "a1", "b2"]
    assert tok.tokenize("") == []
    assert tok.tokenize("...") == []


def test_tokenize_batch_matches_per_row():
    tok = Tokenizer()
    texts = ["a b c", "", "Hello WORLD", "x1!y2", "same same same"]
    arr, dls = tok.tokenize_batch(texts)
    for i, text in enumerate(texts):
        assert arr[i].as_py() == tok.tokenize(text)
        assert dls[i] == len(tok.tokenize(text))


def test_zipf_skew():
    """Head terms must dominate (posting-list skew fixture)."""
    t = generate_web_pages_chunk(0, 500)
    tok = Tokenizer()
    counts = {}
    for text in t["text"].to_pylist():
        for w in tok.tokenize(text):
            counts[w] = counts.get(w, 0) + 1
    freqs = sorted(counts.values(), reverse=True)
    assert freqs[0] > 20 * freqs[len(freqs) // 2]


def test_normalize_optional_str_scalar_and_array():
    """M3 optional-str normalization: '', 'none', 'null' (any case,
    surrounding whitespace) mean absent — reference dataset/utils.py:7-14
    semantics, scalar-identical; plus the vectorized Arrow form."""
    import pyarrow as pa

    from splade_ray.functions.normalize import normalize_optional_str, normalize_optional_str_array

    assert normalize_optional_str(None) is None
    assert normalize_optional_str("") is None
    assert normalize_optional_str("  NoNe ") is None
    assert normalize_optional_str("NULL") is None
    assert normalize_optional_str(" keep me ") == " keep me "
    assert normalize_optional_str(42) == "42"
    arr = pa.array(["", "none", " NULL ", "en", None, "None"], type=pa.string())
    out = normalize_optional_str_array(arr)
    assert out.to_pylist() == [None, None, None, "en", None, None]
    # config integration: an "absent" checkpoint string never reaches torch
    from splade_ray.config import EngineConfig

    assert EngineConfig(neural_checkpoint="  None ").validate().neural_checkpoint == ""
