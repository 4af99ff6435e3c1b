"""Property-based checks (hypothesis): the Arrow tokenization path must
equal the Python reference on arbitrary text, codecs must round-trip, and
sparsify must respect its invariants."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from splade_ray.codec import delta_decode, delta_encode, varint_decode, varint_encode
from splade_ray.config import EngineConfig
from splade_ray.stages.encode import term_count_table
from splade_ray.stages.neural import sparsify_rows
from splade_ray.tokenizer import Tokenizer

TOK = Tokenizer(EngineConfig())

texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),  # no surrogates
        max_size=80,
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_tokenize_codes_equals_python(texts):
    enc = TOK.tokenize_codes(pa.array(texts, type=pa.string()))
    assert enc is not None
    codes, rows, vocab, dls = enc
    vocab_list = vocab.to_pylist()
    got = [[] for _ in texts]
    for c, r in zip(codes.tolist(), rows.tolist()):
        got[r].append(vocab_list[c])
    for i, t in enumerate(texts):
        assert got[i] == TOK.tokenize(t), repr(t)
        assert dls[i] == len(TOK.tokenize(t))


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_term_count_table_tfs_match_python(texts):
    terms, tfs, dls = term_count_table(pa.array(texts, type=pa.string()), TOK)
    for i, t in enumerate(texts):
        toks = TOK.tokenize(t)
        expect = {}
        for x in toks:
            expect[x] = expect.get(x, 0) + 1
        row_terms = terms[i].as_py()
        row_tfs = tfs[i].as_py()
        assert row_terms == sorted(expect), repr(t)
        assert dict(zip(row_terms, row_tfs)) == expect


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**35 - 1), max_size=200))
def test_varint_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr), arr.size), arr)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=0, max_size=200, unique=True))
def test_delta_roundtrip_sorted(vals):
    arr = np.sort(np.asarray(vals, dtype=np.int64))
    assert np.array_equal(delta_decode(delta_encode(arr), arr.size), arr)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # row
            st.integers(min_value=0, max_value=50),  # tid
            st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
        ),
        max_size=80,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_sparsify_invariants(triples, k):
    if triples:
        rows = np.asarray([t[0] for t in triples], dtype=np.int64)
        tids = np.asarray([t[1] for t in triples], dtype=np.int64)
        w = np.asarray([t[2] for t in triples], dtype=np.float64)
    else:
        rows = np.zeros(0, np.int64)
        tids = np.zeros(0, np.int64)
        w = np.zeros(0, np.float64)
    offs, out_tids, out_w = sparsify_rows(rows, tids, w, n_rows=6, top_k=k, min_weight=0.0)
    assert offs.size == 7 and offs[0] == 0
    for r in range(6):
        seg_t = out_tids[offs[r] : offs[r + 1]]
        seg_w = out_w[offs[r] : offs[r + 1]]
        assert seg_t.size <= k
        assert list(seg_t) == sorted(seg_t)  # tid-sorted within row
        assert (seg_w > 0.0).all()  # threshold respected
        # kept weights dominate dropped ones for this row
        row_mask = rows == r
        if row_mask.any() and seg_t.size == k:
            dropped = np.setdiff1d(np.nonzero(row_mask)[0], None)
            kept_min = seg_w.min()
            all_w = w[row_mask][w[row_mask] > 0]
            if all_w.size > k:
                assert kept_min >= np.partition(all_w, -k)[-k] - 1e-12


@settings(max_examples=40, deadline=None)
@given(texts_strategy, st.integers(min_value=2, max_value=7))
def test_row_windows_equal_python(texts, w):
    from splade_ray.pipelines.textops import _row_windows

    th, rows, _dls = TOK.tokenize_md5(pa.array(texts, type=pa.string()))
    wh, wrow = _row_windows(th, rows, w)
    R = np.uint64(0x100000001B3)
    exp_h, exp_r = [], []
    pos = 0
    for i, t in enumerate(texts):
        toks = TOK.tokenize(t)
        hs = th[pos : pos + len(toks)]
        pos += len(toks)
        for s in range(max(len(toks) - w + 1, 0)):
            h = hs[s]
            for k in range(1, w):
                with np.errstate(over="ignore"):
                    h = h * R + hs[s + k]
            exp_h.append(int(h))
            exp_r.append(i)
    assert wh.tolist() == exp_h
    assert wrow.tolist() == exp_r


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=60),
    st.integers(min_value=1, max_value=64),
)
def test_bitlen_and_pack_properties(vals, cap):
    from splade_ray.pipelines.textops import _bitlen_u64

    arr = np.array(vals, dtype=np.uint64)
    assert _bitlen_u64(arr).tolist() == [v.bit_length() for v in vals]
    # pack-bins arithmetic: bin ids are nondecreasing in scan order and no
    # bin's token total exceeds capacity unless a single row does
    cum = np.cumsum(np.array(vals, dtype=np.int64))
    bins = np.floor((cum - np.array(vals, dtype=np.int64)) / float(cap)).astype(np.int64)
    assert (np.diff(bins) >= 0).all() if len(vals) > 1 else True
    for b in np.unique(bins):
        tot = int(np.array(vals, dtype=np.int64)[bins == b].sum())
        members = np.array(vals, dtype=np.int64)[bins == b]
        assert tot <= cap + int(members.max() if members.size else 0)
