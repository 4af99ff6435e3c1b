"""Varint/delta codec round-trip (SURVEY.md §5 unit tests)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from splade_ray.codec import delta_decode, delta_encode, varint_decode, varint_encode


def test_varint_boundaries():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 2**31 - 1], dtype=np.uint64)
    assert varint_decode(varint_encode(vals)).tolist() == vals.tolist()


def test_varint_empty():
    assert varint_encode(np.zeros(0, np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_count_check():
    data = varint_encode(np.array([5, 6], dtype=np.uint64))
    with pytest.raises(ValueError):
        varint_decode(data, count=3)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=500))
def test_varint_roundtrip_hypothesis(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr), count=len(vals)).tolist() == vals


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**9), max_size=300))
def test_delta_roundtrip_hypothesis(ids):
    arr = np.sort(np.asarray(sorted(ids), dtype=np.int64))
    assert delta_decode(delta_encode(arr), count=len(ids)).tolist() == arr.tolist()


def test_varint_single_byte_density():
    # small deltas must stay 1 byte (the point of the encoding)
    vals = np.arange(100, dtype=np.uint64) % 128
    assert len(varint_encode(vals)) == 100
