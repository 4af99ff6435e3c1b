"""Vectorized hashing primitives shared by the dedup / fingerprint family.

All pure numpy — usable inside ``map_batches`` without per-row Python.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xBF58476D1CE4E5B9)
_M3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _M1
        z = (z ^ (z >> np.uint64(30))) * _M2
        z = (z ^ (z >> np.uint64(27))) * _M3
        z = z ^ (z >> np.uint64(31))
    return z


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hashes of a string sequence — vectorized via
    pandas' C string-hash kernel (SipHash with a fixed key, process- and
    chunk-invariant), splitmix-finalized; ``seed`` remixes the stream."""
    arr = values if isinstance(values, np.ndarray) else np.asarray(list(values), dtype=object)
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint64)
    import pandas as pd

    h = pd.util.hash_array(arr, categorize=arr.size > 4096)
    if seed:
        h = h ^ splitmix64(np.full(h.shape, seed, np.uint64))
    return splitmix64(h)


def md5_u64(values) -> np.ndarray:
    """64-bit hash = MD5 digest bytes 8..16 little-endian — exactly DuckDB's
    ``md5_number_lower``, so every operator built on it is SQL-oracle
    checkable (simhash, fingerprints, triplet sampling).  Python loop — call
    on per-batch UNIQUE terms (vocab) and gather by dictionary code, never
    per occurrence."""
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(hashlib.md5(v.encode()).digest()[8:16], "little")
    return out


def hash_tokens_to_u64(token_hashes: np.ndarray, seed: int) -> np.ndarray:
    """Re-mix precomputed 64-bit token hashes under a new seed — the cheap
    way to derive the k MinHash permutations from one string-hash pass."""
    return splitmix64(token_hashes ^ splitmix64(np.full(token_hashes.shape, seed, np.uint64)))


def shingle_hashes(token_hashes: np.ndarray, n: int) -> np.ndarray:
    """Rolling n-gram (shingle) hashes from per-token hashes: combine n
    consecutive token hashes with position-mixed xor.  Returns an array of
    length ``max(0, len(tokens) - n + 1)``."""
    t = token_hashes.astype(np.uint64)
    if t.size < n:
        return np.zeros(0, dtype=np.uint64)
    acc = np.zeros(t.size - n + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            acc ^= splitmix64(t[j : t.size - n + 1 + j] + np.uint64(j * 0x1F123BB5))
    return acc
