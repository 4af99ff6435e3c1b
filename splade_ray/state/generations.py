"""Generational index manifests (Lucene ``segments_N`` / ES point-in-time).

A *generation* is an immutable JSON manifest naming the exact segment
directories and per-segment tombstone url lists that constitute one
committed view of an index.  Readers never list directories — they open a
generation file — so a reader pinned to generation G is isolated from
every later commit (ES PIT / Lucene reader-over-commit-point semantics):
the segments a generation references are immutable and are never
rewritten in place; upserts and merges only ADD segments and commit a new
generation whose manifest tombstones (or drops) the superseded ones.

Commits are atomic (temp file + ``os.replace``) and named
``segments_{N:06d}.json`` under ``<root>/generations/`` with monotonically
increasing N — the file name IS the commit point, exactly Lucene's
``segments_N`` convention.

Reference parity: the reference records one static build per manifest
(``src/indexing/sparse_index.py:437-452``); generations extend that shape
to a mutable index with snapshot-isolated readers.
"""

from __future__ import annotations

import os
import re
from typing import Any

from .lineage import atomic_write_json, read_json

_GEN_RE = re.compile(r"^segments_(\d{6})\.json$")


def _gen_dir(root: str) -> str:
    return os.path.join(root, "generations")


def list_generations(root: str) -> list[int]:
    """Committed generation numbers, ascending (empty if none)."""
    d = _gen_dir(root)
    if not os.path.isdir(d):
        return []
    return sorted(int(m.group(1)) for f in os.listdir(d) if (m := _GEN_RE.match(f)))


def latest_generation(root: str) -> int | None:
    gens = list_generations(root)
    return gens[-1] if gens else None


def commit_generation(
    root: str,
    segments: list[str],
    deletes: list[list[str] | None] | None = None,
) -> int:
    """Atomically commit the next generation; returns its number.

    ``deletes`` is aligned with ``segments`` (one url list or None per
    segment), the same contract as ``FederatedReader(deletes=...)``.
    """
    if deletes is not None and len(deletes) != len(segments):
        raise ValueError("deletes must have one (possibly None) entry per segment")
    gen = (latest_generation(root) or 0) + 1
    manifest: dict[str, Any] = {
        "generation": gen,
        "segments": [os.path.abspath(s) for s in segments],
        "deletes": deletes if deletes is not None else [None] * len(segments),
    }
    atomic_write_json(os.path.join(_gen_dir(root), f"segments_{gen:06d}.json"), manifest)
    return gen


def read_generation(root: str, gen: int | None = None) -> dict[str, Any]:
    """The manifest of generation ``gen`` (default: latest).  Raises on a
    missing commit point — a pinned PIT must fail loudly, never fall
    forward to a newer view."""
    if gen is None:
        gen = latest_generation(root)
        if gen is None:
            raise FileNotFoundError(f"no committed generations under {root!r}")
    m = read_json(os.path.join(_gen_dir(root), f"segments_{gen:06d}.json"))
    if m is None:
        raise FileNotFoundError(f"generation {gen} not committed under {root!r}")
    return m
