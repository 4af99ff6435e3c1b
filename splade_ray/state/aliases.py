"""Index aliases (the ES filtered-alias surface).

An alias names a subset of segment indexes plus an optional doc-value
filter; queries address the alias, not the physical segments, so segment
rollover / reindex swaps stay invisible to clients.  The registry is one
atomic JSON file per index root (``aliases.json``) — the same
write-tmp-then-rename convention as the generation manifests
(:mod:`splade_ray.state.generations`).

Reference analogue: the reference engine has no alias layer (it serves one
fixed index per run); this is serving-surface parity with the
Lucene/Elasticsearch deployment model the survey targets.
"""

from __future__ import annotations

import json
import os

_FILE = "aliases.json"


def put_alias(
    index_root: str,
    name: str,
    segments: list[str],
    filt: dict | None = None,
) -> None:
    """Register (or replace) ``name`` → (segments, filter).  ``filt`` is a
    doc-value predicate spec ``{"col": ..., "op": "eq", "value": ...}``
    applied at query time inside each segment's scorer."""
    path = os.path.join(index_root, _FILE)
    reg: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            reg = json.load(f)
    reg[name] = {"segments": list(segments), "filter": filt}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def get_alias(index_root: str, name: str) -> tuple[list[str], dict | None]:
    """Resolve ``name`` → (segment dirs, filter spec); KeyError if absent."""
    path = os.path.join(index_root, _FILE)
    with open(path) as f:
        reg = json.load(f)
    ent = reg[name]
    return list(ent["segments"]), ent.get("filter")


def list_aliases(index_root: str) -> dict:
    path = os.path.join(index_root, _FILE)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)
