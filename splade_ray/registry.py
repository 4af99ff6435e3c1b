"""Operator registry (SURVEY.md §2.10 extension surface).

Reference analogue: ``src/utils/registry.py:6-59`` — a name → factory map
used to plug models/datasets by config string.  Here it registers the
engine's pipeline operators (every ``__ray_entry__.queries()`` entry
self-registers at import), so external code can enumerate and invoke them
by name without importing the individual modules:

    from splade_ray.registry import get_op, list_ops
    get_op("bm25_topk")("/root/testdata/sf0.001")
"""

from __future__ import annotations

from collections.abc import Callable

_OPS: dict[str, Callable] = {}


def register_op(name: str, fn: Callable | None = None):
    """Register ``fn`` under ``name`` (last registration wins); usable as
    a decorator or a direct call."""

    def _apply(f: Callable) -> Callable:
        _OPS[name] = f
        return f

    return _apply(fn) if fn is not None else _apply


def get_op(name: str) -> Callable:
    try:
        return _OPS[name]
    except KeyError:
        raise KeyError(f"unknown operator {name!r}; known: {sorted(_OPS)}") from None


def list_ops() -> list[str]:
    return sorted(_OPS)
