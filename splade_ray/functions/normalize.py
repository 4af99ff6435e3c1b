"""Config-layer string normalizations (reference M2/M3).

Reference semantics (``/root/reference/src/data/dataset/utils.py:7-14``):
an optional string whose stripped, lowercased form is one of
``{"", "none", "null"}`` means "absent" → None; anything else is kept as
``str(value)``.  The reference applies it per config value; here the same
rule is ALSO exposed as a vectorized Arrow kernel so a corpus column of
optional strings (e.g. a nullable ``lang`` or source tag read from
heterogeneous parquet) normalizes in C++ inside ``map_batches``.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

_ABSENT = ("", "none", "null")


def normalize_optional_str(value: Any) -> str | None:
    """Scalar form — byte-identical to the reference helper."""
    if value is None:
        return None
    if isinstance(value, str):
        if value.strip().lower() in _ABSENT:
            return None
    return str(value)


def normalize_optional_str_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized form over a string column: rows whose stripped lowercase
    form is in {"", "none", "null"} become null; existing nulls stay null.
    All Arrow C++ (utf8_trim_whitespace + utf8_lower + is_in + if_else)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    canon = pc.utf8_lower(pc.utf8_trim_whitespace(arr))
    absent = pc.is_in(canon, value_set=pa.array(_ABSENT, type=canon.type))
    return pc.if_else(absent, pa.nulls(len(arr), arr.type), arr)
