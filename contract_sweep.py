"""Mechanical driver-style contract sweep.

Runs EVERY ``__ray_entry__.queries()`` entry against one sf directory and
compares each result to its ``oracle_sql()`` through DuckDB, using the same
canonicalization as the driver / tests/test_entry_contract.py (columns
sorted by name, floats rounded to 1e-6, rows sorted).  Prints one JSON
object per run::

    python contract_sweep.py [sf_dir]          # default /root/testdata/sf0.01
    python contract_sweep.py /root/testdata/sf0.1

Output: {"sf_dir": ..., "ok": N, "fail": N, "queries": {name: {"rows": r,
"oracle_rows": r, "match": true|false|null, "wall_s": t, "err": ...}}}
(match=null: no SQL oracle — the driver's weaker rows-only gate).

CONTRACT.md is generated from two runs of this script (sf0.01 + sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (np.ndarray, list)):
            df[c] = df[c].map(lambda v: tuple(np.round(np.asarray(v, dtype=float), 6).tolist()))
    return df.sort_values(list(df.columns), ignore_index=True)


def _match(got: pd.DataFrame, want: pd.DataFrame) -> bool:
    if list(got.columns) != list(want.columns) or len(got) != len(want):
        return False
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            if not np.allclose(g.to_numpy(), w.to_numpy(dtype=float), atol=2e-6, equal_nan=True):
                return False
        elif g.tolist() != w.tolist():
            return False
    return True


def sweep(sf_dir: str, only: list[str] | None = None) -> dict:
    import duckdb

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        queries = {k: v for k, v in queries.items() if k in set(only)}
    report: dict = {"sf_dir": sf_dir, "ok": 0, "fail": 0, "queries": {}}
    for name in sorted(queries):
        t0 = time.perf_counter()
        rec: dict = {"rows": None, "oracle_rows": None, "match": None, "wall_s": None, "err": None}
        try:
            got = _canon(_to_df(queries[name](sf_dir)))
            rec["rows"] = int(len(got))
            if name in oracles:
                want = _canon(con.execute(oracles[name]).fetchdf())
                rec["oracle_rows"] = int(len(want))
                rec["match"] = _match(got, want)
                report["ok" if rec["match"] else "fail"] += 1
            else:
                report["ok"] += 1  # rows-only gate
        except Exception:
            rec["err"] = traceback.format_exc(limit=3).strip().splitlines()[-1]
            report["fail"] += 1
        rec["wall_s"] = round(time.perf_counter() - t0, 2)
        report["queries"][name] = rec
        status = "OK" if rec["err"] is None and rec["match"] is not False else "FAIL"
        print(f"  {name:<28} {status:<4} rows={rec['rows']} wall={rec['wall_s']}s", file=sys.stderr)
    return report


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None  # optional query-name filter for spot-checks
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    out = sweep(sf_dir, only)
    print(json.dumps(out))
    ray.shutdown()
