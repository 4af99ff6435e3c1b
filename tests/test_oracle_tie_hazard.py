"""Guard against the fp tie-flip hazard in score-ranked SQL oracles.

Contract convention: every oracle that reports a rank over a floating
score ranks on ``round(score, 9) DESC, doc_id ASC``.  That is exactly the
engine's semantics IF no two mathematically-distinct scores land within
1e-9 of each other near the cut:

- mathematically TIED docs get bitwise-equal engine scores (identical
  arithmetic) so the engine's (-score, doc_id) break orders them by
  doc_id — the same order round-9 forces on the SQL side, where DuckDB's
  parallel hash aggregate makes the raw fp sums of tied groups a
  run-to-run COIN FLIP (observed: datastream_topk q3 ranks 6/7);
- mathematically DISTINCT scores keep their true order on both sides as
  long as they differ by more than 1e-9.

This test re-runs every round-9-ranked oracle at sf0.001 with the cut
widened by 5 and asserts the 'gray zone' is empty: no adjacent score
pair differs by less than 1e-8 without being an exact tie (< 1e-13
relative).  If a corpus or query change ever lands a genuine near-tie,
this fails loudly instead of the sweep flaking."""

import re

import numpy as np
import pytest

duckdb = pytest.importorskip("duckdb")

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "documents", "embeddings", "events", "region", "nation",
    "customer", "supplier", "part", "orders", "lineitem",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        try:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
        except Exception:
            pass
    yield c
    c.close()


def _ranked_oracles():
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry", "__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = {}
    for name, sql in m.oracle_sql().items():
        if re.search(r"ORDER BY round\([a-z_.]*(score|cs|rrf), 9\)", sql) and re.search(
            r"rank <= \d+", sql
        ):
            out[name] = sql
    return out


ORACLES = _ranked_oracles()


def test_round9_convention_is_used():
    # the raw-ranked family must stay on the rounded convention
    assert len(ORACLES) >= 40


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_no_gray_zone_near_cut(name, con):
    sql = ORACLES[name]
    k = int(re.search(r"rank <= (\d+)", sql).group(1))
    sql = re.sub(r"rank <= \d+", f"rank <= {k + 5}", sql)
    # report the RAW score so near-ties are visible
    sql = re.sub(r"round\((?:[a-z]+\.)?(score|cs|rrf), ?6\) AS (\w+)", r"\1 AS \2", sql)
    df = con.execute(sql).fetchdf()
    cols = [c for c in df.columns if c in ("score_r", "score", "cs", "rrf", "sim_r")]
    if not cols:
        pytest.skip(f"{name}: no score column surfaced")
    groups = df.groupby("query_id") if "query_id" in df.columns else [(None, df)]
    for qid, g in groups:
        s = np.sort(g[cols[0]].to_numpy(dtype=float))[::-1]
        if s.size < 2:
            continue
        d = np.abs(np.diff(s))
        rel = d / np.maximum(np.abs(s[:-1]), 1e-300)
        gray = (rel > 1e-13) & (d < 1e-8)
        assert not gray.any(), (
            f"{name} q={qid}: mathematically-distinct scores within 1e-8 of each "
            f"other near the cut — round-9 oracle ranking is no longer safe: "
            f"{s[np.where(gray)[0][0]:np.where(gray)[0][0] + 2]}"
        )
