"""Value-oracle regression for the engine/sql_oracles.py queries:
runs each Ray pipeline at sf0.001 and compares against its DuckDB
oracle SQL exactly (the driver's comparison, in miniature).

Data assets are deterministic synthetic (SURVEY.md §7.2); the oracle
SQL recomputes everything independently (closed-form or term-for-term
float mirror), so a pass here is a true two-implementation check.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from engine.sql_oracles import SQL_ORACLES2

SF = "/root/testdata/sf0.001"
TABLES = ("orders", "lineitem", "embeddings", "documents")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", sorted(SQL_ORACLES2))
def test_sql_oracle_exact(ray_session, con, name):
    fn, sql = SQL_ORACLES2[name]
    r = fn(SF)
    ray_df = r.to_pandas() if hasattr(r, "to_pandas") else r
    sql_df = con.sql(sql).df()
    assert len(ray_df) == len(sql_df)
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    b = sql_df[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    for c in cols:
        av = a[c].to_numpy()
        bv = b[c].to_numpy()
        # Everything these queries emit is quantized int/bool — compare
        # exactly (floats would indicate a schema regression).
        assert not np.issubdtype(av.dtype, np.floating), c
        assert np.array_equal(av, bv), f"{name}.{c}"


def test_geo_pipeline_sql_oracle_exact(ray_session, con):
    """End-to-end flagship-chain value oracle (engine/geo_pipeline_oracle):
    the REAL extract -> prepare -> spatial stages vs the complete DuckDB
    mirror, exact on every quantized column; the corpus must exercise
    all four text layouts plus both reject paths (no-coord, M4 bounds)."""
    from engine.geo_pipeline_oracle import _sql_geo_pipeline, q_geo_pipeline_sql

    ray_df = q_geo_pipeline_sql(SF).to_pandas()
    sql_df = con.sql(_sql_geo_pipeline()).df()
    assert len(ray_df) == len(sql_df)
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    b = sql_df[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    for c in cols:
        av = a[c].to_numpy()
        bv = b[c].to_numpy()
        assert not np.issubdtype(av.dtype, np.floating), c
        assert np.array_equal(av, bv), f"geo_pipeline_sql.{c}"
    # Layout coverage: decimal / DMS / D48 / D96 all survive.
    assert set(a["system"].unique()) == {0, 1, 2, 3}
    # Both reject paths fired: the corpus has orders rows with no
    # coordinate (ok%17) and out-of-bounds coordinates (ok%23), so the
    # survivor count is strictly below the orders row count.
    n_orders = con.sql(f"SELECT COUNT(*) FROM orders").fetchone()[0]
    assert 0 < len(a) < n_orders
