"""X71 rolling-active-users tests: brute pandas oracle (per day,
distinct users over the trailing 7 days) with planted burst / gap /
always-on users, window-size variants, contract guard, layout
invariance, and sf0.001 DuckDB mirror parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.rolling import DAY_US, rolling_active_users, sql_rolling_active_users

SF = "/root/testdata/sf0.001"


def _synth(seed: int = 29):
    rng = np.random.RandomState(seed)
    n = 15_000
    u = rng.randint(0, 200, n).astype(np.int64)
    day = rng.randint(0, 60, n).astype(np.int64)
    # user 300: active ONLY on day 10 (must appear in waus of days 10..16)
    u = np.r_[u, [300]]
    day = np.r_[day, [10]]
    # user 301: every day (counts once per window)
    u = np.r_[u, np.full(60, 301)]
    day = np.r_[day, np.arange(60, dtype=np.int64)]
    us = day * DAY_US + rng.randint(0, DAY_US, len(u), dtype=np.int64)
    return pd.DataFrame({"user_id": u, "ts": us.astype("datetime64[us]")})


def _brute(df: pd.DataFrame, w: int = 7) -> pd.DataFrame:
    d = df.ts.to_numpy().astype(np.int64) // DAY_US
    act = pd.DataFrame({"u": df.user_id, "d": d}).drop_duplicates()
    days = sorted({dd + k for dd in act.d.unique() for k in range(w)})
    rows = []
    for day in days:
        m = (act.d >= day - w + 1) & (act.d <= day)
        rows.append((day, act.u[m].nunique()))
    return (
        pd.DataFrame(rows, columns=["day", "wau"])
        .astype(np.int64)
        .sort_values("day")
        .reset_index(drop=True)
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["day", "wau"]]
        .astype(np.int64)
        .sort_values("day")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpus(ray_session):
    df = _synth()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    return df, ds


def test_rolling_vs_brute(corpus):
    df, ds = corpus
    out = _norm(rolling_active_users(ds).to_pandas())
    exp = _brute(df)
    # the single-day user is counted in exactly 7 windows
    pd.testing.assert_frame_equal(out, exp)


def test_rolling_window_1_is_dau(corpus):
    df, ds = corpus
    out = _norm(rolling_active_users(ds, window_days=1).to_pandas())
    pd.testing.assert_frame_equal(out, _brute(df, 1))


def test_rolling_layout_invariance(corpus):
    df, ds = corpus
    a = _norm(rolling_active_users(ds).to_pandas())
    b = _norm(
        rolling_active_users(ds.repartition(2), num_partitions=5).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_rolling_contract_guard(ray_session):
    bad = rd.from_arrow(
        pa.table(
            {
                "user_id": np.array([1 << 43], np.int64),
                "ts": np.array([0], "datetime64[us]"),
            }
        )
    )
    with pytest.raises(Exception, match="packing contract"):
        rolling_active_users(bad).to_pandas()


def test_rolling_gate_sql_parity_sf0001(ray_session):
    from engine.queries import q_rolling_active_users

    ray_df = _norm(q_rolling_active_users(SF).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sql_df = _norm(con.sql(sql_rolling_active_users()).df())
    assert len(ray_df) > 0
    pd.testing.assert_frame_equal(ray_df, sql_df)
