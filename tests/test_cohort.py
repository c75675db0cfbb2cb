"""X63 cohort-retention tests: brute pandas oracle on a synthetic
event stream (activity gaps, single-period users, cross-block users),
layout invariance, and sf0.001 DuckDB mirror parity of the gate."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.cohort import PERIOD_US, cohort_retention, sql_cohort_retention

SF = "/root/testdata/sf0.001"
DAY = PERIOD_US


def _synth(n: int = 30_000, users: int = 400, days: int = 40, seed: int = 5):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, users, n).astype(np.int64)
    day = rng.randint(0, days, n).astype(np.int64)
    # plant gaps: users 0..19 active ONLY on days {3, 17}
    gap = u < 20
    day[gap] = np.where(rng.rand(int(gap.sum())) < 0.5, 3, 17)
    # users 20..39 active in exactly one period (offset-0-only rows)
    single = (u >= 20) & (u < 40)
    day[single] = u[single] % days
    base = np.int64(19723)  # ~2024 epoch days, matches the gate range
    us = (base + day) * DAY + rng.randint(0, DAY, n, dtype=np.int64)
    ts = us.astype("datetime64[us]")
    return pd.DataFrame({"user_id": u, "ts": ts})


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    p = df.ts.to_numpy().astype(np.int64) // DAY
    act = pd.DataFrame({"u": df.user_id, "p": p}).drop_duplicates()
    coh = act.groupby("u").p.min().rename("c")
    j = act.join(coh, on="u")
    out = (
        j.assign(offset=j.p - j.c)
        .groupby(["c", "offset"])
        .size()
        .rename("n_users")
        .reset_index()
        .rename(columns={"c": "cohort"})
    )
    return (
        out.astype(np.int64)
        .sort_values(["cohort", "offset"])
        .reset_index(drop=True)
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["cohort", "offset", "n_users"]]
        .astype(np.int64)
        .sort_values(["cohort", "offset"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpus(ray_session):
    df = _synth()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(9)
    return df, ds


def test_cohort_vs_brute(corpus):
    df, ds = corpus
    out = _norm(cohort_retention(ds).to_pandas())
    exp = _brute(df)
    assert (exp.offset == 0).sum() > 10  # multiple live cohorts
    assert exp.offset.max() >= 14  # the planted 3->17 gap is live
    pd.testing.assert_frame_equal(out, exp)


def test_cohort_offset_zero_counts_every_user(corpus):
    df, ds = corpus
    out = _norm(cohort_retention(ds).to_pandas())
    # every user appears exactly once at offset 0 (their cohort row)
    assert int(out[out.offset == 0].n_users.sum()) == df.user_id.nunique()


def test_cohort_layout_invariance(corpus):
    df, ds = corpus
    a = _norm(cohort_retention(ds).to_pandas())
    b = _norm(cohort_retention(ds.repartition(2)).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_cohort_gate_sql_parity_sf0001(ray_session):
    from engine.queries import q_cohort_retention

    ray_df = _norm(q_cohort_retention(SF).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sql_df = _norm(con.sql(sql_cohort_retention()).df())
    assert len(ray_df) > 0
    pd.testing.assert_frame_equal(ray_df, sql_df)
