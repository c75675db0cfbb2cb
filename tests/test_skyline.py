"""X64 grouped-Pareto-skyline tests: brute dominance oracle on a
synthetic with duplicates / ties / an anti-correlated staircase group
(worst case: every point survives), kernel contract guards, layout
invariance, and sf0.001 DuckDB mirror parity of the gate."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.skyline import grouped_skyline, skyline_mask, sql_skyline_events

SF = "/root/testdata/sf0.001"


def _brute_mask(g, x, y):
    n = len(x)
    keep = np.ones(n, bool)
    for i in range(n):
        dom = (
            (g == g[i])
            & (x >= x[i])
            & (y >= y[i])
            & ((x > x[i]) | (y > y[i]))
        )
        if dom.any():
            keep[i] = False
    return keep


def _synth(seed: int = 11):
    rng = np.random.RandomState(seed)
    n = 4000
    g = rng.randint(0, 3, n).astype(np.int64)
    x = rng.randint(0, 500, n).astype(np.int64)
    y = rng.randint(0, 500, n).astype(np.int64)
    # group 3: anti-correlated staircase — x = k, y = 999 - k, all on
    # the frontier (the all-survivors worst case), with each point
    # DUPLICATED (both copies must survive: neither dominates)
    k = np.arange(200, dtype=np.int64)
    g = np.r_[g, np.full(400, 3, np.int64)]
    x = np.r_[x, np.repeat(k, 2)]
    y = np.r_[y, np.repeat(999 - k, 2)]
    return pd.DataFrame({"grp": g.astype(str), "x": x, "y": y})


def test_kernel_vs_brute_random():
    rng = np.random.RandomState(3)
    for _ in range(60):
        n = rng.randint(1, 80)
        g = rng.randint(0, 4, n).astype(np.int64)
        x = rng.randint(0, 9, n).astype(np.int64)
        y = rng.randint(0, 9, n).astype(np.int64)
        np.testing.assert_array_equal(
            skyline_mask(g, x, y), _brute_mask(g, x, y)
        )


def test_kernel_contracts():
    one = np.zeros(1, np.int64)
    with pytest.raises(ValueError):
        skyline_mask(one, one, np.array([-1], np.int64))
    with pytest.raises(ValueError):
        skyline_mask(one, one, np.array([1 << 52], np.int64))
    with pytest.raises(ValueError):
        skyline_mask(np.array([1 << 11], np.int64), one, one)
    assert skyline_mask(np.zeros(0, np.int64), one[:0], one[:0]).size == 0


@pytest.fixture(scope="module")
def corpus(ray_session):
    df = _synth()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    return df, ds


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["grp", "x", "y"]]
        .astype({"x": np.int64, "y": np.int64})
        .sort_values(["grp", "x", "y"])
        .reset_index(drop=True)
    )


def test_grouped_skyline_vs_brute(corpus):
    df, ds = corpus
    out = _norm(
        grouped_skyline(ds, group_col="grp", x_col="x", y_col="y").to_pandas()
    )
    keep = _brute_mask(
        df.grp.to_numpy(), df.x.to_numpy(), df.y.to_numpy()
    )
    exp = _norm(df.loc[keep])
    # the staircase group survives whole, duplicates included
    assert (exp.grp == "3").sum() == 400
    # the random groups actually prune (the filter is live)
    assert (exp.grp != "3").sum() < 200
    pd.testing.assert_frame_equal(out, exp)


def test_grouped_skyline_layout_invariance(corpus):
    df, ds = corpus
    a = _norm(
        grouped_skyline(ds, group_col="grp", x_col="x", y_col="y").to_pandas()
    )
    b = _norm(
        grouped_skyline(
            ds.repartition(2), group_col="grp", x_col="x", y_col="y"
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_skyline_gate_sql_parity_sf0001(ray_session):
    from engine.queries import q_skyline_events

    ray_df = (
        q_skyline_events(SF)
        .to_pandas()
        .sort_values(["event_type", "cents", "t"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sql_df = (
        con.sql(sql_skyline_events())
        .df()
        .sort_values(["event_type", "cents", "t"])
        .reset_index(drop=True)
    )
    assert len(ray_df) > 0
    pd.testing.assert_frame_equal(
        ray_df, sql_df.astype({"cents": np.int64, "t": np.int64})
    )
