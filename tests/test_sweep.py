"""X65 interval-concurrency-sweep tests: brute per-instant oracle on
a synthetic with midnight-spanning plateaus, end-before-start ties
and a day whose first boundary is an END (the carry-in case), layout
invariance, and sf0.001 DuckDB mirror parity of the gate."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.sweep import (
    DAY_US,
    max_concurrency_by_day,
    sql_sweep_concurrency,
)

SF = "/root/testdata/sf0.001"


def _brute(s: np.ndarray, e: np.ndarray) -> pd.DataFrame:
    """Per-day max open count, evaluated at every boundary instant
    (half-open [s, e)): level(t) = #{i : s_i <= t < e_i}, and the
    pre-boundary plateau of a day's first boundary is the carry-in."""
    bounds = np.concatenate([np.stack([s, np.ones_like(s)], 1),
                             np.stack([e, -np.ones_like(e)], 1)])
    order = np.lexsort((bounds[:, 1], bounds[:, 0]))
    b = bounds[order]
    run = np.cumsum(b[:, 1])
    m = np.maximum(run, run - b[:, 1])
    day = b[:, 0] // DAY_US
    out = pd.DataFrame({"day": day, "m": m}).groupby("day").m.max()
    return (
        out.rename("max_concur")
        .reset_index()
        .astype(np.int64)
        .sort_values("day")
        .reset_index(drop=True)
    )


def _synth(seed: int = 23):
    rng = np.random.RandomState(seed)
    n = 20_000
    base = np.int64(19_700) * DAY_US
    s = base + rng.randint(0, 30 * DAY_US, n).astype(np.int64)
    dur = rng.randint(1, 2 * 3600_000_000, n).astype(np.int64)
    # plant: 7 intervals spanning the night of day 19715 -> 19716,
    # and day 19716's FIRST boundary is one of their ENDS (carry-in)
    s2 = np.full(7, (np.int64(19_715) * DAY_US) + 23 * 3600_000_000)
    e2 = s2 + 2 * 3600_000_000 + np.arange(7, dtype=np.int64)
    # plant an end-before-start tie: interval A ends exactly where B starts
    t0 = base + 5 * DAY_US + 12 * 3600_000_000
    s = np.r_[s, s2, t0 - 1000, t0]
    dur = np.r_[dur, e2 - s2, np.int64(1000), np.int64(1000)]
    return s, s + dur


@pytest.fixture(scope="module")
def corpus(ray_session):
    s, e = _synth()
    n = len(s)
    b = pa.table(
        {
            "t": np.concatenate([s, e]),
            "d": np.concatenate([np.ones(n, np.int64), -np.ones(n, np.int64)]),
        }
    )
    return s, e, rd.from_arrow(b).repartition(11)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["day", "max_concur"]]
        .astype(np.int64)
        .sort_values("day")
        .reset_index(drop=True)
    )


def test_sweep_vs_brute(corpus):
    s, e, ds = corpus
    out = _norm(max_concurrency_by_day(ds).to_pandas())
    exp = _brute(s, e)
    pd.testing.assert_frame_equal(out, exp)


def test_sweep_carry_in_day(ray_session):
    # 3 intervals open 23:00 day 0, close 01:00 day 1; day 1 has ONLY
    # their end boundaries — its max must be the overnight plateau 3,
    # which only the carry-in (run - d of the first END) can report
    s = np.full(3, 23 * 3600_000_000, np.int64)
    e = s + 2 * 3600_000_000
    n = 3
    ds = rd.from_arrow(
        pa.table(
            {
                "t": np.concatenate([s, e]),
                "d": np.concatenate(
                    [np.ones(n, np.int64), -np.ones(n, np.int64)]
                ),
            }
        )
    )
    out = _norm(max_concurrency_by_day(ds, num_partitions=4).to_pandas())
    pd.testing.assert_frame_equal(
        out,
        pd.DataFrame({"day": [0, 1], "max_concur": [3, 3]}).astype(np.int64),
    )


def test_sweep_half_open_tie(ray_session):
    # A = [0, 10), B = [10, 20): never concurrent (end closes first)
    ds = rd.from_arrow(
        pa.table(
            {
                "t": np.array([0, 10, 10, 20], np.int64),
                "d": np.array([1, 1, -1, -1], np.int64),
            }
        )
    )
    out = _norm(max_concurrency_by_day(ds, num_partitions=2).to_pandas())
    assert int(out.max_concur.max()) == 1


def test_sweep_layout_invariance(corpus):
    s, e, ds = corpus
    a = _norm(max_concurrency_by_day(ds).to_pandas())
    b = _norm(
        max_concurrency_by_day(ds.repartition(3), num_partitions=7).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_sweep_gate_sql_parity_sf0001(ray_session):
    from engine.queries import q_sweep_concurrency

    ray_df = _norm(q_sweep_concurrency(SF).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sql_df = _norm(con.sql(sql_sweep_concurrency()).df())
    assert len(ray_df) > 0
    pd.testing.assert_frame_equal(ray_df, sql_df)
