"""X58 funnel analysis (engine/funnel.py): brute-force scalar oracle,
strict-inequality tie semantics, sentinel/stage-0 contracts, layout
invariance, and sf0.001 DuckDB value parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.funnel import DEFAULT_STAGES, funnel, sql_funnel

SF = "/root/testdata/sf0.001"


def _brute(df: pd.DataFrame, stages=DEFAULT_STAGES) -> pd.DataFrame:
    """Independent per-user scalar reference (Python loop)."""
    rows = []
    df = df[df.event_type.isin(stages)]
    for uid, g in df.groupby("user_id"):
        ts = {s: sorted(g[g.event_type == s].ts_us) for s in stages}
        times, prev = [], -1
        for s in stages:
            nxt = next((t for t in ts[s] if t > prev), None)
            if nxt is None or (times and times[-1] == 0):
                times.append(0)
            else:
                times.append(nxt)
                prev = nxt
        max_stage = 0
        for t in times:
            if t == 0:
                break
            max_stage += 1
        rows.append([uid, max_stage] + times)
    cols = ["user_id", "max_stage"] + [f"t{i + 1}_us" for i in range(len(stages))]
    return (
        pd.DataFrame(rows, columns=cols)
        .sort_values("user_id")
        .reset_index(drop=True)
        .astype(np.int64)
    )


def _mk_events(df: pd.DataFrame) -> rd.Dataset:
    t = pa.table(
        {
            "user_id": pa.array(df.user_id.to_numpy(np.int64)),
            "event_type": pa.array(df.event_type, pa.string()),
            "ts": pa.array(df.ts_us.to_numpy(np.int64)).cast(pa.timestamp("us")),
        }
    )
    return rd.from_arrow(t).repartition(5)


def _run(df: pd.DataFrame, **kw) -> pd.DataFrame:
    out = funnel(_mk_events(df), **kw).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True).astype(np.int64)


def test_brute_force_equality_random(ray_session):
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 300, n),
            "event_type": rng.choice(
                ["view", "click", "purchase", "error", "signup"], n
            ),
            "ts_us": rng.integers(1_000_000, 2_000_000, n),
        }
    )
    got = _run(df)
    exp = _brute(df)
    pd.testing.assert_frame_equal(got, exp)


def test_tie_does_not_advance(ray_session):
    # click at the SAME ts as the first view must not count (strict >)
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["view", "click", "click", "view", "click"],
            "ts_us": [100, 100, 250, 100, 100],
        }
    )
    got = _run(df)
    r1 = got[got.user_id == 1].iloc[0]
    assert r1.max_stage == 2 and r1.t2_us == 250
    r2 = got[got.user_id == 2].iloc[0]
    assert r2.max_stage == 1 and r2.t2_us == 0


def test_stage0_and_missing_stage1(ray_session):
    # a user with only clicks/purchases never enters the funnel
    df = pd.DataFrame(
        {
            "user_id": [5, 5, 6],
            "event_type": ["click", "purchase", "view"],
            "ts_us": [10, 20, 30],
        }
    )
    got = _run(df)
    r5 = got[got.user_id == 5].iloc[0]
    assert r5.max_stage == 0 and r5.t1_us == 0 and r5.t2_us == 0
    r6 = got[got.user_id == 6].iloc[0]
    assert r6.max_stage == 1 and r6.t1_us == 30


def test_earliest_match_greedy(ray_session):
    # greedy takes the EARLIEST qualifying event per stage: the first
    # click after t1 gates purchases even if a later click would
    # permit an earlier purchase chain -- standard windowFunnel rule
    df = pd.DataFrame(
        {
            "user_id": [9] * 4,
            "event_type": ["view", "click", "purchase", "click"],
            "ts_us": [10, 50, 40, 20],
        }
    )
    got = _run(df)
    r = got.iloc[0]
    # t1=10, earliest click > 10 is 20, earliest purchase > 20 is 40
    assert (r.t1_us, r.t2_us, r.t3_us, r.max_stage) == (10, 20, 40, 3)


def test_custom_stages_and_partition_invariance(ray_session):
    rng = np.random.default_rng(11)
    n = 1500
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 80, n),
            "event_type": rng.choice(["signup", "view", "error"], n),
            "ts_us": rng.integers(0, 10_000, n),
        }
    )
    stages = ("signup", "error")
    a = _run(df, stages=stages, num_partitions=2)
    b = _run(df, stages=stages, num_partitions=13)
    pd.testing.assert_frame_equal(a, b)
    exp = _brute(df, stages)
    pd.testing.assert_frame_equal(a, exp)


def test_duckdb_parity_sf0001(ray_session):
    from engine.queries import REGISTRY

    fn, sql = REGISTRY["funnel_events"]
    ray_df = (
        fn(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sql_df = con.sql(sql).df().sort_values("user_id").reset_index(drop=True)
    assert list(ray_df.columns) == list(sql_df.columns) == [
        "user_id",
        "max_stage",
        "t1_us",
        "t2_us",
        "t3_us",
    ]
    pd.testing.assert_frame_equal(ray_df, sql_df.astype(np.int64))


def test_two_stage_raises_below_min():
    with pytest.raises(ValueError):
        funnel(None, stages=("one",))
