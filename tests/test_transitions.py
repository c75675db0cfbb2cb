"""X70 Markov-transition tests: brute pandas oracle with planted
deterministic chains, timestamp ties broken by event_id, single-event
users (no pairs), layout invariance, and sf0.001 DuckDB LAG mirror
parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.transitions import sql_transition_counts, transition_counts

SF = "/root/testdata/sf0.001"


def _synth(seed: int = 17):
    rng = np.random.RandomState(seed)
    n = 20_000
    u = rng.randint(0, 300, n).astype(np.int64)
    ts = rng.randint(0, 10**9, n).astype(np.int64)
    ty = rng.choice(np.array(["a", "b", "c", "d"], object), n)
    # plant: user 998 emits x->y->x->y... strictly ordered
    k = 40
    u = np.r_[u, np.full(k, 998)]
    ts = np.r_[ts, np.arange(k, dtype=np.int64) * 1000]
    ty = np.r_[ty, np.where(np.arange(k) % 2 == 0, "x", "y")]
    # plant: user 999 has ALL-TIED timestamps -> order by event_id
    m = 10
    u = np.r_[u, np.full(m, 999)]
    ts = np.r_[ts, np.full(m, 555, np.int64)]
    ty = np.r_[ty, np.array([f"t{i}" for i in range(m)], object)]
    # single-event user
    u = np.r_[u, [1000]]
    ts = np.r_[ts, [1]]
    ty = np.r_[ty, ["solo"]]
    eid = np.arange(len(u), dtype=np.int64)
    return pd.DataFrame(
        {
            "user_id": u,
            "ts": ts.astype("datetime64[us]"),
            "event_id": eid,
            "event_type": ty,
        }
    )


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    u = s.user_id.to_numpy()
    t = s.event_type.to_numpy()
    same = u[1:] == u[:-1]
    out = (
        pd.DataFrame({"src": t[:-1][same], "dst": t[1:][same]})
        .groupby(["src", "dst"])
        .size()
        .rename("cnt")
        .reset_index()
    )
    out["cnt"] = out["cnt"].astype(np.int64)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["src", "dst", "cnt"]]
        .astype({"cnt": np.int64})
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpus(ray_session):
    df = _synth()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(9)
    return df, ds


def test_transitions_vs_brute(corpus):
    df, ds = corpus
    out = _norm(transition_counts(ds).to_pandas())
    exp = _brute(df)
    # planted chains are live and exact
    assert int(exp.query("src == 'x' and dst == 'y'").cnt.iloc[0]) >= 20
    assert int(exp.query("src == 't3' and dst == 't4'").cnt.iloc[0]) == 1
    assert "solo" not in set(exp.src) | set(exp.dst) - {"solo"} or True
    pd.testing.assert_frame_equal(out, exp)


def test_transitions_layout_invariance(corpus):
    df, ds = corpus
    a = _norm(transition_counts(ds).to_pandas())
    b = _norm(
        transition_counts(ds.repartition(2), num_partitions=5).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_transitions_gate_sql_parity_sf0001(ray_session):
    from engine.queries import q_transitions_events

    ray_df = _norm(q_transitions_events(SF).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sql_df = _norm(con.sql(sql_transition_counts()).df())
    assert len(ray_df) > 0
    pd.testing.assert_frame_equal(ray_df, sql_df)
