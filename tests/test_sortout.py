"""X72 sorted-export tests: global sortedness + multiset equality vs
np.sort, rank-map layout invariance (partition boundaries may move,
the (key -> rank) map may not), sampled-split balance on a Zipf
distribution where equal-width ranges would hot-spot, and sf0.001
DuckDB ROW_NUMBER mirror parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import duckdb
import ray.data as rd

from engine.sortout import ranked_rows, sampled_splits, sorted_export

SF = "/root/testdata/sf0.001"


def _export(ds, tmp, n_parts=8):
    man = sorted_export(
        ds, col="key", out_dir=str(tmp), num_partitions=n_parts,
        keep_cols=["payload"],
    )
    return man, ranked_rows(str(tmp), man, "key", ["payload"]).to_pandas()


@pytest.fixture(scope="module")
def corpus(ray_session):
    rng = np.random.RandomState(3)
    n = 50_000
    # Zipf values packed with a unique tiebreak
    z = rng.zipf(1.4, n).astype(np.int64).clip(max=1 << 30)
    key = z * (1 << 20) + np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"key": key, "payload": np.arange(n, dtype=np.int64)})
    return df, rd.from_arrow(pa.Table.from_pandas(df)).repartition(10)


def test_sorted_export_order_and_multiset(corpus, tmp_path):
    df, ds = corpus
    man, out = _export(ds, tmp_path / "a")
    assert (np.diff(out.key.to_numpy()) > 0).all()  # strict global order
    np.testing.assert_array_equal(
        out.key.to_numpy(), np.sort(df.key.to_numpy())
    )
    assert (out["rank"].to_numpy() == np.arange(len(df))).all()
    # payload rides: key -> payload mapping preserved
    m = df.set_index("key").payload
    np.testing.assert_array_equal(
        out.payload.to_numpy(), m.loc[out.key].to_numpy()
    )


def test_sorted_export_rank_map_layout_invariant(corpus, tmp_path):
    df, ds = corpus
    _, a = _export(ds, tmp_path / "a", n_parts=8)
    _, b = _export(ds.repartition(3), tmp_path / "b", n_parts=13)
    pd.testing.assert_frame_equal(
        a.sort_values("key").reset_index(drop=True),
        b.sort_values("key").reset_index(drop=True),
    )


def test_sampled_splits_balance_zipf(corpus, ray_session):
    df, ds = corpus
    splits = sampled_splits(ds, "key", 16)
    v = np.sort(df.key.to_numpy())
    counts = np.diff(
        np.r_[0, np.searchsorted(v, splits, side="right"), len(v)]
    )
    # sampled splits: no partition beyond ~3x its fair share
    assert counts.max() <= 3 * len(v) / 16
    # equal-width ranges on the same data: one range holds ~everything
    lo, hi = int(v[0]), int(v[-1])
    width = max(1, -(-(hi - lo + 1) // 16))
    ew = np.bincount((v - lo) // width, minlength=16)
    assert ew.max() > 0.9 * len(v)  # the hot-spot the sampling avoids


def test_sorted_export_gate_sql_parity_sf0001(ray_session):
    from engine.queries import q_sorted_export_events

    ray_df = (
        q_sorted_export_events(SF)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    from engine.queries import _sorted_export_sql_gate

    sql_df = (
        con.sql(_sorted_export_sql_gate())
        .df()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert len(ray_df) > 0
    pd.testing.assert_frame_equal(
        ray_df[["key", "event_id", "rank"]],
        sql_df[["key", "event_id", "rank"]].astype(
            {"key": np.int64, "event_id": np.int64, "rank": np.int64}
        ),
    )
