"""X68 ordered-grouped-aggregation tests: brute pandas oracle with
non-trivial within-group order (values deliberately NOT in key or
arrival order), the duplicate-order-key contract guard, layout
invariance, empty-sep and single-row groups, and sf0.001 DuckDB
string_agg mirror parity of the gate."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.ordagg import grouped_string_agg, sql_string_agg_orders

SF = "/root/testdata/sf0.001"


def _synth(seed: int = 13):
    rng = np.random.RandomState(seed)
    n = 5000
    k = rng.randint(0, 40, n)
    order = rng.permutation(n).astype(np.int64)  # unique, shuffled
    val = np.array([f"v{o % 97}" for o in order], object)
    # a few single-row groups
    k = np.r_[k, [100, 101]]
    order = np.r_[order, [n + 1, n + 2]]
    val = np.append(val, ["solo1", "solo2"])
    return pd.DataFrame(
        {"key": k.astype(str), "o": order, "val": val}
    )


def _brute(df: pd.DataFrame, sep: str = ",") -> pd.DataFrame:
    s = df.sort_values(["key", "o"], kind="stable")
    g = s.groupby("key", sort=True)
    out = pd.DataFrame(
        {
            "key": [k for k, _ in g],
            "n": g.size().to_numpy().astype(np.int64),
            "agg": [sep.join(sub.val) for _, sub in g],
        }
    )
    return out.sort_values("key").reset_index(drop=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["key", "n", "agg"]]
        .astype({"n": np.int64})
        .sort_values("key")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpus(ray_session):
    df = _synth()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(9)
    return df, ds


def test_string_agg_vs_brute(corpus):
    df, ds = corpus
    out = _norm(
        grouped_string_agg(
            ds, key_col="key", order_col="o", val_col="val"
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(out, _brute(df))


def test_string_agg_layout_invariance(corpus):
    df, ds = corpus
    a = _norm(
        grouped_string_agg(
            ds, key_col="key", order_col="o", val_col="val"
        ).to_pandas()
    )
    b = _norm(
        grouped_string_agg(
            ds.repartition(2), key_col="key", order_col="o", val_col="val",
            num_partitions=5,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_string_agg_duplicate_order_raises(ray_session):
    bad = rd.from_arrow(
        pa.table(
            {
                "key": ["a", "a"],
                "o": np.array([7, 7], np.int64),
                "val": ["x", "y"],
            }
        )
    )
    with pytest.raises(Exception, match="not unique"):
        grouped_string_agg(
            bad, key_col="key", order_col="o", val_col="val"
        ).to_pandas()


def test_string_agg_gate_sql_parity_sf0001(ray_session):
    from engine.queries import q_string_agg_orders

    ray_df = (
        q_string_agg_orders(SF)
        .to_pandas()
        .sort_values("prio")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    sql_df = (
        con.sql(sql_string_agg_orders())
        .df()
        .sort_values("prio")
        .reset_index(drop=True)
    )
    assert len(ray_df) > 0 and ray_df["agg"].str.len().max() > 100
    pd.testing.assert_frame_equal(
        ray_df[["prio", "n", "agg"]],
        sql_df[["prio", "n", "agg"]].astype({"n": np.int64}),
    )
