"""X69 exact-global-selection tests: np.sort oracle across
adversarial distributions (massive duplicates, Zipf skew, adversarial
gaps spanning the int range, negatives, tiny n), the gather-cap
bypass (cap smaller than every narrowing step), layout invariance,
and sf0.001 DuckDB ORDER BY + OFFSET mirror parity of the gate."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

import engine.kselect as ks
from engine.kselect import DEFAULT_RANKS, global_kth, sql_global_kth_events

SF = "/root/testdata/sf0.001"


def _oracle(x: np.ndarray):
    s = np.sort(x)
    n = len(s)
    out = {}
    for tag, qn, qd in DEFAULT_RANKS:
        k = max(1, -(-qn * n // qd))
        out[tag] = (n, k, int(s[k - 1]))
    return out


def _check(ds, x):
    got = global_kth(ds, "x").to_pandas().set_index("tag")
    exp = _oracle(x)
    for tag, (n, k, v) in exp.items():
        row = got.loc[tag]
        assert (int(row.n), int(row.k), int(row.value)) == (n, k, v), tag


CASES = {
    "duplicates": lambda rng: rng.choice(
        np.array([5, 5, 5, 7, 7, 1000], np.int64), 50_000
    ),
    "zipf": lambda rng: (
        rng.zipf(1.3, 50_000).astype(np.int64).clip(max=10**9)
    ),
    "gaps": lambda rng: np.r_[
        rng.randint(-(2**62), -(2**61), 20_000),
        rng.randint(2**61, 2**62, 30_001),
    ].astype(np.int64),
    "tiny": lambda rng: rng.randint(-5, 5, 3).astype(np.int64),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_kselect_vs_sort_oracle(ray_session, name):
    rng = np.random.RandomState(hash(name) % 2**31)
    x = CASES[name](rng)
    ds = rd.from_arrow(pa.table({"x": x})).repartition(7)
    _check(ds, x)


def test_kselect_narrowing_path_without_gather(ray_session, monkeypatch):
    # cap 0 forces the histogram loop to run to width-1 resolution —
    # the pure narrowing path must be exact on its own
    monkeypatch.setattr(ks, "_GATHER_CAP", 0)
    rng = np.random.RandomState(8)
    x = rng.randint(-(10**12), 10**12, 30_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": x})).repartition(5)
    _check(ds, x)


def test_kselect_layout_invariance(ray_session):
    rng = np.random.RandomState(77)
    x = rng.randint(0, 10**6, 40_000).astype(np.int64)
    a = (
        global_kth(rd.from_arrow(pa.table({"x": x})).repartition(3), "x")
        .to_pandas()
        .sort_values("tag")
        .reset_index(drop=True)
    )
    b = (
        global_kth(rd.from_arrow(pa.table({"x": x})).repartition(17), "x")
        .to_pandas()
        .sort_values("tag")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_kselect_empty(ray_session):
    ds = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert global_kth(ds, "x").num_rows == 0


def test_kselect_gate_sql_parity_sf0001(ray_session):
    from engine.queries import q_global_kth_events

    ray_df = (
        q_global_kth_events(SF)
        .to_pandas()
        .sort_values("tag")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    sql_df = (
        con.sql(sql_global_kth_events())
        .df()
        .sort_values("tag")
        .reset_index(drop=True)
    )
    assert len(ray_df) == 4
    pd.testing.assert_frame_equal(
        ray_df, sql_df.astype({"n": np.int64, "k": np.int64, "value": np.int64})
    )


def test_kselect_gather_collects_bounded_rows(ray_session, monkeypatch):
    """ADVICE r4 regression: the gather pass must filter with the OR
    of each tag's OWN interval, never their union hull — on uniform
    data all rank intervals cross the cap in the same round and the
    hull spans p25..p99 (~74% of the corpus collected to the driver).
    Wrap the filter stage to count what actually lands driverside and
    assert the n_tags * cap contract, plus exactness."""
    rng = np.random.RandomState(4)
    n = 60_000
    x = rng.randint(0, 10**9, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": x})).repartition(6)

    monkeypatch.setattr(ks, "_GATHER_CAP", 2_000)
    collected = []
    orig_sort = np.sort

    def counting_sort(a, *args, **kw):
        if isinstance(a, np.ndarray) and a.dtype == np.int64:
            collected.append(len(a))
        return orig_sort(a, *args, **kw)

    monkeypatch.setattr(ks.np, "sort", counting_sort)
    got = global_kth(ds, "x").to_pandas().set_index("tag")
    monkeypatch.setattr(ks.np, "sort", orig_sort)
    exp = _oracle(x)
    for tag, (nn, k, v) in exp.items():
        row = got.loc[tag]
        assert (int(row.n), int(row.k), int(row.value)) == (nn, k, v), tag
    gathered = max(collected)  # the gather pass is the largest sort
    assert gathered <= len(DEFAULT_RANKS) * 2_000, (
        f"gather collected {gathered} rows (> n_tags * cap); "
        "union-hull regression"
    )
