"""Interval (range) join operator (engine/interval.py): brute-force
equivalence across bin widths, boundary semantics, replication
correctness, and the driver-gate query vs DuckDB at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _mk(seed=11, n_points=500, n_intervals=40):
    rng = np.random.default_rng(seed)
    p = pd.DataFrame(
        {
            "pid": np.arange(n_points, dtype=np.int64),
            "v": np.round(rng.uniform(-50, 150, n_points), 3),
        }
    )
    lo = np.round(rng.uniform(-60, 140, n_intervals), 3)
    span = np.round(rng.uniform(0, 30, n_intervals), 3)
    i = pd.DataFrame(
        {
            "lo": lo,
            "hi": lo + span,
            "iid": np.arange(n_intervals, dtype=np.int64),
        }
    )
    return p, i


def _brute(p, i):
    rows = []
    for _, pr in p.iterrows():
        for _, ir in i.iterrows():
            if ir["lo"] <= pr["v"] < ir["hi"]:
                rows.append((pr["pid"], ir["iid"]))
    return sorted(rows)


@pytest.mark.parametrize("bin_width", [0.7, 5.0, 64.0])
@pytest.mark.parametrize("threshold", [0, 65_536])  # 0 = force shuffle path
def test_interval_join_matches_bruteforce(ray_session, bin_width, threshold):
    import ray
    from engine.interval import interval_join

    p, i = _mk()
    got = interval_join(
        ray.data.from_pandas(p).repartition(5),
        ray.data.from_pandas(i).repartition(3),
        value="v",
        bin_width=bin_width,
        num_partitions=7,
        broadcast_threshold=threshold,
    ).to_pandas()
    pairs = sorted(zip(got["pid"].astype(np.int64), got["iid"].astype(np.int64)))
    assert pairs == _brute(p, i)
    assert len(pairs) > 0
    # payload columns ride through intact
    assert set(got.columns) == {"pid", "v", "lo", "hi", "iid"}
    assert ((got["v"] >= got["lo"]) & (got["v"] < got["hi"])).all()


@pytest.mark.parametrize("threshold", [0, 65_536])
def test_interval_join_halfopen_boundaries(ray_session, threshold):
    """v == lo matches, v == hi does not — including when the boundary
    sits exactly on a bin edge (the over-replication path)."""
    import ray
    from engine.interval import interval_join

    p = pd.DataFrame({"pid": np.array([0, 1, 2], dtype=np.int64),
                      "v": [10.0, 20.0, 15.0]})
    i = pd.DataFrame({"lo": [10.0], "hi": [20.0],
                      "iid": np.array([5], dtype=np.int64)})
    got = interval_join(
        ray.data.from_pandas(p), ray.data.from_pandas(i),
        value="v", bin_width=10.0,  # lo and hi both exactly on bin edges
        broadcast_threshold=threshold,
    ).to_pandas()
    assert sorted(got["pid"].tolist()) == [0, 2]


def test_interval_join_validation(ray_session):
    import ray
    from engine.interval import interval_join

    p = pd.DataFrame({"pid": [1], "v": [1.0]})
    i = pd.DataFrame({"lo": [0.0], "hi": [2.0], "v": [9.9]})
    with pytest.raises(ValueError, match="collide"):
        interval_join(ray.data.from_pandas(p), ray.data.from_pandas(i), value="v")
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(
            ray.data.from_pandas(p),
            ray.data.from_pandas(i.rename(columns={"v": "iid"})),
            value="v",
            bin_width=0,
        )


def test_interval_events_query_vs_duckdb(ray_session):
    import duckdb

    from engine.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    fn, sql = REGISTRY["interval_bands"]
    got = fn(sf).to_pandas()
    con = duckdb.connect()
    for t in ("events", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = con.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns)
    key = ["event_id", "band_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    # overlapping bands: some events match 2 bands
    assert got["event_id"].duplicated().any()
    for c in want.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if got[c].dtype.kind == "f":
            np.testing.assert_allclose(g, w)
        else:
            assert (g == w).all(), c
