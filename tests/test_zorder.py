"""X59 Z-order layout tests: Morton kernel vs bit-by-bit brute force,
DuckDB mirror parity, bbox quadtree cover exactness (and superset
degradation under a node budget), end-to-end layout write + pruned
bbox query vs brute filter, and the total-order guards."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from engine.zorder import (
    GRID_BITS,
    bbox_zranges,
    morton_key,
    sql_morton,
    synth_grid_coords,
    zorder_assign,
    zorder_bbox_query,
    zorder_layout,
)


def _brute_morton(a: int, b: int) -> int:
    out = 0
    for i in range(GRID_BITS):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_kernel_vs_brute_and_sql():
    rng = np.random.RandomState(7)
    ix = rng.randint(0, 1 << GRID_BITS, 2000).astype(np.int64)
    iy = rng.randint(0, 1 << GRID_BITS, 2000).astype(np.int64)
    z = morton_key(ix, iy).astype(np.int64)
    for a, b, k in zip(ix[:100], iy[:100], z[:100]):
        assert _brute_morton(int(a), int(b)) == int(k)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"ix": ix, "iy": iy}))
    q = con.execute(
        f"SELECT CAST({sql_morton('ix', 'iy')} AS BIGINT) AS z FROM t"
    ).fetchnumpy()["z"]
    assert np.array_equal(q, z)


def test_morton_order_locality():
    # Aligned 2^k squares are contiguous z-runs: the defining layout
    # property the bbox decomposition relies on.
    xs, ys = np.meshgrid(np.arange(4, 8), np.arange(12, 16))
    z = morton_key(
        xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)
    ).astype(np.int64)
    z.sort()
    assert z[-1] - z[0] == 15 and len(np.unique(z)) == 16


def _cover(ranges, keys):
    import bisect

    los = [r[0] for r in ranges]
    out = []
    for k in keys:
        i = bisect.bisect_right(los, int(k)) - 1
        out.append(i >= 0 and ranges[i][1] >= int(k))
    return np.array(out)


def test_bbox_zranges_exact_cover():
    rng = np.random.RandomState(3)
    for _ in range(30):
        x0, y0 = rng.randint(0, 900, 2)
        x1, y1 = x0 + rng.randint(0, 400), y0 + rng.randint(0, 400)
        ranges = bbox_zranges(int(x0), int(x1), int(y0), int(y1), bits=10)
        xs = rng.randint(0, 1024, 1500)
        ys = rng.randint(0, 1024, 1500)
        z = morton_key(xs.astype(np.int64), ys.astype(np.int64))
        inbox = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
        assert np.array_equal(_cover(ranges, z.astype(np.int64)), inbox)


def test_bbox_zranges_budget_superset():
    rng = np.random.RandomState(4)
    ranges = bbox_zranges(3, 900, 7, 800, bits=10, max_nodes=8)
    xs = rng.randint(0, 1024, 2000)
    ys = rng.randint(0, 1024, 2000)
    z = morton_key(xs.astype(np.int64), ys.astype(np.int64))
    inbox = (xs >= 3) & (xs <= 900) & (ys >= 7) & (ys <= 800)
    got = _cover(ranges, z.astype(np.int64))
    assert np.all(got[inbox])  # never misses an in-box point


def test_bbox_zranges_degenerate():
    assert bbox_zranges(5, 4, 0, 10) == []
    one = bbox_zranges(9, 9, 17, 17, bits=10)
    k = int(morton_key(np.array([9]), np.array([17]))[0])
    assert one == [(k, k)]


@pytest.fixture()
def points_ds(ray_session):
    import ray.data as rd

    ids = np.arange(5000, dtype=np.int64)
    ix, iy = synth_grid_coords(ids)
    return rd.from_pandas(
        pd.DataFrame({"pid_col": ids, "ix": ix, "iy": iy})
    ).repartition(7)


def test_zorder_assign_rank_rule(points_ds):
    out = (
        zorder_assign(points_ds, "pid_col", part_size=256)
        .to_pandas()
        .sort_values("pid_col")
        .reset_index(drop=True)
    )
    z = morton_key(
        out["ix"].to_numpy().astype(np.int64),
        out["iy"].to_numpy().astype(np.int64),
    ).astype(np.int64)
    assert np.array_equal(out["zkey"].to_numpy(), z)
    okey = (z << np.int64(22)) | out["pid_col"].to_numpy()
    rank = np.argsort(np.argsort(okey, kind="stable"), kind="stable")
    assert np.array_equal(out["pid"].to_numpy(), rank // 256)
    assert np.array_equal(out["pos"].to_numpy(), rank % 256)


def test_zorder_assign_guards(ray_session):
    import ray.data as rd

    bad = rd.from_pandas(
        pd.DataFrame({"i": [1 << 22], "ix": [0], "iy": [0]})
    )
    with pytest.raises(Exception, match="densify|outside"):
        zorder_assign(bad, "i").to_pandas()
    bad2 = rd.from_pandas(
        pd.DataFrame({"i": [1], "ix": [1 << GRID_BITS], "iy": [0]})
    )
    with pytest.raises(Exception, match="grid coords"):
        zorder_assign(bad2, "i").to_pandas()


def test_layout_write_and_pruned_bbox_query(points_ds, tmp_path):
    out_dir = str(tmp_path / "zl")
    manifest = zorder_layout(
        points_ds, out_dir, "pid_col", part_size=512, num_partitions=8
    )
    assert sum(p["rows"] for p in manifest["parts"]) == 5000
    sizes = [p["rows"] for p in manifest["parts"]]
    assert all(s == 512 for s in sizes[:-1]) and sizes[-1] <= 512
    # manifest ranges are disjoint and sorted (rank order = key order)
    for a, b in zip(manifest["parts"], manifest["parts"][1:]):
        assert a["zmax"] <= b["zmin"]

    ids = np.arange(5000, dtype=np.int64)
    ix, iy = synth_grid_coords(ids)
    for x0, x1, y0, y1 in [
        (0, 1 << 19, 0, 1 << 19),  # quarter plane
        (100, 200_000, 5_000, 90_000),  # small box
        (0, (1 << GRID_BITS) - 1, 0, (1 << GRID_BITS) - 1),  # all
    ]:
        got, stats = zorder_bbox_query(out_dir, x0, x1, y0, y1)
        gdf = got.to_pandas().sort_values("pid_col").reset_index(drop=True)
        mask = (ix >= x0) & (ix <= x1) & (iy >= y0) & (iy <= y1)
        assert np.array_equal(gdf["pid_col"].to_numpy(), ids[mask])
        assert stats["files_read"] <= stats["files_total"]
    # selective box must actually skip files (the layout's point)
    _, stats = zorder_bbox_query(out_dir, 0, 4095, 0, 4095)
    assert stats["files_read"] < stats["files_total"]


def test_zorder_points_gate_sql_parity(ray_session):
    from engine.queries import REGISTRY

    fn, sql = REGISTRY["zorder_points"]
    got = (
        fn("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    exp = con.execute(sql).df().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[exp.columns].astype("int64"), exp.astype("int64")
    )
