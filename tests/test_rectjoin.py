"""X62 rectangle-overlap join tests: brute pandas oracle (incl.
touching edges, degenerate width-0 rects, big multi-tile rects),
tile-size invariance (the reference-point dedup rule), block-layout
invariance, and sf0.001 DuckDB mirror parity of the gate query."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.rectjoin import rect_join_gate, rect_overlap_join, sql_rect_join

SF = "/root/testdata/sf0.001"


def _synth(n: int, seed: int, big_every: int = 25):
    rng = np.random.RandomState(seed)
    x1 = rng.randint(0, 12000, n).astype(np.int64)
    y1 = rng.randint(0, 12000, n).astype(np.int64)
    w = rng.randint(0, 80, n).astype(np.int64)  # 0-width rects live
    h = rng.randint(0, 80, n).astype(np.int64)
    big = np.arange(n) % big_every == 0
    w[big] += rng.randint(600, 2000, int(big.sum()))
    h[big] += rng.randint(600, 2000, int(big.sum()))
    return pd.DataFrame(
        {"id": np.arange(n, dtype=np.int64), "x1": x1, "x2": x1 + w, "y1": y1, "y2": y1 + h}
    )


def _brute(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
    ax1 = a.x1.to_numpy()[:, None]
    ax2 = a.x2.to_numpy()[:, None]
    ay1 = a.y1.to_numpy()[:, None]
    ay2 = a.y2.to_numpy()[:, None]
    bx1 = b.x1.to_numpy()[None, :]
    bx2 = b.x2.to_numpy()[None, :]
    by1 = b.y1.to_numpy()[None, :]
    by2 = b.y2.to_numpy()[None, :]
    ix1, ix2 = np.maximum(ax1, bx1), np.minimum(ax2, bx2)
    iy1, iy2 = np.maximum(ay1, by1), np.minimum(ay2, by2)
    m = (ix1 <= ix2) & (iy1 <= iy2)
    r, c = np.nonzero(m)
    out = pd.DataFrame(
        {
            "a_id": a.id.to_numpy()[r],
            "b_id": b.id.to_numpy()[c],
            "area": (ix2[r, c] - ix1[r, c] + 1) * (iy2[r, c] - iy1[r, c] + 1),
        }
    )
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["a_id", "b_id", "area"]]
        .astype(np.int64)
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpora(ray_session):
    a = _synth(900, 11)
    b = _synth(700, 23)
    dsa = rd.from_arrow(pa.Table.from_pandas(a)).repartition(5)
    dsb = rd.from_arrow(pa.Table.from_pandas(b)).repartition(3)
    return a, b, dsa, dsb


def test_rect_join_vs_brute(corpora):
    a, b, dsa, dsb = corpora
    out = _norm(rect_overlap_join(dsa, dsb).to_pandas())
    exp = _brute(a, b)
    assert len(exp) > 500  # the corpus actually exercises overlaps
    pd.testing.assert_frame_equal(out, exp)


def test_rect_join_touching_and_degenerate(ray_session):
    # hand-built edge semantics: closed intervals — touching overlaps
    a = pd.DataFrame({"id": [1, 2, 3], "x1": [0, 100, 200], "x2": [10, 110, 200],
                      "y1": [0, 100, 200], "y2": [10, 110, 200]})
    b = pd.DataFrame({"id": [7, 8, 9], "x1": [10, 111, 200], "x2": [20, 120, 200],
                      "y1": [10, 100, 200], "y2": [20, 110, 200]})
    dsa = rd.from_arrow(pa.Table.from_pandas(a))
    dsb = rd.from_arrow(pa.Table.from_pandas(b))
    out = _norm(rect_overlap_join(dsa, dsb).to_pandas())
    exp = _brute(a, b)
    # corner-touch (1,7) area 1; (2,8) gap of 1 -> no pair;
    # point-rect (3,9) area 1
    assert set(map(tuple, exp[["a_id", "b_id"]].to_numpy())) == {(1, 7), (3, 9)}
    pd.testing.assert_frame_equal(out, exp)


def test_rect_join_tile_size_invariance(corpora):
    a, b, dsa, dsb = corpora
    exp = _brute(a, b)
    for bits in (7, 9, 11):
        out = _norm(rect_overlap_join(dsa, dsb, tile_bits=bits).to_pandas())
        pd.testing.assert_frame_equal(out, exp)


def test_rect_join_layout_invariance(corpora):
    a, b, dsa, dsb = corpora
    x = _norm(rect_overlap_join(dsa.repartition(17), dsb.repartition(1)).to_pandas())
    y = _norm(rect_overlap_join(dsa, dsb).to_pandas())
    pd.testing.assert_frame_equal(x, y)


def test_rect_join_gate_sql_parity_sf0001(ray_session):
    o = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    p = rd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey"])
    ray_df = _norm(rect_join_gate(o, p).to_pandas())
    con = duckdb.connect()
    for t in ("orders", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sql_df = _norm(con.sql(sql_rect_join()).df())
    assert len(ray_df) > 0
    pd.testing.assert_frame_equal(ray_df, sql_df)
