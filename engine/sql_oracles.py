"""SQL-value-oracled spatial operators (round-1 widening).

Each query here runs the REAL engine operator as a Ray Data pipeline
over driver testdata tables and is paired with a DuckDB oracle that
recomputes the result independently (term-for-term float mirror or
closed-form truth). This upgrades ops that previously had rows-only
checks to full value verification:

- ``s2_cells``      — S2-style cell assignment (geokit.cells.cell_id,
                      SURVEY.md §7.3.4; north_star "tile assignments
                      exactly") + parent containment, mirrored in SQL
                      with BIGINT bit arithmetic. Measured bitwise-
                      equal vs DuckDB (0 mismatches at 50k pts).
- ``cell_rollup_sql``— salted per-cell groupby rollup (A1) vs SQL
                      GROUP BY over the same bit-exact cell ids.
- ``geoid_bilinear`` — K8 bilinear geoid undulation; SQL recomputes
                      the grid NODE values from the analytic surface
                      (assets/make_assets.py: linspace verified
                      bitwise == lat0 + i*dlat) and mirrors the
                      interpolation. Cross-engine diff measured
                      <= 4e-14 m; outputs quantized to 0.1 mm
                      (boundary margin ~1e6x the diff).
- ``dms_roundtrip``  — K1 deg->DMS->deg (reference ggeo.c::deg2dms/
                      dms2deg), floor arithmetic mirrored in SQL.
- ``knn_oracle``     — J4 kNN join: the engine's PaddedGridKnn index
                      (geokit.knn) in a stateful map_batches stage vs
                      a brute-force SQL cross-join top-k. Control
                      points derived by integer arithmetic on BOTH
                      sides (range(m) in SQL, arange in numpy).
- ``pip_quads``      — J3 point-in-polygon: the engine's generic
                      ray-crossing pip_lookup (geokit.polygons) vs
                      closed-form floor-quad truth in SQL over a
                      deterministic quad tiling.

Determinism note: numpy and DuckDB share libm here; every float
expression is mirrored term-for-term, and quantized outputs carry
measured boundary margins (see tools/check_oracles.py). SQL numeric
literals must be e-notation (``1.8e0``): DuckDB types bare ``1.8`` as
DECIMAL and a BIGINT*DECIMAL chain stays exact-decimal, diverging from
the numpy float64 chain (measured 45-ulp d2 differences before the
fix). Measured margins at sf0.1 (fraction of one quantum to the
nearest rounding boundary): geoid n_dmm 2.3e-7 (~650x the 3.6e-14 m
cross-engine diff), dms sec_e7 0.4998, knn d_um 3.8e-6 (d2 itself is
bitwise-equal), pip nearest-quad-boundary distance 0.325 m; s2 cell
ids bitwise-equal (0 mismatches at 600k points).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from geokit.cells import cell_id, cell_parent
from geokit.dms import deg2dms, dms2deg
from geokit.geoid import geoid_undulation
from geokit.knn import PaddedGridKnn
from geokit.polygons import PolygonSet, pip_lookup

# ---------------------------------------------------------------- helpers

CELL_LEVEL = 12
PARENT_LEVEL = 8


def _np(batch: pa.Table, col: str) -> np.ndarray:
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False)


def _c(v: float) -> str:
    """Float constant as an explicit DOUBLE (bare decimal literals are
    DECIMAL-typed in DuckDB: DECIMAL*DECIMAL overflows and DECIMAL
    chains diverge from float64; parenthesized so '-' can precede)."""
    return f"(CAST({v!r} AS DOUBLE))"


def _read(sf_dir: str, table: str, columns) -> Dataset:
    from engine.util import clean_read_schema

    path = f"{sf_dir}/{table}.parquet"
    return rd.read_parquet(path, columns=columns, schema=clean_read_schema(path, columns))


# Derived lat/lon points from lineitem keys (same arithmetic in numpy
# and SQL; see engine/queries.py tm oracles). i%7==0 rows are pushed
# 0.5 deg south — below the geoid bbox — to exercise the out-of-bounds
# fallback path (SURVEY.md §2.3 M4).
_SQL_LL = """
WITH pts AS (
 SELECT l_orderkey, l_linenumber,
   45.2 + ((l_orderkey * 40503 + l_linenumber) % 100000) * 1.9e-5
     - (CASE WHEN l_orderkey % 7 = 0 THEN 0.5 ELSE 0.0 END) AS fi,
   13.1 + ((l_orderkey * 69069 + l_partkey) % 100000) * 3.6e-5 AS la
 FROM lineitem)
"""


def _derive_ll(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    ok = _np(batch, "l_orderkey")
    ln = _np(batch, "l_linenumber").astype(np.int64)
    pk = _np(batch, "l_partkey")
    fi = 45.2 + ((ok * 40503 + ln) % 100000) * 1.9e-5 - np.where(
        ok % 7 == 0, 0.5, 0.0
    )
    la = 13.1 + ((ok * 69069 + pk) % 100000) * 3.6e-5
    return ok, ln, fi, la


# Derived projected D96-space points from orders keys; o_orderkey%11==0
# rows shift 50 km west so some land outside the quad tiling / kNN grid
# (exercises the outside -1 path and the brute-force fallback).
# All constants in e-notation: DuckDB parses bare `1.8` as DECIMAL and
# `BIGINT * DECIMAL` stays exact-decimal, diverging from the numpy
# float64 chain (measured: 45-ulp d2 differences). `1.8e0` is DOUBLE.
_SQL_XY = """
WITH pts AS (
 SELECT o_orderkey,
   2.5e4 + ((o_orderkey * 40503 + o_custkey) % 100000) * 1.8e0
     - (CASE WHEN o_orderkey % 11 = 0 THEN 5.0e4 ELSE 0.0e0 END) AS px,
   3.7e5 + ((o_orderkey * 69069 + o_custkey) % 100000) * 2.6e0 AS py
 FROM orders)
"""


def _derive_xy(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ok = _np(batch, "o_orderkey")
    ck = _np(batch, "o_custkey")
    px = 25000.0 + ((ok * 40503 + ck) % 100000) * 1.8 - np.where(
        ok % 11 == 0, 50000.0, 0.0
    )
    py = 370000.0 + ((ok * 69069 + ck) % 100000) * 2.6
    return ok, px, py


# ------------------------------------------------------------- s2_cells

def q_s2_cells(sf_dir: str) -> Dataset:
    """Per-point S2-style cell id at level 12 + level-8 parent."""

    def fn(batch: pa.Table) -> pa.Table:
        ok, ln, fi, la = _derive_ll(batch)
        cid = cell_id(fi, la, CELL_LEVEL)
        par = cell_parent(cid, PARENT_LEVEL)
        return pa.table(
            {
                "l_orderkey": pa.array(ok),
                "l_linenumber": pa.array(ln.astype(np.int32)),
                "cell": pa.array(cid, pa.int64()),
                "cell_parent": pa.array(par, pa.int64()),
            }
        )

    return _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


_SPREAD_MASKS = [
    (16, 281470681808895),
    (8, 71777214294589695),
    (4, 1085102592571150095),
    (2, 3689348814741910323),
    (1, 6148914691236517205),
]


def _sql_spread(col: str) -> str:
    e = col
    for sh, m in _SPREAD_MASKS:
        e = f"(({e} | ({e} << {sh})) & {m})"
    return e


def _sql_cell_chain(level: int) -> str:
    """CTE chain pts(fi, la, keys...) -> g(keys..., face, ii, jj)."""
    n = 1 << level
    return f""",
ca AS (SELECT *, radians(fi) AS phi, radians(la) AS lam FROM pts),
cb AS (SELECT *, cos(phi) * cos(lam) AS x, cos(phi) * sin(lam) AS y, sin(phi) AS z FROM ca),
cc AS (SELECT *, abs(x) AS ax, abs(y) AS ay, abs(z) AS az FROM cb),
cd AS (SELECT *, (ax >= ay AND ax >= az) AS fx, (NOT (ax >= ay AND ax >= az) AND ay >= az) AS fy FROM cc),
ce AS (SELECT *, CASE WHEN fx THEN (CASE WHEN x >= 0 THEN 0 ELSE 3 END) WHEN fy THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END) ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END AS face,
  (CASE WHEN fx THEN y WHEN fy THEN z ELSE x END) / (CASE WHEN fx THEN x WHEN fy THEN y ELSE z END) AS u,
  (CASE WHEN fx THEN z WHEN fy THEN x ELSE y END) / (CASE WHEN fx THEN x WHEN fy THEN y ELSE z END) AS v FROM cd),
cf AS (SELECT *, CASE WHEN u >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * u) ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END AS s,
  CASE WHEN v >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * v) ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END AS t FROM ce),
cg AS (SELECT *, LEAST(GREATEST(CAST(floor(s * {n}.0) AS BIGINT), 0), {n - 1}) AS ii,
  LEAST(GREATEST(CAST(floor(t * {n}.0) AS BIGINT), 0), {n - 1}) AS jj FROM cf)
"""


def _sql_cell_expr(level: int) -> str:
    morton = f"({_sql_spread('ii')} | ({_sql_spread('jj')} << 1))"
    return f"((CAST({level} AS BIGINT) << 58) | (CAST(face AS BIGINT) << 55) | {morton})"


def _sql_s2_cells() -> str:
    shift = 2 * (CELL_LEVEL - PARENT_LEVEL)
    morton = f"({_sql_spread('ii')} | ({_sql_spread('jj')} << 1))"
    parent = (
        f"((CAST({PARENT_LEVEL} AS BIGINT) << 58) | (CAST(face AS BIGINT) << 55)"
        f" | ({morton} >> {shift}))"
    )
    return (
        _SQL_LL
        + _sql_cell_chain(CELL_LEVEL)
        + f"""
SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
  {_sql_cell_expr(CELL_LEVEL)} AS cell, {parent} AS cell_parent
FROM cg
"""
    )


# -------------------------------------------------------- cell_rollup_sql

def q_cell_rollup_sql(sf_dir: str) -> Dataset:
    """Salted per-cell rollup (A1) over bit-exact cell ids: count +
    coordinate sums (sums, not means, so the SQL comparison is exact
    under quantization; the engine's combiner pre-agg still runs)."""
    from engine.shuffle import grouped_count_sums

    def fn(batch: pa.Table) -> pa.Table:
        ok, ln, fi, la = _derive_ll(batch)
        cid = cell_id(fi, la, CELL_LEVEL)
        return pa.table({"cell": pa.array(cid, pa.int64())})

    pts = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        fn, batch_format="pyarrow"
    )
    return grouped_count_sums(pts, key="cell")


def _sql_cell_rollup() -> str:
    return (
        _SQL_LL
        + _sql_cell_chain(CELL_LEVEL)
        + f"""
SELECT {_sql_cell_expr(CELL_LEVEL)} AS cell, CAST(COUNT(*) AS BIGINT) AS cnt
FROM cg GROUP BY 1
"""
    )


# -------------------------------------------------------- geoid_bilinear

def q_geoid_bilinear(sf_dir: str) -> Dataset:
    """K8 bilinear geoid undulation on derived points; output quantized
    to 0.1 mm (cross-engine diff <= ~4e-14 m; margin ~1e6x)."""
    import assets

    def fn(batch: pa.Table) -> pa.Table:
        ok, ln, fi, la = _derive_ll(batch)
        und, inb = geoid_undulation(fi, la, assets.load_geoid("slo2000"))
        und_e, _ = geoid_undulation(fi, la, assets.load_geoid("egm2008"))
        return pa.table(
            {
                "l_orderkey": pa.array(ok),
                "l_linenumber": pa.array(ln.astype(np.int32)),
                "n_dmm": pa.array(np.floor(und * 1e4 + 0.5).astype(np.int64)),
                "n_egm_dmm": pa.array(np.floor(und_e * 1e4 + 0.5).astype(np.int64)),
                "in_bounds": pa.array(inb),
            }
        )

    return _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _sql_analytic_geoid(fi: str, la: str) -> str:
    """Mirror of assets.make_assets.analytic_geoid, term for term."""
    return (
        f"(46.5 + 1.2 * sin(2.1 * ({fi} - 45.0)) * cos(1.7 * ({la} - 13.0))"
        f" + 0.8 * sin(0.9 * ({la} - 13.0))"
        f" + 0.15 * cos(3.3 * ({fi} - 45.0) + 0.5 * ({la} - 13.0)))"
    )


def _sql_geoid_interp_ctes(model: str, p: str) -> str:
    """Interpolation CTE chain for one geoid model, column prefix p."""
    import assets

    grid = assets.load_geoid(model)
    nrows, ncols = grid.N.shape
    lat0, lon0, dlat, dlon = grid.lat0, grid.lon0, grid.dlat, grid.dlon
    return f""",
{p}ga AS (SELECT *, (fi - {_c(lat0)}) / {_c(dlat)} AS {p}ri, (la - {_c(lon0)}) / {_c(dlon)} AS {p}ci FROM {{prev}}),
{p}gb AS (SELECT *, ({p}ri >= 0.0 AND {p}ri <= {nrows - 1}.0 AND {p}ci >= 0.0 AND {p}ci <= {ncols - 1}.0) AS {p}inb,
  LEAST(GREATEST({p}ri, 0.0), {_c(float(nrows - 1))}) AS {p}ric,
  LEAST(GREATEST({p}ci, 0.0), {_c(float(ncols - 1))}) AS {p}cic FROM {p}ga),
{p}gc AS (SELECT *, LEAST(CAST(floor({p}ric) AS BIGINT), {nrows - 2}) AS {p}r0,
  LEAST(CAST(floor({p}cic) AS BIGINT), {ncols - 2}) AS {p}c0 FROM {p}gb),
{p}gd AS (SELECT *, {p}ric - {p}r0 AS {p}fr, {p}cic - {p}c0 AS {p}fc,
  {_c(lat0)} + {p}r0 * {_c(dlat)} AS {p}lat_0, {_c(lon0)} + {p}c0 * {_c(dlon)} AS {p}lon_0,
  {_c(lat0)} + ({p}r0 + 1) * {_c(dlat)} AS {p}lat_1, {_c(lon0)} + ({p}c0 + 1) * {_c(dlon)} AS {p}lon_1 FROM {p}gc),
{p}ge AS (SELECT *, {_sql_analytic_geoid(p + 'lat_0', p + 'lon_0')} AS {p}n00, {_sql_analytic_geoid(p + 'lat_0', p + 'lon_1')} AS {p}n01,
  {_sql_analytic_geoid(p + 'lat_1', p + 'lon_0')} AS {p}n10, {_sql_analytic_geoid(p + 'lat_1', p + 'lon_1')} AS {p}n11 FROM {p}gd)"""


def _sql_geoid_und_expr(p: str) -> str:
    return (
        f"CASE WHEN {p}inb THEN {p}n00 * (1.0 - {p}fr) * (1.0 - {p}fc) + {p}n01 * (1.0 - {p}fr) * {p}fc"
        f" + {p}n10 * {p}fr * (1.0 - {p}fc) + {p}n11 * {p}fr * {p}fc ELSE 0.0 END"
    )


def _sql_geoid_bilinear() -> str:
    a = _sql_geoid_interp_ctes("slo2000", "s_").replace("{prev}", "pts")
    b = _sql_geoid_interp_ctes("egm2008", "e_").replace("{prev}", "s_ge")
    return (
        _SQL_LL
        + a
        + b
        + f"""
SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
  CAST(FLOOR(({_sql_geoid_und_expr('s_')}) * 1e4 + 0.5) AS BIGINT) AS n_dmm,
  CAST(FLOOR(({_sql_geoid_und_expr('e_')}) * 1e4 + 0.5) AS BIGINT) AS n_egm_dmm,
  s_inb AS in_bounds
FROM e_ge
"""
    )


# -------------------------------------------------------- dms_roundtrip

def q_dms_roundtrip(sf_dir: str) -> Dataset:
    """K1 deg->DMS->deg: integer deg/min + seconds and the reassembled
    decimal degrees (both quantized; sec to 1e-7 arcsec, deg to udeg)."""

    def fn(batch: pa.Table) -> pa.Table:
        ok, ln, fi, la = _derive_ll(batch)
        d, m, s = deg2dms(fi)
        back = dms2deg(d, m, s)
        return pa.table(
            {
                "l_orderkey": pa.array(ok),
                "l_linenumber": pa.array(ln.astype(np.int32)),
                "dd": pa.array(d.astype(np.int32)),
                "mm": pa.array(m.astype(np.int32)),
                "sec_e7": pa.array(np.floor(s * 1e7 + 0.5).astype(np.int64)),
                "back_udeg": pa.array(np.floor(back * 1e6 + 0.5).astype(np.int64)),
            }
        )

    return _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _sql_dms_roundtrip() -> str:
    # fi is always > 0 here, so sign handling reduces to the positive
    # branch (the signed path is pytest-covered in test_kernels).
    return (
        _SQL_LL
        + """,
da AS (SELECT *, floor(fi) AS d, (fi - floor(fi)) * 60.0 AS rem FROM pts),
db AS (SELECT *, floor(rem) AS m, (rem - floor(rem)) * 60.0 AS s FROM da)
SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
  CAST(d AS INTEGER) AS dd, CAST(m AS INTEGER) AS mm,
  CAST(FLOOR(s * 1e7 + 0.5) AS BIGINT) AS sec_e7,
  CAST(FLOOR((d + m / 60.0 + s / 3600.0) * 1e6 + 0.5) AS BIGINT) AS back_udeg
FROM db
"""
    )


# ----------------------------------------------------------- knn_oracle

KNN_M = 400  # control points
KNN_K = 3


def _control_points() -> tuple[np.ndarray, np.ndarray]:
    i = np.arange(KNN_M, dtype=np.int64)
    cx = 30000.0 + ((i * 7919 + 13) % 20000) * 10.0
    cy = 380000.0 + ((i * 104729 + 7) % 25000) * 10.0
    return cx, cy


_SQL_CP = f"""
cp AS (SELECT i AS cp_id,
   3.0e4 + ((i * 7919 + 13) % 20000) * 1.0e1 AS cx,
   3.8e5 + ((i * 104729 + 7) % 25000) * 1.0e1 AS cy
 FROM range({KNN_M}) t(i))
"""


class _KnnOracleStage:
    """Stateful map_batches stage: PaddedGridKnn over the derived
    control points, built once per actor (J4 deployment shape)."""

    def __init__(self):
        cx, cy = _control_points()
        self.index = PaddedGridKnn(cx, cy, KNN_K, ncells=1024)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok, px, py = _derive_xy(batch)
        idx, dist = self.index.query(px, py)
        cols = {"o_orderkey": pa.array(ok)}
        for j in range(KNN_K):
            cols[f"nn{j + 1}"] = pa.array(idx[:, j].astype(np.int32))
            cols[f"d{j + 1}_um"] = pa.array(
                np.floor(dist[:, j] * 1e6 + 0.5).astype(np.int64)
            )
        return pa.table(cols)


def q_knn_oracle(sf_dir: str) -> Dataset:
    return _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        _KnnOracleStage, batch_format="pyarrow", batch_size=32768, concurrency=(1, 4)
    )


def _sql_knn_oracle() -> str:
    picks = ",\n  ".join(
        f"MAX(CASE WHEN rk = {j + 1} THEN CAST(cp_id AS INTEGER) END) AS nn{j + 1},\n  "
        f"MAX(CASE WHEN rk = {j + 1} THEN CAST(FLOOR(sqrt(d2) * 1e6 + 0.5) AS BIGINT) END) AS d{j + 1}_um"
        for j in range(KNN_K)
    )
    return (
        _SQL_XY
        + f""",
{_SQL_CP},
dd AS (SELECT o_orderkey, cp_id, (px - cx) * (px - cx) + (py - cy) * (py - cy) AS d2
       FROM pts CROSS JOIN cp),
rr AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY d2, cp_id) AS rk FROM dd)
SELECT o_orderkey,
  {picks}
FROM rr WHERE rk <= {KNN_K} GROUP BY o_orderkey
"""
    )


# ------------------------------------------------------------ pip_quads

PIP_G = 8
PIP_X0, PIP_X1 = 20000.0, 210001.0
PIP_Y0, PIP_Y1 = 365000.0, 635003.0


def _quad_polyset() -> PolygonSet:
    """PIP_G x PIP_G regular quad tiling as generic polygons — the
    engine runs its general ray-crossing lookup against them; the SQL
    truth is closed-form floor arithmetic."""
    dx = (PIP_X1 - PIP_X0) / PIP_G
    dy = (PIP_Y1 - PIP_Y0) / PIP_G
    ids, xs, ys, bbox = [], [], [], []
    for i in range(PIP_G):
        for j in range(PIP_G):
            xa, xb = PIP_X0 + i * dx, PIP_X0 + (i + 1) * dx
            ya, yb = PIP_Y0 + j * dy, PIP_Y0 + (j + 1) * dy
            ids.append(i * PIP_G + j)
            xs.extend([xa, xb, xb, xa])
            ys.extend([ya, ya, yb, yb])
            bbox.append([xa, ya, xb, yb])
    p = len(ids)
    return PolygonSet(
        muni_id=np.array(ids, dtype=np.int32),
        name=np.array([f"q{i}" for i in ids], dtype=object),
        ring_start=np.arange(0, 4 * (p + 1), 4, dtype=np.int64),
        xs=np.array(xs),
        ys=np.array(ys),
        bbox=np.array(bbox),
    )


_QUADS: list[PolygonSet] = []


def q_pip_quads(sf_dir: str) -> Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        if not _QUADS:
            _QUADS.append(_quad_polyset())
        polys = _QUADS[0]
        ok, px, py = _derive_xy(batch)
        idx = pip_lookup(polys, px, py)
        quad = np.where(idx >= 0, polys.muni_id[np.where(idx >= 0, idx, 0)], -1)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "quad_id": pa.array(quad.astype(np.int32)),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _sql_pip_quads() -> str:
    dx = (PIP_X1 - PIP_X0) / PIP_G
    dy = (PIP_Y1 - PIP_Y0) / PIP_G
    return (
        _SQL_XY
        + f"""
SELECT o_orderkey,
  CAST(CASE WHEN px > {_c(PIP_X0)} AND px < {_c(PIP_X1)} AND py > {_c(PIP_Y0)} AND py < {_c(PIP_Y1)}
    THEN CAST(floor((px - {_c(PIP_X0)}) / {_c(dx)}) AS BIGINT) * {PIP_G}
       + CAST(floor((py - {_c(PIP_Y0)}) / {_c(dy)}) AS BIGINT)
    ELSE -1 END AS INTEGER) AS quad_id
FROM pts
"""
    )


SQL_ORACLES2 = {
    "s2_cells": (q_s2_cells, _sql_s2_cells()),
    "cell_rollup_sql": (q_cell_rollup_sql, _sql_cell_rollup()),
    "geoid_bilinear": (q_geoid_bilinear, _sql_geoid_bilinear()),
    "dms_roundtrip": (q_dms_roundtrip, _sql_dms_roundtrip()),
    "knn_oracle": (q_knn_oracle, _sql_knn_oracle()),
    "pip_quads": (q_pip_quads, _sql_pip_quads()),
}


# -------------------------------------------------------- aft_transform
# K9 triangle-based affine transform (the reference's virtual-tie-point
# datum path), SQL-value-oracled: the oracle locates the containing
# grid cell/triangle with floor arithmetic, RECOMPUTES the four tie-
# node destinations from scratch (full D48->ETRS89 Helmert chain + TM
# forward + analytic wiggle — mirrors assets/make_assets.py build_aft
# term-for-term) and barycentrically interpolates; the engine side runs
# the real actor-held triangulation index + solved affine coeffs
# (geokit.aft.aft_apply). The irreducible cross-engine gap is the
# engine's solved-affine apply vs the oracle's barycentric form of the
# same linear map: measured max 4.4e-9 m over 300k values. Outputs
# quantize to cm (gap = 4.4e-7 of a quantum): measured ZERO
# mismatches at sf0.001/0.01/0.1 (including out-of-coverage fallback
# rows), min boundary margin 4.3e-6 quanta at sf0.1.

from assets.make_assets import _projected_bbox_d48 as _aft_bbox

_AFT_SP = 3000.0
_AFT_X0, _AFT_Y0, _AFT_X1, _AFT_Y1 = _aft_bbox()
_AFT_NX = int(np.ceil((_AFT_X1 - _AFT_X0) / _AFT_SP)) + 1
_AFT_NY = int(np.ceil((_AFT_Y1 - _AFT_Y0) / _AFT_SP)) + 1


_AFT_SUF = ["00", "01", "10", "11"]


def _gk2tm_chain_ctes(suffixes, base_cte, prefix="", wiggle=False):
    """Reusable CTE chain: for each suffix s, transforms D48 grid
    columns gx{s}/gy{s} (present in ``base_cte``) into D96 columns
    tmx{s}/tmy{s} via the full Helmert chain + GRS80 TM forward —
    term-for-term mirror of geokit.transforms.gkxy2tmxy, verified
    against the engine at 0.1 mm over all sfs. With ``wiggle`` adds
    dstx{s}/dsty{s} = tm + analytic AFT wiggle (make_assets mirror).
    Returns a list of (name, query) CTEs chained from base_cte."""
    from geokit.datums import D48_GK, D96_TM, HELMERT_D48_TO_D96 as P
    from geokit.ellipsoids import GRS80

    bes = D48_GK.ellipsoid
    e2b, ep2b, ab = bes.e2, bes.ep2, bes.a
    e4b, e6b = e2b * e2b, e2b ** 3
    c1 = 1.0 - e2b / 4.0 - 3.0 * e4b / 64.0 - 5.0 * e6b / 256.0
    sq = np.sqrt(1.0 - e2b)
    e1 = (1.0 - sq) / (1.0 + sq)
    d1 = 3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0
    d2 = 21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0
    d3 = 151.0 * e1 ** 3 / 96.0
    d4 = 1097.0 * e1 ** 4 / 512.0
    e2g, ag = GRS80.e2, GRS80.a
    cc = P.scale

    # GRS80 tm_fwd constants (D96_TM)
    g = D96_TM.ellipsoid
    ge2 = g.e2
    ge4, ge6 = ge2 * ge2, ge2 ** 3
    gep2 = g.ep2
    ga = g.a
    gc1 = 1.0 - ge2 / 4.0 - 3.0 * ge4 / 64.0 - 5.0 * ge6 / 256.0
    gc2 = 3.0 * ge2 / 8.0 + 3.0 * ge4 / 32.0 + 45.0 * ge6 / 1024.0
    gc3 = 15.0 * ge4 / 256.0 + 45.0 * ge6 / 1024.0
    gc4 = 35.0 * ge6 / 3072.0

    K = dict(
        ab=_c(ab), e2b=_c(e2b), ep2b=_c(ep2b), c1=_c(c1),
        d1=_c(d1), d2=_c(d2), d3=_c(d3), d4=_c(d4),
        e2g=_c(e2g), ag=_c(ag), cscale=_c(cc),
        dx=_c(P.dx), dy=_c(P.dy), dz=_c(P.dz),
        rx=_c(P.rx), ry=_c(P.ry), rz=_c(P.rz),
        ga=_c(ga), ge2=_c(ge2), gep2=_c(gep2),
        gc1=_c(gc1), gc2=_c(gc2), gc3=_c(gc3), gc4=_c(gc4),
    )

    ctes = []

    def _stage(template):
        return ", ".join(template.format(s=sfx, **K) for sfx in suffixes)

    def add(name, template, replace=False):
        prev = ctes[-1][0] if ctes else base_cte
        body = _stage(template)
        name = prefix + name
        if replace:
            ctes.append((name, f"SELECT * REPLACE ({body}) FROM {prev}"))
        else:
            ctes.append((name, f"SELECT *, {body} FROM {prev}"))

    # ---- helmert chain (mirror of engine/queries.py _sql_helmert_chain)
    add("hm1", "0.0e0 + (gx{s} - (-5.0e6)) / 0.9999e0 AS M{s}")
    add("hm2", "M{s} / ({ab} * {c1}) AS mu{s}")
    add("hm3", "mu{s} + {d1} * sin(2.0e0*mu{s}) + {d2} * sin(4.0e0*mu{s}) + {d3} * sin(6.0e0*mu{s}) + {d4} * sin(8.0e0*mu{s}) AS phi1{s}")
    add("hm4", "sin(phi1{s}) AS sp1{s}, cos(phi1{s}) AS cp1{s}")
    add("hm5", "sp1{s}/cp1{s} AS tp1{s}, {ep2b} * cp1{s} * cp1{s} AS C1{s}, (sp1{s}/cp1{s})*(sp1{s}/cp1{s}) AS T1{s}, 1.0e0 - {e2b} * sp1{s} * sp1{s} AS om{s}")
    add("hm6", "{ab} / sqrt(om{s}) AS N1{s}, {ab} * (1.0e0 - {e2b}) / (om{s} * sqrt(om{s})) AS R1{s}")
    add("hm7", "(gy{s} - 5.0e5) / (N1{s} * 0.9999e0) AS D{s}")
    add("hm8", "D{s}*D{s} AS DD2{s}")
    add("hm9", "DD2{s}*D{s} AS DD3{s}, DD2{s}*DD2{s} AS DD4{s}")
    add("hm10", "DD4{s}*D{s} AS DD5{s}, DD4{s}*DD2{s} AS DD6{s}")
    add("hm11",
        "phi1{s} - (N1{s} * tp1{s} / R1{s}) * (DD2{s}/2.0e0 - (5.0e0 + 3.0e0*T1{s} + 10.0e0*C1{s} - 4.0e0*C1{s}*C1{s} - 9.0e0*{ep2b}) * DD4{s}/24.0e0"
        " + (61.0e0 + 90.0e0*T1{s} + 298.0e0*C1{s} + 45.0e0*T1{s}*T1{s} - 252.0e0*{ep2b} - 3.0e0*C1{s}*C1{s}) * DD6{s}/720.0e0) AS phib{s},"
        " radians(15.0e0) + (D{s} - (1.0e0 + 2.0e0*T1{s} + C1{s}) * DD3{s}/6.0e0"
        " + (5.0e0 - 2.0e0*C1{s} + 28.0e0*T1{s} - 3.0e0*C1{s}*C1{s} + 8.0e0*{ep2b} + 24.0e0*T1{s}*T1{s}) * DD5{s}/120.0e0) / cp1{s} AS lamb{s}")
    add("hm12", "radians(degrees(phib{s})) AS phi2{s}, radians(degrees(lamb{s})) AS lam2{s}")
    add("hm13", "{ab} / sqrt(1.0e0 - {e2b} * sin(phi2{s}) * sin(phi2{s})) AS Nb{s}")
    add("hm14",
        "(Nb{s} + 0.0e0) * cos(phi2{s}) * cos(lam2{s}) AS Xb{s},"
        " (Nb{s} + 0.0e0) * cos(phi2{s}) * sin(lam2{s}) AS Yb{s},"
        " (Nb{s} * (1.0e0 - {e2b}) + 0.0e0) * sin(phi2{s}) AS Zb{s}")
    add("hm15",
        "{cscale} * (Xb{s} - {rz} * Yb{s} + {ry} * Zb{s}) + {dx} AS HX{s},"
        " {cscale} * ({rz} * Xb{s} + Yb{s} - {rx} * Zb{s}) + {dy} AS HY{s},"
        " {cscale} * ((-{ry}) * Xb{s} + {rx} * Yb{s} + Zb{s}) + {dz} AS HZ{s}")
    add("hm16", "sqrt(HX{s}*HX{s} + HY{s}*HY{s}) AS pp{s}, atan2(HY{s}, HX{s}) AS lam3{s}, atan2(HZ{s}, sqrt(HX{s}*HX{s} + HY{s}*HY{s}) * (1.0e0 - {e2g})) AS phi3{s}")
    for it in range(8):
        add(f"it{it}", "atan2(HZ{s} + {e2g} * ({ag} / sqrt(1.0e0 - {e2g} * sin(phi3{s}) * sin(phi3{s}))) * sin(phi3{s}), pp{s}) AS phi3{s}", replace=True)
    add("fin", "degrees(phi3{s}) AS fi{s}, degrees(lam3{s}) AS la{s}")
    # ---- tm_fwd on GRS80 / D96 (mirror of _sql_tm_forward)
    add("tf1", "radians(fi{s}) AS tphi{s}, radians(la{s}) AS tlam{s}")
    add("tf2", "sin(tphi{s}) AS tsp{s}, cos(tphi{s}) AS tcp{s}")
    add("tf3",
        "tsp{s} / tcp{s} AS ttp{s},"
        " {ga} / sqrt(1.0e0 - {ge2} * tsp{s} * tsp{s}) AS TN{s},"
        " {gep2} * tcp{s} * tcp{s} AS TC{s},"
        " (tlam{s} - radians(15.0e0)) * tcp{s} AS TA{s},"
        " {ga} * ({gc1} * tphi{s} - {gc2} * sin(2.0e0 * tphi{s}) + {gc3} * sin(4.0e0 * tphi{s}) - {gc4} * sin(6.0e0 * tphi{s})) AS TM{s}")
    add("tf4", "ttp{s} * ttp{s} AS TT{s}, TA{s} * TA{s} AS TA2{s}")
    add("tf5", "TA2{s} * TA{s} AS TA3{s}, TA2{s} * TA2{s} AS TA4{s}")
    add("tf6", "TA4{s} * TA{s} AS TA5{s}, TA4{s} * TA2{s} AS TA6{s}")
    add("tf7",
        "-5.0e6 + 0.9999e0 * (TM{s} - 0.0e0 + TN{s} * ttp{s} * (TA2{s} / 2.0e0"
        " + (5.0e0 - TT{s} + 9.0e0 * TC{s} + 4.0e0 * TC{s} * TC{s}) * TA4{s} / 24.0e0"
        " + (61.0e0 - 58.0e0 * TT{s} + TT{s} * TT{s} + 600.0e0 * TC{s} - 330.0e0 * {gep2}) * TA6{s} / 720.0e0)) AS tmx{s},"
        " 5.0e5 + 0.9999e0 * TN{s} * (TA{s}"
        " + (1.0e0 - TT{s} + TC{s}) * TA3{s} / 6.0e0"
        " + (5.0e0 - 18.0e0 * TT{s} + TT{s} * TT{s} + 72.0e0 * TC{s} - 58.0e0 * {gep2}) * TA5{s} / 120.0e0) AS tmy{s}")
    if wiggle:
        # ---- wiggle (mirror of assets.make_assets.aft_wiggle)
        add("wg",
            "tmx{s} + (0.30e0 * sin(gx{s} / 2.3e4) * cos(gy{s} / 1.7e4) + 0.12e0 * sin(gy{s} / 3.1e4)) AS dstx{s},"
            " tmy{s} + (0.25e0 * cos(gx{s} / 1.9e4) * sin(gy{s} / 2.7e4) + 0.10e0 * cos(gx{s} / 4.1e4)) AS dsty{s}")
    return ctes


def _sql_aft_transform() -> str:
    node_cte = (
        "SELECT *, "
        f"{_c(_AFT_X0)} + i0q * 3.0e3 AS gx00, {_c(_AFT_Y0)} + j0q * 3.0e3 AS gy00, "
        f"{_c(_AFT_X0)} + i0q * 3.0e3 AS gx01, {_c(_AFT_Y0)} + (j0q + 1) * 3.0e3 AS gy01, "
        f"{_c(_AFT_X0)} + (i0q + 1) * 3.0e3 AS gx10, {_c(_AFT_Y0)} + j0q * 3.0e3 AS gy10, "
        f"{_c(_AFT_X0)} + (i0q + 1) * 3.0e3 AS gx11, {_c(_AFT_Y0)} + (j0q + 1) * 3.0e3 AS gy11 "
        "FROM loc"
    )
    ctes = [("nd", node_cte)] + _gk2tm_chain_ctes(_AFT_SUF, "nd", wiggle=True)
    chain = ",\n".join(f"{n} AS ({q})" for n, q in ctes)

    return f"""
WITH pts AS (
 SELECT o_orderkey,
   3.0e4 + ((o_orderkey * 40503 + o_custkey) % 100000) * 1.7e0
     - (CASE WHEN o_orderkey % 13 = 0 THEN 6.0e4 ELSE 0.0e0 END) AS px,
   3.8e5 + ((o_orderkey * 69069 + o_custkey) % 100000) * 2.2e0 AS py
 FROM orders),
loc AS (
 SELECT *, (px - {_c(_AFT_X0)}) / 3.0e3 AS xi, (py - {_c(_AFT_Y0)}) / 3.0e3 AS yj,
   ((px - {_c(_AFT_X0)}) / 3.0e3 >= 0.0e0 AND (px - {_c(_AFT_X0)}) / 3.0e3 <= {_AFT_NX - 1}.0e0
    AND (py - {_c(_AFT_Y0)}) / 3.0e3 >= 0.0e0 AND (py - {_c(_AFT_Y0)}) / 3.0e3 <= {_AFT_NY - 1}.0e0) AS in_cov,
   LEAST(GREATEST(CAST(floor((px - {_c(_AFT_X0)}) / 3.0e3) AS BIGINT), 0), {_AFT_NX - 2}) AS i0q,
   LEAST(GREATEST(CAST(floor((py - {_c(_AFT_Y0)}) / 3.0e3) AS BIGINT), 0), {_AFT_NY - 2}) AS j0q
 FROM pts),
{chain},
bary AS (
 SELECT *, (px - gx00) / 3.0e3 AS u, (py - gy00) / 3.0e3 AS v FROM wg)
SELECT o_orderkey,
  in_cov AS aft_found,
  CAST(FLOOR((CASE WHEN NOT in_cov THEN px
    WHEN u + v <= 1.0e0 THEN (1.0e0 - u - v) * dstx00 + v * dstx01 + u * dstx10
    ELSE (1.0e0 - u) * dstx01 + (u + v - 1.0e0) * dstx11 + (1.0e0 - v) * dstx10 END) * 1e2 + 0.5e0) AS BIGINT) AS x_cm,
  CAST(FLOOR((CASE WHEN NOT in_cov THEN py
    WHEN u + v <= 1.0e0 THEN (1.0e0 - u - v) * dsty00 + v * dsty01 + u * dsty10
    ELSE (1.0e0 - u) * dsty01 + (u + v - 1.0e0) * dsty11 + (1.0e0 - v) * dsty10 END) * 1e2 + 0.5e0) AS BIGINT) AS y_cm
FROM bary
"""




class _AftOracleStage:
    """Stateful map_batches stage: triangulation + grid index loaded
    once per actor (the K9/J1 deployment shape, SURVEY.md §2.1)."""

    def __init__(self):
        import assets

        self.aft = assets.load_aft("fwd")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from geokit.aft import aft_apply

        ok = _np(batch, "o_orderkey")
        ck = _np(batch, "o_custkey")
        px = 30000.0 + ((ok * 40503 + ck) % 100000) * 1.7 - np.where(
            ok % 13 == 0, 60000.0, 0.0
        )
        py = 380000.0 + ((ok * 69069 + ck) % 100000) * 2.2
        xo, yo, found = aft_apply(self.aft, px, py)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "aft_found": pa.array(found),
                "x_cm": pa.array(np.floor(xo * 1e2 + 0.5).astype(np.int64)),
                "y_cm": pa.array(np.floor(yo * 1e2 + 0.5).astype(np.int64)),
            }
        )


def q_aft_transform(sf_dir: str) -> Dataset:
    return _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        _AftOracleStage, batch_format="pyarrow", batch_size=32768, concurrency=(1, 4)
    )


SQL_ORACLES2["aft_transform"] = (q_aft_transform, _sql_aft_transform())


# -------------------------------------------------------- format_points
# S2 fixed-precision output formatting (reference gk-slo writer,
# SURVEY.md §2.2/§2.6): geokit.dms.format_deg / format_m vs DuckDB
# printf — measured string-identical including round-half-even
# boundary cases (0.0005 -> "0.001", 2.675, negative-zero).


def q_format_points(sf_dir: str) -> Dataset:
    from geokit.dms import format_deg, format_m

    def fn(batch: pa.Table) -> pa.Table:
        ok, ln, fi, la = _derive_ll(batch)
        metres = fi * 10000.0  # metre-scale magnitude for format_m
        return pa.table(
            {
                "l_orderkey": pa.array(ok),
                "l_linenumber": pa.array(ln.astype(np.int32)),
                "fi_str": pa.array(format_deg(fi, 9)),
                "la_str": pa.array(format_deg(la, 9)),
                "m_str": pa.array(format_m(metres, 3)),
            }
        )

    return _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _sql_format_points() -> str:
    return (
        _SQL_LL
        + """
SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
  printf('%.9f', fi) AS fi_str,
  printf('%.9f', la) AS la_str,
  printf('%.3f', fi * 1.0e4) AS m_str
FROM pts
"""
    )


SQL_ORACLES2["format_points"] = (q_format_points, _sql_format_points())


# ----------------------------------------------------- geometry_summary
# The gk-shp lifecycle (SURVEY.md §3.2 / M5) SQL-value-oracled: the
# engine runs the REAL explode -> menu-5 transform -> reassemble
# pipeline over integer-derived entities; the oracle unnests per-entity
# vertex ordinals with range(), runs the same gkxy2tmxy chain CTEs and
# aggregates per-vertex cm-quantized coordinate sums (quantize-then-sum
# so float addition order cannot differ between engines).


def _derive_entities(batch: pa.Table) -> pa.Table:
    ok = _np(batch, "o_orderkey")
    ck = _np(batch, "o_custkey")
    sel = ok % 5 == 0
    ok, ck = ok[sel], ck[sel]
    nv = (3 + ok % 9).astype(np.int64)
    xs, ys = [], []
    for o, c, n in zip(ok, ck, nv):
        v = np.arange(n, dtype=np.int64)
        xs.append(32000.0 + ((o * 40503 + c + v * 7919) % 100000) * 1.6)
        ys.append(390000.0 + ((o * 69069 + c + v * 104729) % 100000) * 2.0)
    return pa.table(
        {
            "entity_id": pa.array(ok),
            "xs": pa.array(xs, pa.list_(pa.float64())),
            "ys": pa.array(ys, pa.list_(pa.float64())),
        }
    )


def q_geometry_summary(sf_dir: str) -> Dataset:
    from engine.geometry import transform_geometry

    ents = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        _derive_entities, batch_format="pyarrow"
    )
    out = transform_geometry(ents, transform=5)

    import pandas as pd

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        # pandas format: xs/ys arrive as ragged numpy arrays per cell
        # (Ray's variable-shaped tensor extension in Arrow format).
        nv = df["n_vertices"].to_numpy().astype(np.int64)
        fx = np.concatenate([np.asarray(v, dtype=np.float64) for v in df["xs"]])
        fy = np.concatenate([np.asarray(v, dtype=np.float64) for v in df["ys"]])
        qx = np.floor(fx * 1e2 + 0.5).astype(np.int64)
        qy = np.floor(fy * 1e2 + 0.5).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(nv)[:-1]]).astype(np.int64)
        return pd.DataFrame(
            {
                "entity_id": df["entity_id"].to_numpy().astype(np.int64),
                "n_vertices": nv,
                "sum_x_cm": np.add.reduceat(qx, starts),
                "sum_y_cm": np.add.reduceat(qy, starts),
            }
        )

    return out.map_batches(summarize, batch_format="pandas")


def _sql_geometry_summary() -> str:
    ctes = _gk2tm_chain_ctes([""], "verts")
    chain = ",\n".join(f"{n} AS ({q})" for n, q in ctes)
    last = ctes[-1][0]
    return f"""
WITH ents AS (
 SELECT o_orderkey, o_custkey, 3 + o_orderkey % 9 AS nv
 FROM orders WHERE o_orderkey % 5 = 0),
verts AS (
 SELECT o_orderkey AS entity_id, nv,
   3.2e4 + ((o_orderkey * 40503 + o_custkey + v * 7919) % 100000) * 1.6e0 AS gx,
   3.9e5 + ((o_orderkey * 69069 + o_custkey + v * 104729) % 100000) * 2.0e0 AS gy
 FROM ents, LATERAL unnest(range(nv)) AS t(v)),
{chain}
SELECT entity_id, CAST(nv AS BIGINT) AS n_vertices,
  CAST(SUM(CAST(FLOOR(tmx * 1e2 + 0.5e0) AS BIGINT)) AS BIGINT) AS sum_x_cm,
  CAST(SUM(CAST(FLOOR(tmy * 1e2 + 0.5e0) AS BIGINT)) AS BIGINT) AS sum_y_cm
FROM {last}
GROUP BY entity_id, nv
"""


SQL_ORACLES2["geometry_summary"] = (q_geometry_summary, _sql_geometry_summary())


# --------------------------------------------------- raster <-> vector
# north_rule "raster<->vector": all three operator families SQL-value-
# oracled. Raster geometry constants are non-commensurate with the
# point derivations (no exact pixel/quad-boundary hits possible — see
# pip_quads analysis); raster node values are an analytic trig surface
# mirrored term-for-term.

from engine.raster import RasterSampler, RasterSpec, pixel_table, rasterize_points, zonal_stats

_RSPEC = RasterSpec(
    x0=20000.0, y0=365000.0, dx=2000.125, dy=3000.25, nrows=96, ncols=91
)


def _raster_value(r, c):
    """Analytic raster surface over pixel indices (float math)."""
    return (
        10.0
        + 3.0 * np.sin(0.37 * r) * np.cos(0.53 * c)
        + 0.5 * np.sin(0.11 * (r + c))
    )


def _sql_raster_value(r: str, c: str) -> str:
    return (
        f"(1.0e1 + 3.0e0 * sin(3.7e-1 * ({r})) * cos(5.3e-1 * ({c}))"
        f" + 5.0e-1 * sin(1.1e-1 * (({r}) + ({c}))))"
    )


def q_rasterize(sf_dir: str) -> Dataset:
    """Vector -> raster: derived orders points with an integer value
    column binned per pixel (combiner shuffle); exact BIGINT sums."""

    def prep(batch: pa.Table) -> pa.Table:
        ok, px, py = _derive_xy(batch)
        ck = _np(batch, "o_custkey")
        v = ((ok * 7919 + ck) % 100000).astype(np.int64)
        return pa.table(
            {"x": pa.array(px), "y": pa.array(py), "v_cents": pa.array(v)}
        )

    pts = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        prep, batch_format="pyarrow"
    )
    return rasterize_points(pts, _RSPEC, value_cols=("v_cents",))


def _sql_rasterize() -> str:
    sp = _RSPEC
    return (
        _SQL_XY
        + f""",
q AS (SELECT o_orderkey, px, py, (o_orderkey * 7919 + o_custkey) % 100000 AS v,
   CAST(floor((px - {_c(sp.x0)}) / {_c(sp.dx)}) AS BIGINT) AS r,
   CAST(floor((py - {_c(sp.y0)}) / {_c(sp.dy)}) AS BIGINT) AS c
 FROM pts JOIN orders USING (o_orderkey))
SELECT r AS pix_row, c AS pix_col, CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(v) AS BIGINT) AS sum_v_cents
FROM q WHERE r >= 0 AND r < {sp.nrows} AND c >= 0 AND c < {sp.ncols}
GROUP BY r, c
"""
    )


class _RasterSampleStage:
    """Raster array built once per actor (broadcast-small-side)."""

    def __init__(self):
        self.sampler = RasterSampler(_RSPEC, value_fn=_raster_value)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok, px, py = _derive_xy(batch)
        near, bilin, inb = self.sampler.sample(px, py)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "near_u": pa.array(np.floor(near * 1e6 + 0.5).astype(np.int64)),
                "bilin_u": pa.array(np.floor(bilin * 1e6 + 0.5).astype(np.int64)),
                "in_bounds": pa.array(inb),
            }
        )


def q_raster_sample(sf_dir: str) -> Dataset:
    return _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        _RasterSampleStage, batch_format="pyarrow", batch_size=32768, concurrency=(1, 4)
    )


def _sql_raster_sample() -> str:
    sp = _RSPEC
    nr, nc = sp.nrows, sp.ncols
    return (
        _SQL_XY
        + f""",
ra AS (SELECT o_orderkey, (px - {_c(sp.x0)}) / {_c(sp.dx)} AS rx,
              (py - {_c(sp.y0)}) / {_c(sp.dy)} AS cx_ FROM pts),
ra2 AS (SELECT *, rx - 0.5e0 AS rf, cx_ - 0.5e0 AS cf FROM ra),
rb AS (SELECT *, (rx >= 0.0e0 AND rx < {nr}.0e0 AND cx_ >= 0.0e0 AND cx_ < {nc}.0e0) AS inb,
  LEAST(GREATEST(rf, 0.0e0), {nr - 1}.0e0 + 0.0e0) AS rfc,
  LEAST(GREATEST(cf, 0.0e0), {nc - 1}.0e0 + 0.0e0) AS cfc FROM ra2),
rc AS (SELECT *, LEAST(CAST(floor(rfc) AS BIGINT), {nr - 2}) AS r0,
  LEAST(CAST(floor(cfc) AS BIGINT), {nc - 2}) AS c0,
  LEAST(GREATEST(CAST(floor(rfc + 0.5e0) AS BIGINT), 0), {nr - 1}) AS rn,
  LEAST(GREATEST(CAST(floor(cfc + 0.5e0) AS BIGINT), 0), {nc - 1}) AS cn FROM rb),
rd AS (SELECT *, rfc - r0 AS fr, cfc - c0 AS fc,
  {_sql_raster_value('r0', 'c0')} AS n00, {_sql_raster_value('r0', 'c0 + 1')} AS n01,
  {_sql_raster_value('r0 + 1', 'c0')} AS n10, {_sql_raster_value('r0 + 1', 'c0 + 1')} AS n11,
  {_sql_raster_value('rn', 'cn')} AS nv FROM rc)
SELECT o_orderkey,
  CAST(FLOOR((CASE WHEN inb THEN nv ELSE 0.0e0 END) * 1e6 + 0.5e0) AS BIGINT) AS near_u,
  CAST(FLOOR((CASE WHEN inb THEN n00 * (1.0e0 - fr) * (1.0e0 - fc) + n01 * (1.0e0 - fr) * fc
      + n10 * fr * (1.0e0 - fc) + n11 * fr * fc ELSE 0.0e0 END) * 1e6 + 0.5e0) AS BIGINT) AS bilin_u,
  inb AS in_bounds
FROM rd
"""
    )


def q_zonal_stats(sf_dir: str) -> Dataset:
    """Raster x vector: per-quad-zone count + exact integer sum of
    quantized pixel values (pixel centers PIP'd against the quad
    polygons by the engine's generic ray-crossing lookup). sf-invariant
    input (the dense pixel table) — the zone assignment and sums are
    the oracle's subject."""
    import ray.data as rd_mod

    t = pixel_table(_RSPEC, _raster_value)
    vq = np.floor(t["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    t = t.drop_columns(["value"]).append_column("value_u", pa.array(vq))
    pixels = rd_mod.from_arrow(t)
    return zonal_stats(pixels, _quad_polyset(), value_col="value_u").map_batches(
        lambda b: b.rename_columns(["zone", "cnt", "sum_value_u"]),
        batch_format="pyarrow",
    )


def _sql_zonal_stats() -> str:
    sp = _RSPEC
    dxq = (PIP_X1 - PIP_X0) / PIP_G
    dyq = (PIP_Y1 - PIP_Y0) / PIP_G
    return f"""
WITH px AS (
 SELECT r, c, {_c(sp.x0)} + (r + 0.5e0) * {_c(sp.dx)} AS cx,
        {_c(sp.y0)} + (c + 0.5e0) * {_c(sp.dy)} AS cy,
        CAST(FLOOR({_sql_raster_value('CAST(r AS DOUBLE)', 'CAST(c AS DOUBLE)')} * 1e6 + 0.5e0) AS BIGINT) AS value_u
 FROM range({sp.nrows}) t1(r), range({sp.ncols}) t2(c)),
z AS (
 SELECT CAST(CASE WHEN cx > {_c(PIP_X0)} AND cx < {_c(PIP_X1)} AND cy > {_c(PIP_Y0)} AND cy < {_c(PIP_Y1)}
   THEN CAST(floor((cx - {_c(PIP_X0)}) / {_c(dxq)}) AS BIGINT) * {PIP_G}
      + CAST(floor((cy - {_c(PIP_Y0)}) / {_c(dyq)}) AS BIGINT)
   ELSE -1 END AS INTEGER) AS zone, value_u
 FROM px)
SELECT zone, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(value_u) AS BIGINT) AS sum_value_u
FROM z GROUP BY zone
"""


SQL_ORACLES2.update(
    {
        "rasterize": (q_rasterize, _sql_rasterize()),
        "raster_sample": (q_raster_sample, _sql_raster_sample()),
        "zonal_stats": (q_zonal_stats, _sql_zonal_stats()),
    }
)


# ---------------------------------------------------------- tm_inverse
# Menu 1 (reference tmxy2fila_wgs = K4 tm_inv on GRS80/D96): the
# remaining TM direction not yet independently oracled (helmert_chain
# covers the Bessel inverse). Derived D96 grid points; SQL mirrors
# geokit.tm.tm_inv term-for-term. Outputs quantized to 1e-9 deg
# (~0.1 mm) with measured margins.


def q_tm_inverse(sf_dir: str) -> Dataset:
    from geokit.datums import D96_TM
    from geokit.tm import tm_inv

    def fn(batch: pa.Table) -> pa.Table:
        ok = _np(batch, "o_orderkey")
        ck = _np(batch, "o_custkey")
        x96 = 30000.0 + ((ok * 40503 + ck) % 100000) * 1.7
        y96 = 380000.0 + ((ok * 69069 + ck) % 100000) * 2.2
        fi, la = tm_inv(x96, y96, D96_TM)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "fi_ndeg": pa.array(np.floor(fi * 1e9 + 0.5).astype(np.int64)),
                "la_ndeg": pa.array(np.floor(la * 1e9 + 0.5).astype(np.int64)),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _sql_tm_inverse() -> str:
    from geokit.datums import D96_TM

    g = D96_TM.ellipsoid
    e2, ep2, a = g.e2, g.ep2, g.a
    e4, e6 = e2 * e2, e2 ** 3
    c1 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    sq = np.sqrt(1.0 - e2)
    e1 = (1.0 - sq) / (1.0 + sq)
    d1 = 3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0
    d2 = 21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0
    d3 = 151.0 * e1 ** 3 / 96.0
    d4 = 1097.0 * e1 ** 4 / 512.0
    return f"""
WITH pts AS (
 SELECT o_orderkey,
   3.0e4 + ((o_orderkey * 40503 + o_custkey) % 100000) * 1.7e0 AS x96,
   3.8e5 + ((o_orderkey * 69069 + o_custkey) % 100000) * 2.2e0 AS y96
 FROM orders),
m AS (SELECT o_orderkey, x96, y96, 0.0e0 + (x96 - (-5.0e6)) / 0.9999e0 AS M FROM pts),
mu AS (SELECT *, M / ({_c(a)} * {_c(c1)}) AS mu FROM m),
p1 AS (SELECT *, mu + {_c(d1)} * sin(2.0e0*mu) + {_c(d2)} * sin(4.0e0*mu) + {_c(d3)} * sin(6.0e0*mu) + {_c(d4)} * sin(8.0e0*mu) AS phi1 FROM mu),
p2 AS (SELECT *, sin(phi1) AS sp1, cos(phi1) AS cp1 FROM p1),
p3 AS (SELECT *, sp1/cp1 AS tp1, {_c(ep2)} * cp1 * cp1 AS C1, (sp1/cp1)*(sp1/cp1) AS T1, 1.0e0 - {_c(e2)} * sp1 * sp1 AS om FROM p2),
p4 AS (SELECT *, {_c(a)} / sqrt(om) AS N1, {_c(a)} * (1.0e0 - {_c(e2)}) / (om * sqrt(om)) AS R1 FROM p3),
p5 AS (SELECT *, (y96 - 5.0e5) / (N1 * 0.9999e0) AS D FROM p4),
p6 AS (SELECT *, D*D AS DD2 FROM p5),
p7 AS (SELECT *, DD2*D AS DD3, DD2*DD2 AS DD4 FROM p6),
p8 AS (SELECT *, DD4*D AS DD5, DD4*DD2 AS DD6 FROM p7),
geo AS (SELECT o_orderkey,
  phi1 - (N1 * tp1 / R1) * (DD2/2.0e0 - (5.0e0 + 3.0e0*T1 + 10.0e0*C1 - 4.0e0*C1*C1 - 9.0e0*{_c(ep2)}) * DD4/24.0e0
      + (61.0e0 + 90.0e0*T1 + 298.0e0*C1 + 45.0e0*T1*T1 - 252.0e0*{_c(ep2)} - 3.0e0*C1*C1) * DD6/720.0e0) AS phi,
  radians(15.0e0) + (D - (1.0e0 + 2.0e0*T1 + C1) * DD3/6.0e0
      + (5.0e0 - 2.0e0*C1 + 28.0e0*T1 - 3.0e0*C1*C1 + 8.0e0*{_c(ep2)} + 24.0e0*T1*T1) * DD5/120.0e0) / cp1 AS lam
  FROM p8)
SELECT o_orderkey,
  CAST(FLOOR(degrees(phi) * 1e9 + 0.5e0) AS BIGINT) AS fi_ndeg,
  CAST(FLOOR(degrees(lam) * 1e9 + 0.5e0) AS BIGINT) AS la_ndeg
FROM geo
"""


SQL_ORACLES2["tm_inverse"] = (q_tm_inverse, _sql_tm_inverse())


# ------------------------------------------------------------ tile_join
# J5: cell-equality join of two LARGE sides via the explicit bucketed
# hash join (engine.joins.hash_join — one shuffle, co-grouped pandas
# merges). Probe side = per-point cells from the lineitem derivation;
# build side = the per-cell rollup of the same points (Zipfian cell
# counts, the north_rule skew shape). SQL oracle = subquery join.


def q_tile_join(sf_dir: str) -> Dataset:
    from engine.joins import hash_join
    from engine.shuffle import grouped_count_sums

    def fn(batch: pa.Table) -> pa.Table:
        ok, ln, fi, la = _derive_ll(batch)
        cid = cell_id(fi, la, CELL_LEVEL)
        return pa.table(
            {
                "l_orderkey": pa.array(ok),
                "l_linenumber": pa.array(ln.astype(np.int32)),
                "cell": pa.array(cid, pa.int64()),
            }
        )

    pts = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        fn, batch_format="pyarrow"
    )
    rollup = grouped_count_sums(
        pts.map_batches(lambda b: b.select(["cell"]), batch_format="pyarrow"),
        key="cell",
    ).map_batches(
        lambda b: b.rename_columns(["cell", "cell_cnt"]), batch_format="pyarrow"
    )
    joined = hash_join(pts, rollup, key="cell", num_buckets=32, how="inner")
    return joined.map_batches(
        lambda b: b.select(["l_orderkey", "l_linenumber", "cell", "cell_cnt"]),
        batch_format="pyarrow",
    )


def _sql_tile_join() -> str:
    return (
        _SQL_LL
        + _sql_cell_chain(CELL_LEVEL)
        + f""",
pc2 AS (SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
        {_sql_cell_expr(CELL_LEVEL)} AS cell FROM cg),
ru AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS cell_cnt FROM pc2 GROUP BY cell)
SELECT p.l_orderkey, p.l_linenumber, p.cell, ru.cell_cnt
FROM pc2 p JOIN ru USING (cell)
"""
    )


SQL_ORACLES2["tile_join"] = (q_tile_join, _sql_tile_join())


# ------------------------------------------------------- fila_wgs2gkxy
# Menu 4 (reference fila_wgs2gkxy): ETRS89 geographic -> D48/GK grid =
# fila2xyz(GRS80) -> EXACT inverse Helmert (engine inverts the
# similarity with linalg.inv — the oracle embeds that Rinv's nine
# elements as constants, so both engines use bitwise-identical
# matrices) -> xyz2fila(Bessel, 8 fixed iterations) -> tm_fwd(Bessel).
# Outputs quantized to cm (measured cross-engine diff <= ~1e-9 m from
# the matmul accumulation order; margin ~1e7).


def q_fila2gk(sf_dir: str) -> Dataset:
    from geokit.transforms import fila_wgs2gkxy

    def fn(batch: pa.Table) -> pa.Table:
        ok, ln, fi, la = _derive_ll(batch)
        x, y, h = fila_wgs2gkxy(fi, la)
        return pa.table(
            {
                "l_orderkey": pa.array(ok),
                "l_linenumber": pa.array(ln.astype(np.int32)),
                "x48_cm": pa.array(np.floor(x * 1e2 + 0.5).astype(np.int64)),
                "y48_cm": pa.array(np.floor(y * 1e2 + 0.5).astype(np.int64)),
                "h_cm": pa.array(np.floor(h * 1e2 + 0.5).astype(np.int64)),
            }
        )

    return _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _fila2gk_ctes(
    keys: str, src: str = "pts", p: str = ""
) -> tuple[str, str, str, str]:
    """The fila_wgs2gkxy CTE chain (ETRS89 fi/la degrees in CTE ``src``
    -> Bessel GK grid), reusable: returns (chain_fragment starting with
    a comma, x_expr, y_expr, h_expr) where the expressions are the
    UNQUANTIZED doubles over the final ``{p}fh`` CTE. ``keys`` is the
    projection carried through the chain's narrow stages — callers that
    need extra columns downstream must list them here. ``p`` prefixes
    every CTE name so the chain can appear more than once in one WITH
    (column names are not prefixed — project them away between
    instances)."""
    from geokit.datums import D48_GK, HELMERT_D48_TO_D96 as P
    from geokit.ellipsoids import GRS80
    from geokit.helmert import _rotation_matrix

    Rinv = np.linalg.inv(_rotation_matrix(P))
    ag, e2g = GRS80.a, GRS80.e2
    bes = D48_GK.ellipsoid
    ab, e2b, ep2b = bes.a, bes.e2, bes.ep2
    e4b, e6b = e2b * e2b, e2b ** 3
    bc1 = 1.0 - e2b / 4.0 - 3.0 * e4b / 64.0 - 5.0 * e6b / 256.0
    bc2 = 3.0 * e2b / 8.0 + 3.0 * e4b / 32.0 + 45.0 * e6b / 1024.0
    bc3 = 15.0 * e4b / 256.0 + 45.0 * e6b / 1024.0
    bc4 = 35.0 * e6b / 3072.0
    iters = "\n".join(
        f"{p}j{n} AS (SELECT * REPLACE (atan2(Zc + {_c(e2b)} * ({_c(ab)} / sqrt(1.0e0 - {_c(e2b)} * sin(phi) * sin(phi))) * sin(phi), p) AS phi) FROM {p}j{n-1}),"
        for n in range(1, 9)
    )
    chain = f""",
{p}ea AS (SELECT {keys}, radians(fi) AS phi0, radians(la) AS lam0 FROM {src}),
{p}eb AS (SELECT *, sin(phi0) AS sp, cos(phi0) AS cp FROM {p}ea),
{p}ec AS (SELECT *, {_c(ag)} / sqrt(1.0e0 - {_c(e2g)} * sp * sp) AS N FROM {p}eb),
{p}ed AS (SELECT {keys},
   (N + 0.0e0) * cp * cos(lam0) AS X,
   (N + 0.0e0) * cp * sin(lam0) AS Y,
   (N * (1.0e0 - {_c(e2g)}) + 0.0e0) * sp AS Z FROM {p}ec),
{p}ee AS (SELECT {keys},
   (X - {_c(P.dx)}) / {_c(P.scale)} AS Xs,
   (Y - {_c(P.dy)}) / {_c(P.scale)} AS Ys,
   (Z - {_c(P.dz)}) / {_c(P.scale)} AS Zs FROM {p}ed),
{p}ef AS (SELECT {keys},
   Xs * {_c(Rinv[0, 0])} + Ys * {_c(Rinv[0, 1])} + Zs * {_c(Rinv[0, 2])} AS Xc,
   Xs * {_c(Rinv[1, 0])} + Ys * {_c(Rinv[1, 1])} + Zs * {_c(Rinv[1, 2])} AS Yc,
   Xs * {_c(Rinv[2, 0])} + Ys * {_c(Rinv[2, 1])} + Zs * {_c(Rinv[2, 2])} AS Zc FROM {p}ee),
{p}j0 AS (SELECT *, sqrt(Xc*Xc + Yc*Yc) AS p, atan2(Yc, Xc) AS lam,
   atan2(Zc, sqrt(Xc*Xc + Yc*Yc) * (1.0e0 - {_c(e2b)})) AS phi FROM {p}ef),
{iters}
{p}fb AS (SELECT {keys}, lam, phi, sin(phi) AS sp2, cos(phi) AS cp2,
   {_c(ab)} / sqrt(1.0e0 - {_c(e2b)} * sin(phi) * sin(phi)) AS Nb, p FROM {p}j8),
{p}fc AS (SELECT *, p / cp2 - Nb AS hb,
   radians(degrees(phi)) AS tphi, radians(degrees(lam)) AS tlam FROM {p}fb),
{p}fd AS (SELECT *, sin(tphi) AS tsp, cos(tphi) AS tcp FROM {p}fc),
{p}fe AS (SELECT *, tsp / tcp AS ttp,
   {_c(ab)} / sqrt(1.0e0 - {_c(e2b)} * tsp * tsp) AS TN,
   {_c(ep2b)} * tcp * tcp AS TC,
   (tlam - radians(15.0e0)) * tcp AS TA,
   {_c(ab)} * ({_c(bc1)} * tphi - {_c(bc2)} * sin(2.0e0 * tphi) + {_c(bc3)} * sin(4.0e0 * tphi) - {_c(bc4)} * sin(6.0e0 * tphi)) AS TM FROM {p}fd),
{p}ff AS (SELECT *, ttp * ttp AS TT, TA * TA AS TA2 FROM {p}fe),
{p}fg AS (SELECT *, TA2 * TA AS TA3, TA2 * TA2 AS TA4 FROM {p}ff),
{p}fh AS (SELECT *, TA4 * TA AS TA5, TA4 * TA2 AS TA6 FROM {p}fg)"""
    x_expr = f"""(-5.0e6 + 0.9999e0 * (TM - 0.0e0 + TN * ttp * (TA2 / 2.0e0
      + (5.0e0 - TT + 9.0e0 * TC + 4.0e0 * TC * TC) * TA4 / 24.0e0
      + (61.0e0 - 58.0e0 * TT + TT * TT + 600.0e0 * TC - 330.0e0 * {_c(ep2b)}) * TA6 / 720.0e0)))"""
    y_expr = f"""(5.0e5 + 0.9999e0 * TN * (TA
      + (1.0e0 - TT + TC) * TA3 / 6.0e0
      + (5.0e0 - 18.0e0 * TT + TT * TT + 72.0e0 * TC - 58.0e0 * {_c(ep2b)}) * TA5 / 120.0e0))"""
    return chain, x_expr, y_expr, "hb"


def _sql_fila2gk(src_sql: str | None = None, keys: str = "l_orderkey, l_linenumber") -> str:
    if src_sql is None:
        src_sql = _SQL_LL
    chain, xe, ye, he = _fila2gk_ctes(keys)
    return f"""{src_sql}{chain}
SELECT {keys},
  CAST(FLOOR({xe} * 1e2 + 0.5e0) AS BIGINT) AS x48_cm,
  CAST(FLOOR({ye} * 1e2 + 0.5e0) AS BIGINT) AS y48_cm,
  CAST(FLOOR({he} * 1e2 + 0.5e0) AS BIGINT) AS h_cm
FROM fh
"""


SQL_ORACLES2["fila2gk"] = (
    q_fila2gk,
    _sql_fila2gk(keys="l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber")
    .replace("SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber, radians(fi)",
             "SELECT l_orderkey, l_linenumber, radians(fi)"),
)


# ---------------------------------------------------------- tmxy2gkxy
# Menu 6 (D96/TM grid -> D48/GK grid): composition of the two verified
# mirrors — tm_inverse (GRS80) feeding the fila2gk inverse-Helmert +
# Bessel-TM chain. With menus 1-5 this makes every Helmert-path menu
# entry independently SQL-value-verified.


def q_tm2gk(sf_dir: str) -> Dataset:
    from geokit.transforms import tmxy2gkxy

    def fn(batch: pa.Table) -> pa.Table:
        ok = _np(batch, "o_orderkey")
        ck = _np(batch, "o_custkey")
        x96 = 30000.0 + ((ok * 40503 + ck) % 100000) * 1.7
        y96 = 380000.0 + ((ok * 69069 + ck) % 100000) * 2.2
        x, y, h = tmxy2gkxy(x96, y96)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "x48_cm": pa.array(np.floor(x * 1e2 + 0.5).astype(np.int64)),
                "y48_cm": pa.array(np.floor(y * 1e2 + 0.5).astype(np.int64)),
                "h_cm": pa.array(np.floor(h * 1e2 + 0.5).astype(np.int64)),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _sql_tm2gk() -> str:
    import re as _re

    inv = _sql_tm_inverse()
    head = inv.rsplit("SELECT o_orderkey,", 1)[0].rstrip().rstrip(",")
    # tm_inverse's source CTE is also named `pts` — rename its whole
    # namespace so the fila2gk chain's `pts` (fi/la degrees) is free.
    head = _re.sub(r"\bpts\b", "tp0", head)
    src = (
        head
        + """,
pts AS (SELECT o_orderkey, degrees(phi) AS fi, degrees(lam) AS la FROM geo)"""
    )
    return _sql_fila2gk(src_sql=src, keys="o_orderkey")


SQL_ORACLES2["tm2gk"] = (q_tm2gk, _sql_tm2gk())


# --------------------------------------------------------- aft_roundtrip
# Menus 7-10 inverse-direction coverage: forward AFT then inverse AFT.
# Both directions share the same triangle topology with affine coeffs
# fitted from the same vertex correspondences, so fwd∘inv is exact
# piecewise-linear identity; float residual measured <= ~1e-9 m, so
# the 0.01 mm-quantized error is EXACTLY ZERO for every row (in- and
# out-of-coverage alike — out-of-coverage falls back to identity in
# both directions). The SQL oracle states that invariant.


class _AftRoundtripStage:
    def __init__(self):
        import assets

        self.fwd = assets.load_aft("fwd")
        self.inv = assets.load_aft("inv")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from geokit.aft import aft_apply

        ok = _np(batch, "o_orderkey")
        ck = _np(batch, "o_custkey")
        px = 30000.0 + ((ok * 40503 + ck) % 100000) * 1.7 - np.where(
            ok % 13 == 0, 60000.0, 0.0
        )
        py = 380000.0 + ((ok * 69069 + ck) % 100000) * 2.2
        fx, fy, _found = aft_apply(self.fwd, px, py)
        bx, by, _f2 = aft_apply(self.inv, fx, fy)
        err = np.hypot(bx - px, by - py)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "err_cmm": pa.array(np.floor(err * 1e5 + 0.5).astype(np.int64)),
            }
        )


def q_aft_roundtrip(sf_dir: str) -> Dataset:
    return _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        _AftRoundtripStage, batch_format="pyarrow", batch_size=32768, concurrency=(1, 4)
    )


SQL_ORACLES2["aft_roundtrip"] = (
    q_aft_roundtrip,
    "SELECT o_orderkey, CAST(0 AS BIGINT) AS err_cmm FROM orders",
)


# ------------------------------------------------------------ ann_multi
# Multi-query brute-force ANN (the broadcast-query-matrix shape the
# mandate names): queries = vectors of vec_id 0..7; exact top-10 per
# query (self-matches included — they rank first with cos 1000,
# a deterministic fixture). Oracle = per-query window top-k.

ANN_NQ = 8
ANN_K = 10


def q_ann_multi(sf_dir: str):
    import pyarrow.compute as pc2
    import pyarrow.parquet as pq2

    from engine.ann import brute_topk_many

    t = pq2.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = t.filter(pc2.less(t["vec_id"], ANN_NQ)).sort_by("vec_id")
    Q = np.asarray(qt["embedding"].to_pylist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return brute_topk_many(ds, Q, k=ANN_K)


def _sql_ann_multi() -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {ANN_NQ}),
sims AS (
  SELECT q.query_id, e.vec_id,
    list_cosine_similarity(e.embedding, q.qv) AS cos
  FROM embeddings e CROSS JOIN q),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM sims)
SELECT query_id, vec_id,
  CAST(FLOOR(cos * 1000 + 0.5) AS BIGINT) AS cos_milli,
  CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {ANN_K}
"""


SQL_ORACLES2["ann_multi"] = (q_ann_multi, _sql_ann_multi())
