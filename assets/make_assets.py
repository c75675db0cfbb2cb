"""Deterministic synthetic asset builder (SURVEY.md §7.2, FIXTURES.md B-F).

The reference compiles its data tables into the binary
(``geoid_slo.h``, ``geoid_egm.h``, ``aft_gktm.h``, ``aft_tmgk.h``,
SURVEY.md §2.2 S5); those tables and the real ctt control points are
NOT available in this sandbox and external data is forbidden
(BASELINE.json). This module synthesizes *structure-identical* assets
deterministically (seed=42):

- two geoid grids (Slo2000- and EGM2008-shaped resolutions) sampling a
  smooth analytic undulation surface over the Slovenia bbox;
- an AFT tie-point grid (~3 km) whose D96 coordinates are the Helmert
  chain plus a smooth analytic wiggle, triangulated by splitting each
  grid cell (no Delaunay dependency); per-triangle affine coeffs are
  solved from vertex correspondences in BOTH directions over the SAME
  triangle topology, so forward∘inverse is exact piecewise-linear;
- ~64 municipality polygons (jittered quad tiling of the projected
  bbox: exhaustive, non-overlapping, convex);
- ~500 control points for kNN;
- ~1000 ctt-style golden points whose expected outputs come from
  geokit.scalar_ref (the independent scalar formula implementation).

If the real reference data materializes later, only these assets and
the golden files change — kernel code is untouched.

Run: ``python -m assets.make_assets`` (writes assets/generated/).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from geokit import scalar_ref as sr
from geokit.aft import AftTriangulation, fit_affine_per_triangle
from geokit.datums import D48_GK, D96_TM, HELMERT_D48_TO_D96, SLO_BBOX
from geokit.transforms import gkxy2tmxy
from geokit.tm import tm_fwd

GEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "generated")

SEED = 42


def analytic_geoid(fi: np.ndarray, la: np.ndarray) -> np.ndarray:
    """Smooth synthetic undulation surface, ~45-49 m over Slovenia."""
    return (
        46.5
        + 1.2 * np.sin(2.1 * (fi - 45.0)) * np.cos(1.7 * (la - 13.0))
        + 0.8 * np.sin(0.9 * (la - 13.0))
        + 0.15 * np.cos(3.3 * (fi - 45.0) + 0.5 * (la - 13.0))
    )


def build_geoid_grids() -> dict[str, dict]:
    lat_min, lon_min, lat_max, lon_max = SLO_BBOX
    out = {}
    for model, (nrows, ncols) in {"slo2000": (115, 217), "egm2008": (58, 109)}.items():
        lat = np.linspace(lat_min, lat_max, nrows)
        lon = np.linspace(lon_min, lon_max, ncols)
        N = analytic_geoid(lat[:, None], lon[None, :])
        out[model] = dict(
            N=N,
            lat0=lat_min,
            lon0=lon_min,
            dlat=(lat_max - lat_min) / (nrows - 1),
            dlon=(lon_max - lon_min) / (ncols - 1),
        )
    return out


def _projected_bbox_d48(pad: float = 5000.0) -> tuple[float, float, float, float]:
    lat_min, lon_min, lat_max, lon_max = SLO_BBOX
    fi = np.array([lat_min, lat_min, lat_max, lat_max])
    la = np.array([lon_min, lon_max, lon_min, lon_max])
    x, y = tm_fwd(fi, la, D48_GK)  # Bessel-vs-ETRS89 offset is << pad
    return x.min() - pad, y.min() - pad, x.max() + pad, y.max() + pad


def aft_wiggle(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Smooth sub-metre distortion field added on top of the Helmert
    trend so AFT differs measurably from Helmert (SURVEY.md §7.2)."""
    wx = 0.30 * np.sin(x / 23000.0) * np.cos(y / 17000.0) + 0.12 * np.sin(y / 31000.0)
    wy = 0.25 * np.cos(x / 19000.0) * np.sin(y / 27000.0) + 0.10 * np.cos(x / 41000.0)
    return wx, wy


def build_aft(spacing: float = 3000.0) -> dict[str, np.ndarray]:
    x0, y0, x1, y1 = _projected_bbox_d48()
    nx = int(np.ceil((x1 - x0) / spacing)) + 1
    ny = int(np.ceil((y1 - y0) / spacing)) + 1
    gx = x0 + np.arange(nx) * spacing  # northing axis
    gy = y0 + np.arange(ny) * spacing  # easting axis
    X, Y = np.meshgrid(gx, gy, indexing="ij")
    src = np.stack([X.ravel(), Y.ravel()], axis=1)  # D48/GK tie coords

    # "True" displacement field: Helmert chain + smooth wiggle.
    xt, yt, _ = gkxy2tmxy(src[:, 0], src[:, 1], None, HELMERT_D48_TO_D96)
    wx, wy = aft_wiggle(src[:, 0], src[:, 1])
    dst = np.stack([xt + wx, yt + wy], axis=1)  # D96/TM tie coords

    # Split every grid cell into two triangles (fixed diagonal).
    r, c = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1), indexing="ij")
    n00 = (r * ny + c).ravel()
    n01 = (r * ny + c + 1).ravel()
    n10 = ((r + 1) * ny + c).ravel()
    n11 = ((r + 1) * ny + c + 1).ravel()
    tris = np.concatenate(
        [
            np.stack([n00, n01, n10], axis=1),
            np.stack([n01, n11, n10], axis=1),
        ],
        axis=0,
    ).astype(np.int32)

    coef_fwd = fit_affine_per_triangle(src, dst, tris)
    coef_inv = fit_affine_per_triangle(dst, src, tris)
    return dict(
        tie_src=src,
        tie_dst=dst,
        tris=tris,
        coef_fwd=coef_fwd,
        coef_inv=coef_inv,
    )


def build_municipalities(ngrid: int = 8) -> pa.Table:
    """Jittered quad tiling of the projected D96 bbox — exhaustive,
    non-overlapping, convex-ish (FIXTURES.md C)."""
    rng = np.random.default_rng(SEED)
    x0, y0, x1, y1 = _projected_bbox_d48(pad=2000.0)
    # Shift into D96 space (tiling target space for PIP on x_d96/y_d96).
    xs = np.linspace(x0, x1, ngrid + 1)
    ys = np.linspace(y0, y1, ngrid + 1)
    NX, NY = np.meshgrid(xs, ys, indexing="ij")
    jx = rng.uniform(-0.25, 0.25, NX.shape) * (xs[1] - xs[0])
    jy = rng.uniform(-0.25, 0.25, NY.shape) * (ys[1] - ys[0])
    jx[0, :] = jx[-1, :] = 0.0
    jx[:, 0] = jx[:, -1] = 0.0
    jy[0, :] = jy[-1, :] = 0.0
    jy[:, 0] = jy[:, -1] = 0.0
    NX = NX + jx
    NY = NY + jy

    muni_id, names, ring_xs, ring_ys, bboxes = [], [], [], [], []
    k = 0
    for i in range(ngrid):
        for j in range(ngrid):
            rx = [NX[i, j], NX[i + 1, j], NX[i + 1, j + 1], NX[i, j + 1]]
            ry = [NY[i, j], NY[i + 1, j], NY[i + 1, j + 1], NY[i, j + 1]]
            muni_id.append(k)
            names.append(f"muni_{k:03d}")
            ring_xs.append(rx)
            ring_ys.append(ry)
            bboxes.append([min(rx), min(ry), max(rx), max(ry)])
            k += 1
    return pa.table(
        {
            "muni_id": pa.array(muni_id, pa.int32()),
            "name": pa.array(names, pa.string()),
            "ring_xs": pa.array(ring_xs, pa.list_(pa.float64())),
            "ring_ys": pa.array(ring_ys, pa.list_(pa.float64())),
            "bbox": pa.array(bboxes, pa.list_(pa.float64())),
        }
    )


def build_control_points(n: int = 500) -> pa.Table:
    rng = np.random.default_rng(SEED + 1)
    x0, y0, x1, y1 = _projected_bbox_d48(pad=0.0)
    x = rng.uniform(x0, x1, n)
    y = rng.uniform(y0, y1, n)
    return pa.table(
        {
            "cp_id": pa.array(np.arange(n, dtype=np.int32)),
            "x": pa.array(x),
            "y": pa.array(y),
            "name": pa.array([f"cp_{i:04d}" for i in range(n)]),
        }
    )


def build_ctt_points(geoids: dict[str, dict]) -> pa.Table:
    """Golden transform vectors via the scalar reference (FIXTURES.md B)."""
    lat_min, lon_min, lat_max, lon_max = SLO_BBOX
    # Regular 30x30 interior subgrid + corner/edge cases.
    fi_g = np.linspace(lat_min + 0.05, lat_max - 0.05, 30)
    la_g = np.linspace(lon_min + 0.05, lon_max - 0.05, 30)
    FI, LA = np.meshgrid(fi_g, la_g, indexing="ij")
    fi = FI.ravel().tolist()
    la = LA.ravel().tolist()
    # Exact geoid grid nodes (bilinear must be exact there).
    g = geoids["slo2000"]
    for r, c in [(5, 7), (20, 100), (57, 108), (0, 0)]:
        fi.append(g["lat0"] + r * g["dlat"])
        la.append(g["lon0"] + c * g["dlon"])
    # Out-of-bbox fallback points.
    fi += [44.0, 48.5]
    la += [10.0, 20.0]

    rng = np.random.default_rng(SEED + 2)
    h_ell = rng.uniform(200.0, 1500.0, len(fi))

    grid_obj = type(
        "G", (), dict(N=g["N"], lat0=g["lat0"], lon0=g["lon0"], dlat=g["dlat"], dlon=g["dlon"])
    )

    rows = {
        "pt_id": [], "fi": [], "la": [], "h_ell": [],
        "x_d96": [], "y_d96": [], "x_d48": [], "y_d48": [], "H_orth": [],
    }
    p = HELMERT_D48_TO_D96
    for i, (f, l) in enumerate(zip(fi, la)):
        h = float(h_ell[i])
        x96, y96 = sr.tm_fwd_scalar(f, l, D96_TM)
        # ETRS89 -> D48/GK: exact inverse of the forward Helmert chain.
        X, Y, Z = sr.fila2xyz_scalar(f, l, h, D96_TM.ellipsoid)
        # scalar exact inverse Helmert: solve c*R@v + T = X  =>
        # v = R^-1 @ (X - T)/c ; use transpose-free 3x3 Cramer solve via numpy
        c = p.scale
        R = np.array(
            [[1.0, -p.rz, p.ry], [p.rz, 1.0, -p.rx], [-p.ry, p.rx, 1.0]]
        )
        v = np.linalg.solve(R, np.array([X - p.dx, Y - p.dy, Z - p.dz]) / c)
        fb, lb, hb = sr.xyz2fila_scalar(v[0], v[1], v[2], D48_GK.ellipsoid)
        x48, y48 = sr.tm_fwd_scalar(fb, lb, D48_GK)
        in_bbox = lat_min <= f <= lat_max and lon_min <= l <= lon_max
        und = sr.bilinear_scalar(grid_obj, f, l) if in_bbox else 0.0
        rows["pt_id"].append(i)
        rows["fi"].append(f)
        rows["la"].append(l)
        rows["h_ell"].append(h)
        rows["x_d96"].append(x96)
        rows["y_d96"].append(y96)
        rows["x_d48"].append(x48)
        rows["y_d48"].append(y48)
        rows["H_orth"].append(h - und)
    return pa.table(
        {
            "pt_id": pa.array(rows["pt_id"], pa.int32()),
            **{k: pa.array(rows[k], pa.float64()) for k in
               ["fi", "la", "h_ell", "x_d96", "y_d96", "x_d48", "y_d48", "H_orth"]},
        }
    )


def main() -> None:
    os.makedirs(GEN_DIR, exist_ok=True)
    geoids = build_geoid_grids()
    for model, g in geoids.items():
        np.savez_compressed(os.path.join(GEN_DIR, f"geoid_{model}.npz"), **g)

    aft = build_aft()
    np.savez_compressed(os.path.join(GEN_DIR, "aft.npz"), **aft)

    pq.write_table(build_municipalities(), os.path.join(GEN_DIR, "municipalities.parquet"))
    pq.write_table(build_control_points(), os.path.join(GEN_DIR, "control_points.parquet"))
    pq.write_table(build_ctt_points(geoids), os.path.join(GEN_DIR, "ctt_points.parquet"))
    print(f"assets written to {GEN_DIR}")


if __name__ == "__main__":
    main()
