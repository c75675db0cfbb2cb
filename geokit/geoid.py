"""Bilinear geoid-undulation interpolation over a regular lat/lon grid.

Reimplements ``ggeo.c::geoid_height`` + the compiled-in grids
``geoid_slo.h`` / ``geoid_egm.h`` (SURVEY.md §2.1 K8): two selectable
models over the Slovenia bbox; out-of-bbox points fall back to
undulation 0 with a flag; orthometric height H = h_ell − N.

The grid asset here is a deterministic synthetic analytic surface
(SURVEY.md §7.2) sampled on the same-shaped regular grid; see
``assets/make_assets.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class GeoidGrid:
    model: str
    N: np.ndarray  # (nrows, ncols) undulation [m]; row 0 at lat0, col 0 at lon0
    lat0: float
    lon0: float
    dlat: float
    dlon: float

    @property
    def lat_max(self) -> float:
        return self.lat0 + (self.N.shape[0] - 1) * self.dlat

    @property
    def lon_max(self) -> float:
        return self.lon0 + (self.N.shape[1] - 1) * self.dlon


def geoid_undulation(
    fi_deg: np.ndarray, la_deg: np.ndarray, grid: GeoidGrid
) -> tuple[np.ndarray, np.ndarray]:
    """Bilinear-interpolated undulation N; returns (N, in_bounds).

    Out-of-bbox points get N=0.0 and in_bounds=False (reference
    fallback path, SURVEY.md §2.1 K8 / §2.3 M4). Exact at grid nodes.
    """
    fi = np.asarray(fi_deg, dtype=np.float64)
    la = np.asarray(la_deg, dtype=np.float64)
    nrows, ncols = grid.N.shape

    ri = (fi - grid.lat0) / grid.dlat
    ci = (la - grid.lon0) / grid.dlon
    in_bounds = (ri >= 0.0) & (ri <= nrows - 1) & (ci >= 0.0) & (ci <= ncols - 1)

    # Clip to the exact last node (the r0 = min(floor, nrows-2) guard
    # below handles the edge cell); an epsilon clamp here would make
    # the top-edge nodes bilinearly inexact.
    ric = np.clip(ri, 0.0, float(nrows - 1))
    cic = np.clip(ci, 0.0, float(ncols - 1))
    r0 = np.floor(ric).astype(np.int64)
    c0 = np.floor(cic).astype(np.int64)
    r0 = np.minimum(r0, nrows - 2)
    c0 = np.minimum(c0, ncols - 2)
    fr = ric - r0
    fc = cic - c0

    g = grid.N
    n00 = g[r0, c0]
    n01 = g[r0, c0 + 1]
    n10 = g[r0 + 1, c0]
    n11 = g[r0 + 1, c0 + 1]
    und = (
        n00 * (1.0 - fr) * (1.0 - fc)
        + n01 * (1.0 - fr) * fc
        + n10 * fr * (1.0 - fc)
        + n11 * fr * fc
    )
    und = np.where(in_bounds, und, 0.0)
    return und, in_bounds


def ortho_height(
    h_ell: np.ndarray, fi_deg: np.ndarray, la_deg: np.ndarray, grid: GeoidGrid
) -> np.ndarray:
    """H_orth = h_ell − N(fi, la)."""
    und, _ = geoid_undulation(fi_deg, la_deg, grid)
    return np.asarray(h_ell, dtype=np.float64) - und
