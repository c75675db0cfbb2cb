"""Point-in-polygon kernels (north_rule spatial join J3, SURVEY.md §2.4).

No reference analog (the graft mandates it): vectorized ray-crossing
(even-odd) test against a small broadcast polygon table, with a bbox
prefilter. Designed for the broadcast-small-side join shape: polygons
live once per worker (actor __init__), every batch tests its points
against bbox-candidate polygons only.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PolygonSet:
    """Closed outer rings, CSR layout over a flat vertex array."""

    muni_id: np.ndarray  # (p,) int32
    name: np.ndarray  # (p,) object/str
    ring_start: np.ndarray  # (p + 1,) int64 offsets into xs/ys
    xs: np.ndarray  # flat float64 ring vertices (first == last NOT required)
    ys: np.ndarray
    bbox: np.ndarray  # (p, 4) float64 [xmin, ymin, xmax, ymax]


def point_in_ring(px: np.ndarray, py: np.ndarray, rx: np.ndarray, ry: np.ndarray) -> np.ndarray:
    """Even-odd ray crossing of points vs ONE ring, vectorized over
    points x edges ((n, e) broadcast)."""
    x0 = rx
    y0 = ry
    x1 = np.roll(rx, -1)
    y1 = np.roll(ry, -1)
    px = px[:, None]
    py = py[:, None]
    cond = (y0[None, :] > py) != (y1[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0[None, :] + (py - y0[None, :]) / (y1[None, :] - y0[None, :]) * (
            x1[None, :] - x0[None, :]
        )
    crossings = cond & (px < xint)
    return crossings.sum(axis=1) % 2 == 1


def pip_lookup(polys: PolygonSet, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """For each point, index into polys of the first containing polygon
    (−1 when outside all). bbox prefilter then per-polygon vectorized
    ray test over only the candidate points."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = px.shape[0]
    out = np.full(n, -1, dtype=np.int64)
    unresolved = np.ones(n, dtype=bool)
    for p in range(len(polys.muni_id)):
        xmin, ymin, xmax, ymax = polys.bbox[p]
        cand = unresolved & (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
        if not cand.any():
            continue
        idx = np.nonzero(cand)[0]
        s, e = polys.ring_start[p], polys.ring_start[p + 1]
        inside = point_in_ring(px[idx], py[idx], polys.xs[s:e], polys.ys[s:e])
        hits = idx[inside]
        out[hits] = p
        unresolved[hits] = False
    return out


def zone_of(polys: PolygonSet, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """First containing polygon's muni_id per point (int32, -1 when
    outside all) — the shared PIP-join projection used by the page
    pipeline stage and raster zonal stats."""
    idx = pip_lookup(polys, px, py)
    found = idx >= 0
    return np.where(found, polys.muni_id[np.where(found, idx, 0)], -1).astype(np.int32)
