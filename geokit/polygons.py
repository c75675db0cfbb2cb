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


class GridPipIndex:
    """Uniform-grid candidate index over a PolygonSet — the nationwide-
    scale PIP path (round-2 verdict: the linear bbox scan is fine for
    ~64 broadcast municipalities but wrong for thousands of polygons).

    Build (once per worker, like the AFT grid): bucket every polygon
    into each grid cell its bbox overlaps (CSR cell -> ascending
    polygon indices). Lookup: each point indexes ONE cell and tests
    only that cell's candidates; first-containing-polygon (lowest
    index) semantics match pip_lookup exactly (pytest-equal)."""

    def __init__(self, polys: PolygonSet, nx: int = 64, ny: int = 64):
        self.polys = polys
        self.nx, self.ny = nx, ny
        b = polys.bbox
        self.xmin = float(b[:, 0].min()) if len(b) else 0.0
        self.ymin = float(b[:, 1].min()) if len(b) else 0.0
        xmax = float(b[:, 2].max()) if len(b) else 1.0
        ymax = float(b[:, 3].max()) if len(b) else 1.0
        self.wx = max(xmax - self.xmin, 1e-9) / nx
        self.wy = max(ymax - self.ymin, 1e-9) / ny
        # (cell, poly) pairs for every cell each polygon bbox touches.
        cx0 = np.clip(((b[:, 0] - self.xmin) / self.wx).astype(np.int64), 0, nx - 1)
        cx1 = np.clip(((b[:, 2] - self.xmin) / self.wx).astype(np.int64), 0, nx - 1)
        cy0 = np.clip(((b[:, 1] - self.ymin) / self.wy).astype(np.int64), 0, ny - 1)
        cy1 = np.clip(((b[:, 3] - self.ymin) / self.wy).astype(np.int64), 0, ny - 1)
        spans = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        total = int(spans.sum())
        poly_idx = np.repeat(np.arange(len(b), dtype=np.int64), spans)
        # Per-poly local cell enumeration, vectorized over the flat span.
        starts = np.concatenate([[0], np.cumsum(spans)[:-1]])
        local = np.arange(total, dtype=np.int64) - np.repeat(starts, spans)
        w = np.repeat(cx1 - cx0 + 1, spans)
        lx = local % w
        ly = local // w
        cells = (np.repeat(cy0, spans) + ly) * nx + (np.repeat(cx0, spans) + lx)
        order = np.lexsort((poly_idx, cells))  # ascending poly WITHIN cell
        self.cell_polys = poly_idx[order]
        self.cell_start = np.zeros(nx * ny + 1, dtype=np.int64)
        np.add.at(self.cell_start, cells + 1, 1)
        np.cumsum(self.cell_start, out=self.cell_start)

    def lookup(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        polys = self.polys
        out = np.full(len(px), -1, dtype=np.int64)
        cx = ((px - self.xmin) / self.wx).astype(np.int64)
        cy = ((py - self.ymin) / self.wy).astype(np.int64)
        inb = (cx >= 0) & (cx < self.nx) & (cy >= 0) & (cy < self.ny)
        pts = np.flatnonzero(inb)
        if len(pts) == 0:
            return out
        cell = cy[pts] * self.nx + cx[pts]
        s = self.cell_start[cell]
        cnt = self.cell_start[cell + 1] - s
        has = cnt > 0
        pts, s, cnt = pts[has], s[has], cnt[has]
        total = int(cnt.sum())
        if total == 0:
            return out
        # (point, candidate-poly) pair expansion from the CSR gather.
        local = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt
        )
        pair_pt = np.repeat(pts, cnt)
        pair_poly = self.cell_polys[np.repeat(s, cnt) + local]
        # Resolve in ascending polygon order so the FIRST containing
        # polygon wins, exactly like pip_lookup's scan.
        order = np.argsort(pair_poly, kind="stable")
        pair_pt, pair_poly = pair_pt[order], pair_poly[order]
        bounds = np.concatenate(
            [[0], np.flatnonzero(pair_poly[1:] != pair_poly[:-1]) + 1, [len(pair_poly)]]
        )
        unresolved = np.ones(len(px), dtype=bool)
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            p = int(pair_poly[b0])
            idx = pair_pt[b0:b1]
            xmin, ymin, xmax, ymax = polys.bbox[p]
            cand = unresolved[idx] & (
                (px[idx] >= xmin) & (px[idx] <= xmax) & (py[idx] >= ymin) & (py[idx] <= ymax)
            )
            if not cand.any():
                continue
            idx = idx[cand]
            rs, re = polys.ring_start[p], polys.ring_start[p + 1]
            inside = point_in_ring(px[idx], py[idx], polys.xs[rs:re], polys.ys[rs:re])
            hits = idx[inside]
            out[hits] = p
            unresolved[hits] = False
        return out


# Polygon count above which the per-polygon bbox scan loses to the
# grid's candidate pruning (the ~64-muni broadcast set stays on the
# measured-faster simple path; a nationwide set gets the index).
GRID_PIP_THRESHOLD = 128


def pip_lookup_auto(polys: PolygonSet, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """pip_lookup with automatic index selection: polygon sets at or
    above GRID_PIP_THRESHOLD route through a lazily-built
    per-PolygonSet GridPipIndex (cached on the instance — polygon sets
    are broadcast once per worker, so the build amortizes to zero).
    Identical output to pip_lookup (pytest-equal)."""
    if len(polys.muni_id) >= GRID_PIP_THRESHOLD:
        index = getattr(polys, "_grid", None)
        if index is None:
            index = GridPipIndex(polys)
            polys._grid = index
        return index.lookup(px, py)
    return pip_lookup(polys, px, py)


def zone_of(polys: PolygonSet, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """First containing polygon's muni_id per point (int32, -1 when
    outside all) — the shared PIP-join projection used by the page
    pipeline stage and raster zonal stats."""
    idx = pip_lookup_auto(polys, px, py)
    found = idx >= 0
    return np.where(found, polys.muni_id[np.where(found, idx, 0)], -1).astype(np.int32)
