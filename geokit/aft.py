"""Triangle-based affine datum transform (AFT, "virtual tie points").

Reimplements the reference's triangle-lookup + per-triangle affine
apply (``ggeo.c`` triangle search / coord_in_triangle + the
``aft_gktm.h`` / ``aft_tmgk.h`` tables, SURVEY.md §2.1 K9) with a
different, scale-friendly search structure: instead of the reference's
linear search with a last-hit cache, a uniform-grid spatial index
(cell -> candidate triangle ids, CSR layout) built once per worker,
queried fully vectorized over a batch (hash coords to cells, gather
ragged candidates via repeat/cumsum, one barycentric sign test over
all (point, candidate) pairs, first-hit selection).

Semantics: find the triangle containing (x, y) in the source plane,
apply that triangle's affine x' = a·x + b·y + c, y' = d·x + e·y + f.
Points outside the triangulation hull are flagged (found=False) so the
caller can fall back to the Helmert path, mirroring the reference's
out-of-coverage behaviour.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class AftTriangulation:
    """One direction of the AFT transform (e.g. D48->D96)."""

    name: str
    verts: np.ndarray  # (n, 2) float64 source-plane vertex coords (x, y)
    tris: np.ndarray  # (m, 3) int32 vertex indices, CCW in source plane
    coef: np.ndarray  # (m, 6) float64 affine coeffs a, b, c, d, e, f
    # Uniform grid index (built by build_index):
    x0: float = 0.0
    y0: float = 0.0
    dx: float = 1.0
    dy: float = 1.0
    ncx: int = 0
    ncy: int = 0
    cell_start: np.ndarray | None = None  # (ncx*ncy + 1,) int64 CSR offsets
    cell_tris: np.ndarray | None = None  # flat int32 candidate ids
    # Closed-form fast path (set by build_index when the triangulation
    # is a regular grid split — the official tie-point tables are):
    grid_nx: int = 0  # 0 = not grid-regular, use the general index
    grid_ny: int = 0
    grid_sx: float = 1.0
    grid_sy: float = 1.0


def _orient_ccw(verts: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Return tris with consistent CCW winding in the source plane."""
    p0 = verts[tris[:, 0]]
    p1 = verts[tris[:, 1]]
    p2 = verts[tris[:, 2]]
    cross = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (p1[:, 1] - p0[:, 1]) * (
        p2[:, 0] - p0[:, 0]
    )
    out = tris.copy()
    flip = cross < 0
    out[flip, 1], out[flip, 2] = tris[flip, 2], tris[flip, 1]
    return out


def build_index(tri: AftTriangulation, target_cells: int = 4096) -> AftTriangulation:
    """Build the uniform-grid candidate index (once per worker/actor).

    Each grid cell lists every triangle whose bbox overlaps it; CSR
    layout keeps lookup a pure gather. O(m) build, O(1) query.
    """
    tris = _orient_ccw(tri.verts, tri.tris)
    v = tri.verts
    tx = v[tris, 0]  # (m, 3)
    ty = v[tris, 1]
    xmin, xmax = tx.min(axis=1), tx.max(axis=1)
    ymin, ymax = ty.min(axis=1), ty.max(axis=1)

    gx0, gx1 = float(v[:, 0].min()), float(v[:, 0].max())
    gy0, gy1 = float(v[:, 1].min()), float(v[:, 1].max())
    aspect = max((gx1 - gx0), 1e-9) / max((gy1 - gy0), 1e-9)
    ncy = max(1, int(np.sqrt(target_cells / max(aspect, 1e-9))))
    ncx = max(1, int(target_cells // max(ncy, 1)))
    dx = (gx1 - gx0) / ncx or 1.0
    dy = (gy1 - gy0) / ncy or 1.0

    cx0 = np.clip(((xmin - gx0) / dx).astype(np.int64), 0, ncx - 1)
    cx1 = np.clip(((xmax - gx0) / dx).astype(np.int64), 0, ncx - 1)
    cy0 = np.clip(((ymin - gy0) / dy).astype(np.int64), 0, ncy - 1)
    cy1 = np.clip(((ymax - gy0) / dy).astype(np.int64), 0, ncy - 1)

    # Expand (triangle, covered-cell) pairs. Bboxes are ~1 grid cell so
    # the expansion factor is small and bounded.
    spans_x = cx1 - cx0 + 1
    spans_y = cy1 - cy0 + 1
    counts = spans_x * spans_y
    total = int(counts.sum())
    tri_ids = np.repeat(np.arange(len(tris), dtype=np.int32), counts)
    # per-pair local offset within its triangle's span
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    sx = np.repeat(spans_x, counts)
    lx = local % sx
    ly = local // sx
    cellx = np.repeat(cx0, counts) + lx
    celly = np.repeat(cy0, counts) + ly
    cell_id = celly * ncx + cellx

    order = np.argsort(cell_id, kind="stable")
    cell_id_s = cell_id[order]
    tri_ids_s = tri_ids[order]
    cell_start = np.zeros(ncx * ncy + 1, dtype=np.int64)
    np.add.at(cell_start, cell_id_s + 1, 1)
    cell_start = np.cumsum(cell_start)

    out = AftTriangulation(
        name=tri.name,
        verts=v,
        tris=tris,
        coef=tri.coef,
        x0=gx0,
        y0=gy0,
        dx=dx,
        dy=dy,
        ncx=ncx,
        ncy=ncy,
        cell_start=cell_start,
        cell_tris=tri_ids_s,
    )
    _detect_grid_regular(out)
    return out


def _detect_grid_regular(tri: AftTriangulation) -> None:
    """Detect the regular grid-split structure (lattice vertices, two
    fixed-diagonal triangles per cell in block layout) and enable the
    O(1) closed-form locate. Every condition is VERIFIED exactly — any
    mismatch leaves the general candidate-index path in charge."""
    v = tri.verts
    t = tri.tris
    n = len(v)
    m = len(t)
    if m % 2 or n < 4:
        return
    ncell = m // 2
    # Infer (nx, ny) from the lattice: y varies fastest in index order.
    ys = v[:, 1]
    ny = int(np.argmax(ys[1:] < ys[:-1])) + 1 if n > 1 else 1
    if ny <= 1 or n % ny:
        return
    nx = n // ny
    if (nx - 1) * (ny - 1) != ncell:
        return
    sx = (v[ny, 0] - v[0, 0]) if nx > 1 else 1.0
    sy = (v[1, 1] - v[0, 1]) if ny > 1 else 1.0
    if sx <= 0 or sy <= 0:
        return
    i = np.repeat(np.arange(nx), ny)
    j = np.tile(np.arange(ny), nx)
    if not (
        np.array_equal(v[:, 0], v[0, 0] + i * sx)
        and np.array_equal(v[:, 1], v[0, 1] + j * sy)
    ):
        return
    # Triangle topology: block 0 = {n00, n01, n10} per cell (row-major
    # over (nx-1, ny-1)), block 1 = {n01, n11, n10} — winding-agnostic
    # set comparison (build_index may have flipped orientation).
    r = np.repeat(np.arange(nx - 1), ny - 1)
    c = np.tile(np.arange(ny - 1), nx - 1)
    n00 = r * ny + c
    n01 = n00 + 1
    n10 = n00 + ny
    n11 = n10 + 1
    want_lo = np.sort(np.stack([n00, n01, n10], axis=1), axis=1)
    want_hi = np.sort(np.stack([n01, n11, n10], axis=1), axis=1)
    got = np.sort(t, axis=1)
    if not (
        np.array_equal(got[:ncell], want_lo) and np.array_equal(got[ncell:], want_hi)
    ):
        return
    tri.grid_nx = nx
    tri.grid_ny = ny
    tri.grid_sx = float(sx)
    tri.grid_sy = float(sy)


def _locate_grid(tri: AftTriangulation, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """O(1) closed-form locate for grid-regular triangulations: floor
    to the cell, diagonal test picks the half. ~4x faster than the
    candidate-index path (no gather, no per-candidate sign tests).
    Boundary semantics: points exactly ON a shared edge/diagonal get
    the lower-indexed cell / lower triangle — the same winner the
    general path's first-hit rule picks (both halves pass its eps
    test there), and both halves agree in value on the edge."""
    nx, ny = tri.grid_nx, tri.grid_ny
    xi = (x - tri.verts[0, 0]) / tri.grid_sx
    yj = (y - tri.verts[0, 1]) / tri.grid_sy
    inside = (xi >= 0.0) & (xi <= nx - 1) & (yj >= 0.0) & (yj <= ny - 1)
    i = np.minimum(np.floor(xi).astype(np.int64), nx - 2)
    j = np.minimum(np.floor(yj).astype(np.int64), ny - 2)
    i = np.maximum(i, 0)
    j = np.maximum(j, 0)
    u = xi - i
    v = yj - j
    ncell = (nx - 1) * (ny - 1)
    tid = i * (ny - 1) + j + np.where(u + v > 1.0, ncell, 0)
    return np.where(inside, tid, -1)


def locate(tri: AftTriangulation, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized point-in-triangle lookup. Returns triangle id per
    point, -1 when outside the triangulation."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if tri.grid_nx:
        return _locate_grid(tri, x, y)
    assert tri.cell_start is not None, "call build_index first"
    n = x.shape[0]

    cx = np.clip(((x - tri.x0) / tri.dx).astype(np.int64), 0, tri.ncx - 1)
    cy = np.clip(((y - tri.y0) / tri.dy).astype(np.int64), 0, tri.ncy - 1)
    cell = cy * tri.ncx + cx
    off = tri.cell_start[cell]
    cnt = tri.cell_start[cell + 1] - off
    total = int(cnt.sum())
    hit = np.full(n, -1, dtype=np.int64)
    if total == 0:
        return hit

    pt_idx = np.repeat(np.arange(n, dtype=np.int64), cnt)
    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
    cand = tri.cell_tris[np.repeat(off, cnt) + local].astype(np.int64)

    px = x[pt_idx]
    py = y[pt_idx]
    t = tri.tris[cand]
    v = tri.verts
    x0, y0 = v[t[:, 0], 0], v[t[:, 0], 1]
    x1, y1 = v[t[:, 1], 0], v[t[:, 1], 1]
    x2, y2 = v[t[:, 2], 0], v[t[:, 2], 1]
    # CCW winding => inside iff all edge cross-products >= -eps.
    eps = 1e-7  # metres-scale tolerance for points on shared edges
    d0 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    d1 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    d2 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
    inside = (d0 >= -eps) & (d1 >= -eps) & (d2 >= -eps)

    # First matching candidate wins: assign matches in reverse pair
    # order so the earliest pair is written last.
    m_pt = pt_idx[inside][::-1]
    m_tri = cand[inside][::-1]
    hit[m_pt] = m_tri
    return hit


def aft_apply(
    tri: AftTriangulation, x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Locate + apply per-triangle affine. Returns (x', y', found)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    hit = locate(tri, x, y)
    found = hit >= 0
    safe = np.where(found, hit, 0)
    c = tri.coef[safe]
    xo = c[:, 0] * x + c[:, 1] * y + c[:, 2]
    yo = c[:, 3] * x + c[:, 4] * y + c[:, 5]
    xo = np.where(found, xo, x)
    yo = np.where(found, yo, y)
    return xo, yo, found


def fit_affine_per_triangle(
    src: np.ndarray, dst: np.ndarray, tris: np.ndarray
) -> np.ndarray:
    """Solve the 6 affine coeffs per triangle from its 3 vertex
    correspondences (asset-build time; vectorized batched 3x3 solve)."""
    m = tris.shape[0]
    A = np.ones((m, 3, 3), dtype=np.float64)
    A[:, :, 0] = src[tris, 0]
    A[:, :, 1] = src[tris, 1]
    bx = dst[tris, 0]
    by = dst[tris, 1]
    abc = np.linalg.solve(A, bx[..., None])[..., 0]  # (m, 3)
    def_ = np.linalg.solve(A, by[..., None])[..., 0]
    return np.concatenate([abc, def_], axis=1)
