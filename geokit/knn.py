"""k-nearest-neighbour lookup vs a broadcast control-point table
(north_rule join J4, SURVEY.md §2.4 — no reference analog).

The small side (~500 reference control points) is broadcast once per
worker; each batch computes a dense (batch, m) squared-distance matrix
with one BLAS-shaped NumPy expression and top-k's it with
``argpartition`` — the right call for m up to a few tens of thousands.
For a larger small-side, ``grid_knn`` buckets the control points on a
uniform grid and searches expanding rings (the documented scale path).
"""

from __future__ import annotations

import numpy as np


def brute_knn(
    px: np.ndarray,
    py: np.ndarray,
    cx: np.ndarray,
    cy: np.ndarray,
    k: int,
    chunk: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (idx (n, k) into control points sorted by distance then
    index, dist (n, k) Euclidean).

    Processes points in row chunks so the (chunk, m) distance matrix
    stays cache/allocator-friendly regardless of batch size."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    cx = np.asarray(cx, dtype=np.float64)[None, :]
    cy = np.asarray(cy, dtype=np.float64)[None, :]
    n = px.shape[0]
    m = cx.shape[1]
    k = min(k, m)
    idx = np.empty((n, k), dtype=np.int64)
    dist = np.empty((n, k), dtype=np.float64)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        d2 = (px[s:e, None] - cx) ** 2 + (py[s:e, None] - cy) ** 2  # (c, m)
        part = np.argpartition(d2, kth=k - 1, axis=1)[:, :k]
        rows = np.arange(e - s)[:, None]
        dk = d2[rows, part]
        # Stable final order: by (distance, index) for deterministic ties.
        order = np.lexsort((part, dk), axis=1)
        idx[s:e] = part[rows, order]
        dist[s:e] = np.sqrt(dk[rows, order])
    return idx, dist


class PaddedGridKnn:
    """Exact kNN via a precomputed per-cell candidate table.

    Build (once per worker): lay a uniform grid over the control
    points' bbox; for each cell compute the exact kth-NN distance of
    its CENTER (one brute pass), then store every control point within
    ``d_k(center) + 2 * half_diagonal`` as the cell's candidate set —
    by the triangle inequality that set provably contains the true k
    nearest for EVERY query point inside the cell. Candidate lists are
    padded to a fixed width W, so the per-batch query is one dense
    (n, W) gather + distance + top-k — typically W ~ 30-60 vs m = all
    control points for brute force, and fully vectorized.

    Falls back to brute force for query points outside the grid.
    """

    def __init__(self, cx: np.ndarray, cy: np.ndarray, k: int, ncells: int = 16384):
        self.cx = np.asarray(cx, dtype=np.float64)
        self.cy = np.asarray(cy, dtype=np.float64)
        m = len(self.cx)
        self.k = min(k, m)  # brute_knn output contract: k = min(k, m)
        k = self.k
        x0, x1 = self.cx.min(), self.cx.max()
        y0, y1 = self.cy.min(), self.cy.max()
        aspect = max(x1 - x0, 1e-9) / max(y1 - y0, 1e-9)
        ngy = max(1, int(np.sqrt(ncells / max(aspect, 1e-9))))
        ngx = max(1, ncells // ngy)
        self.x0, self.y0 = x0, y0
        self.dx = (x1 - x0) / ngx or 1.0
        self.dy = (y1 - y0) / ngy or 1.0
        self.ngx, self.ngy = ngx, ngy

        # Cell centers (ngx*ngy, brute kNN of centers in one shot).
        gx = x0 + (np.arange(ngx) + 0.5) * self.dx
        gy = y0 + (np.arange(ngy) + 0.5) * self.dy
        CX, CY = np.meshgrid(gx, gy, indexing="ij")
        centers_x = CX.ravel()
        centers_y = CY.ravel()
        _, cdist = brute_knn(centers_x, centers_y, self.cx, self.cy, k)
        dk = cdist[:, -1]
        half_diag = 0.5 * np.hypot(self.dx, self.dy)
        radius = dk + 2.0 * half_diag

        # Candidate lists per cell (vectorized distance test per cell
        # would be (cells, m); do it chunked over cells).
        cand_lists: list[np.ndarray] = []
        W = k
        for s in range(0, len(centers_x), 2048):
            e = min(s + 2048, len(centers_x))
            d2 = (centers_x[s:e, None] - self.cx) ** 2 + (
                centers_y[s:e, None] - self.cy
            ) ** 2
            within = d2 <= (radius[s:e, None] ** 2)
            for row in within:
                ids = np.nonzero(row)[0]
                cand_lists.append(ids)
                if len(ids) > W:
                    W = len(ids)
        self.W = W
        cand = np.zeros((len(cand_lists), W), dtype=np.int32)
        mask = np.ones((len(cand_lists), W), dtype=bool)  # True = padding
        for i, ids in enumerate(cand_lists):
            cand[i, : len(ids)] = ids
            mask[i, : len(ids)] = False
        self.cand = cand
        self.pad = mask

    def query(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        gx = np.floor((px - self.x0) / self.dx).astype(np.int64)
        gy = np.floor((py - self.y0) / self.dy).astype(np.int64)
        inside = (gx >= 0) & (gx < self.ngx) & (gy >= 0) & (gy < self.ngy)
        cell = np.clip(gx, 0, self.ngx - 1) * self.ngy + np.clip(gy, 0, self.ngy - 1)

        cand = self.cand[cell]  # (n, W)
        pad = self.pad[cell]
        d2 = (px[:, None] - self.cx[cand]) ** 2 + (py[:, None] - self.cy[cand]) ** 2
        d2 = np.where(pad, np.inf, d2)
        kk = self.k
        part = np.argpartition(d2, kth=kk - 1, axis=1)[:, :kk]
        rows = np.arange(len(px))[:, None]
        dk = d2[rows, part]
        ids = cand[rows, part]
        order = np.lexsort((ids, dk), axis=1)
        idx = ids[rows, order].astype(np.int64)
        dist = np.sqrt(dk[rows, order])

        if not inside.all():
            out = ~inside
            bi, bd = brute_knn(px[out], py[out], self.cx, self.cy, kk)
            idx[out] = bi
            dist[out] = bd
        return idx, dist


def grid_knn(
    px: np.ndarray,
    py: np.ndarray,
    cx: np.ndarray,
    cy: np.ndarray,
    k: int,
    cell: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Bucketed kNN: uniform-grid buckets over control points, expand
    rings of cells until >= k candidates and the ring lower-bound
    distance exceeds the current kth distance, then exact top-k on
    candidates. Same output contract as brute_knn."""
    cx = np.asarray(cx, dtype=np.float64)
    cy = np.asarray(cy, dtype=np.float64)
    k = min(k, len(cx))  # same clamp as brute_knn
    x0, y0 = cx.min(), cy.min()
    gx = np.floor((cx - x0) / cell).astype(np.int64)
    gy = np.floor((cy - y0) / cell).astype(np.int64)
    ncx = int(gx.max()) + 1
    ncy = int(gy.max()) + 1
    cell_of = gy * ncx + gx
    order = np.argsort(cell_of, kind="stable")
    sorted_ids = order
    starts = np.searchsorted(cell_of[order], np.arange(ncx * ncy + 1))

    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = px.shape[0]
    out_idx = np.empty((n, k), dtype=np.int64)
    out_dist = np.empty((n, k), dtype=np.float64)
    pgx = np.clip(np.floor((px - x0) / cell).astype(np.int64), 0, ncx - 1)
    pgy = np.clip(np.floor((py - y0) / cell).astype(np.int64), 0, ncy - 1)
    max_ring = max(ncx, ncy)
    for i in range(n):  # cold path; hot path is brute_knn
        cands: list[np.ndarray] = []
        count = 0
        # Expand rings until we have >= k candidates AND every farther
        # ring's minimum possible distance ((r-1)*cell from the query's
        # cell) exceeds the current kth candidate distance — stopping
        # merely at count >= k can miss a closer point in a later ring.
        need_r = max_ring
        for r in range(max_ring + 1):
            xs = range(max(0, pgx[i] - r), min(ncx, pgx[i] + r + 1))
            ys = range(max(0, pgy[i] - r), min(ncy, pgy[i] + r + 1))
            ring = [
                (xx, yy)
                for xx in xs
                for yy in ys
                if max(abs(xx - pgx[i]), abs(yy - pgy[i])) == r
            ]
            for xx, yy in ring:
                c = yy * ncx + xx
                ids = sorted_ids[starts[c] : starts[c + 1]]
                if len(ids):
                    cands.append(ids)
                    count += len(ids)
            if count >= k:
                cur = np.concatenate(cands)
                dcur = np.sqrt((cx[cur] - px[i]) ** 2 + (cy[cur] - py[i]) ** 2)
                d_k = np.partition(dcur, k - 1)[k - 1]
                need_r = int(d_k / cell) + 1
                if r >= need_r:
                    break
        ids = np.concatenate(cands) if cands else np.arange(len(cx))
        d2 = (cx[ids] - px[i]) ** 2 + (cy[ids] - py[i]) ** 2
        kk = min(k, len(ids))
        part = np.argpartition(d2, kth=kk - 1)[:kk]
        sub_order = np.lexsort((ids[part], d2[part]))
        sel = part[sub_order]
        out_idx[i, :kk] = ids[sel]
        out_dist[i, :kk] = np.sqrt(d2[sel])
    return out_idx, out_dist
