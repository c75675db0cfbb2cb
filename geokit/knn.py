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
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (idx (n, k) into control points sorted by distance then
    index, dist (n, k) Euclidean)."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    cx = np.asarray(cx, dtype=np.float64)[None, :]
    cy = np.asarray(cy, dtype=np.float64)[None, :]
    d2 = (px - cx) ** 2 + (py - cy) ** 2  # (n, m)
    m = d2.shape[1]
    k = min(k, m)
    part = np.argpartition(d2, kth=k - 1, axis=1)[:, :k]
    rows = np.arange(d2.shape[0])[:, None]
    dk = d2[rows, part]
    # Stable final order: by (distance, index) for deterministic ties.
    order = np.lexsort((part, dk), axis=1)
    idx = part[rows, order]
    dist = np.sqrt(dk[rows, order])
    return idx.astype(np.int64), dist


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
