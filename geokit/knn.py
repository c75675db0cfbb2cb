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
    # Keep the (rows, cols) working tile ~<=32M float64 (256 MB):
    # argpartition over a very wide axis-1 is ~60 ns/element and the
    # broadcast temporaries hit GBs, so large control tables are
    # scanned in column chunks with a running top-k merge (exact).
    mchunk = m if m * min(chunk, n) <= (1 << 25) else max(k, (1 << 25) // max(chunk, 1))
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        rows = np.arange(e - s)[:, None]
        best_d: np.ndarray | None = None  # (rows, k) running top-k
        best_i: np.ndarray | None = None
        for ms in range(0, m, mchunk):
            me = min(ms + mchunk, m)
            d2 = (px[s:e, None] - cx[:, ms:me]) ** 2 + (
                py[s:e, None] - cy[:, ms:me]
            ) ** 2
            ids = np.arange(ms, me, dtype=np.int64)[None, :].repeat(e - s, axis=0)
            if best_d is not None:
                d2 = np.concatenate([best_d, d2], axis=1)
                ids = np.concatenate([best_i, ids], axis=1)
            kk = min(k, d2.shape[1])
            part = np.argpartition(d2, kth=kk - 1, axis=1)[:, :kk]
            best_d = d2[rows, part]
            best_i = ids[rows, part]
        # Stable final order: by (distance, index) for deterministic ties.
        order = np.lexsort((best_i, best_d), axis=1)
        idx[s:e] = best_i[rows, order]
        dist[s:e] = np.sqrt(best_d[rows, order])
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

    Two build paths, same candidate-table shape and the same
    correctness proof (only the d_k(center) estimate differs):
    - ``m <= bucketed_build_threshold``: exact d_k(center) via one
      brute pass of all centers vs all control points (O(cells x m) —
      fine for the reference-scale small side).
    - larger m (the nationwide-control-table case, VERDICT-r3 #7):
      O(m + cells) BUCKETED build — control points bucketed on the
      grid once, d_k(center) replaced by a provable UPPER bound from a
      2D prefix-sum ring search (smallest box around the cell holding
      >= k points; every box point is within the box's corner
      distance, so corner distance >= d_k(center)), candidates
      gathered from the bucket ranges of the radius box and distance-
      filtered. An upper bound only ever ENLARGES the candidate set,
      so exactness is preserved (pytest: bucketed == brute path ==
      brute_knn). ``ncells`` defaults to ~1 control point per cell
      (clamped) so W stays a few dozen at any m.
    """

    def __init__(
        self,
        cx: np.ndarray,
        cy: np.ndarray,
        k: int,
        ncells: int | None = None,
        bucketed_build_threshold: int = 20_000,
    ):
        self.cx = np.asarray(cx, dtype=np.float64)
        self.cy = np.asarray(cy, dtype=np.float64)
        m = len(self.cx)
        self.k = min(k, m)  # brute_knn output contract: k = min(k, m)
        k = self.k
        if ncells is None:
            ncells = int(min(max(16384, m), 1 << 20))
        x0, x1 = self.cx.min(), self.cx.max()
        y0, y1 = self.cy.min(), self.cy.max()
        aspect = max(x1 - x0, 1e-9) / max(y1 - y0, 1e-9)
        ngy = max(1, int(np.sqrt(ncells / max(aspect, 1e-9))))
        ngx = max(1, ncells // ngy)
        self.x0, self.y0 = x0, y0
        self.dx = (x1 - x0) / ngx or 1.0
        self.dy = (y1 - y0) / ngy or 1.0
        self.ngx, self.ngy = ngx, ngy

        gx = x0 + (np.arange(ngx) + 0.5) * self.dx
        gy = y0 + (np.arange(ngy) + 0.5) * self.dy
        half_diag = 0.5 * np.hypot(self.dx, self.dy)

        if m <= bucketed_build_threshold:
            # Cell centers (ngx*ngy, brute kNN of centers in one shot).
            CX, CY = np.meshgrid(gx, gy, indexing="ij")
            centers_x = CX.ravel()
            centers_y = CY.ravel()
            _, cdist = brute_knn(centers_x, centers_y, self.cx, self.cy, k)
            dk = cdist[:, -1]
            radius = dk + 2.0 * half_diag

            # Candidate lists per cell (vectorized distance test per
            # cell would be (cells, m); do it chunked over cells).
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
        else:
            cand_lists, W = self._build_bucketed(gx, gy, half_diag)
        self.W = W
        cand = np.zeros((len(cand_lists), W), dtype=np.int32)
        mask = np.ones((len(cand_lists), W), dtype=bool)  # True = padding
        for i, ids in enumerate(cand_lists):
            cand[i, : len(ids)] = ids
            mask[i, : len(ids)] = False
        self.cand = cand
        self.pad = mask

    def _build_bucketed(
        self, gx: np.ndarray, gy: np.ndarray, half_diag: float
    ) -> tuple[list[np.ndarray], int]:
        """O(m + cells) candidate build for large control tables."""
        k, ngx, ngy = self.k, self.ngx, self.ngy
        # Bucket control points on the SAME grid/indexing the query
        # uses (cell = gx_idx * ngy + gy_idx).
        bi = np.clip(((self.cx - self.x0) / self.dx).astype(np.int64), 0, ngx - 1)
        bj = np.clip(((self.cy - self.y0) / self.dy).astype(np.int64), 0, ngy - 1)
        cell_of = bi * ngy + bj
        order = np.argsort(cell_of, kind="stable")
        starts = np.searchsorted(cell_of[order], np.arange(ngx * ngy + 1))
        counts2d = np.diff(starts).reshape(ngx, ngy)
        # 2D prefix sums: box point-counts in O(1) per cell.
        P = np.zeros((ngx + 1, ngy + 1), dtype=np.int64)
        np.cumsum(np.cumsum(counts2d, axis=0), axis=1, out=P[1:, 1:])

        ii = np.repeat(np.arange(ngx), ngy)
        jj = np.tile(np.arange(ngy), ngx)
        rstar = np.zeros(ngx * ngy, dtype=np.int64)
        unres = np.ones(ngx * ngy, dtype=bool)
        for r in range(max(ngx, ngy) + 1):
            if not unres.any():
                break
            iu = ii[unres]
            ju = jj[unres]
            i0 = np.maximum(iu - r, 0)
            i1 = np.minimum(iu + r, ngx - 1)
            j0 = np.maximum(ju - r, 0)
            j1 = np.minimum(ju + r, ngy - 1)
            s = P[i1 + 1, j1 + 1] - P[i0, j1 + 1] - P[i1 + 1, j0] + P[i0, j0]
            ok = s >= k
            hit = np.flatnonzero(unres)[ok]
            rstar[hit] = r
            unres[hit] = False
        # d_k(center) <= distance to the farthest corner of the r* box.
        dk_upper = np.hypot((rstar + 0.5) * self.dx, (rstar + 0.5) * self.dy)
        radius = dk_upper + 2.0 * half_diag

        sorted_ids = order.astype(np.int64)
        cand_lists: list[np.ndarray] = []
        W = k
        r2 = radius * radius
        ri_all = (radius / self.dx).astype(np.int64) + 1
        rj_all = (radius / self.dy).astype(np.int64) + 1
        for c in range(ngx * ngy):
            i, j = divmod(c, ngy)
            ri, rj = int(ri_all[c]), int(rj_all[c])
            lo_j = max(0, j - rj)
            hi_j = min(ngy - 1, j + rj)
            rows = [
                sorted_ids[starts[di * ngy + lo_j] : starts[di * ngy + hi_j + 1]]
                for di in range(max(0, i - ri), min(ngx - 1, i + ri) + 1)
            ]
            ids = np.concatenate(rows) if rows else np.zeros(0, dtype=np.int64)
            if len(ids):
                d2 = (gx[i] - self.cx[ids]) ** 2 + (gy[j] - self.cy[ids]) ** 2
                ids = ids[d2 <= r2[c]]
            cand_lists.append(ids)
            if len(ids) > W:
                W = len(ids)
        return cand_lists, W

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


class BucketGridKnn:
    """Exact kNN for LARGE control tables (the nationwide case,
    VERDICT-r3 #7) in O(m) memory: CSR grid buckets + per-cell
    radius bounds; candidates are gathered PER QUERY CELL at query
    time instead of padded into a global table.

    PaddedGridKnn's padded candidate table is O(cells x W) where W is
    the WORST cell's candidate count — under skewed density (city
    disks holding most points) W explodes into the thousands and the
    table into GBs. Here the build stores only the CSR buckets and the
    per-cell search radius (prefix-sum ring bound, same correctness
    proof as PaddedGridKnn._build_bucketed: the radius ball provably
    contains the true kNN of every query inside the cell); query
    batches are grouped by cell and each distinct cell's candidate set
    is gathered once per batch (plus a bounded per-index cache) and
    processed as one dense (group, candidates) top-k. Out-of-grid
    queries are clamped to the nearest boundary cell and served from a
    radius enlarged by twice the group's max distance-to-cell-rectangle
    D: d_k(q) <= dk_upper + half_diag + D and any true neighbour p has
    dist(p, center) <= d_k(q) + half_diag + D, so radius + 2D provably
    contains the exact kNN (no brute fallback, no (n, m) temporaries).

    Same output contract as brute_knn (pytest-equal)."""

    def __init__(self, cx: np.ndarray, cy: np.ndarray, k: int, ncells: int | None = None):
        self.cx = np.asarray(cx, dtype=np.float64)
        self.cy = np.asarray(cy, dtype=np.float64)
        m = len(self.cx)
        self.k = min(k, m)
        k = self.k
        if ncells is None:
            # ~4 control points per cell: candidate sets stay a few
            # dozen wide while cold gathers / cache entries are 4x
            # fewer than 1-point-per-cell.
            ncells = int(min(max(16384, m // 4), 1 << 20))
        x0, x1 = self.cx.min(), self.cx.max()
        y0, y1 = self.cy.min(), self.cy.max()
        aspect = max(x1 - x0, 1e-9) / max(y1 - y0, 1e-9)
        ngy = max(1, int(np.sqrt(ncells / max(aspect, 1e-9))))
        ngx = max(1, ncells // ngy)
        self.x0, self.y0 = x0, y0
        self.dx = (x1 - x0) / ngx or 1.0
        self.dy = (y1 - y0) / ngy or 1.0
        self.ngx, self.ngy = ngx, ngy

        bi = np.clip(((self.cx - x0) / self.dx).astype(np.int64), 0, ngx - 1)
        bj = np.clip(((self.cy - y0) / self.dy).astype(np.int64), 0, ngy - 1)
        cell_of = bi * ngy + bj
        self._sorted_ids = np.argsort(cell_of, kind="stable")
        self._starts = np.searchsorted(
            cell_of[self._sorted_ids], np.arange(ngx * ngy + 1)
        )
        counts2d = np.diff(self._starts).reshape(ngx, ngy)
        P = np.zeros((ngx + 1, ngy + 1), dtype=np.int64)
        np.cumsum(np.cumsum(counts2d, axis=0), axis=1, out=P[1:, 1:])
        ii = np.repeat(np.arange(ngx), ngy)
        jj = np.tile(np.arange(ngy), ngx)
        rstar = np.zeros(ngx * ngy, dtype=np.int64)
        unres = np.ones(ngx * ngy, dtype=bool)
        for r in range(max(ngx, ngy) + 1):
            if not unres.any():
                break
            iu, ju = ii[unres], jj[unres]
            i0 = np.maximum(iu - r, 0)
            i1 = np.minimum(iu + r, ngx - 1)
            j0 = np.maximum(ju - r, 0)
            j1 = np.minimum(ju + r, ngy - 1)
            s = P[i1 + 1, j1 + 1] - P[i0, j1 + 1] - P[i1 + 1, j0] + P[i0, j0]
            hit = np.flatnonzero(unres)[s >= k]
            rstar[hit] = r
            unres[hit] = False
        half_diag = 0.5 * np.hypot(self.dx, self.dy)
        self._radius = (
            np.hypot((rstar + 0.5) * self.dx, (rstar + 0.5) * self.dy)
            + 2.0 * half_diag
        )
        self._cand_cache: dict[int, np.ndarray] = {}

    def _cell_candidates(self, c: int, radius: float | None = None) -> np.ndarray:
        """Control points within ``radius`` (default: the cell's proven
        bound) of cell c's center. Pure gather — caching happens in
        ``query`` under the composite (cell, radius-quantum) key."""
        ngy = self.ngy
        i, j = divmod(c, ngy)
        rad = self._radius[c] if radius is None else radius
        ri = int(rad / self.dx) + 1
        rj = int(rad / self.dy) + 1
        lo_j = max(0, j - rj)
        hi_j = min(ngy - 1, j + rj)
        starts = self._starts
        sids = self._sorted_ids
        rows = [
            sids[starts[di * ngy + lo_j] : starts[di * ngy + hi_j + 1]]
            for di in range(max(0, i - ri), min(self.ngx - 1, i + ri) + 1)
        ]
        ids = np.concatenate(rows) if rows else np.zeros(0, dtype=np.int64)
        if len(ids):
            gx = self.x0 + (i + 0.5) * self.dx
            gy = self.y0 + (j + 0.5) * self.dy
            d2 = (gx - self.cx[ids]) ** 2 + (gy - self.cy[ids]) ** 2
            ids = ids[d2 <= rad * rad]
        return ids

    def query(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        n = len(px)
        k = self.k
        idx = np.empty((n, k), dtype=np.int64)
        dist = np.empty((n, k), dtype=np.float64)
        gi = np.clip(
            np.floor((px - self.x0) / self.dx).astype(np.int64), 0, self.ngx - 1
        )
        gj = np.clip(
            np.floor((py - self.y0) / self.dy).astype(np.int64), 0, self.ngy - 1
        )
        cell = gi * self.ngy + gj
        # Distance from each query to its (clamped) cell's rectangle —
        # 0 for in-grid queries, the bbox overhang for clamped ones.
        rx0 = self.x0 + gi * self.dx
        ry0 = self.y0 + gj * self.dy
        dxq = np.maximum(np.maximum(rx0 - px, px - (rx0 + self.dx)), 0.0)
        dyq = np.maximum(np.maximum(ry0 - py, py - (ry0 + self.dy)), 0.0)
        rect_d = np.hypot(dxq, dyq)
        # Out-of-grid overhang, quantized UP to cell-diagonal units:
        # gather radius = radius[c] + rq * diag >= radius[c] + 2 *
        # rect_d, so the enlarged-radius proof holds, and (cell, rq)
        # becomes a cacheable composite key (boundary cells x few
        # overhang quanta — small). rq = 0 for all in-grid queries.
        diag = np.hypot(self.dx, self.dy)
        rq = np.ceil((2.0 * rect_d) / diag).astype(np.int64)
        key = (cell << 21) | np.minimum(rq, (1 << 21) - 1)

        # Vectorize across cells by candidate-size class — pad each hit
        # key's candidates to the class width (a power of two, <= 2x
        # optimal work) and run ONE dense gather + top-k per class
        # instead of one Python iteration per cell.
        ukeys, inv = np.unique(key, return_inverse=True)
        cache = self._cand_cache
        cands: list[np.ndarray] = []
        for kx in ukeys:
            kxi = int(kx)
            a = cache.get(kxi)
            if a is None:
                c = kxi >> 21
                r = kxi & ((1 << 21) - 1)
                a = self._cell_candidates(
                    c, radius=float(self._radius[c]) + r * diag if r else None
                )
                if len(cache) > (1 << 20):  # bounded per-actor memory
                    cache.clear()
                cache[kxi] = a
            cands.append(a)
        sizes = np.array([len(a) for a in cands], dtype=np.int64)
        width = np.maximum(sizes, 1)
        cls = 1 << np.ceil(np.log2(width)).astype(np.int64)

        # Keys with big candidate sets (far-overhang boundary keys and
        # ultra-dense cells) skip the padded path — padding to a big
        # power-of-two width multiplies memory traffic; a direct
        # (group_rows, cand) pass per key is cheaper there.
        big = np.flatnonzero(sizes > 1024)
        if len(big):
            border = np.argsort(inv, kind="stable")
            gb = np.searchsorted(inv[border], np.arange(len(ukeys) + 1))
            for ki in big:
                self._topk_into(
                    px, py, border[gb[ki] : gb[ki + 1]], cands[ki], None, idx, dist
                )
            cls[big] = -1  # exclude from the padded classes below

        for S in np.unique(cls[cls > 0]):
            csel = np.flatnonzero(cls == S)
            padded = np.zeros((len(csel), S), dtype=np.int64)
            pad = np.ones((len(csel), S), dtype=bool)  # True = padding
            cat = (
                np.concatenate([cands[ci] for ci in csel])
                if len(csel)
                else np.zeros(0, dtype=np.int64)
            )
            L = sizes[csel]
            rowi = np.repeat(np.arange(len(csel)), L)
            colj = np.arange(len(cat)) - np.repeat(
                np.concatenate([[0], np.cumsum(L[:-1])]), L
            )
            padded[rowi, colj] = cat
            pad[rowi, colj] = False
            rowmap = np.full(len(ukeys), -1, dtype=np.int64)
            rowmap[csel] = np.arange(len(csel))
            sel = np.flatnonzero(rowmap[inv] >= 0)
            local = rowmap[inv[sel]]
            self._topk_into(px, py, sel, padded[local], pad[local], idx, dist)
        return idx, dist

    def _topk_into(
        self,
        px: np.ndarray,
        py: np.ndarray,
        rows: np.ndarray,
        cand: np.ndarray,
        pad: np.ndarray | None,
        idx: np.ndarray,
        dist: np.ndarray,
    ) -> None:
        """Dense (rows, candidates) distance + deterministic top-k,
        written into the output arrays at ``rows``. ``cand`` is either
        a shared 1-D id list or a per-row (rows, W) padded matrix with
        ``pad`` masking the padding slots."""
        k = self.k
        if cand.ndim == 1:
            d2 = (px[rows, None] - self.cx[cand]) ** 2 + (
                py[rows, None] - self.cy[cand]
            ) ** 2
            got_ids = np.broadcast_to(cand, d2.shape)
        else:
            d2 = (px[rows, None] - self.cx[cand]) ** 2 + (
                py[rows, None] - self.cy[cand]
            ) ** 2
            if pad is not None:
                d2 = np.where(pad, np.inf, d2)
            got_ids = cand
        part = np.argpartition(d2, kth=k - 1, axis=1)[:, :k]
        rr = np.arange(len(rows))[:, None]
        dk = d2[rr, part]
        got = np.take_along_axis(np.ascontiguousarray(got_ids), part, axis=1)
        o = np.lexsort((got, dk), axis=1)
        idx[rows] = got[rr, o]
        dist[rows] = np.sqrt(dk[rr, o])


def build_knn_index(
    cx: np.ndarray, cy: np.ndarray, k: int, padded_max: int = 100_000
):
    """Pick the kNN structure by small-side size: padded candidate
    table (fastest vectorized query) while the table stays MB-scale,
    CSR bucket grid beyond (O(m) memory, per-cell group query)."""
    if len(np.asarray(cx)) <= padded_max:
        return PaddedGridKnn(cx, cy, k)
    return BucketGridKnn(cx, cy, k)


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
