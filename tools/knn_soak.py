"""kNN index at nationwide control-point scale (VERDICT-r3 #7): build
PaddedGridKnn over ~1M control points (the J4 small side grown to real
deployment size), prove the build stays actor-pool-viable (wall + RSS),
then push 1M query points through the actor-pool stage shape and check
exactness against brute force on a sample.

Usage: python -m tools.knn_soak [n_controls] [n_queries]
Prints one JSON line; raises on any exactness miss.
"""

from __future__ import annotations

import json
import resource
import sys
import time

import numpy as np

SEED = 555


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    rng = np.random.default_rng(SEED)
    # D96/TM-like metre coordinates over a country-sized bbox, with
    # density skew (60% in 3 disks — the pages-corpus shape).
    cx = rng.uniform(370_000, 630_000, m)
    cy = rng.uniform(30_000, 200_000, m)
    disk = rng.random(m) < 0.6
    which = rng.integers(0, 3, m)
    for ci, (dx0, dy0, r) in enumerate(
        [(460_000, 100_000, 8_000), (550_000, 160_000, 6_000), (400_000, 45_000, 5_000)]
    ):
        sel = disk & (which == ci)
        kk = int(sel.sum())
        ang = rng.uniform(0, 2 * np.pi, kk)
        rad = r * np.sqrt(rng.random(kk))
        cx[sel] = dx0 + rad * np.cos(ang)
        cy[sel] = dy0 + rad * np.sin(ang)

    from geokit.knn import brute_knn, build_knn_index

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.time()
    idx = build_knn_index(cx, cy, k=3)
    build_s = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    tbl = (
        idx.cand.nbytes + idx.pad.nbytes
        if hasattr(idx, "cand")
        else idx._sorted_ids.nbytes + idx._starts.nbytes + idx._radius.nbytes
    )
    index_mb = (tbl + cx.nbytes + cy.nbytes) / 1e6

    # Query throughput, batch-shaped like the actor-pool stage. The
    # main run includes a deliberately hostile ~17% of queries up to
    # 10 km OUTSIDE the control bbox (enlarged-radius path); the
    # in-bbox run is the realistic J4 shape (data points inside the
    # control network).
    px = rng.uniform(360_000, 640_000, nq)
    py = rng.uniform(20_000, 210_000, nq)
    t1 = time.time()
    out_i = np.empty((nq, idx.k), dtype=np.int64)
    for s in range(0, nq, 65_536):
        e = min(s + 65_536, nq)
        out_i[s:e], _ = idx.query(px[s:e], py[s:e])
    query_s = time.time() - t1

    nin = min(nq, 262_144)
    qx = rng.uniform(370_000, 630_000, nin)
    qy = rng.uniform(30_000, 200_000, nin)
    t2 = time.time()
    for s in range(0, nin, 65_536):
        e = min(s + 65_536, nin)
        idx.query(qx[s:e], qy[s:e])
    inbbox_s = time.time() - t2

    # Exactness vs brute force on a sample (brute at full m is the
    # slow path this index replaces — sample keeps the check minutes-free).
    samp = rng.choice(nq, 2000, replace=False)
    bi, _ = brute_knn(px[samp], py[samp], cx, cy, 3)
    if not np.array_equal(out_i[samp], bi):
        raise SystemExit("grid kNN != brute force on sample")

    print(
        json.dumps(
            {
                "metric": "knn_soak",
                "n_controls": m,
                "n_queries": nq,
                "build_s": round(build_s, 2),
                "build_rss_delta_gb": round((rss1 - rss0) / (1 << 20), 2),
                "index_mb": round(index_mb, 1),
                "index_kind": type(idx).__name__,
                "grid": [idx.ngx, idx.ngy],
                "queries_per_s": round(nq / query_s, 0),
                "inbbox_queries_per_s": round(nin / inbbox_s, 0),
                "exact_vs_brute_sample": True,
            }
        )
    )


if __name__ == "__main__":
    main()
