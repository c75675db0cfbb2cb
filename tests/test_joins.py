"""PIP / kNN join conformance vs brute-force oracles (SURVEY.md §5.2.4)."""

import numpy as np

import assets
from geokit.knn import brute_knn, grid_knn
from geokit.polygons import pip_lookup, point_in_ring


def _random_points(n=2000, seed=5):
    rng = np.random.default_rng(seed)
    polys = assets.load_municipalities()
    x0, y0 = polys.bbox[:, 0].min(), polys.bbox[:, 1].min()
    x1, y1 = polys.bbox[:, 2].max(), polys.bbox[:, 3].max()
    return rng.uniform(x0 - 1000, x1 + 1000, n), rng.uniform(y0 - 1000, y1 + 1000, n)


def test_pip_matches_bruteforce_oracle():
    polys = assets.load_municipalities()
    px, py = _random_points()
    got = pip_lookup(polys, px, py)

    # O(n*m) oracle: test every point against every ring.
    oracle = np.full(len(px), -1, dtype=np.int64)
    for p in range(len(polys.muni_id)):
        s, e = polys.ring_start[p], polys.ring_start[p + 1]
        inside = point_in_ring(px, py, polys.xs[s:e], polys.ys[s:e])
        first = inside & (oracle == -1)
        oracle[first] = p
    assert np.array_equal(got, oracle)


def test_pip_tiling_exhaustive():
    """Interior points of the jittered-quad tiling match exactly one
    polygon (FIXTURES.md C: exhaustive, non-overlapping)."""
    polys = assets.load_municipalities()
    rng = np.random.default_rng(6)
    x0, y0 = polys.bbox[:, 0].min() + 1000, polys.bbox[:, 1].min() + 1000
    x1, y1 = polys.bbox[:, 2].max() - 1000, polys.bbox[:, 3].max() - 1000
    px = rng.uniform(x0, x1, 3000)
    py = rng.uniform(y0, y1, 3000)
    got = pip_lookup(polys, px, py)
    assert (got >= 0).all()


def test_knn_matches_bruteforce_sort_oracle():
    cp = assets.load_control_points()
    px, py = _random_points(500, seed=9)
    idx, dist = brute_knn(px, py, cp["x"], cp["y"], 3)
    for i in range(0, 500, 50):
        d2 = (cp["x"] - px[i]) ** 2 + (cp["y"] - py[i]) ** 2
        order = np.lexsort((np.arange(len(d2)), d2))[:3]
        assert np.array_equal(idx[i], order)
        assert np.allclose(dist[i], np.sqrt(d2[order]))


def test_grid_knn_matches_brute():
    cp = assets.load_control_points()
    px, py = _random_points(200, seed=10)
    bi, bd = brute_knn(px, py, cp["x"], cp["y"], 3)
    gi, gd = grid_knn(px, py, cp["x"], cp["y"], 3, cell=15000.0)
    assert np.array_equal(bi, gi)
    assert np.allclose(bd, gd)
