"""engine/tdigest.py — merging t-digest: rank-error bounds vs exact
order statistics, merge associativity, determinism, and the
distributed grouped path vs the exact grouped_quantiles gate query."""

from __future__ import annotations

import numpy as np
import pytest

RANK_TOL = 0.01  # delta=300 k1-scale digests stay well under this

SF = "/root/testdata/sf0.01"


def _rank_err(sorted_vals: np.ndarray, est: float, q: float) -> float:
    return abs(np.searchsorted(sorted_vals, est) / len(sorted_vals) - q)


def test_build_rank_error_bound():
    from engine.tdigest import build, quantile

    rng = np.random.default_rng(7)
    v = rng.lognormal(3, 1.5, 100_000)  # heavy right tail
    d = build(v)
    sv = np.sort(v)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
        assert _rank_err(sv, float(quantile(d, q)), q) < RANK_TOL, q


def test_merge_preserves_accuracy_and_is_deterministic():
    from engine.tdigest import build, merge, quantile

    rng = np.random.default_rng(11)
    v = rng.normal(100, 15, 120_000)
    sv = np.sort(v)
    parts = np.array_split(v, 23)
    d = (np.empty(0), np.empty(0))
    for p in parts:
        d = merge(d, build(p))
    for q in (0.5, 0.9, 0.99):
        assert _rank_err(sv, float(quantile(d, q)), q) < RANK_TOL, q
    # determinism: identical inputs -> bitwise-identical digests
    d2 = (np.empty(0), np.empty(0))
    for p in parts:
        d2 = merge(d2, build(p))
    assert np.array_equal(d[0], d2[0]) and np.array_equal(d[1], d2[1])


def test_digest_size_is_bounded():
    from engine.tdigest import DELTA_DEFAULT, build, merge

    rng = np.random.default_rng(3)
    d = build(rng.uniform(0, 1, 50_000))
    assert len(d[0]) <= DELTA_DEFAULT
    d2 = merge(d, build(rng.uniform(0, 1, 50_000)))
    assert len(d2[0]) <= DELTA_DEFAULT


def test_grouped_sketch_matches_exact_gate_query(ray_session):
    """The sketch-path quantiles must land within RANK_TOL of the
    EXACT percentile_disc values the grouped_quantiles gate query
    computes (cross-checking two independent implementations)."""
    import pyarrow.parquet as pq

    from engine.tdigest import q_quantile_sketch_orders

    df = q_quantile_sketch_orders(SF).to_pandas().set_index("o_orderpriority")
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pandas()
    for k, g in t.groupby("o_orderpriority"):
        sv = np.sort(g.o_totalprice.to_numpy())
        for q in (0.5, 0.9, 0.99):
            est = df.loc[k, f"q{int(q*100)}_o_totalprice"]
            assert _rank_err(sv, est, q) < RANK_TOL, (k, q)
