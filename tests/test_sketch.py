"""engine/sketch.py — HLL approximate distinct: accuracy bound vs
exact COUNT(DISTINCT), register-exact mergeability, determinism, and
the string-key hash path."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

# 3-sigma of the HLL standard error for p=12 (1.04/sqrt(4096) ~ 1.6%),
# plus linear-counting transition slack.
REL_TOL = 0.05


def _exact_by_type(sf):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    d = dict(
        c.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY event_type"
        ).fetchall()
    )
    d["ALL"] = c.sql("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    return d


@pytest.mark.parametrize("sf", [SF001, SF01])
def test_approx_distinct_within_error_bound(ray_session, sf):
    from engine.sketch import q_approx_distinct_users

    df = q_approx_distinct_users(sf)
    exact = _exact_by_type(sf)
    assert set(df.event_type) == set(exact)
    for _, r in df.iterrows():
        e = exact[r.event_type]
        assert abs(r.approx_nd - e) <= max(2, REL_TOL * e), (r.event_type, r.approx_nd, e)


def test_hll_merge_is_register_exact(ray_session):
    """HLL(A ∪ B) == max(HLL(A), HLL(B)) register-for-register — the
    property that makes the per-batch partial/combiner decomposition
    exact rather than an approximation of an approximation."""
    import pyarrow.parquet as pq

    from engine.sketch import _batch_registers, hll_merge

    col = (
        pq.read_table(f"{SF01}/events.parquet", columns=["user_id"])["user_id"]
        .combine_chunks()
    )
    full = _batch_registers(col, 12)
    parts = [col[:3000], col[3000:7000], col[7000:]]
    merged = np.zeros_like(full)
    for p in parts:
        merged = hll_merge(merged, _batch_registers(p, 12))
    assert np.array_equal(full, merged)


def test_hll_deterministic_and_string_path(ray_session):
    """Same input -> same registers (splitmix64/FNV are process- and
    version-stable, unlike hash()); strings hash via the FNV kernel."""
    from engine.sketch import _batch_registers, hll_estimate

    ints = pa.array(np.arange(10_000, dtype=np.int64) % 977)
    r1, r2 = _batch_registers(ints, 12), _batch_registers(ints, 12)
    assert np.array_equal(r1, r2)
    assert abs(hll_estimate(r1) - 977) <= max(2, REL_TOL * 977)

    strs = pa.array([f"user-{i % 977}" for i in range(10_000)])
    rs = _batch_registers(strs, 12)
    assert abs(hll_estimate(rs) - 977) <= max(2, REL_TOL * 977)


def test_hll_sketch_distributed_equals_single_pass(ray_session):
    """The Dataset-level sketch (per-block partials + merge rounds)
    must equal the registers of one driver-side pass."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from engine.sketch import _batch_registers, hll_sketch

    tbl = pq.read_table(f"{SF01}/events.parquet", columns=["user_id"])
    expect = _batch_registers(tbl["user_id"].combine_chunks(), 12)
    ds = rd.from_arrow(tbl).repartition(8)
    got = hll_sketch(ds, "user_id")
    assert np.array_equal(expect, got)
