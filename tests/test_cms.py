"""engine/cms.py — Count-Min frequency sketch: register-exact
mergeability, overcount-only estimates, eps·N accuracy bound vs exact
counts, and heavy-hitter agreement with the exact vocab_topk query."""

from __future__ import annotations

import collections
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from engine.cms import (
    D_DEFAULT,
    W_DEFAULT,
    cms_batch,
    cms_estimate,
    cms_merge,
    cms_sketch,
    local_top_candidates,
    q_cms_heavy_hitters,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _exact_token_counts(sf: str) -> dict[str, int]:
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    return collections.Counter(
        tok for s in texts for tok in re.findall(r"[a-z0-9]+", s.lower())
    )


def test_cms_merge_is_register_exact():
    """CMS(A ∪ B) == CMS(A) + CMS(B), elementwise."""
    a = pa.array(["x", "y", "x", "z"] * 50)
    b = pa.array(["y", "w"] * 30)
    both = pa.concat_arrays([a, b])
    ca = cms_batch(a, None)
    cb = cms_batch(b, None)
    cab = cms_batch(both, None)
    assert np.array_equal(cms_merge(ca, cb), cab)


def test_cms_weighted_equals_repeated():
    """Weighted inserts == repeating each value weight times (the
    combiner-partial contract vocab partials rely on)."""
    vals = pa.array(["a", "b", "c"])
    wts = np.array([5, 2, 7], dtype=np.int64)
    repeated = pa.array(["a"] * 5 + ["b"] * 2 + ["c"] * 7)
    assert np.array_equal(cms_batch(vals, wts), cms_batch(repeated, None))


def test_cms_int64_key_path():
    keys = pa.array(np.arange(1000, dtype=np.int64) % 7)
    sk = cms_batch(keys, None)
    est = cms_estimate(sk, pa.array(np.arange(7, dtype=np.int64)))
    true = np.bincount(np.arange(1000) % 7)
    assert (est >= true).all()
    assert (est - true <= 2 * np.e / W_DEFAULT * 1000 + 1).all()


@pytest.mark.parametrize("sf", [SF001, SF01])
def test_cms_overcount_only_and_bounded(ray_session, sf):
    """est >= true for EVERY token, and est - true <= eps·N for the
    standard eps = e/W (collision mass)."""
    exact = _exact_token_counts(sf)
    n_total = sum(exact.values())
    from engine.queries import _read
    from engine.textops import token_count_partials

    partials = _read(sf, "documents", ["text"], rows_per_block=256).map_batches(
        token_count_partials, batch_format="pyarrow"
    )
    sketch = cms_sketch(partials, "token", weight_col="_cnt")
    assert sketch.shape == (D_DEFAULT, W_DEFAULT)
    assert sketch.sum() == D_DEFAULT * n_total  # every row sees all mass
    toks = sorted(exact)
    est = cms_estimate(sketch, pa.array(toks))
    true = np.array([exact[t] for t in toks], dtype=np.int64)
    assert (est >= true).all()
    assert (est - true <= np.e / W_DEFAULT * n_total + 1).all()


def test_cms_distributed_equals_single_pass(ray_session):
    """Tree-merged distributed sketch == one single-batch sketch."""
    vals = pa.array([f"k{i % 37}" for i in range(5000)])
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    dist = cms_sketch(ds, "v")
    single = cms_batch(vals, None)
    assert np.array_equal(dist, single)


def test_heavy_hitters_match_exact_topk(ray_session):
    """On the test corpus (vocab << W so no collisions), the CMS
    heavy-hitter query equals the exact vocab_topk output."""
    from engine.queries import q_vocab_topk

    got = q_cms_heavy_hitters(SF001, k=20)
    exact = q_vocab_topk(SF001).to_pandas()
    assert list(got.token) == list(exact.token)
    assert (got.est_cnt.to_numpy() >= exact.cnt.to_numpy()).all()


def test_local_top_candidates_bounded_and_complete(ray_session):
    """Candidate set contains every exact top-k token and stays
    bounded by m × blocks."""
    from engine.queries import _read
    from engine.textops import token_count_partials

    partials = _read(SF001, "documents", ["text"], rows_per_block=256).map_batches(
        token_count_partials, batch_format="pyarrow"
    )
    cands = set(local_top_candidates(partials, "token", "_cnt", m=8).to_pylist())
    exact = _exact_token_counts(SF001)
    top8 = [t for t, _ in sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:8]]
    assert set(top8) <= cands
