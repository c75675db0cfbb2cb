"""X56 product quantization: ADC exactness vs a scalar recompute,
recall@k vs brute force, code determinism under repartitioning, and
the persisted-index parquet round-trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _load():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return t, ids, mat


def test_adc_distance_matches_scalar_recompute(ray_session):
    from engine.ann import _unit
    from engine.pq import PqCodebook

    _, ids, mat = _load()
    cb = PqCodebook(mat[:200], m=4, k=16)
    codes = cb.encode(mat)
    q = mat[3]
    tab = cb.adc_tables(q)
    got = PqCodebook.adc_distance(tab, codes)
    # scalar: sum over subspaces of ||q_sub - centroid[code]||^2
    u_q = _unit(q.reshape(1, -1))[0]
    d_sub = cb.d_sub
    want = np.zeros(len(mat))
    for i in range(len(mat)):
        for s in range(cb.m):
            c = cb.codebooks[s][codes[i, s]]
            qs = u_q[s * d_sub : (s + 1) * d_sub]
            want[i] += ((qs - c) ** 2).sum()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_pq_recall_vs_brute_force(ray_session):
    from engine.ann import _unit
    from engine.pq import pq_encode, pq_topk, train_codebook

    t, ids, mat = _load()
    ds = rd.from_arrow(t)
    cb = train_codebook(ds, m=16, k=64)
    codes = pq_encode(ds, cb)
    u = _unit(mat)
    adc_recalls, rr_recalls = [], []
    for qi in (0, 7, 123, 400):
        q = mat[ids.tolist().index(qi)] if qi in ids else mat[qi]
        adc = set(pq_topk(codes, cb, q, k=10)["vec_id"].to_pylist())
        rr = set(
            pq_topk(codes, cb, q, k=10, rerank_ds=ds, rerank=50)["vec_id"].to_pylist()
        )
        sims = _unit(q.reshape(1, -1))[0] @ u.T
        order = np.lexsort((ids, -sims))
        want = set(ids[order[:10]].tolist())
        adc_recalls.append(len(adc & want) / 10)
        rr_recalls.append(len(rr & want) / 10)
    # empirical floors with margin on the near-random synthetic table:
    # ADC-only ~0.5-0.8 at m=16,k=64; +R=50 exact re-rank -> 1.0
    assert np.mean(adc_recalls) >= 0.3, adc_recalls
    assert np.mean(rr_recalls) >= 0.8, rr_recalls


def test_pq_codes_and_topk_deterministic_under_repartition(ray_session):
    from engine.pq import pq_encode, pq_topk, train_codebook

    t, ids, mat = _load()
    q = mat[11]
    outs = []
    for parts in (2, 9):
        ds = rd.from_arrow(t).repartition(parts)
        cb = train_codebook(ds, m=4, k=16)
        codes = pq_encode(ds, cb).to_pandas().sort_values("vec_id").reset_index(drop=True)
        top = pq_topk(
            rd.from_arrow(pa.Table.from_pandas(codes)), cb, q, k=10
        ).to_pandas()
        outs.append((codes, top))
    pd.testing.assert_frame_equal(outs[0][0], outs[1][0])
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])


def test_pq_index_parquet_roundtrip(ray_session, tmp_path):
    from engine.pq import pq_encode, pq_topk, train_codebook

    t, ids, mat = _load()
    ds = rd.from_arrow(t)
    cb = train_codebook(ds, m=4, k=16)
    codes = pq_encode(ds, cb)
    path = str(tmp_path / "pq_index")
    codes.write_parquet(path)
    back = rd.read_parquet(path)
    q = mat[42]
    a = pq_topk(codes, cb, q, k=10).to_pandas()
    b = pq_topk(back, cb, q, k=10).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_pq_gate_query_runs(ray_session):
    from engine.queries import REGISTRY

    fn, sql = REGISTRY["pq_ann"]
    assert sql is None
    out = fn(SF).to_pandas()
    assert len(out) == 10
    assert list(out.columns) == ["vec_id", "cos_sim"]
    # query vector is vec_id 7's own embedding -> it must rank first
    assert out.iloc[0]["vec_id"] == 7
