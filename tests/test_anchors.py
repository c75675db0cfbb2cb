"""X48 anchor-text top-k tests: brute pandas oracle on random edge
sets (ties included), derived-edge determinism, block-layout
invariance, DuckDB gate parity at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _brute_topk(edges: pd.DataFrame, k: int) -> pd.DataFrame:
    cn = (
        edges.groupby(["dst", "anchor"], sort=False)
        .size()
        .rename("cnt")
        .reset_index()
    )
    cn = cn.sort_values(
        ["dst", "cnt", "anchor"], ascending=[True, False, True], kind="stable"
    )
    cn["rank"] = cn.groupby("dst", sort=False).cumcount() + 1
    out = cn[cn["rank"] <= k][["dst", "rank", "anchor", "cnt"]]
    out["cnt"] = out["cnt"].astype(np.int64)
    out["rank"] = out["rank"].astype(np.int64)
    return out.sort_values(["dst", "rank"]).reset_index(drop=True)


@pytest.mark.parametrize("k", [1, 3, 10])
def test_anchor_topk_matches_brute(ray_session, k):
    import ray.data as rd

    from engine.anchors import anchor_topk

    rng = np.random.default_rng(13)
    n = 20_000
    words = np.array(["alpha", "beta", "gamma", "delta", "eps"], object)
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 500, n).astype(np.int64),
            "dst": rng.integers(0, 300, n).astype(np.int64),
            # few anchors per dst -> live count ties at every k
            "anchor": words[rng.integers(0, 5, n)],
        }
    )
    exp = _brute_topk(edges, k)
    got = (
        anchor_topk(rd.from_pandas(edges).repartition(9), k=k, num_partitions=8)
        .to_pandas()
        .sort_values(["dst", "rank"])
        .reset_index(drop=True)
    )
    assert got[exp.columns.tolist()].equals(exp)


def test_block_layout_invariance(ray_session):
    import ray.data as rd

    from engine.anchors import anchor_topk, derive_anchor_edges

    nodes = pd.DataFrame({"doc_id": np.arange(800, dtype=np.int64)})
    outs = []
    for p in (1, 11):
        e = derive_anchor_edges(rd.from_pandas(nodes).repartition(p), 800)
        outs.append(
            anchor_topk(e, k=3, num_partitions=5)
            .to_pandas()
            .sort_values(["dst", "rank"])
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])


def test_gate_parity_sf0001(ray_session):
    from engine.queries import REGISTRY, _sql_anchor_topk

    fn, _ = REGISTRY["anchor_topk_docs"]
    ray_df = (
        fn("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["dst", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    sql_df = (
        con.sql(_sql_anchor_topk())
        .df()
        .sort_values(["dst", "rank"])
        .reset_index(drop=True)
    )
    assert list(ray_df.columns) == list(sql_df.columns)
    for c in ray_df.columns:
        assert (ray_df[c].to_numpy() == sql_df[c].to_numpy()).all(), c
