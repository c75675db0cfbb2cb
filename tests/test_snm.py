"""X67 sorted-neighborhood-blocking tests: brute rank-window oracle,
multi-block halo coverage (block_size smaller than the corpus so
pairs SPAN block borders), duplicate-key tiebreak determinism, window
sizes, contract guards, layout invariance, and sf0.001 DuckDB mirror
parity of the gate."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.snm import snm_pairs, sql_snm_pairs_docs

SF = "/root/testdata/sf0.001"


def _brute(df: pd.DataFrame, w: int) -> pd.DataFrame:
    s = df.sort_values(["k", "id"]).reset_index(drop=True)
    ids = s.id.to_numpy()
    rows = []
    for d in range(1, w + 1):
        for i in range(len(ids) - d):
            rows.append((ids[i], ids[i + d], d))
    return (
        pd.DataFrame(rows, columns=["doc_a", "doc_b", "gap"])
        .astype(np.int64)
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def _synth(seed: int = 31, n: int = 3000):
    rng = np.random.RandomState(seed)
    ids = rng.permutation(n).astype(np.int64)  # ids NOT in key order
    k = rng.randint(0, 300, n).astype(np.int64)  # heavy key ties
    return pd.DataFrame({"id": ids, "k": k})


@pytest.fixture(scope="module")
def corpus(ray_session):
    df = _synth()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    return df, ds


def _norm(out: pd.DataFrame) -> pd.DataFrame:
    return (
        out[["doc_a", "doc_b", "gap"]]
        .astype(np.int64)
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def test_snm_vs_brute_multiblock(corpus):
    df, ds = corpus
    # block_size 128 << 3000 rows: ~23 blocks, halo crossed ~22 times
    out = _norm(
        snm_pairs(
            ds, id_col="id", key_col="k", window=5, block_size=128,
            num_partitions=16,
        ).to_pandas()
    )
    exp = _brute(df, 5)
    assert len(exp) == 5 * 3000 - (1 + 2 + 3 + 4 + 5)
    pd.testing.assert_frame_equal(out, exp)


def test_snm_window_1(corpus):
    df, ds = corpus
    out = _norm(
        snm_pairs(
            ds, id_col="id", key_col="k", window=1, block_size=64
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(out, _brute(df, 1))


def test_snm_layout_and_blocksize_invariance(corpus):
    df, ds = corpus
    a = _norm(
        snm_pairs(
            ds, id_col="id", key_col="k", window=4, block_size=100
        ).to_pandas()
    )
    b = _norm(
        snm_pairs(
            ds.repartition(2), id_col="id", key_col="k", window=4,
            block_size=997, num_partitions=5,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_snm_contract_guard(ray_session):
    bad = rd.from_arrow(
        pa.table({"id": np.array([-1], np.int64), "k": np.array([0], np.int64)})
    )
    with pytest.raises(Exception):
        snm_pairs(bad, id_col="id", key_col="k").to_pandas()


def test_snm_gate_sql_parity_sf0001(ray_session):
    from engine.queries import q_snm_pairs_docs

    ray_df = _norm(q_snm_pairs_docs(SF).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    sql_df = _norm(con.sql(sql_snm_pairs_docs()).df())
    assert len(ray_df) > 0
    pd.testing.assert_frame_equal(ray_df, sql_df)
