"""X49 grouped vector-centroid tests: numpy brute oracle (exact int
sums + the fixed-division centroid), partitioning bit-identity, the
ragged-vector guard, and DuckDB gate parity (bitwise floats)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from engine.vecagg import QUANT


def _mk(n=400, d=16, n_labels=7, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    labels = rng.integers(0, n_labels, n).astype(np.int32)
    return pa.table(
        {
            "label": pa.array(labels),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )


def _brute(tbl):
    labels = tbl["label"].to_numpy().astype(np.int64)
    m = np.stack(tbl["embedding"].to_pylist()).astype(np.float64)
    # same quantization rule: round half away from zero
    q = m * QUANT
    q = np.sign(q) * np.floor(np.abs(q) + 0.5)
    q = q.astype(np.int64)
    rows = []
    for lab in np.unique(labels):
        sel = labels == lab
        s = q[sel].sum(axis=0)
        c = int(sel.sum())
        for dim in range(m.shape[1]):
            rows.append(
                (
                    int(lab),
                    dim,
                    int(s[dim]),
                    c,
                    s[dim] / (float(c) * float(QUANT)),
                )
            )
    return pd.DataFrame(
        rows, columns=["label", "dim", "sum_q", "cnt", "centroid"]
    ).sort_values(["label", "dim"]).reset_index(drop=True)


def test_matches_numpy_brute(ray_session):
    import ray.data as rd

    from engine.vecagg import label_centroid_sums

    tbl = _mk()
    exp = _brute(tbl)
    got = (
        label_centroid_sums(rd.from_arrow(tbl).repartition(9), num_partitions=4)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    assert got["sum_q"].tolist() == exp["sum_q"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()
    np.testing.assert_array_equal(
        got["centroid"].to_numpy(), exp["centroid"].to_numpy()
    )  # bitwise: exact ints + one fixed division


def test_partitioning_bit_identity(ray_session):
    import ray.data as rd

    from engine.vecagg import label_centroid_sums

    tbl = _mk(n=300, d=8, seed=11)
    outs = []
    for p in (1, 13):
        outs.append(
            label_centroid_sums(rd.from_arrow(tbl).repartition(p), num_partitions=3)
            .to_pandas()
            .sort_values(["label", "dim"])
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])


def test_ragged_vectors_raise(ray_session):
    import ray.data as rd

    from engine.vecagg import label_centroid_sums

    tbl = pa.table(
        {
            "label": pa.array([0, 1], pa.int32()),
            "embedding": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32())),
        }
    )
    with pytest.raises(Exception, match="fixed-length"):
        label_centroid_sums(rd.from_arrow(tbl)).to_pandas()


def test_gate_parity_sf0001(ray_session):
    from engine.queries import REGISTRY, _sql_label_centroids

    fn, _ = REGISTRY["label_centroids"]
    ray_df = (
        fn("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    sql_df = (
        con.sql(_sql_label_centroids())
        .df()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    assert list(ray_df.columns) == list(sql_df.columns)
    for c in ["label", "dim", "sum_q", "cnt"]:
        assert (ray_df[c].to_numpy() == sql_df[c].to_numpy()).all(), c
    np.testing.assert_array_equal(
        ray_df["centroid"].to_numpy(), sql_df["centroid"].to_numpy()
    )
