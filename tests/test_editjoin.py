"""X66 edit-distance-join tests: scalar-DP reference for the batch
kernel, full-join brute oracle on a planted-edit corpus (insert /
delete / substitute at every position class, short-bucket keys,
duplicate input rows), ASCII + length contracts, layout invariance,
and sf0.001 DuckDB levenshtein() mirror parity of the gate."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.editjoin import (
    _pad_matrix,
    edit_distance_join,
    levenshtein_batch,
    sql_edit_join_docs,
)

SF = "/root/testdata/sf0.001"


def _py_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp = dp, [i] + [0] * lb
        for j in range(1, lb + 1):
            dp[j] = min(
                prev[j] + 1, dp[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
    return dp[lb]


def test_levenshtein_batch_vs_scalar():
    random.seed(3)
    alpha = "abcd"
    pairs = [
        (
            "".join(random.choices(alpha, k=random.randint(0, 12))),
            "".join(random.choices(alpha, k=random.randint(0, 12))),
        )
        for _ in range(300)
    ]
    am, al = _pad_matrix(np.array([p[0] for p in pairs], object))
    bm, bl = _pad_matrix(np.array([p[1] for p in pairs], object))
    got = levenshtein_batch(am, al, bm, bl)
    exp = np.array([_py_lev(a, b) for a, b in pairs])
    np.testing.assert_array_equal(got, exp)


def test_contracts():
    with pytest.raises(UnicodeEncodeError):
        _pad_matrix(np.array(["café"], object))
    with pytest.raises(ValueError):
        _pad_matrix(np.array(["x" * 65], object))


def _planted_corpus():
    random.seed(19)
    alpha = "abcdef"
    base = [
        "".join(random.choices(alpha, k=random.randint(0, 14)))
        for _ in range(250)
    ]
    extra = []
    for s in random.sample([b for b in base if len(b) >= 3], 50):
        i = random.randrange(len(s))
        extra.append(s[:i] + random.choice(alpha) + s[i:])  # insert
        extra.append(s[:i] + s[i + 1 :])  # delete
        extra.append(s[:i] + random.choice(alpha) + s[i + 1 :])  # substitute
    # short-bucket keys (len <= 2D+1) incl. the empty string
    return base + extra + ["", "a", "ab", "abc", "abcd", "abcde"]


def _brute_pairs(keys):
    uniq = sorted(set(keys))
    out = set()
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            dv = _py_lev(uniq[i], uniq[j])
            if dv <= 2:
                out.add((uniq[i], uniq[j], dv))
    return out


@pytest.fixture(scope="module")
def corpus(ray_session):
    keys = _planted_corpus()
    # duplicate every row: the DISTINCT stage must collapse them
    ds = rd.from_arrow(pa.table({"key": keys * 2})).repartition(6)
    return keys, ds


def test_edit_join_vs_brute(corpus):
    keys, ds = corpus
    out = edit_distance_join(ds, max_dist=2, num_partitions=8).to_pandas()
    got = set(zip(out.ka, out.kb, out.dist))
    exp = _brute_pairs(keys)
    assert len(exp) > 300  # the plant is live
    assert sum(1 for a, _b, _d in exp if len(a) <= 5) > 5  # short bucket live
    assert got == exp
    assert len(out) == len(exp)  # duplicate-free


def test_edit_join_layout_invariance(corpus):
    keys, ds = corpus
    a = edit_distance_join(ds, max_dist=2, num_partitions=8).to_pandas()
    b = edit_distance_join(
        ds.repartition(2), max_dist=2, num_partitions=3
    ).to_pandas()
    key = lambda df: df.sort_values(["ka", "kb"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a), key(b))


def test_edit_join_d1(corpus):
    keys, ds = corpus
    out = edit_distance_join(ds, max_dist=1, num_partitions=8).to_pandas()
    exp = {(a, b, dv) for a, b, dv in _brute_pairs(keys) if dv <= 1}
    assert set(zip(out.ka, out.kb, out.dist)) == exp


def test_edit_join_gate_sql_parity_sf0001(ray_session):
    from engine.queries import q_edit_join_docs

    ray_df = (
        q_edit_join_docs(SF)
        .to_pandas()
        .sort_values(["ka", "kb"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    sql_df = (
        con.sql(sql_edit_join_docs())
        .df()
        .sort_values(["ka", "kb"])
        .reset_index(drop=True)
    )
    assert len(ray_df) > 0
    pd.testing.assert_frame_equal(
        ray_df, sql_df.astype({"dist": np.int64})
    )
