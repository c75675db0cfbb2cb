"""Beyond-broadcast swap-path parity (round-5 item 1).

Every guarded broadcast in the engine has a co-partitioned /
hash-join swap for corpora whose lookup state outgrows a ray.put
broadcast (the 100 TB cliff VERDICT r4 flagged). These tests force
each swap — both with ``mode='partition'`` explicitly and via the
auto router with the threshold pinned to a tiny value — and assert
bit-identical results against the broadcast leg (the
test_robots.py::test_partition_mode_equals_broadcast template).

Covered sites:
- engine/weburl.py  canonical_url_dedup keeper table
- engine/dedupe.py  line_dedup drop keys
- engine/dedupe.py  exact_substring_dedup dup digests + removal spans
- engine/dedupe.py  jaccard_similarity_join_prefix shingle-df map
- engine/cooc.py    cooc_lift marginals
- engine/bpe.py     bpe_token_counts token->symbol map
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from engine.bpe import bpe_token_counts
from engine.cooc import cooc_lift
from engine.dedupe import (
    exact_substring_dedup,
    jaccard_similarity_join_prefix,
    line_dedup,
)
from engine.weburl import canonical_url_dedup, make_messy_urls_table


def _eq(a, b, keys):
    da = a.to_pandas().sort_values(keys).reset_index(drop=True)
    db = b.to_pandas().sort_values(keys).reset_index(drop=True)
    db = db[da.columns]
    pd.testing.assert_frame_equal(da, db)


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    rng = np.random.default_rng(7)
    pool = [f"line {i} content" for i in range(30)]
    docs = []
    for i in range(120):
        n = rng.integers(1, 12)
        body = [pool[j] for j in rng.integers(0, 30, n)]
        if rng.random() < 0.3:
            body.insert(0, "")
        docs.append("\n".join(body))
    t = pa.table(
        {"doc_id": pa.array(np.arange(120, dtype=np.int64)),
         "text": pa.array(docs)}
    )
    return rd.from_arrow(t).repartition(4).materialize()


@pytest.fixture(scope="module")
def token_docs_ds(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(25)]
    boiler = " ".join(vocab[:12])
    docs = []
    for i in range(150):
        body = " ".join(vocab[j] for j in rng.integers(0, 25, rng.integers(3, 60)))
        if rng.random() < 0.4:
            body = boiler + " " + body
        docs.append(body)
    t = pa.table(
        {"doc_id": pa.array(np.arange(150, dtype=np.int64)),
         "text": pa.array(docs)}
    )
    return rd.from_arrow(t).repartition(4).materialize()


def test_canonical_url_swap(ray_session):
    t = make_messy_urls_table(400)
    ds = rd.from_arrow(t.select(["page_id", "url"])).repartition(5)
    bc = canonical_url_dedup(ds, mode="broadcast")
    for part in (
        canonical_url_dedup(ds, mode="partition", num_partitions=7),
        # auto router with a pinned tiny cap must take the swap, not raise
        canonical_url_dedup(ds, max_broadcast=1, num_partitions=7),
    ):
        _eq(bc, part, ["page_id"])


def test_line_dedup_swap(docs_ds):
    bc = line_dedup(docs_ds, mode="broadcast")
    for part in (
        line_dedup(docs_ds, mode="partition", num_partitions=5),
        line_dedup(docs_ds, max_broadcast_drops=1, num_partitions=5),
    ):
        _eq(bc, part, ["doc_id"])


def test_substr_dedup_swap(token_docs_ds):
    bc = exact_substring_dedup(token_docs_ds, L=8, mode="broadcast",
                               num_partitions=4)
    for part in (
        exact_substring_dedup(token_docs_ds, L=8, mode="partition",
                              num_partitions=4),
        exact_substring_dedup(token_docs_ds, L=8, max_broadcast=1,
                              num_partitions=4),
    ):
        _eq(bc, part, ["doc_id"])


def test_jaccard_prefix_swap(token_docs_ds):
    bc = jaccard_similarity_join_prefix(token_docs_ds, num_partitions=8,
                                        mode="broadcast")
    for part in (
        jaccard_similarity_join_prefix(token_docs_ds, num_partitions=8,
                                       mode="partition"),
        jaccard_similarity_join_prefix(token_docs_ds, num_partitions=8,
                                       max_broadcast_df=1),
    ):
        _eq(bc, part, ["id_a", "id_b"])


def test_cooc_swap(token_docs_ds):
    bc = cooc_lift(token_docs_ds, min_count=3, k=30, mode="broadcast",
                   num_partitions=8)
    for part in (
        cooc_lift(token_docs_ds, min_count=3, k=30, mode="partition",
                  num_partitions=8),
        cooc_lift(token_docs_ds, min_count=3, k=30, broadcast_limit=1,
                  num_partitions=8),
    ):
        _eq(bc, part, ["lift_ppm", "pair_cnt", "left_tok", "right_tok"])


def test_bpe_swap_local_trained(token_docs_ds):
    bc = bpe_token_counts(token_docs_ds, n_merges=4, mode="broadcast")
    for part in (
        bpe_token_counts(token_docs_ds, n_merges=4, mode="partition",
                         num_partitions=4),
        bpe_token_counts(token_docs_ds, n_merges=4, broadcast_limit=1,
                         num_partitions=4),
    ):
        _eq(bc, part, ["doc_id"])


def test_bpe_swap_distributed_trained(token_docs_ds, monkeypatch):
    import engine.bpe as bpe_mod

    monkeypatch.setattr(bpe_mod, "LOCAL_VOCAB_LIMIT", 0)
    bc = bpe_token_counts(token_docs_ds, n_merges=4, mode="broadcast")
    part = bpe_token_counts(token_docs_ds, n_merges=4, mode="partition",
                            num_partitions=4)
    _eq(bc, part, ["doc_id"])


def test_bad_mode_raises(docs_ds):
    for fn, kw in (
        (line_dedup, {}),
        (exact_substring_dedup, {}),
        (cooc_lift, {}),
        (bpe_token_counts, {}),
        (jaccard_similarity_join_prefix, {}),
    ):
        with pytest.raises(ValueError, match="unknown mode"):
            fn(docs_ds, mode="bogus", **kw).materialize()
    with pytest.raises(ValueError, match="unknown mode"):
        ds = rd.from_arrow(make_messy_urls_table(10).select(["page_id", "url"]))
        canonical_url_dedup(ds, mode="bogus").materialize()
