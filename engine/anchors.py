"""Inbound anchor-text aggregation (X48): for every link target, the
top-k inbound anchor phrases with exact counts — the classic web-graph
quality/topic signal (anchor text is how the REST of the web describes
a page; search and curation pipelines aggregate it per target).

Upstream parity: no analogue in GeoCoordinateConverter — brief-
mandated web-graph infrastructure (the X33/X37 link-graph family; the
per-group top-k shape generalizes `topk_per_type` to grouped STRING
keys with exact tie order).

Scale shape: edges (src, dst, anchor) never carry document text; the
(dst, anchor) count reduction is `grouped_count_sums` (per-block
combiner partials — a hot (dst, anchor) pair contributes one partial
row per block; `salts` protection available there), and the per-dst
top-k is one dst-keyed coarse co-partition over COUNT rows (distinct
(dst, anchor) pairs, already reduced — far below edge scale), with a
C-speed sort + cumcount inside each partition. Total order
(cnt DESC, anchor ASC) makes the output repartition-deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from engine.graph import EDGE_A, EDGE_B
from engine.shuffle import grouped_count_sums, keyed_partition_map

# Anchor phrase vocabulary — the SQL mirror indexes the same list as a
# DuckDB list literal (1-based); change together.
ANCHOR_VOCAB = (
    "home docs blog press about research product download paper talk "
    "archive news forum wiki help"
).split()


def derive_anchor_edges(
    nodes: Dataset, num_nodes: int, id_col: str = "doc_id", out_degree: int = 4
) -> Dataset:
    """Deterministic anchored link edges: the X33 LCG arms for dst,
    anchor phrase index = (dst + 13 * ((src + arm) % 5)) % |V| — so
    each target sees at most 5 distinct anchors with skewed counts
    (live top-k ties included). One map, no shuffle."""
    a = np.array(EDGE_A[:out_degree], np.int64)
    b = np.array(EDGE_B[:out_degree], np.int64)
    vocab = np.array(ANCHOR_VOCAB, dtype=object)
    nv = np.int64(len(vocab))

    def fn(batch: pa.Table) -> pa.Table:
        src = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = np.repeat(src, out_degree)
        dst = ((src[:, None] * a[None, :] + b[None, :]) % np.int64(num_nodes)).reshape(
            -1
        )
        arm = np.tile(np.arange(out_degree, dtype=np.int64), len(src))
        aidx = (dst + 13 * ((srcs + arm) % 5)) % nv
        return pa.table(
            {
                "src": pa.array(srcs),
                "dst": pa.array(dst),
                "anchor": pa.array(vocab[aidx], pa.string()),
            }
        )

    return nodes.map_batches(fn, batch_format="pyarrow")


def anchor_topk(
    edges: Dataset, k: int = 3, num_partitions: int = 32, salts: int | str = 1
) -> Dataset:
    """Top-k inbound anchors per dst with exact counts and rank.

    Output: (dst, rank 1..k, anchor, cnt), total order
    (cnt DESC, anchor ASC) per dst."""
    counts = grouped_count_sums(
        edges.select_columns(["dst", "anchor"]),
        key=["dst", "anchor"],
        num_partitions=num_partitions,
        salts=salts,
    )

    def topk_part(df):
        df = df.sort_values(
            ["dst", "cnt", "anchor"],
            ascending=[True, False, True],
            kind="stable",
        )
        df["rank"] = df.groupby("dst", sort=False).cumcount() + 1
        return df[df["rank"] <= k][["dst", "rank", "anchor", "cnt"]]

    out_schema = pa.schema(
        [
            pa.field("dst", pa.int64()),
            pa.field("rank", pa.int64()),
            pa.field("anchor", pa.string()),
            pa.field("cnt", pa.int64()),
        ]
    )
    return keyed_partition_map(
        counts,
        ["dst"],
        topk_part,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )
