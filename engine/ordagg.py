"""Order-sensitive grouped aggregation (X68): string_agg / collect
in a caller-specified per-group ORDER.

Every other aggregate in the engine is COMMUTATIVE — count/sum/min/
max/moments combine per-block partials in any arrival order. The
ordered-concatenation family (SQL's string_agg(x, sep ORDER BY o),
collect_list) is the non-commutative member: the result depends on a
total order WITHIN each group, so block partials cannot merge without
carrying their order metadata. The exact shape used here:

1. Prune to (key, order, value) rows — values ride the shuffle, but
   callers aggregate short atoms (ids, codes, tokens), never
   documents; the output size is the group's own payload, which is
   the operator's contract (an ordered concat IS its group's data).
2. ONE key co-partition; within the partition one vectorized
   lexsort by (key, order), group offsets via run boundaries, and a
   single pyarrow ``binary_join`` over a ListArray built from those
   offsets — no per-group Python loop, the join is one Arrow kernel.

Determinism contract: ``order_col`` must be UNIQUE within each group
(asserted loudly) — with duplicate order keys the concatenation of
the tied values would be engine-dependent, exactly why SQL's
string_agg without a unique ORDER BY is nondeterministic.

Upstream parity: no analogue in GeoCoordinateConverter; brief-mandated
reporting machinery (per-entity ordered rollups: per-host URL lists,
per-shard manifest lines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def grouped_string_agg(
    ds: Dataset,
    *,
    key_col: str,
    order_col: str,
    val_col: str,
    sep: str = ",",
    num_partitions: int = 32,
) -> Dataset:
    """Dataset[key, n, agg] — ``agg`` = values joined by ``sep`` in
    ascending ``order_col`` order within each key; ``n`` = group size.
    See module docstring for the shape and the uniqueness contract."""
    from engine.shuffle import keyed_partition_map

    out_schema = pa.schema(
        [(key_col, pa.string()), ("n", pa.int64()), ("agg", pa.string())]
    )

    def concat(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or key_col not in df.columns:
            return pd.DataFrame(
                {
                    key_col: pd.Series(dtype=object),
                    "n": pd.Series(dtype=np.int64),
                    "agg": pd.Series(dtype=object),
                }
            )
        df = df.sort_values([key_col, order_col], kind="stable")
        o = df[order_col].to_numpy()
        k = df[key_col].to_numpy()
        new_k = np.r_[True, k[1:] != k[:-1]]
        if bool((~new_k[1:] & (o[1:] == o[:-1])).any() if len(o) > 1 else False):
            raise ValueError(
                "grouped_string_agg: order_col not unique within a group"
            )
        starts = np.flatnonzero(new_k)
        counts = np.diff(np.append(starts, len(k)))
        offsets = np.zeros(len(starts) + 1, np.int64)
        offsets[1:] = np.cumsum(counts)
        vals = pa.array(df[val_col].to_numpy(), pa.string())
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), vals
        )
        joined = pc.binary_join(lists, sep)
        return pd.DataFrame(
            {
                key_col: k[starts],
                "n": counts.astype(np.int64),
                "agg": joined.to_numpy(zero_copy_only=False),
            }
        )

    return keyed_partition_map(
        ds, [key_col], concat, num_partitions, out_schema=out_schema
    )


def string_agg_orders(ds_orders: Dataset) -> Dataset:
    """Gate pipeline: per order-priority, the comma-joined ascending
    list of its order keys (and the group size) — a per-group result
    whose VALUE depends on the within-group order end to end."""

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prio": b["o_orderpriority"],
                "ok": b["o_orderkey"],
                "val": pc.cast(b["o_orderkey"], pa.string()),
            }
        )

    rows = ds_orders.map_batches(prep, batch_format="pyarrow")
    return grouped_string_agg(
        rows, key_col="prio", order_col="ok", val_col="val"
    )


def sql_string_agg_orders() -> str:
    """DuckDB mirror: the builtin ordered string_agg — one hash
    aggregate with an ORDER BY clause the engine reproduces via its
    co-partition lexsort + Arrow list join."""
    return """
SELECT o_orderpriority AS prio,
       CAST(COUNT(*) AS BIGINT) AS n,
       string_agg(CAST(o_orderkey AS VARCHAR), ','
                  ORDER BY o_orderkey) AS agg
FROM orders
GROUP BY o_orderpriority
"""
