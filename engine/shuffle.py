"""Shuffle-minimizing aggregation helpers (SURVEY.md §2.5 A1, §4 skew).

Web-data cell distributions are Zipfian (city cells ≫ rural), so a
bare ``groupby("cell")`` shuffles every row and hot keys land on one
reducer. The combiner pattern here pre-aggregates *inside*
``map_batches`` — one output row per (key, batch) — so the wide
shuffle moves only partials. This is strictly stronger than key
salting for algebraic aggregates (count/sum/min/max/mean): the
pre-aggregated stream is already salt-partitioned by block, and the
final groupby touches ~keys×blocks rows instead of all rows.

``salted_groupby_count`` additionally demonstrates explicit
(key, salt) two-phase aggregation for consumers that need the salting
shape itself (north_rule "explicit H3-cell salting").
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Sum


def _combine_batch(
    batch: pa.Table, key: str, sum_cols: Sequence[str]
) -> pa.Table:
    """Per-batch partial aggregation: one row per key with count +
    per-column sums (+ min/max piggybacked as sums-compatible cols)."""
    keys = batch[key]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    karr = keys.to_numpy(zero_copy_only=False)
    uniq, inv, counts = np.unique(karr, return_inverse=True, return_counts=True)
    cols: dict[str, pa.Array] = {
        key: pa.array(uniq),
        "_cnt": pa.array(counts.astype(np.int64)),
    }
    for c in sum_cols:
        v = batch[c]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vn = v.to_numpy(zero_copy_only=False).astype(np.float64)
        sums = np.zeros(len(uniq))
        np.add.at(sums, inv, vn)
        cols[f"_sum_{c}"] = pa.array(sums)
    return pa.table(cols)


def grouped_count_sums(
    ds: Dataset, key: str, sum_cols: Sequence[str] = (), mean_cols: Sequence[str] = ()
) -> Dataset:
    """count + sums + means per key with per-batch combining.

    Output columns: ``key, cnt, sum_<c>..., mean_<c>...``.
    """
    sum_all = tuple(dict.fromkeys(tuple(sum_cols) + tuple(mean_cols)))
    partials = ds.map_batches(
        _combine_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(key=key, sum_cols=sum_all),
    )
    aggs = [Sum("_cnt", alias_name="cnt")]
    for c in sum_all:
        aggs.append(Sum(f"_sum_{c}", alias_name=f"sum_{c}"))
    out = partials.groupby(key).aggregate(*aggs)

    if mean_cols:
        def add_means(batch: pa.Table) -> pa.Table:
            cnt = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in mean_cols:
                s = batch[f"sum_{c}"].to_numpy(zero_copy_only=False)
                batch = batch.append_column(f"mean_{c}", pa.array(s / cnt))
            drop = [f"sum_{c}" for c in mean_cols if c not in tuple(sum_cols)]
            return batch.drop_columns(drop) if drop else batch

        out = out.map_batches(add_means, batch_format="pyarrow")
    return out


def salted_groupby_count(ds: Dataset, key: str, salts: int = 16) -> Dataset:
    """Explicit two-phase (key, salt) -> key count aggregation.

    Phase 1 groups on (key, salt % S) so a hot key's rows split over S
    reducers; phase 2 groups the S partial rows per key. Returns
    ``key, cnt``."""

    def add_salt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        salt = (np.arange(n, dtype=np.int64) % salts).astype(np.int32)
        return batch.select([key]).append_column("_salt", pa.array(salt))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    phase1 = salted.groupby([key, "_salt"]).aggregate(Count(alias_name="_c"))
    return phase1.groupby(key).aggregate(Sum("_c", alias_name="cnt"))


def topk(ds: Dataset, col: str, k: int, descending: bool = True) -> Dataset:
    """Top-k by column (A4): sort + limit (Ray's sort is a shuffle;
    inputs here are already reduced aggregates, so it's small)."""
    return ds.sort(col, descending=descending).limit(k)
