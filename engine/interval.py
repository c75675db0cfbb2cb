"""Distributed interval (range) join: points to half-open intervals.

The upstream reference (mrihtar/GeoCoordinateConverter) has no range
join; with as-of (engine/asof.py) and windowed aggregates
(engine/windows.py) this completes the brief's custom non-equi join
family. Matches the SQL predicate ``p.value >= i.lo AND p.value <
i.hi`` (half-open — an interval's ``hi`` belongs to the next one).

Ray-Data-first shape — binned replication instead of a cross join:
- each interval is replicated to every fixed-width bin it overlaps
  (vectorized ``np.repeat`` inside map_batches; replication factor =
  interval span / bin_width, so size ``bin_width`` near the typical
  interval span to keep it O(1) per interval);
- each point lands in exactly ONE bin (``floor(value / bin_width)``);
- one hash co-partition shuffle on the bin id (the asof/hash_join
  union pattern), then a per-partition vectorized pandas merge on the
  bin followed by the range filter. A (point, interval) pair can only
  meet in the point's own bin, so no post-join dedup is needed.

Partitioning assumption (custom-operator contract): per-bin work is
points_in_bin x intervals_overlapping_bin before the filter —
``bin_width`` is the skew knob. A value hot-spot concentrates points
in one bin; unlike equality keys it CAN be split by lowering
``bin_width`` (more bins, fewer rows each), at the cost of replicating
long intervals to more bins. At 100 TB pick ``bin_width`` from a
sampled value histogram (engine/shuffle.sampled_key_histogram idiom).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def interval_join(
    points: Dataset,
    intervals: Dataset,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    bin_width: float = 1.0,
    num_partitions: int = 32,
) -> Dataset:
    """Inner-join ``points`` to every interval with
    ``lo <= point[value] < hi`` (see module docstring for the
    binned-replication shape and the skew contract).

    ``intervals`` must be projected to ``[lo, hi] + payload`` with
    names disjoint from the point columns. Output = point columns +
    ``lo``/``hi`` + interval payload; a point matching k intervals
    emits k rows, an unmatched point emits none (inner semantics).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    p_schema, i_schema = points.schema(), intervals.schema()
    p_cols = list(p_schema.names)
    i_cols = list(i_schema.names)
    if value not in p_cols:
        raise ValueError(f"value column {value!r} missing from points")
    if lo not in i_cols or hi not in i_cols:
        raise ValueError(f"interval side needs {lo!r} and {hi!r} columns")
    overlap = set(i_cols) & set(p_cols)
    if overlap:
        raise ValueError(f"interval columns collide with point columns: {overlap}")
    p_types = dict(zip(p_schema.names, p_schema.types))
    i_types = dict(zip(i_schema.names, i_schema.types))
    out_cols = p_cols + i_cols
    out_schema = pa.schema(
        [(c, p_types[c]) for c in p_cols] + [(c, i_types[c]) for c in i_cols]
    )
    bw = float(bin_width)

    def tag_points(batch: pa.Table) -> pa.Table:
        v = batch[value].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v / bw).astype(np.int64)
        batch = batch.append_column("_bin", pa.array(b)).append_column(
            "_side", pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        )
        for c in i_cols:
            batch = batch.append_column(c, pa.nulls(batch.num_rows, i_types[c]))
        return batch.select(out_cols + ["_bin", "_side"])

    def tag_intervals(batch: pa.Table) -> pa.Table:
        lo_v = batch[lo].to_numpy(zero_copy_only=False).astype(np.float64)
        hi_v = batch[hi].to_numpy(zero_copy_only=False).astype(np.float64)
        if np.any(hi_v < lo_v):
            raise ValueError("interval with hi < lo")
        first = np.floor(lo_v / bw).astype(np.int64)
        # floor(hi/bw) over-replicates by one dead bin when hi sits
        # exactly on a boundary — harmless (the range filter drops the
        # pair); under-replication would be a correctness bug.
        last = np.floor(hi_v / bw).astype(np.int64)
        counts = last - first + 1
        idx = np.repeat(np.arange(batch.num_rows), counts)
        offs = np.arange(counts.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        bins = first[idx] + offs
        rep = batch.take(pa.array(idx))
        rep = rep.append_column("_bin", pa.array(bins)).append_column(
            "_side", pa.array(np.ones(len(idx), dtype=np.int8))
        )
        for c in p_cols:
            rep = rep.append_column(c, pa.nulls(len(idx), p_types[c]))
        return rep.select(out_cols + ["_bin", "_side"])

    pt = points.map_batches(tag_points, batch_format="pyarrow")
    it = intervals.map_batches(tag_intervals, batch_format="pyarrow")
    both = pt.union(it)

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        p = df.loc[df["_side"] == 0, p_cols + ["_bin"]]
        i = df.loc[df["_side"] == 1, i_cols + ["_bin"]]
        if len(p) == 0 or len(i) == 0:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols}).head(0)
        m = p.merge(i, on="_bin")  # candidates: same bin only
        v = m[value].to_numpy(dtype=np.float64)
        keep = (v >= m[lo].to_numpy(dtype=np.float64)) & (
            v < m[hi].to_numpy(dtype=np.float64)
        )
        return m.loc[keep, out_cols]

    from engine.shuffle import keyed_partition_map

    return keyed_partition_map(
        both, ["_bin"], part_fn, num_partitions=num_partitions, out_schema=out_schema
    )
