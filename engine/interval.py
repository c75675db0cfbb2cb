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
    broadcast_threshold: int = 65_536,
) -> Dataset:
    """Inner-join ``points`` to every interval with
    ``lo <= point[value] < hi`` (see module docstring for the
    binned-replication shape and the skew contract).

    ``intervals`` must be projected to ``[lo, hi] + payload`` with
    names disjoint from the point columns. Output = point columns +
    ``lo``/``hi`` + interval payload; a point matching k intervals
    emits k rows, an unmatched point emits none (inner semantics).

    Small interval side (count <= ``broadcast_threshold``): the
    interval table is collected ONCE, a CSR bin->intervals index is
    built and ``ray.put`` into the object store, and every point batch
    resolves matches locally — zero shuffle, the points never move
    (the broadcast_lookup / GridPipIndex pattern). Above the threshold
    the co-partition shuffle path runs; both paths are value-identical
    (pytest-parametrized equivalence).
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

    # Skip the full-pass count probe when the caller already forced
    # the shuffle path (broadcast_threshold=0).
    if broadcast_threshold > 0 and intervals.count() <= broadcast_threshold:
        return _interval_join_broadcast(
            points, intervals, value, lo, hi, bw, out_schema, p_cols, i_cols
        )

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


def _interval_join_broadcast(
    points: Dataset,
    intervals: Dataset,
    value: str,
    lo: str,
    hi: str,
    bw: float,
    out_schema: pa.Schema,
    p_cols: list,
    i_cols: list,
) -> Dataset:
    """Small-interval-side path: collect the interval table once
    (bounded by broadcast_threshold rows), build a CSR bin->interval
    candidate index, ship it through the object store with ``ray.put``
    (ONE copy per node, not per batch/task), and resolve matches
    inside ``map_batches`` — the points never shuffle."""
    import ray

    itab = pa.concat_tables(
        [t for t in (ray.get(r) for r in intervals.to_arrow_refs()) if t.num_columns]
    )
    lo_v = itab[lo].to_numpy(zero_copy_only=False).astype(np.float64)
    hi_v = itab[hi].to_numpy(zero_copy_only=False).astype(np.float64)
    if np.any(hi_v < lo_v):
        raise ValueError("interval with hi < lo")
    if len(lo_v) == 0:
        empty = out_schema.empty_table()
        return points.map_batches(
            lambda b: empty, batch_format="pyarrow"
        )
    first = np.floor(lo_v / bw).astype(np.int64)
    last = np.floor(hi_v / bw).astype(np.int64)  # over-replication OK (see shuffle path)
    counts = last - first + 1
    rep_iid = np.repeat(np.arange(len(lo_v)), counts)
    offs = np.arange(counts.sum()) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    rep_bin = first[rep_iid] + offs
    # CSR over the OCCUPIED bin range [bin_min, bin_max]: indptr maps a
    # point's bin to its candidate interval ids. Dense indptr is fine —
    # its size is total replicated entries' bin span, bounded by
    # broadcast_threshold * max span / bw (caller-sized via bin_width).
    order = np.argsort(rep_bin, kind="stable")
    rep_bin, rep_iid = rep_bin[order], rep_iid[order]
    bin_min, bin_max = int(rep_bin[0]), int(rep_bin[-1])
    indptr = np.searchsorted(rep_bin, np.arange(bin_min, bin_max + 2))
    index_ref = ray.put((bin_min, bin_max, indptr, rep_iid, lo_v, hi_v, itab))

    def lookup(batch: pa.Table) -> pa.Table:
        bmin, bmax, iptr, iids, lov, hiv, itbl = ray.get(index_ref)
        v = batch[value].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v / bw).astype(np.int64)
        inside = (b >= bmin) & (b <= bmax)
        bi = b[inside] - bmin
        starts, ends = iptr[bi], iptr[bi + 1]
        cand_counts = ends - starts
        p_idx_inside = np.flatnonzero(inside)
        p_idx = np.repeat(p_idx_inside, cand_counts)
        coffs = np.arange(cand_counts.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(cand_counts)[:-1])), cand_counts
        )
        cand = iids[np.repeat(starts, cand_counts) + coffs]
        keep = (v[p_idx] >= lov[cand]) & (v[p_idx] < hiv[cand])
        p_idx, cand = p_idx[keep], cand[keep]
        out = batch.take(pa.array(p_idx))
        itaken = itbl.take(pa.array(cand))
        for c in i_cols:
            out = out.append_column(c, itaken[c])
        return out.select(out_schema.names).cast(out_schema)

    return points.map_batches(lookup, batch_format="pyarrow")
