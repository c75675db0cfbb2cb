"""Interval-concurrency sweep (X65): max concurrent intervals per day.

The classic sweep-line stabbing aggregate: each event opens a
half-open interval [s, e) (s = event epoch-us, e = s + duration);
the output is, per UTC day, the MAXIMUM number of simultaneously open
intervals at any instant of that day. This is the order-statistics-
over-TIME family — hopping/daily windows aggregate rows that FALL in
a window; the sweep aggregates a running state (the open count) whose
value at any instant depends on every earlier boundary, so a global
carry must cross partitions.

Semantics (exact):

  boundaries      = {(s, +1)} ∪ {(e, -1)} per interval
  order           = by (t, d) with d = -1 first (half-open: an
                    interval ending at t is closed before one
                    starting at t opens)
  run(i)          = sum of d over boundaries ordered <= i
  max_concur(day) = max over boundaries i with t_i in the day of
                    max(run(i), run(i) - d_i)

`run(i) - d_i` is the running level just BEFORE boundary i — for the
day's first boundary that is the midnight carry-in, so a day whose
first event is an END still reports the overnight plateau. Days with
no boundaries are omitted (their plateau is reported by the day the
plateau's boundaries fall in). Within a tie-run of identical (t, d)
boundaries the prefix VALUES form the same multiset under any
permutation, so the per-day max is deterministic.

Scale shape — the pack_shards two-pass global prefix sum
(engine/analytics.py:897), never a global sort:

1. One map pass emits (t, d) boundary rows (~16 B/row, 2 per event).
2. Per-block combiner: per contiguous t-range, the partial SUM of d —
   `num_partitions` scalars per block; the driver prefix-sums them
   into per-range carry bases (tiny).
3. ONE range co-partition: local sort by (t, d), cumsum + broadcast
   base = exact global running level; per-day max REDUCED inside the
   partition (≤ days-per-range rows leave).
4. A tiny grouped max merges days that straddle range borders.

The DuckDB mirror is the textbook single-ordered-window plan
(SUM(d) OVER (ORDER BY t, d)) — a global sort the engine never does,
so agreement checks the two-pass carry against an independently
ordered computation.

Contracts: t >= 0 (epoch us), duration > 0 (zero-length intervals
would invert the end-before-start tie rule against themselves).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

DAY_US = 86_400_000_000

_OUT_SCHEMA = pa.schema([("day", pa.int64()), ("max_concur", pa.int64())])


def max_concurrency_by_day(
    ds_boundaries: Dataset,
    *,
    t_col: str = "t",
    d_col: str = "d",
    num_partitions: int = 32,
) -> Dataset:
    """Dataset[day, max_concur] from a boundary table (t epoch-us,
    d = +1 open / -1 close). See module docstring."""
    from engine.shuffle import grouped_count_sums, keyed_partition_map

    ds = ds_boundaries.materialize()  # consumed 3x (bounds, partials, tag)
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(t_col), Max(t_col))
    lo, hi = mm[f"min({t_col})"], mm[f"max({t_col})"]
    if lo is None:
        import ray.data as rd

        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    if lo < 0:
        raise ValueError("max_concurrency_by_day: t must be >= 0")
    width = max(1, -(-(hi - lo + 1) // num_partitions))

    def partials(b: pa.Table) -> pa.Table:
        t = b[t_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[d_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = (t - lo) // width
        sums = np.zeros(num_partitions, dtype=np.int64)
        np.add.at(sums, rng, d)
        nz = np.flatnonzero(sums)
        return pa.table({"rng": pa.array(nz), "s": pa.array(sums[nz])})

    pp = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    bases = np.zeros(num_partitions + 1, dtype=np.int64)
    if len(pp):  # ranges whose boundaries all pair up in-block net to 0
        per_rng = pp.groupby("rng")["s"].sum().sort_index()
        np.add.at(
            bases,
            per_rng.index.to_numpy().astype(np.int64) + 1,
            per_rng.to_numpy(),
        )
    bases = np.cumsum(bases)  # bases[r] = net open count entering range r

    def tag(b: pa.Table) -> pa.Table:
        t = b[t_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("_rng", pa.array((t - lo) // width))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or t_col not in df.columns:
            return pd.DataFrame(
                {
                    "day": pd.Series(dtype=np.int64),
                    "max_concur": pd.Series(dtype=np.int64),
                }
            )
        df = df.sort_values([t_col, d_col], kind="stable")
        t = df[t_col].to_numpy().astype(np.int64)
        d = df[d_col].to_numpy().astype(np.int64)
        rng = df["_rng"].to_numpy().astype(np.int64)
        # ranges are contiguous in t, so rng is sorted after the t sort;
        # reset the cumsum at each range run and add its carry base
        cv = np.cumsum(d)
        starts = np.flatnonzero(np.r_[True, rng[1:] != rng[:-1]])
        runlen = np.diff(np.append(starts, len(rng)))
        seg_base = np.repeat(cv[starts] - d[starts], runlen)
        run = bases[rng] + (cv - seg_base)
        m = np.maximum(run, run - d)  # level incl. the pre-boundary plateau
        day = t // DAY_US
        # reduce per day inside the partition (days are contiguous)
        dstarts = np.flatnonzero(np.r_[True, day[1:] != day[:-1]])
        dmax = np.maximum.reduceat(m, dstarts)
        return pd.DataFrame({"day": day[dstarts], "max_concur": dmax})

    reduced = keyed_partition_map(
        tagged, ["_rng"], sweep, num_partitions, out_schema=_OUT_SCHEMA
    )
    agg = grouped_count_sums(
        reduced, "day", max_cols=["max_concur"], num_partitions=8
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"day": b["day"], "max_concur": b["max_max_concur"]})

    return agg.map_batches(finish, batch_format="pyarrow")


def sweep_concurrency_events(ds_events: Dataset) -> Dataset:
    """Gate pipeline: events as intervals [ts, ts + value seconds) at
    millisecond duration precision; per-day max concurrency."""

    def boundaries(b: pa.Table) -> pa.Table:
        s = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        dur_ms = pc.cast(
            pc.round(pc.multiply(b["value"], 1000.0), round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        e = s + dur_ms * 1000
        n = len(s)
        return pa.table(
            {
                "t": pa.array(np.concatenate([s, e])),
                "d": pa.array(
                    np.concatenate(
                        [np.ones(n, np.int64), -np.ones(n, np.int64)]
                    )
                ),
            }
        )

    b = ds_events.map_batches(boundaries, batch_format="pyarrow")
    return max_concurrency_by_day(b)


def sql_sweep_concurrency() -> str:
    """DuckDB mirror: single global ordered window (the plan the
    engine avoids) — SUM(d) OVER (ORDER BY t, d), per-boundary
    pre-plateau via GREATEST(run, run - d), GROUP BY day."""
    return f"""
WITH iv AS (
  SELECT epoch_us(ts) AS s,
         epoch_us(ts) + CAST(ROUND(value * 1000) AS BIGINT) * 1000 AS e
  FROM events),
b AS (
  SELECT s AS t, CAST(1 AS BIGINT) AS d FROM iv
  UNION ALL
  SELECT e AS t, CAST(-1 AS BIGINT) AS d FROM iv),
r AS (
  SELECT t, d,
         SUM(d) OVER (ORDER BY t, d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM b)
SELECT t // {DAY_US} AS day,
       CAST(MAX(GREATEST(run, run - d)) AS BIGINT) AS max_concur
FROM r
GROUP BY t // {DAY_US}
"""
