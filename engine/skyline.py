"""Grouped 2-D Pareto skyline (X64).

Multi-objective dominance selection: within each group, keep every
point not DOMINATED by another point of the same group, where (both
dimensions maximized, duplicates kept)

  q dominates p  <=>  x_q >= x_p  and  y_q >= y_p
                      and (x_q > x_p or y_q > y_p).

This is the dominance member of the selection family: top-k selects
by a single total order, quantile/winsorize by rank, sampling by
hash — the skyline selects by PARTIAL-order maximality, which no
single sort key can express.

Upstream parity: no analogue in GeoCoordinateConverter; brief-mandated
analytics machinery (multi-criteria candidate selection over event
streams — e.g. "frontier of value vs recency" per event type).

Scale shape — local-prune partials, then a group co-partition over
the tiny survivor set:

1. Per block: the vectorized skyline kernel drops every point
   dominated WITHIN the block. Dominance is transitive and local
   dominance implies global dominance, so dropping local losers is
   exact; survivors per block are the block's own skyline (O(log n)
   expected for independent dims; anti-correlated worst case can keep
   many points — documented, the all-survivors case degrades to the
   plain shuffle).
2. ONE co-partition on the group key over the reduced rows; the same
   kernel finishes each group exactly.

Kernel (no per-row loop, no per-group loop): one lexsort by
(group, x desc, y desc); per distinct (group, x) run the max y is the
run's first element; a SEGMENTED prefix max over those run maxima
(reset at group boundaries via an offset trick) yields, for every
point, the max y among same-group points with strictly-greater x
(exclusive, M) and with greater-or-equal x (inclusive, M2); p is
dominated iff M >= y_p (x strictly greater, y >= ) or M2 > y_p
(x >= , y strictly greater).

Contracts (asserted): y values in [0, 2^52) — epoch microseconds
reach 2^52 in year ~2112 — and < 2^11 distinct groups per kernel
call (offset trick headroom: 2^52 * 2^11 = 2^63). Widen the trick to
object-dtype or per-group slices if either ever grows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_Y_LIMIT = np.int64(1) << np.int64(52)
_SENTINEL = np.int64(-1)  # below any valid y (y >= 0)


def skyline_mask(gcodes: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the grouped 2-D skyline (maximize x and y).

    ``gcodes`` are dense int group codes; ``x``/``y`` int64. Duplicate
    points are all kept (neither dominates the other)."""
    n = x.size
    if n == 0:
        return np.zeros(0, dtype=bool)
    if y.min() < 0 or y.max() >= _Y_LIMIT:
        raise ValueError("skyline_mask: y must be in [0, 2^52)")
    n_groups = int(gcodes.max()) + 1 if n else 0
    if n_groups >= (1 << 11):
        raise ValueError("skyline_mask: >= 2^11 distinct groups")
    order = np.lexsort((-y, -x, gcodes))
    g = gcodes[order]
    xs = x[order]
    ys = y[order]
    new_g = np.r_[True, g[1:] != g[:-1]]
    new_gx = new_g | np.r_[False, xs[1:] != xs[:-1]]
    starts = np.flatnonzero(new_gx)
    run_id = np.cumsum(new_gx) - 1
    # y sorted desc within each (g, x) run -> run max is the first row
    run_max = ys[starts]
    # segment id of each run = index of its group (for the reset trick)
    run_seg = np.cumsum(new_g[starts]) - 1
    shifted = run_max + run_seg.astype(np.int64) * _Y_LIMIT
    inc = np.maximum.accumulate(shifted) - run_seg.astype(np.int64) * _Y_LIMIT
    # inclusive prefix max over runs of the same group (x >= current run's x)
    m2 = inc[run_id]
    # exclusive: previous run of the SAME group, else sentinel
    first_run_of_group = new_g[starts]
    exc_runs = np.where(
        first_run_of_group, _SENTINEL, np.r_[_SENTINEL, inc[:-1]]
    )
    m = exc_runs[run_id]
    dominated = (m >= ys) | (m2 > ys)
    keep = np.empty(n, dtype=bool)
    keep[order] = ~dominated
    return keep


_OUT_SCHEMA = pa.schema(
    [
        ("event_type", pa.string()),
        ("cents", pa.int64()),
        ("t", pa.int64()),
    ]
)


def grouped_skyline(
    ds: Dataset,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
    num_partitions: int = 16,
) -> Dataset:
    """Skyline Dataset[group, x, y] — local-prune partials then one
    group co-partition over the survivors. See module docstring."""
    from engine.shuffle import keyed_partition_map

    out_schema = pa.schema(
        [(group_col, pa.string()), (x_col, pa.int64()), (y_col, pa.int64())]
    )

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gcodes, _ = pd.factorize(b[group_col].to_pandas(), sort=False)
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = skyline_mask(gcodes.astype(np.int64), x, y)
        return b.select([group_col, x_col, y_col]).filter(pa.array(keep))

    partials = ds.map_batches(local, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or group_col not in df.columns:
            return pd.DataFrame(
                {
                    group_col: pd.Series(dtype=object),
                    x_col: pd.Series(dtype=np.int64),
                    y_col: pd.Series(dtype=np.int64),
                }
            )
        gcodes, _ = pd.factorize(df[group_col], sort=False)
        keep = skyline_mask(
            gcodes.astype(np.int64),
            df[x_col].to_numpy().astype(np.int64),
            df[y_col].to_numpy().astype(np.int64),
        )
        return df.loc[keep, [group_col, x_col, y_col]]

    return keyed_partition_map(
        partials, [group_col], finish, num_partitions, out_schema=out_schema
    )


def skyline_events(ds_events: Dataset) -> Dataset:
    """Gate pipeline: per event_type, the (value-cents, epoch-us)
    skyline — the frontier of 'highest value' vs 'most recent'."""

    def prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["value"], 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        t = pc.cast(b["ts"], pa.int64())  # timestamp[us] -> epoch us
        return pa.table({"event_type": b["event_type"], "cents": cents, "t": t})

    pts = ds_events.map_batches(prep, batch_format="pyarrow")
    return grouped_skyline(
        pts, group_col="event_type", x_col="cents", y_col="t"
    )


def sql_skyline_events() -> str:
    """DuckDB mirror: the textbook NOT EXISTS dominance anti-join —
    quadratic and plan-free, so agreement checks the engine's
    local-prune + segmented-prefix-max kernel, not a shared plan."""
    return """
WITH pts AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS t
  FROM events)
SELECT p.event_type, p.cents, p.t
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.event_type = p.event_type
    AND q.cents >= p.cents AND q.t >= p.t
    AND (q.cents > p.cents OR q.t > p.t))
"""
