"""Cohort retention analysis (X63).

The standard product/web-analytics retention triangle: bucket every
user by the period of their FIRST event (their cohort), then count
how many of each cohort are active again k periods later —
``(cohort, period_offset) -> n_users``. This is the reporting
counterpart of the sequence family (sessionize orders events inside a
user, funnel matches staged sequences; cohort aggregates ACROSS
users by first-touch age).

Semantics (exact, layout-independent):

  period(e)        = epoch_us(ts) // PERIOD_US   (integer floor)
  cohort(u)        = min over u's events of period(e)
  active(u, p)     = u has >= 1 event in period p
  out(c, k)        = |{u : cohort(u) = c and active(u, c + k)}|

Upstream parity: no analogue in GeoCoordinateConverter; brief-mandated
event-analytics machinery (the across-user aggregation member of the
§2.7 window family).

Scale shape — ONE corpus-scale shuffle:

1. Per block: distinct (user, period) pairs (np.unique on the packed
   key) — the shuffle moves ~16 B/pair deduped rows, never events.
2. ONE user co-partition: per user (sorted runs + reduceat-min), the
   cohort is the first period; each distinct (user, period) row emits
   one (cohort, offset) row. A user contributes at most one row per
   offset, so the downstream count of rows IS the distinct-user
   count — no second distinct pass.
3. A combiner rollup (grouped_count_sums) on the tiny
   (cohort, offset) table.

The DuckDB mirror computes DISTINCT pairs, a per-user MIN, a join and
a COUNT(*) — four relational ops vs the engine's fused single
co-partition; agreement checks the fusion.

Contracts: non-negative epoch timestamps; the packed distinct key
needs user_id < 2^43 and period index < 2^20 (day periods reach year
~4840) — widen to a two-column np.unique if either ever grows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

PERIOD_US = 86_400_000_000  # 1 day

_OUT_SCHEMA = pa.schema(
    [("cohort", pa.int64()), ("offset", pa.int64())]
)


def cohort_retention(
    ds_events: Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = PERIOD_US,
    num_partitions: int = 32,
) -> Dataset:
    """Retention triangle Dataset[cohort, offset, n_users]. See module
    docstring for semantics and the distributed shape."""
    from engine.shuffle import grouped_count_sums, keyed_partition_map

    def pairs(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        p = ts.astype(np.int64) // period_us
        # packing contract (rolling_active_users precedent): an
        # out-of-range user/period would silently corrupt packed keys
        # and miscount retention — fail loudly instead
        if len(u) and (u.min() < 0 or u.max() >= (1 << 43)
                       or p.min() < 0 or p.max() >= (1 << 20)):
            raise ValueError("cohort_retention: packing contract "
                             "(user_id in [0, 2^43), period in [0, 2^20))")
        # per-block distinct (user, period): packed key unique
        key = np.unique((u << np.int64(20)) | p)
        return pa.table(
            {
                "user": pa.array(key >> np.int64(20)),
                "period": pa.array(key & np.int64((1 << 20) - 1)),
            }
        )

    dp = ds_events.map_batches(pairs, batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "user" not in df.columns:
            return pd.DataFrame(
                {
                    "cohort": pd.Series(dtype=np.int64),
                    "offset": pd.Series(dtype=np.int64),
                }
            )
        u = df["user"].to_numpy()
        p = df["period"].to_numpy()
        # re-dedup across blocks, then per-user min via sorted runs
        key = np.unique((u << np.int64(20)) | p)
        u = key >> np.int64(20)
        p = key & np.int64((1 << 20) - 1)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        # sorted ascending within user -> first period is the min
        cohort = np.repeat(p[starts], np.diff(np.r_[starts, u.size]))
        return pd.DataFrame({"cohort": cohort, "offset": p - cohort})

    rows = keyed_partition_map(
        dp, ["user"], per_user, num_partitions, out_schema=_OUT_SCHEMA
    )
    agg = grouped_count_sums(rows, ["cohort", "offset"], num_partitions=8)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {"cohort": b["cohort"], "offset": b["offset"], "n_users": b["cnt"]}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_cohort_retention(period_us: int = PERIOD_US) -> str:
    """DuckDB mirror: DISTINCT activity pairs, per-user MIN cohort,
    join, COUNT(*) — independently ordered relational plan."""
    return f"""
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // CAST({period_us} AS BIGINT) AS BIGINT) AS p
  FROM events),
coh AS (
  SELECT user_id, MIN(p) AS c FROM act GROUP BY user_id)
SELECT coh.c AS cohort, act.p - coh.c AS "offset",
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM act JOIN coh ON act.user_id = coh.user_id
GROUP BY coh.c, act.p - coh.c
"""
