"""Rolling-window distinct users (X71): trailing 7-day active users
per day (WAU) — the SLIDING-window member of the distinct family.

cohort_retention counts distinct users per (cohort, offset) bucket;
distinct_users_per_type per categorical key. The engagement report
every event pipeline serves is the TRAILING window: wau(day) =
|{users active in the 7 days ENDING at day}| — overlapping windows,
so a plain groupby cannot express it; the exact shape:

1. Per block: distinct (user, day) pairs (packed-key np.unique — the
   cohort kernel; the shuffle moves ~16 B/pair deduped rows).
2. Replicate each pair to its 7 covering window-days (np.repeat,
   bounded x7 of the DEDUPED pairs, never events).
3. ONE window-day co-partition: packed (wday, user) np.unique
   re-dedups across blocks (a user active twice inside one window
   counts once), run-boundary reduceat counts per wday.

Output days = every window-day reachable from an active day (i.e.
trailing windows that contain at least one active day, including up
to 6 days after the last activity). The DuckDB mirror replicates via
unnest(range(0,7)) + COUNT(DISTINCT) — hash-distinct vs the engine's
packed-unique co-partition.

Contracts: user_id in [0, 2^43), day index in [0, 2^20 - 7) — the
cohort packing.

Upstream parity: no analogue in GeoCoordinateConverter; brief-mandated
event-analytics machinery (engagement curves over web activity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

DAY_US = 86_400_000_000
WINDOW = 7

_OUT = pa.schema([("day", pa.int64()), ("wau", pa.int64())])


def rolling_active_users(
    ds_events: Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = WINDOW,
    num_partitions: int = 32,
) -> Dataset:
    """Dataset[day, wau] — distinct users active in the trailing
    ``window_days`` ending at each day. See module docstring."""
    from engine.shuffle import keyed_partition_map

    w = int(window_days)

    def pairs(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        d = ts.astype(np.int64) // DAY_US
        if len(u) and (u.min() < 0 or u.max() >= (1 << 43) or d.min() < 0
                       or d.max() >= (1 << 20) - w):
            raise ValueError("rolling_active_users: packing contract")
        key = np.unique((u << np.int64(20)) | d)
        u = key >> np.int64(20)
        d = key & np.int64((1 << 20) - 1)
        # replicate the DEDUPED pair to its w covering window-days
        wday = np.repeat(d, w) + np.tile(np.arange(w, dtype=np.int64), len(d))
        return pa.table({"wday": wday, "user": np.repeat(u, w)})

    rep = ds_events.map_batches(pairs, batch_format="pyarrow")

    def count(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "wday" not in df.columns:
            return pd.DataFrame(
                {"day": pd.Series(dtype=np.int64), "wau": pd.Series(dtype=np.int64)}
            )
        wd = df["wday"].to_numpy().astype(np.int64)
        u = df["user"].to_numpy().astype(np.int64)
        key = np.unique((u << np.int64(20)) | wd)  # across-block re-dedup
        wd = key & np.int64((1 << 20) - 1)
        order = np.argsort(wd, kind="stable")
        wd = wd[order]
        starts = np.flatnonzero(np.r_[True, wd[1:] != wd[:-1]])
        cnt = np.diff(np.append(starts, len(wd)))
        return pd.DataFrame({"day": wd[starts], "wau": cnt.astype(np.int64)})

    return keyed_partition_map(
        rep, ["wday"], count, num_partitions, out_schema=_OUT
    )


def sql_rolling_active_users(window_days: int = WINDOW) -> str:
    """DuckDB mirror: replicate distinct activity pairs to their
    window-days via unnest(range) and COUNT(DISTINCT) — hash-distinct
    vs the engine's packed-unique co-partition."""
    return f"""
WITH act AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // {DAY_US} AS d
  FROM events)
SELECT act.d + ks.k AS day,
       CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS wau
FROM act, (SELECT unnest(range(0, {int(window_days)})) AS k) ks
GROUP BY act.d + ks.k
"""
