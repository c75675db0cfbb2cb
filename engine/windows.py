"""Stream-shaped windowed operators over the events log
(SURVEY.md §2.7; ray_guide streaming-shaped workloads).

Ray Data has no event-time windowing; the engine's contract is the
ordered-partitioned-log shape: partition by key (groupby shuffles),
sort within partition by (ts, event_id), window with vectorized pandas
inside map_groups. Ordering assumption: (ts, event_id) is a total
order per key — stated here and mirrored in the oracle SQL's ORDER BY.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def sessionize(
    ds: Dataset,
    gap_ms: int = 30 * 60 * 1000,
    key: str = "user_id",
    ts_col: str = "ts",
) -> Dataset:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_ms``. Returns one
    row per (key, session_id) with n_events + duration_ms. session_id
    is the 1-based cumulative count of session starts in (ts,
    event_id) order — exactly SQL's SUM(new_session) OVER (...)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"], kind="stable")
        ts = g[ts_col].astype("datetime64[us]").astype(np.int64) // 1000  # ms
        gap = np.diff(ts, prepend=ts.iloc[0] if len(ts) else 0)
        new_s = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new_s[1:] = (np.diff(ts) > gap_ms).astype(np.int64)
        sess = np.cumsum(new_s)
        out = pd.DataFrame({key: g[key].values, "session_id": sess, "_ts_ms": ts.values})
        agg = out.groupby("session_id", sort=True).agg(
            n_events=("_ts_ms", "size"),
            duration_ms=("_ts_ms", lambda v: int(v.max() - v.min())),
        ).reset_index()
        agg[key] = g[key].iloc[0]
        return agg[[key, "session_id", "n_events", "duration_ms"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def topk_per_group(
    ds: Dataset,
    group: str = "event_type",
    order_col: str = "value",
    k: int = 2,
) -> Dataset:
    """Top-k rows per group by (order_col desc, event_id asc) — SQL
    ROW_NUMBER() OVER (PARTITION BY group ORDER BY ...) <= k."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([order_col, "event_id"], ascending=[False, True], kind="stable").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return ds.groupby(group).map_groups(per_group, batch_format="pandas")


def running_totals(
    ds: Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    val_milli_col: str = "value_milli",
) -> Dataset:
    """Cumulative count + cumulative (exact-int) value per key in
    (ts, event_id) order — SQL SUM(...) OVER (PARTITION BY key ORDER
    BY ts, event_id ROWS UNBOUNDED PRECEDING)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"], kind="stable").copy()
        g["running_n"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["running_value_milli"] = g[val_milli_col].cumsum().astype(np.int64)
        return g.drop(columns=[ts_col])

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def add_value_milli(batch: pa.Table) -> pa.Table:
    vc = pc.cast(
        pc.round(pc.multiply(batch["value"], 1000.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )
    return batch.append_column("value_milli", vc)
