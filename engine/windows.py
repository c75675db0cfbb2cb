"""Stream-shaped windowed operators over the events log
(SURVEY.md §2.7; ray_guide streaming-shaped workloads).

Ray Data has no event-time windowing; the engine's contract is the
ordered-partitioned-log shape: co-partition by key (coarse hash
partition via engine.shuffle.keyed_partition_map — per-key map_groups
pays ~0.1 ms/group, measured 3+ s for the events user set), sort the
partition by (key, ts, event_id), and window with run-length
vectorized numpy across ALL keys of the partition at once. Ordering
assumption: (ts, event_id) is a total order per key — stated here and
mirrored in the oracle SQL's ORDER BY.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from engine.shuffle import keyed_partition_map


def _user_runs(uid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(start indices, run lengths) of equal-key runs in a sorted key
    array."""
    n = len(uid)
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, n))
    return starts, lens


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

    def partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, "event_id"], kind="stable")
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    key: pd.Series(dtype=df[key].dtype),
                    "session_id": pd.Series(dtype=np.int64),
                    "n_events": pd.Series(dtype=np.int64),
                    "duration_ms": pd.Series(dtype=np.int64),
                }
            )
        uid = df[key].to_numpy()
        ts = (df[ts_col].astype("datetime64[us]").astype(np.int64) // 1000).to_numpy()
        new_user = np.ones(n, dtype=bool)
        gap_big = np.ones(n, dtype=bool)
        if n > 1:
            new_user[1:] = uid[1:] != uid[:-1]
            gap_big[1:] = (ts[1:] - ts[:-1]) > gap_ms
        new_s = (new_user | gap_big).astype(np.int64)
        cs = np.cumsum(new_s)
        ustart, ulen = _user_runs(uid)
        base = np.repeat(cs[ustart] - new_s[ustart], ulen)
        sess = cs - base  # 1-based session counter within user
        sstart = np.flatnonzero(new_s)
        slen = np.diff(np.append(sstart, n))
        last = np.append(sstart[1:] - 1, n - 1)
        return pd.DataFrame(
            {
                key: uid[sstart],
                "session_id": sess[sstart],
                "n_events": slen.astype(np.int64),
                "duration_ms": (ts[last] - ts[sstart]).astype(np.int64),
            }
        )

    return keyed_partition_map(ds, [key], partition)


def topk_per_group(
    ds: Dataset,
    group: str = "event_type",
    order_col: str = "value",
    k: int = 2,
) -> Dataset:
    """Top-k rows per group by (order_col desc, event_id asc) — SQL
    ROW_NUMBER() OVER (PARTITION BY group ORDER BY ...) <= k.
    Group cardinality is small (event types), so per-group map_groups
    is fine here; each map task also pre-prunes to its local top-k so
    the shuffle moves at most k rows per (block, group)."""

    def prune(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        pruned = (
            df.sort_values([order_col, "event_id"], ascending=[False, True], kind="stable")
            .groupby(group, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(pruned, preserve_index=False)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([order_col, "event_id"], ascending=[False, True], kind="stable").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return pruned.groupby(group).map_groups(per_group, batch_format="pandas")


def running_totals(
    ds: Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    val_milli_col: str = "value_milli",
) -> Dataset:
    """Cumulative count + cumulative (exact-int) value per key in
    (ts, event_id) order — SQL SUM(...) OVER (PARTITION BY key ORDER
    BY ts, event_id ROWS UNBOUNDED PRECEDING)."""

    def partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, "event_id"], kind="stable").copy()
        n = len(df)
        if n == 0:
            df["running_n"] = pd.Series(dtype=np.int64)
            df["running_value_milli"] = pd.Series(dtype=np.int64)
            return df.drop(columns=[ts_col])
        uid = df[key].to_numpy()
        ustart, ulen = _user_runs(uid)
        idx = np.arange(n, dtype=np.int64)
        df["running_n"] = idx - np.repeat(ustart, ulen) + 1
        v = df[val_milli_col].to_numpy().astype(np.int64)
        cv = np.cumsum(v)
        base = np.repeat(cv[ustart] - v[ustart], ulen)
        df["running_value_milli"] = (cv - base).astype(np.int64)
        return df.drop(columns=[ts_col])

    return keyed_partition_map(ds, [key], partition)


def add_value_milli(batch: pa.Table) -> pa.Table:
    vc = pc.cast(
        pc.round(pc.multiply(batch["value"], 1000.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )
    return batch.append_column("value_milli", vc)
