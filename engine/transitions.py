"""Markov transition counts (X70): consecutive-event-type bigrams
per user.

The LAG member of the sequence family: sessionize segments a user's
ordered events by gaps, funnel matches staged subsequences, cohort
ages first touches — X70 counts ADJACENT ordered pairs, the
transition matrix behind session Markov models / next-action
prediction features:

  order a user's events by (ts, event_id)   (event_id breaks ts ties
                                             deterministically);
  for consecutive events e_i -> e_{i+1} of the SAME user, count
  (type_i, type_{i+1});
  output (src, dst, cnt) — the corpus transition matrix.

Scale shape: prune to (user, ts, event_id, type) rows, ONE user
co-partition, one lexsort, adjacency by index shift masked at user
run boundaries — no per-user loop; per-partition partial counts on
the tiny (src, dst) pairs, then the standard combiner rollup.

The DuckDB mirror runs LAG() OVER (PARTITION BY user ORDER BY ts,
event_id) — the window plan — so agreement checks the shift-mask
adjacency against an independently ordered computation.

Upstream parity: no analogue in GeoCoordinateConverter; brief-mandated
event-analytics machinery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

_OUT = pa.schema(
    [("src", pa.string()), ("dst", pa.string()), ("cnt", pa.int64())]
)


def transition_counts(
    ds_events: Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    num_partitions: int = 32,
) -> Dataset:
    """Dataset[src, dst, cnt] of per-user adjacent event-type pairs
    under the (ts, event_id) order. See module docstring."""
    from engine.shuffle import grouped_count_sums, keyed_partition_map

    def prep(b: pa.Table) -> pa.Table:
        return b.select([user_col, ts_col, id_col, type_col])

    rows = ds_events.map_batches(prep, batch_format="pyarrow")

    pair_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("c", pa.int64())]
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or user_col not in df.columns:
            return pd.DataFrame(
                {
                    "src": pd.Series(dtype=object),
                    "dst": pd.Series(dtype=object),
                    "c": pd.Series(dtype=np.int64),
                }
            )
        df = df.sort_values([user_col, ts_col, id_col], kind="stable")
        u = df[user_col].to_numpy()
        t = df[type_col].to_numpy()
        same = u[1:] == u[:-1]  # adjacency only inside a user run
        src = t[:-1][same]
        dst = t[1:][same]
        if len(src) == 0:
            return pd.DataFrame(
                {
                    "src": pd.Series(dtype=object),
                    "dst": pd.Series(dtype=object),
                    "c": pd.Series(dtype=np.int64),
                }
            )
        # partial counts inside the partition (pairs are tiny)
        g = pd.DataFrame({"src": src, "dst": dst}).groupby(
            ["src", "dst"], sort=False
        )
        out = g.size().rename("c").reset_index()
        out["c"] = out["c"].astype(np.int64)
        return out

    partials = keyed_partition_map(
        rows, [user_col], pairs, num_partitions, out_schema=pair_schema
    )
    agg = grouped_count_sums(
        partials, ["src", "dst"], sum_cols=["c"], num_partitions=8
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "dst": b["dst"], "cnt": b["sum_c"]})

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_transition_counts() -> str:
    """DuckDB mirror: LAG window over (user, ts, event_id)."""
    return """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events)
SELECT prev AS src, event_type AS dst,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM o WHERE prev IS NOT NULL
GROUP BY prev, event_type
"""
