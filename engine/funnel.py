"""Ordered funnel analysis over the events log (X58): per-user staged
sequence matching — the conversion-funnel operator (view -> click ->
purchase) that event-analytics engines ship as MATCH_RECOGNIZE /
windowFunnel. Greedy earliest-match semantics:

  t1 = min ts of a stage-1 event;
  t_k = min ts of a stage-k event with ts STRICTLY greater than
        t_{k-1};
  max_stage = number of stages matched (0 for users who have funnel
  events but never stage 1).

All timestamps are exact int64 epoch-microseconds; absent stages emit
the 0 sentinel (never a real event time) so every column stays int64
in both engines — the SQL mirror COALESCEs identically.

Upstream parity: no analogue in GeoCoordinateConverter — brief-
mandated event-log analytics (SURVEY §2.7 window family; the ordered
per-key machinery is shared with engine/windows.sessionize).

Scale shape: pruned read (user_id, event_type, ts), per-block Arrow
filter to the funnel's stage types, then ONE keyed co-partition on
user_id (engine.shuffle.keyed_partition_map) whose partition fn runs
the staged min/merge at pandas C speed across all users of the
partition at once. The shuffle moves only funnel-type (user, type,
ts) triples — ~20 B/row; nothing else materializes. Skew note: a
single hot user key lands in one partition, but the per-user state is
three timestamps — partition cost is O(rows in partition), not
O(users²)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from engine.shuffle import keyed_partition_map

DEFAULT_STAGES = ("view", "click", "purchase")


def funnel(
    ds: Dataset,
    stages: tuple[str, ...] = DEFAULT_STAGES,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int = 16,
) -> Dataset:
    """Per-user funnel verdicts: (user_id, max_stage, t{k}_us...).

    Strict-inequality greedy matching (ties between consecutive
    stages do NOT advance the funnel) — mirrored in the oracle SQL.
    """
    if len(stages) < 2:
        raise ValueError("funnel needs >= 2 stages")

    def prep(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[type_col], value_set=pa.array(stages))
        b = b.filter(mask)
        ts_us = pc.cast(b[ts_col], pa.timestamp("us"))
        return pa.table(
            {
                key: b[key],
                type_col: b[type_col],
                "ts_us": pc.cast(ts_us, pa.int64()),
            }
        )

    filtered = ds.map_batches(prep, batch_format="pyarrow")

    stage_cols = [f"t{i + 1}_us" for i in range(len(stages))]

    def partition(df: pd.DataFrame) -> pd.DataFrame:
        users = pd.DataFrame({key: df[key].unique()})
        prev: pd.DataFrame | None = None  # (key, t_prev)
        outs = []
        for i, st in enumerate(stages):
            sub = df[df[type_col] == st][[key, "ts_us"]]
            if prev is not None:
                sub = sub.merge(prev, on=key, how="inner")
                sub = sub[sub["ts_us"] > sub["t_prev"]]
            t = (
                sub.groupby(key, sort=False)["ts_us"]
                .min()
                .reset_index()
                .rename(columns={"ts_us": stage_cols[i]})
            )
            outs.append(t)
            prev = t.rename(columns={stage_cols[i]: "t_prev"})
        res = users
        for t in outs:
            res = res.merge(t, on=key, how="left")
        max_stage = np.zeros(len(res), dtype=np.int64)
        for i, c in enumerate(stage_cols):
            max_stage = np.where(res[c].notna(), i + 1, max_stage)
        res["max_stage"] = max_stage
        for c in stage_cols:
            res[c] = res[c].fillna(0).astype(np.int64)
        return res[[key, "max_stage"] + stage_cols]

    out_schema = pa.schema(
        [(key, pa.int64()), ("max_stage", pa.int64())]
        + [(c, pa.int64()) for c in stage_cols]
    )
    return keyed_partition_map(
        filtered,
        [key],
        partition,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )


def sql_funnel(stages: tuple[str, ...] = DEFAULT_STAGES) -> str:
    """DuckDB mirror built from the same stage tuple: chained
    strict-greater MIN CTEs + sentinel COALESCE."""
    quoted = ", ".join(f"'{s}'" for s in stages)
    ctes = [
        f"""e AS (
  SELECT user_id, event_type, ts FROM events
  WHERE event_type IN ({quoted}))""",
        f"""s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM e
  WHERE event_type = '{stages[0]}' GROUP BY user_id)""",
    ]
    for i in range(1, len(stages)):
        ctes.append(
            f"""s{i + 1} AS (
  SELECT e.user_id, MIN(e.ts) AS t{i + 1} FROM e
  JOIN s{i} USING (user_id)
  WHERE e.event_type = '{stages[i]}' AND e.ts > s{i}.t{i}
  GROUP BY e.user_id)"""
        )
    n = len(stages)
    stage_case = " ".join(
        f"WHEN t{k} IS NOT NULL THEN {k}" for k in range(n, 0, -1)
    )
    t_cols = ",\n  ".join(
        f"CAST(COALESCE(epoch_us(t{k}), 0) AS BIGINT) AS t{k}_us"
        for k in range(1, n + 1)
    )
    joins = " ".join(f"LEFT JOIN s{k} USING (user_id)" for k in range(1, n + 1))
    return f"""
WITH {", ".join(ctes)},
u AS (SELECT DISTINCT user_id FROM e)
SELECT u.user_id,
  CAST(CASE {stage_case} ELSE 0 END AS BIGINT) AS max_stage,
  {t_cols}
FROM u {joins}
"""
