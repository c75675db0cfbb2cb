"""Sorted-neighborhood blocking (X67) — windowed self-join on a
global sort order.

The classic entity-resolution blocking method (Hernández & Stolfo's
sorted-neighborhood method, SIGMOD 1995 — public literature): sort
all records by a blocking key, slide a window of size w down the
sorted order, and emit every record pair that co-occurs in a window —
candidate pairs for a downstream matcher. The output here is the
exact pair set {(a, b) : 0 < rank(b) - rank(a) <= w} with the rank
gap, under the total order (key, id) — deterministic because the
order key is unique.

This is a new partitioning pattern in the join family: the rectangle
join replicates rows to spatial TILES, the interval join to value
BINS — SNM replicates along a GLOBAL RANK, which no static grid can
provide (rank depends on every other row). Shape:

1. Global dense rank via the pack_shards two-pass prefix sum
   (engine/analytics.py:897; unit weights, budget 1 => shard_id IS
   the 0-based rank) — never a global sort materialization.
2. ONE rank co-partition into blocks of B consecutive ranks, each row
   ALSO replicated to the previous block when its offset < w (the
   HALO: pairs spanning a block border are generated exactly once, by
   the block that OWNS the left endpoint). Replication factor
   <= 1 + w/B — constant.
3. Per block: ranks are contiguous integers, so the w sliding offsets
   are pure vectorized index shifts; emit (id_left, id_right, gap).

The DuckDB mirror is ROW_NUMBER() OVER one global ORDER BY + a rank
band self-join — the single-sort plan the engine avoids; agreement
checks the two-pass rank AND the halo rule.

Upstream parity: no analogue in GeoCoordinateConverter; brief-mandated
dedup/ER machinery (blocking candidate generation over web records).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

_OUT_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("gap", pa.int64())]
)


def snm_pairs(
    ds: Dataset,
    *,
    id_col: str,
    key_col: str,
    window: int = 5,
    block_size: int = 4096,
    num_partitions: int = 32,
) -> Dataset:
    """Candidate pairs Dataset[doc_a, doc_b, gap] of the sorted-
    neighborhood window over the total order (key_col, id_col).

    Contract: id_col values unique, non-negative, < 2^33; key_col
    int64 in [0, 2^30) — the packed order key (key << 33) | id must
    stay unique and positive."""
    from engine.analytics import pack_shards
    from engine.shuffle import keyed_partition_map

    w = int(window)
    B = max(int(block_size), w + 1)

    def mk_order(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (
            ids.min() < 0
            or ids.max() >= (1 << 33)
            or keys.min() < 0
            or keys.max() >= (1 << 30)
        ):
            raise ValueError("snm_pairs: id/key outside packing contract")
        return pa.table(
            {"o": (keys << np.int64(33)) | ids, "one": np.ones(len(ids), np.int64)}
        )

    ordered = ds.map_batches(mk_order, batch_format="pyarrow")
    # unit weights + budget 1: shard_id == #rows before == dense rank
    ranked = pack_shards(
        ordered, "o", "one", budget=1, num_partitions=num_partitions
    )

    def replicate(b: pa.Table) -> pa.Table:
        o = b["o"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = b["shard_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = r // B
        halo = (r % B < w) & (blk > 0)
        return pa.table(
            {
                "blk": np.concatenate([blk, blk[halo] - 1]),
                "r": np.concatenate([r, r[halo]]),
                "id": np.concatenate(
                    [o & np.int64((1 << 33) - 1), (o & np.int64((1 << 33) - 1))[halo]]
                ),
                "own": np.concatenate(
                    [np.ones(len(r), np.bool_), np.zeros(int(halo.sum()), np.bool_)]
                ),
            }
        )

    rep = ranked.map_batches(replicate, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "r" not in df.columns:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=np.int64),
                    "doc_b": pd.Series(dtype=np.int64),
                    "gap": pd.Series(dtype=np.int64),
                }
            )
        # a coarse partition may hold SEVERAL blocks (keyed_partition_map
        # hashes blk) — adjacent blocks would interleave duplicate ranks
        # (halo copies of the next block's owners), so pair strictly
        # within blk: border pairs are the left block's halo's job
        df = df.sort_values(["blk", "r"], kind="stable")
        r = df["r"].to_numpy().astype(np.int64)
        blk = df["blk"].to_numpy().astype(np.int64)
        ids = df["id"].to_numpy().astype(np.int64)
        own = df["own"].to_numpy().astype(bool)
        # ranks are consecutive integers within block + halo; a left
        # endpoint pairs with the next 1..w ranks — pure index shifts
        out_a, out_b, out_g = [], [], []
        n = len(r)
        for delta in range(1, w + 1):
            a = np.arange(0, n - delta)
            ok = (
                own[a]
                & (blk[a + delta] == blk[a])
                & (r[a + delta] - r[a] == delta)
            )
            out_a.append(ids[a][ok])
            out_b.append(ids[a + delta][ok])
            out_g.append(np.full(int(ok.sum()), delta, np.int64))
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "gap": np.concatenate(out_g),
            }
        )

    return keyed_partition_map(
        rep, ["blk"], pairs, num_partitions, out_schema=_OUT_SCHEMA
    )


def snm_pairs_docs(ds_documents: Dataset, window: int = 5) -> Dataset:
    """Gate pipeline: SNM blocking over documents ordered by
    (n_chars, doc_id) — length-adjacent docs become match candidates
    (the near-dup classes differ by a few chars, so true pairs
    concentrate in the window)."""
    return snm_pairs(
        ds_documents, id_col="doc_id", key_col="n_chars", window=window
    )


def sql_snm_pairs_docs(window: int = 5) -> str:
    """DuckDB mirror: ONE global ROW_NUMBER sort + rank-band self-join
    (the plan the engine's two-pass rank + halo replication avoids)."""
    return f"""
WITH r AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS rn
  FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rn - a.rn AS BIGINT) AS gap
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + {int(window)}
"""
