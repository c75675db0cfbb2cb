"""Exact rectangle-overlap spatial join (X62).

The 2-D interval-overlap join — bbox intersection between two rect
sets (map features vs viewport tiles, building footprints vs parcels,
ad regions vs user extents). The missing 2-D member of the overlap
family: J6 as-of and J7 interval joins are its 1-D specializations.

Semantics (closed integer intervals — touching edges DO overlap, the
DE-9IM "intersects" convention on integer grids):

  overlap(a, b)  iff  max(ax1, bx1) <= min(ax2, bx2)
                 and  max(ay1, by1) <= min(ay2, by2)
  area = (min(ax2,bx2) - max(ax1,bx1) + 1)
       * (min(ay2,by2) - max(ay1,by1) + 1)        (exact int64)

Upstream parity: no analogue in GeoCoordinateConverter (per-point
CLI); brief-mandated spatial-join machinery (the region-region member
of the SURVEY §2.4 family — J3 point-in-polygon, J4 point-kNN, J5
point-tile equi, X60 point-density, X62 region-region overlap).

Scale shape — PBSM (Patel & DeWitt 1996) with the reference-point
dedup (Dittrich & Seeger 2000), ONE corpus-scale shuffle total:

1. Each rect replicates to every fixed-size tile it overlaps
   (``tile_bits`` side): ~32 B (cell, side, id, x1, x2, y1, y2) rows,
   count = its tile span (small rects -> 1 row; the contract is
   rect extent << corpus extent, the usual feature-vs-world shape).
2. ONE cell co-partition (`keyed_partition_map`). Per tile the kernel
   runs a vectorized |A_tile| x |B_tile| interval test — per-tile
   memory is that block (the DBSCAN density contract: tile occupancy
   bounded by a worker heap; shrink tiles if a single tile could
   exceed it). A qualifying pair is emitted ONLY by the tile that
   contains the intersection's min corner (max(ax1,bx1), max(ay1,by1))
   — each intersection has exactly one min corner, so the output is
   globally duplicate-free WITHOUT a distinct shuffle.
3. No step ever assembles either corpus on one node; the only
   all-to-all is the tile co-partition of the replicated projections.

The gate corpus derives both rect sets from integer keys by shared
LCG constants (single source below for engine AND the DuckDB mirror,
which runs the plain O(|A| x |B|) cross-join predicate — a genuinely
independent evaluation order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

# --- gate-corpus derivation constants (single source: engine + SQL)
M31 = 2**31
WORLD = 16384
WMAX = 2048  # max rect extent; placement span keeps rects in-bounds
SPAN = WORLD - WMAX
A_MIX1, A_MIX2 = 2654435761, 40503
B_MIX1, B_MIX2 = 1566083941, 69621
BIG_MOD = 50  # 2% of rects are big (span several tiles)
SMALL_W, SMALL_H = 64, 96
BIG_BASE, BIG_W, BIG_H = 512, 1024, 768
TILE_BITS = 9  # 512-unit tiles -> 32x32 grid at WORLD=16384

_PAIR_SCHEMA = pa.schema(
    [("a_id", pa.int64()), ("b_id", pa.int64()), ("area", pa.int64())]
)


def synth_rects(ds: Dataset, key_col: str, mix1: int, mix2: int) -> Dataset:
    """Deterministic rects from integer keys: LCG placement over
    [0, SPAN), 2% big rects (BIG_BASE + hash extent), closed-interval
    corners (x2 = x1 + w inclusive). Shared constants with the SQL
    mirror — change together."""

    def mk(b: pa.Table) -> pa.Table:
        ids = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h1 = (ids * mix1) % M31
        h2 = (ids * mix2) % M31
        x1 = h1 % SPAN
        y1 = h2 % SPAN
        big = (h1 % BIG_MOD) == 0
        w = np.where(big, BIG_BASE + h2 % BIG_W, h2 % SMALL_W)
        h = np.where(big, BIG_BASE + h1 % BIG_H, h1 % SMALL_H)
        return pa.table(
            {
                "id": pa.array(ids),
                "x1": pa.array(x1),
                "x2": pa.array(x1 + w),
                "y1": pa.array(y1),
                "y2": pa.array(y1 + h),
            }
        )

    return ds.map_batches(mk, batch_format="pyarrow")


def _replicate(side_tag: int, tile_bits: int):
    """Rect -> one row per overlapped tile; packed cell key. The
    per-rect row count is its tile span (nx * ny) — vectorized via
    repeat + cumsum-offset subtraction, no Python loop."""

    def rep(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = b["x1"].to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = b["x2"].to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = b["y1"].to_numpy(zero_copy_only=False).astype(np.int64)
        y2 = b["y2"].to_numpy(zero_copy_only=False).astype(np.int64)
        tx1, tx2 = x1 >> tile_bits, x2 >> tile_bits
        ty1, ty2 = y1 >> tile_bits, y2 >> tile_bits
        nx = tx2 - tx1 + 1
        ny = ty2 - ty1 + 1
        cnt = nx * ny
        total = int(cnt.sum())
        if total == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "id": pa.array([], pa.int64()),
                    "x1": pa.array([], pa.int64()),
                    "x2": pa.array([], pa.int64()),
                    "y1": pa.array([], pa.int64()),
                    "y2": pa.array([], pa.int64()),
                }
            )
        # flat index 0..cnt_i-1 within each rect, vectorized
        offs = np.repeat(np.cumsum(cnt) - cnt, cnt)
        flat = np.arange(total, dtype=np.int64) - offs
        rny = np.repeat(ny, cnt)
        dx = flat // rny
        dy = flat % rny
        cell = ((np.repeat(tx1, cnt) + dx) << np.int64(16)) | (
            np.repeat(ty1, cnt) + dy
        )
        side = np.full(total, side_tag, dtype=np.int8)
        return pa.table(
            {
                "cell": pa.array(cell),
                "side": pa.array(side),
                "id": pa.array(np.repeat(ids, cnt)),
                "x1": pa.array(np.repeat(x1, cnt)),
                "x2": pa.array(np.repeat(x2, cnt)),
                "y1": pa.array(np.repeat(y1, cnt)),
                "y2": pa.array(np.repeat(y2, cnt)),
            }
        )

    return rep


def _tile_pass(tile_bits: int):
    """Per-partition kernel: per tile, the vectorized |A| x |B|
    closed-interval overlap test; emit (a_id, b_id, area) only when
    the intersection's min corner falls in THIS tile (reference-point
    dedup — exactly one emitting tile per qualifying pair)."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a_id": pd.Series(dtype=np.int64),
                "b_id": pd.Series(dtype=np.int64),
                "area": pd.Series(dtype=np.int64),
            }
        )
        if df.empty or "cell" not in df.columns:
            return empty
        cell = df["cell"].to_numpy()
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        side = df["side"].to_numpy()[order]
        ids = df["id"].to_numpy()[order]
        x1 = df["x1"].to_numpy()[order]
        x2 = df["x2"].to_numpy()[order]
        y1 = df["y1"].to_numpy()[order]
        y2 = df["y2"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], cell.size]
        oa, ob, oar = [], [], []
        for s, e in zip(starts, ends):
            sm = side[s:e] == 0
            na = int(sm.sum())
            nb = (e - s) - na
            if na == 0 or nb == 0:
                continue
            ax1, ax2 = x1[s:e][sm], x2[s:e][sm]
            ay1, ay2 = y1[s:e][sm], y2[s:e][sm]
            ai = ids[s:e][sm]
            bm = ~sm
            bx1, bx2 = x1[s:e][bm], x2[s:e][bm]
            by1, by2 = y1[s:e][bm], y2[s:e][bm]
            bi = ids[s:e][bm]
            ix1 = np.maximum(ax1[:, None], bx1[None, :])
            ix2 = np.minimum(ax2[:, None], bx2[None, :])
            iy1 = np.maximum(ay1[:, None], by1[None, :])
            iy2 = np.minimum(ay2[:, None], by2[None, :])
            ctx = cell[s] >> np.int64(16)
            cty = cell[s] & np.int64((1 << 16) - 1)
            m = (
                (ix1 <= ix2)
                & (iy1 <= iy2)
                & ((ix1 >> tile_bits) == ctx)
                & ((iy1 >> tile_bits) == cty)
            )
            r, c = np.nonzero(m)
            if r.size:
                oa.append(ai[r])
                ob.append(bi[c])
                oar.append((ix2[r, c] - ix1[r, c] + 1) * (iy2[r, c] - iy1[r, c] + 1))
        if not oa:
            return empty
        return pd.DataFrame(
            {
                "a_id": np.concatenate(oa),
                "b_id": np.concatenate(ob),
                "area": np.concatenate(oar),
            }
        )

    return part


def rect_overlap_join(
    rects_a: Dataset,
    rects_b: Dataset,
    *,
    tile_bits: int = TILE_BITS,
    num_partitions: int = 32,
) -> Dataset:
    """All overlapping (a_id, b_id) pairs with exact intersection
    areas. Inputs: Dataset[id, x1, x2, y1, y2] closed integer rects,
    coords in [0, 2^16 << tile_bits). See module docstring for the
    distributed shape and the density contract."""
    from engine.shuffle import keyed_partition_map

    ra = rects_a.map_batches(_replicate(0, tile_bits), batch_format="pyarrow")
    rb = rects_b.map_batches(_replicate(1, tile_bits), batch_format="pyarrow")
    # materialize the union input — the documented Ray 2.49
    # Union-before-sort backpressure trickle (engine/dedupe.both_sides)
    both = ra.union(rb).materialize()
    return keyed_partition_map(
        both,
        ["cell"],
        _tile_pass(tile_bits),
        num_partitions,
        out_schema=_PAIR_SCHEMA,
    )


# ------------------------------------------------------- gate query


def rect_join_gate(ds_orders: Dataset, ds_part: Dataset) -> Dataset:
    """Gate pipeline: rect set A from order keys, rect set B from part
    keys (shared LCG constants), full overlap join."""
    a = synth_rects(ds_orders, "o_orderkey", A_MIX1, A_MIX2)
    b = synth_rects(ds_part, "p_partkey", B_MIX1, B_MIX2)
    return rect_overlap_join(a, b)


def _sql_rects(src: str, key: str, mix1: int, mix2: int) -> str:
    return f"""
  SELECT {key} AS id,
         ({key} * {mix1}) % {M31} % {SPAN} AS x1,
         ({key} * {mix1}) % {M31} % {SPAN}
           + CASE WHEN ({key} * {mix1}) % {M31} % {BIG_MOD} = 0
                  THEN {BIG_BASE} + ({key} * {mix2}) % {M31} % {BIG_W}
                  ELSE ({key} * {mix2}) % {M31} % {SMALL_W} END AS x2,
         ({key} * {mix2}) % {M31} % {SPAN} AS y1,
         ({key} * {mix2}) % {M31} % {SPAN}
           + CASE WHEN ({key} * {mix1}) % {M31} % {BIG_MOD} = 0
                  THEN {BIG_BASE} + ({key} * {mix1}) % {M31} % {BIG_H}
                  ELSE ({key} * {mix1}) % {M31} % {SMALL_H} END AS y2
  FROM {src}"""


def sql_rect_join() -> str:
    """DuckDB mirror: identical rect derivation, then the plain
    cross-join overlap predicate — an evaluation order with no tiles,
    no replication and no reference points, so agreement checks the
    PBSM dedup rule itself."""
    return f"""
WITH ra AS ({_sql_rects("orders", "o_orderkey", A_MIX1, A_MIX2)}),
rb AS ({_sql_rects("part", "p_partkey", B_MIX1, B_MIX2)})
SELECT ra.id AS a_id, rb.id AS b_id,
       CAST((LEAST(ra.x2, rb.x2) - GREATEST(ra.x1, rb.x1) + 1)
          * (LEAST(ra.y2, rb.y2) - GREATEST(ra.y1, rb.y1) + 1)
          AS BIGINT) AS area
FROM ra, rb
WHERE GREATEST(ra.x1, rb.x1) <= LEAST(ra.x2, rb.x2)
  AND GREATEST(ra.y1, rb.y1) <= LEAST(ra.y2, rb.y2)
"""
