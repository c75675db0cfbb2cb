"""Z-order (Morton) spatial layout + data-skipping range queries
(X59).

The storage-layout operator every 100 TB geospatial corpus needs:
cluster rows by an interleaved-bit space-filling-curve key so that a
bounding-box query touches only the few partitions whose key range
intersects the box — Delta/Iceberg ``OPTIMIZE ZORDER BY`` re-expressed
Ray-Data-first.

Pieces (each independently tested):

1. ``morton_key(ix, iy)`` — vectorized uint64 bit interleave of two
   20-bit integer grid coordinates (the planar sibling of
   ``geokit.cells``'s cube-face Morton packing; same magic-number
   spread, shared here through the ``SPREAD_STEPS`` constant so the
   DuckDB mirror is BUILT FROM the identical step list).
2. ``zorder_layout(ds, out_dir)`` — assign every row its global rank
   in (zkey, id) order via ``pack_shards``'s distributed prefix sum
   (unit weights — two passes over a ~24 B/row projection, one coarse
   co-partition, never a driver sort), cut ranks into fixed-size
   partitions, and write ONE parquet file per partition plus a
   manifest of per-partition zkey min/max. Filenames are keyed by
   partition id, so a re-run skips/overwrites deterministically
   (resumable-sink contract).
3. ``bbox_zranges(...)`` — exact quadtree decomposition of a bbox
   into covering zkey intervals (bounded node budget; when the budget
   binds, a partially-covered node emits its WHOLE interval — the
   cover degrades to a superset, never misses a point).
4. ``zorder_bbox_query(layout_dir, bbox)`` — manifest-level partition
   pruning (sorted interval merge-scan) + pruned parquet read + exact
   vectorized in-box filter. Returns the rows plus (files_read,
   files_total) evidence for the data-skipping claim.

Scale shape: the layout shuffle moves (okey, id, ix, iy) ≈ 32 B/row;
payload columns stay in the source files and re-attach by the usual
broadcast/bucketed semi-filter (callers feed the PRUNED projection).
Skew note: Morton keys of bbox-clustered points are NOT uniform over
the key space, which only unbalances pack_shards' coarse ranges (its
partials stay exact by construction); the written partitions are
exactly ``part_size`` rows each regardless.

Total-order contract: ids must be unique ints in [0, 2^ID_BITS) —
the rank key packs (zkey << ID_BITS) | id into one int64 so no
tiebreak column rides the shuffle. 22 id bits + 40 zkey bits = 62.
For corpora with wider ids, pre-map ids through a dense rank (or use
``ds.sort`` — documented alternative), as the loud guard explains.

Upstream parity: no analogue in GeoCoordinateConverter (record-at-a-
time CLI, no storage layout); brief-mandated scale machinery (SURVEY
§4 partitioning strategy; the cell-quantization half is the same
floor-grid rule as geokit.cells / cell_rollup).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset

GRID_BITS = 20  # ix, iy in [0, 2^20)
ID_BITS = 22  # ids in [0, 2^22) pack beside the 40-bit zkey
# Morton spread of a 20-bit int: (shift, mask) steps — the SINGLE
# SOURCE for both the numpy kernel and the DuckDB mirror.
SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)
# Deterministic synthetic grid coords from an int id (gate corpus —
# the pagerank/funnel precedent: identical integer arithmetic in both
# engines, no external data).
IX_MULT, IX_ADD = 48271, 0
IY_MULT, IY_ADD = 69621, 12345


def spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low GRID_BITS bits of ``v``."""
    x = v.astype(np.uint64)
    for sh, mask in SPREAD_STEPS:
        x = (x | (x << np.uint64(sh))) & np.uint64(mask)
    return x


def morton_key(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """uint64 Morton key: ix on even bits, iy on odd bits (< 2^40)."""
    return spread_bits(ix) | (spread_bits(iy) << np.uint64(1))


def sql_spread(col: str) -> str:
    """DuckDB expression mirroring ``spread_bits`` — built from the
    same SPREAD_STEPS, so the two engines cannot drift."""
    expr = col
    for sh, mask in SPREAD_STEPS:
        expr = f"((({expr}) | (({expr}) << {sh})) & {mask})"
    return expr


def sql_morton(ix: str, iy: str) -> str:
    return f"({sql_spread(ix)} | ({sql_spread(iy)} << 1))"


def synth_grid_coords(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic 20-bit grid coords from int64 ids (gate corpus)."""
    v = ids.astype(np.int64)
    side = np.int64(1) << np.int64(GRID_BITS)
    ix = (v * np.int64(IX_MULT) + np.int64(IX_ADD)) % side
    iy = (v * np.int64(IY_MULT) + np.int64(IY_ADD)) % side
    return ix, iy


# ------------------------------------------------------------ layout


def zorder_assign(
    ds: Dataset,
    id_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    part_size: int = 512,
    num_partitions: int = 16,
    id_bits: int = ID_BITS,
) -> Dataset:
    """Per-row layout assignment: (id, ix, iy, zkey, pid, pos) where
    pid/pos come from the row's exact global rank in (zkey, id)
    order. Input must be the PRUNED (id, ix, iy) projection.

    ``id_bits``: ids must fit [0, 2^id_bits). When
    2*GRID_BITS + id_bits > 62 the rank key COARSENS the zkey by the
    overflow (drops its lowest bits): ordering becomes "z-order at a
    coarser cell, id-tiebroken within" — layout quality is unchanged
    (a coarse cell is 4^drop adjacent fine cells) and determinism is
    exact; manifest pruning always uses FULL-resolution zkeys."""
    from engine.analytics import pack_shards

    drop = max(0, 2 * GRID_BITS + id_bits - 62)

    def key(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = b[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = b[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        side = 1 << GRID_BITS
        if len(ids):
            if ids.min() < 0 or ids.max() >= (1 << id_bits):
                raise ValueError(
                    f"{id_col} outside [0, 2^{id_bits}) — densify ids, "
                    "raise id_bits, or use the ds.sort alternative"
                )
            if (
                ix.min() < 0
                or ix.max() >= side
                or iy.min() < 0
                or iy.max() >= side
            ):
                raise ValueError(f"grid coords outside [0, 2^{GRID_BITS})")
        zkey = morton_key(ix, iy).astype(np.int64)
        okey = ((zkey >> np.int64(drop)) << np.int64(id_bits)) | ids
        return pa.table(
            {
                id_col: pa.array(ids),
                ix_col: pa.array(ix),
                iy_col: pa.array(iy),
                "zkey": pa.array(zkey),
                "okey": pa.array(okey),
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    keyed = ds.map_batches(key, batch_format="pyarrow")
    out = pack_shards(
        keyed,
        "okey",
        "one",
        budget=part_size,
        num_partitions=num_partitions,
        id_range=(0, (1 << 62) - 1),
        extra_cols=[
            (id_col, pa.int64()),
            (ix_col, pa.int64()),
            (iy_col, pa.int64()),
            ("zkey", pa.int64()),
        ],
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                ix_col: b[ix_col],
                iy_col: b[iy_col],
                "zkey": b["zkey"],
                "pid": b["shard_id"],
                "pos": b["offset_in_shard"],
            }
        ),
        batch_format="pyarrow",
    )


def zorder_layout(
    ds: Dataset,
    out_dir: str,
    id_col: str,
    ix_col: str = "ix",
    iy_col: str = "iy",
    part_size: int = 65_536,
    num_partitions: int = 16,
    id_bits: int = ID_BITS,
) -> dict:
    """Write the z-ordered layout: one parquet file per pid (rows
    sorted by zkey within the file) + ``manifest.json`` with per-file
    zkey min/max. Returns the manifest dict."""
    from engine.shuffle import keyed_partition_map

    os.makedirs(out_dir, exist_ok=True)
    assigned = zorder_assign(
        ds, id_col, ix_col, iy_col, part_size, num_partitions, id_bits
    )

    def write_part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pid, g in df.groupby("pid", sort=True):
            g = g.sort_values(["zkey", id_col], kind="stable")
            path = os.path.join(out_dir, f"part_{int(pid):06d}.parquet")
            tbl = pa.Table.from_pandas(
                g[[id_col, ix_col, iy_col, "zkey", "pos"]],
                preserve_index=False,
            )
            pq.write_table(tbl, path)  # pid-keyed name = resumable
            rows.append(
                {
                    "pid": int(pid),
                    "zmin": int(g["zkey"].min()),
                    "zmax": int(g["zkey"].max()),
                    "rows": int(len(g)),
                }
            )
        return pd.DataFrame(rows, columns=["pid", "zmin", "zmax", "rows"])

    out_schema = pa.schema(
        [
            ("pid", pa.int64()),
            ("zmin", pa.int64()),
            ("zmax", pa.int64()),
            ("rows", pa.int64()),
        ]
    )
    # Partition-scale output: one row per written file.
    summary = keyed_partition_map(
        assigned,
        ["pid"],
        write_part,
        num_partitions=num_partitions,
        out_schema=out_schema,
    ).to_pandas()
    summary = summary.sort_values("pid")
    manifest = {
        "part_size": part_size,
        "parts": [
            {
                "pid": int(r.pid),
                "file": f"part_{int(r.pid):06d}.parquet",
                "zmin": int(r.zmin),
                "zmax": int(r.zmax),
                "rows": int(r.rows),
            }
            for r in summary.itertuples()
        ],
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


# ------------------------------------------------ bbox decomposition


def bbox_zranges(
    ix0: int,
    ix1: int,
    iy0: int,
    iy1: int,
    bits: int = GRID_BITS,
    max_nodes: int = 4096,
) -> list[tuple[int, int]]:
    """Covering zkey intervals of the inclusive box [ix0,ix1]x[iy0,iy1]
    via quadtree descent. Exact cover while the node budget lasts;
    once ``max_nodes`` is hit every remaining partial node emits its
    full interval (superset cover — final filters restore exactness).
    Returns sorted, merged, inclusive (lo, hi) intervals."""
    if ix0 > ix1 or iy0 > iy1:
        return []
    out: list[tuple[int, int]] = []
    # node = (level, x, y): square of side 2^(bits-level) at grid
    # origin (x << (bits-level), y << (bits-level)).
    stack: list[tuple[int, int, int]] = [(0, 0, 0)]
    visited = 0
    while stack:
        level, x, y = stack.pop()
        side_bits = bits - level
        cx0, cy0 = x << side_bits, y << side_bits
        cx1, cy1 = cx0 + (1 << side_bits) - 1, cy0 + (1 << side_bits) - 1
        if cx1 < ix0 or cx0 > ix1 or cy1 < iy0 or cy0 > iy1:
            continue
        lo = int(
            morton_key(np.array([cx0]), np.array([cy0]))[0]
        )
        hi = lo + (1 << (2 * side_bits)) - 1  # node spans a z-run
        full = cx0 >= ix0 and cx1 <= ix1 and cy0 >= iy0 and cy1 <= iy1
        visited += 1
        if full or side_bits == 0 or visited >= max_nodes:
            out.append((lo, hi))
            continue
        for dx in (0, 1):
            for dy in (0, 1):
                stack.append((level + 1, (x << 1) | dx, (y << 1) | dy))
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def _intersects(
    ranges: list[tuple[int, int]], zmin: int, zmax: int
) -> bool:
    """Sorted disjoint intervals vs [zmin, zmax]: overlap exists iff
    the LAST interval with lo <= zmax has hi >= zmin (earlier
    intervals end strictly before it, so one check suffices)."""
    import bisect

    i = bisect.bisect_right(ranges, (zmax, float("inf"))) - 1
    return i >= 0 and ranges[i][1] >= zmin


def zorder_bbox_query(
    layout_dir: str,
    ix0: int,
    ix1: int,
    iy0: int,
    iy1: int,
) -> tuple[Dataset, dict]:
    """Data-skipping bbox query over a written layout: prune files by
    manifest zkey ranges, read survivors, exact in-box filter.
    Returns (rows, {'files_total', 'files_read'})."""
    with open(os.path.join(layout_dir, "manifest.json")) as f:
        manifest = json.load(f)
    ranges = bbox_zranges(ix0, ix1, iy0, iy1)
    keep = [
        p
        for p in manifest["parts"]
        if _intersects(ranges, p["zmin"], p["zmax"])
    ]
    stats = {"files_total": len(manifest["parts"]), "files_read": len(keep)}
    if not keep:
        return rd.from_arrow(
            pa.table(
                {
                    "zkey": pa.array([], pa.int64()),
                }
            )
        ), stats
    ds = rd.read_parquet(
        [os.path.join(layout_dir, p["file"]) for p in keep]
    )

    def infilter(b: pa.Table) -> pa.Table:
        ix = b["ix"].to_numpy(zero_copy_only=False)
        iy = b["iy"].to_numpy(zero_copy_only=False)
        m = (ix >= ix0) & (ix <= ix1) & (iy >= iy0) & (iy <= iy1)
        return b.filter(pa.array(m))

    return ds.map_batches(infilter, batch_format="pyarrow"), stats


# ------------------------------------------------------- gate query


def zorder_points(ds_events: Dataset, part_size: int = 512) -> Dataset:
    """Gate pipeline: deterministic grid coords from event ids ->
    Morton keys -> exact global layout ranks. Columns (event_id, ix,
    iy, zkey, pid, pos) — the SQL mirror recomputes every one by the
    identical integer/bit arithmetic + ROW_NUMBER."""

    def coords(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = synth_grid_coords(ids)
        return pa.table(
            {
                "event_id": pa.array(ids),
                "ix": pa.array(ix),
                "iy": pa.array(iy),
            }
        )

    pts = ds_events.map_batches(coords, batch_format="pyarrow")
    return zorder_assign(pts, "event_id", part_size=part_size)


def sql_zorder_points(part_size: int = 512) -> str:
    """DuckDB mirror: same coord arithmetic, same spread steps, same
    (zkey << ID_BITS | id) total order, ROW_NUMBER rank rule."""
    side = 1 << GRID_BITS
    zexpr = sql_morton("ix", "iy")
    return f"""
WITH p AS (
  SELECT event_id,
         (event_id * {IX_MULT} + {IX_ADD}) % {side} AS ix,
         (event_id * {IY_MULT} + {IY_ADD}) % {side} AS iy
  FROM events),
z AS (
  SELECT event_id, ix, iy, CAST({zexpr} AS BIGINT) AS zkey FROM p),
r AS (
  SELECT *, ROW_NUMBER() OVER (
      ORDER BY (zkey << {ID_BITS}) | event_id) - 1 AS rnk
  FROM z)
SELECT event_id, ix, iy, zkey,
       CAST(rnk // {part_size} AS BIGINT) AS pid,
       CAST(rnk % {part_size} AS BIGINT) AS pos
FROM r
"""
