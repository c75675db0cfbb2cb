"""Vector-geometry pipeline — the engine's ``gk-shp`` (SURVEY.md §3.2).

The reference iterates shapefile entities and transforms every vertex
(``gk-shp.c``: SHPOpen -> per-entity per-vertex K10 -> SHPWriteObject).
Here geometry lives in Arrow list columns
(``entity_id, kind, xs:list<double>, ys:list<double>, attrs...``); the
engine explodes to a flat vertex table (one row per vertex, lineage =
entity_id + vertex ordinal), runs the same vectorized transform
kernels as the point pipeline, and reassembles with a groupby.
Geometry tables round-trip as parquet AND as real ESRI .shp/.shx/.dbf
binaries (engine/shapefile.py — S3/S4 full parity)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from geokit import transforms as T


def _list_counts(arr: pa.Array) -> np.ndarray:
    """Per-row lengths of a list column from the Arrow offsets buffer
    (zero-copy; no to_pylist materialization)."""
    offs = np.asarray(arr.offsets, dtype=np.int64)
    return np.diff(offs)


def explode_vertices(batch: pa.Table, xs_col: str = "xs", ys_col: str = "ys") -> pa.Table:
    """entity rows -> one row per vertex (entity_id, vertex_idx, x, y)."""
    ids = batch["entity_id"].to_numpy(zero_copy_only=False)
    xs = batch[xs_col]
    ys = batch[ys_col]
    if isinstance(xs, pa.ChunkedArray):
        xs = xs.combine_chunks()
        ys = ys.combine_chunks()
    counts = _list_counts(xs)
    flat_x = xs.flatten().to_numpy(zero_copy_only=False)
    flat_y = ys.flatten().to_numpy(zero_copy_only=False)
    ent = np.repeat(ids, counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    vidx = np.arange(counts.sum(), dtype=np.int64) - np.repeat(starts, counts)
    return pa.table(
        {
            "entity_id": pa.array(ent),
            "vertex_idx": pa.array(vidx),
            "x": pa.array(flat_x),
            "y": pa.array(flat_y),
        }
    )


_AFT_CACHE: dict[str, object] = {}


def _aft(direction: str):
    """AFT triangulation, loaded once per worker process (same module-
    cache pattern as engine.stages — the asset is a few MB)."""
    tri = _AFT_CACHE.get(direction)
    if tri is None:
        import assets

        tri = _AFT_CACHE[direction] = assets.load_aft(direction)
    return tri


def transform_vertices(batch: pa.Table, transform: int = 5) -> pa.Table:
    """Apply a menu transform (full gk-shp menu 1-10: Helmert entries
    1-6, AFT entries 7-10) to the exploded vertex table."""
    x = batch["x"].to_numpy(zero_copy_only=False)
    y = batch["y"].to_numpy(zero_copy_only=False)
    if transform == 1:
        o1, o2 = T.tmxy2fila_wgs(x, y)
    elif transform == 2:
        o1, o2 = T.fila_wgs2tmxy(x, y)
    elif transform == 3:
        o1, o2, _ = T.gkxy2fila_wgs(x, y)
    elif transform == 4:
        o1, o2, _ = T.fila_wgs2gkxy(x, y)
    elif transform == 5:
        o1, o2, _ = T.gkxy2tmxy(x, y)
    elif transform == 6:
        o1, o2, _ = T.tmxy2gkxy(x, y)
    elif transform == 7:
        o1, o2, _ = T.gkxy2fila_wgs_aft(x, y, _aft("fwd"))
    elif transform == 8:
        o1, o2, _ = T.fila_wgs2gkxy_aft(x, y, _aft("inv"))
    elif transform == 9:
        o1, o2, _ = T.gkxy2tmxy_aft(x, y, _aft("fwd"))
    elif transform == 10:
        o1, o2, _ = T.tmxy2gkxy_aft(x, y, _aft("inv"))
    else:
        raise ValueError(f"unknown menu transform {transform} (valid: 1-10)")
    return pa.table(
        {
            "entity_id": batch["entity_id"],
            "vertex_idx": batch["vertex_idx"],
            "x": pa.array(o1),
            "y": pa.array(o2),
        }
    )


def reassemble_entities(vertices: Dataset) -> Dataset:
    """Co-partition by entity_id -> ordered list columns back (M5).

    Run-length reassembly across ALL entities of a partition at once
    (engine.shuffle.keyed_partition_map) — per-entity map_groups pays
    Ray's ~0.1 ms/group overhead, ruinous at shapefile scale."""
    from engine.shuffle import keyed_partition_map

    def regroup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["entity_id", "vertex_idx"], kind="stable")
        ids = df["entity_id"].to_numpy()
        n = len(ids)
        if n == 0:
            return pd.DataFrame({"entity_id": [], "xs": [], "ys": [], "n_vertices": []})
        new = np.ones(n, dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        x = df["x"].to_numpy()
        y = df["y"].to_numpy()
        return pd.DataFrame(
            {
                "entity_id": ids[starts].astype(np.int64),
                "xs": [x[s : s + l] for s, l in zip(starts, lens)],
                "ys": [y[s : s + l] for s, l in zip(starts, lens)],
                "n_vertices": lens.astype(np.int64),
            }
        )

    return keyed_partition_map(vertices, ["entity_id"], regroup)


def transform_geometry(ds: Dataset, transform: int = 5) -> Dataset:
    """Full gk-shp lifecycle: explode -> transform -> reassemble."""
    v = ds.map_batches(explode_vertices, batch_format="pyarrow")
    v = v.map_batches(transform_vertices, fn_kwargs=dict(transform=transform), batch_format="pyarrow")
    return reassemble_entities(v)
