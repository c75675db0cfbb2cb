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


def _col(batch: pa.Table, name: str) -> pa.Array:
    c = batch[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def explode_vertices(
    batch: pa.Table,
    xs_col: str = "xs",
    ys_col: str = "ys",
    carry_cols: tuple = (),
) -> pa.Table:
    """entity rows -> one row per vertex (entity_id, vertex_idx, x, y).

    ``carry_cols``: per-vertex payloads threaded through the flat
    table so downstream reassembly needs NO side join / broadcast —
    the fully-streaming shape for huge corpora:
      - vertex-aligned list columns (``zs``/``ms``) flatten to one
        value per vertex (entities without values get NaN);
      - ``parts`` (list of part-start offsets) becomes a per-vertex
        ``part`` ordinal (vectorized boundary-mark cumsum, no
        per-entity loop);
      - ``part_types`` (one int per part) becomes the per-vertex
        ``ptype`` of its part (requires ``parts`` too).
    """
    ids = batch["entity_id"].to_numpy(zero_copy_only=False)
    xs = _col(batch, xs_col)
    ys = _col(batch, ys_col)
    counts = _list_counts(xs)
    total = int(counts.sum())
    flat_x = xs.flatten().to_numpy(zero_copy_only=False)
    flat_y = ys.flatten().to_numpy(zero_copy_only=False)
    ent = np.repeat(ids, counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    vidx = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    cols = {
        "entity_id": pa.array(ent),
        "vertex_idx": pa.array(vidx),
        "x": pa.array(flat_x),
        "y": pa.array(flat_y),
    }
    for name in carry_cols:
        if name in ("parts", "part_types"):
            continue  # handled below
        arr = _col(batch, name)
        vc = _list_counts(arr)
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        if (vc == counts).all():
            cols[name[:-1] if name.endswith("s") else name] = pa.array(flat)
        else:
            # Ragged relative to vertices (absent per entity): NaN-fill
            # entities whose list is empty; mixed partial lengths are a
            # caller error for vertex-aligned payloads.
            if not ((vc == 0) | (vc == counts)).all():
                raise ValueError(f"{name} lists must be vertex-aligned or empty")
            out = np.full(total, np.nan)
            have = np.repeat(vc > 0, counts)
            out[have] = flat
            cols[name[:-1] if name.endswith("s") else name] = pa.array(out)
    if "parts" in carry_cols:
        parts = _col(batch, "parts")
        pcounts = _list_counts(parts)
        pstarts_flat = parts.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        # Entities with an empty parts list have one implicit part 0:
        # splice a 0 at each such entity's slot (vectorized np.insert).
        implicit = pcounts == 0
        if implicit.any():
            pbase0 = np.concatenate([[0], np.cumsum(pcounts)[:-1]]).astype(np.int64)
            pstarts_flat = np.insert(pstarts_flat, pbase0[implicit], 0)
            pcounts = np.where(implicit, 1, pcounts)
        marks = np.zeros(total + 1, dtype=np.int64)
        gpos = np.repeat(starts, pcounts) + pstarts_flat
        np.add.at(marks, gpos, 1)
        ordv = np.cumsum(marks[:-1])
        part = ordv - np.repeat(ordv[starts], counts)
        cols["part"] = pa.array(part)
        if "part_types" in carry_cols:
            pt_arr = _col(batch, "part_types")
            ptc = _list_counts(pt_arr)
            pt_flat = pt_arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            # Align to the (implicit-part-padded) pcounts: entities may
            # omit part_types entirely (-> type 0); partial lists are a
            # caller error.
            ok = ptc == pcounts
            if not (ok | (ptc == 0)).all():
                raise ValueError("part_types lists must match parts or be empty")
            if not ok.all():
                aligned = np.zeros(int(pcounts.sum()), dtype=np.int64)
                aligned[np.repeat(ok, pcounts)] = pt_flat
                pt_flat = aligned
            pbase = np.concatenate([[0], np.cumsum(pcounts)[:-1]]).astype(np.int64)
            flat_pidx = np.repeat(pbase, counts) + part
            cols["ptype"] = pa.array(pt_flat[flat_pidx])
    return pa.table(cols)


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
    cols = {
        "entity_id": batch["entity_id"],
        "vertex_idx": batch["vertex_idx"],
        "x": pa.array(o1),
        "y": pa.array(o2),
    }
    # Carried per-vertex payloads (z/m/part/ptype from explode_vertices
    # carry_cols) pass through untouched — the reference's gk-shp
    # copies heights and ring structure unchanged (-hc behavior).
    for name in batch.column_names:
        if name not in cols:
            cols[name] = batch[name]
    return pa.table(cols)


def reassemble_entities(vertices: Dataset) -> Dataset:
    """Co-partition by entity_id -> ordered list columns back (M5).

    Run-length reassembly across ALL entities of a partition at once
    (engine.shuffle.keyed_partition_map) — per-entity map_groups pays
    Ray's ~0.1 ms/group overhead, ruinous at shapefile scale.

    Carried per-vertex payloads reassemble too: ``z``/``m`` back to
    ``zs``/``ms`` lists (all-NaN entities back to empty lists), and
    the per-vertex ``part`` ordinal (+``ptype``) back to the
    ``parts``/``part_types`` offset lists — so a z/multi-part
    geometry round-trips through the flat pipeline with NO side join."""
    from engine.shuffle import keyed_partition_map

    cols = vertices.schema().names
    has = {c for c in ("z", "m", "part", "ptype") if c in cols}

    def regroup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["entity_id", "vertex_idx"], kind="stable")
        ids = df["entity_id"].to_numpy()
        n = len(ids)
        if n == 0:
            base = {"entity_id": [], "xs": [], "ys": [], "n_vertices": []}
            if "z" in has:
                base["zs"] = []
            if "m" in has:
                base["ms"] = []
            if "part" in has:
                base["parts"] = []
            if "ptype" in has:
                base["part_types"] = []
            return pd.DataFrame(base)
        new = np.ones(n, dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        x = df["x"].to_numpy()
        y = df["y"].to_numpy()
        out = {
            "entity_id": ids[starts].astype(np.int64),
            "xs": [x[s : s + l] for s, l in zip(starts, lens)],
            "ys": [y[s : s + l] for s, l in zip(starts, lens)],
            "n_vertices": lens.astype(np.int64),
        }
        for flat_name, list_name in (("z", "zs"), ("m", "ms")):
            if flat_name in has:
                v = df[flat_name].to_numpy()
                out[list_name] = [
                    seg if not np.isnan(seg).all() else np.zeros(0)
                    for seg in (v[s : s + l] for s, l in zip(starts, lens))
                ]
        if "part" in has:
            p = df["part"].to_numpy()
            vidx = df["vertex_idx"].to_numpy()
            pb = np.ones(n, dtype=bool)
            pb[1:] = (ids[1:] != ids[:-1]) | (p[1:] != p[:-1])
            pstarts = np.flatnonzero(pb)
            # per-part entity slot; split the part-start list back per
            # entity via sorted-boundary search (ent_of_part is
            # non-decreasing, so np.split segments are exact).
            ent_of_part = np.searchsorted(starts, pstarts, side="right") - 1
            bounds = np.searchsorted(ent_of_part, np.arange(1, len(starts)))
            local = vidx[pstarts].astype(np.int32)
            out["parts"] = np.split(local, bounds)
            if "ptype" in has:
                pt = df["ptype"].to_numpy()[pstarts].astype(np.int32)
                out["part_types"] = np.split(pt, bounds)
        return pd.DataFrame(out)

    return keyed_partition_map(vertices, ["entity_id"], regroup)


def transform_geometry(
    ds: Dataset, transform: int = 5, carry_cols: tuple = ()
) -> Dataset:
    """Full gk-shp lifecycle: explode -> transform -> reassemble.

    ``carry_cols`` (e.g. ("zs", "ms", "parts", "part_types")) thread
    per-vertex payloads and ring structure through the flat vertex
    table and back — fully streaming, no side join for geometry."""
    v = ds.map_batches(
        explode_vertices,
        fn_kwargs=dict(carry_cols=tuple(carry_cols)),
        batch_format="pyarrow",
    )
    v = v.map_batches(transform_vertices, fn_kwargs=dict(transform=transform), batch_format="pyarrow")
    return reassemble_entities(v)
