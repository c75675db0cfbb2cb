"""Asset loaders with per-process caching.

Workers call these in actor ``__init__`` (or via the module-level lazy
cache for stateless stages); the arrays are loaded once per process,
mirroring the reference's compiled-in static tables (SURVEY.md §2.2 S5,
§3 control/state summary). At real cluster scale the ``GEN_DIR`` files
ship with the job's working directory / runtime env.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import pyarrow.parquet as pq

from geokit.aft import AftTriangulation, build_index
from geokit.geoid import GeoidGrid
from geokit.polygons import PolygonSet

GEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "generated")


def _ensure_generated() -> None:
    if not os.path.exists(os.path.join(GEN_DIR, "aft.npz")):
        from assets.make_assets import main

        main()


@lru_cache(maxsize=None)
def load_geoid(model: str = "slo2000") -> GeoidGrid:
    _ensure_generated()
    z = np.load(os.path.join(GEN_DIR, f"geoid_{model}.npz"))
    return GeoidGrid(
        model=model,
        N=z["N"],
        lat0=float(z["lat0"]),
        lon0=float(z["lon0"]),
        dlat=float(z["dlat"]),
        dlon=float(z["dlon"]),
    )


@lru_cache(maxsize=None)
def load_aft(direction: str = "fwd") -> AftTriangulation:
    """direction: 'fwd' = D48/GK -> D96/TM, 'inv' = D96/TM -> D48/GK.
    Returns the triangulation WITH its uniform-grid index built."""
    _ensure_generated()
    z = np.load(os.path.join(GEN_DIR, "aft.npz"))
    if direction == "fwd":
        verts, coef = z["tie_src"], z["coef_fwd"]
    elif direction == "inv":
        verts, coef = z["tie_dst"], z["coef_inv"]
    else:
        raise ValueError(direction)
    tri = AftTriangulation(name=f"aft_{direction}", verts=verts, tris=z["tris"], coef=coef)
    # 64k cells: ~3.5 candidate triangles/cell vs 10.7 at the old 4k
    # default — AFT locate measured 4x faster (16 ms vs 64 ms per 44k
    # rows); index is ~1 MB and builds in ~17 ms once per worker.
    return build_index(tri, target_cells=65536)


@lru_cache(maxsize=None)
def load_municipalities() -> PolygonSet:
    _ensure_generated()
    t = pq.read_table(os.path.join(GEN_DIR, "municipalities.parquet"))
    xs_list = t["ring_xs"].to_pylist()
    ys_list = t["ring_ys"].to_pylist()
    ring_start = np.zeros(len(xs_list) + 1, dtype=np.int64)
    ring_start[1:] = np.cumsum([len(r) for r in xs_list])
    return PolygonSet(
        muni_id=t["muni_id"].to_numpy(),
        name=np.array(t["name"].to_pylist(), dtype=object),
        ring_start=ring_start,
        xs=np.concatenate([np.asarray(r, dtype=np.float64) for r in xs_list]),
        ys=np.concatenate([np.asarray(r, dtype=np.float64) for r in ys_list]),
        bbox=np.array(t["bbox"].to_pylist(), dtype=np.float64),
    )


@lru_cache(maxsize=None)
def load_control_points() -> dict[str, np.ndarray]:
    _ensure_generated()
    t = pq.read_table(os.path.join(GEN_DIR, "control_points.parquet"))
    return {
        "cp_id": t["cp_id"].to_numpy(),
        "x": t["x"].to_numpy(),
        "y": t["y"].to_numpy(),
    }


def load_ctt_points():
    _ensure_generated()
    return pq.read_table(os.path.join(GEN_DIR, "ctt_points.parquet"))
