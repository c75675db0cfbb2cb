"""Ray Data stages: transform kernels + stateful actor-pool joins.

Stage catalogue (SURVEY.md §7.4):

- stateless ``map_batches`` fns: projection/datum transforms (menu
  1-6), geoid heights (grid is a few MB, module-level cache), cell
  assignment, formatters, filters;
- actor-pool callable classes: ``AftTransform`` (triangulation + grid
  index built once per actor, K9/J1), ``PipJoin`` (polygons once per
  actor, J3), ``KnnJoin`` (control points once per actor, J4).

All kernels are Arrow-in/Arrow-out (``batch_format="pyarrow"``,
zero-copy from the object store) and fully vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import assets
from geokit import transforms as T
from geokit.cells import cell_id
from geokit.datums import D96_TM
from geokit.geoid import geoid_undulation
from geokit.knn import PaddedGridKnn
from geokit.polygons import pip_lookup_auto
from geokit.tm import tm_fwd


def _np(batch: pa.Table, col: str) -> np.ndarray:
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False)


def project_stage(batch: pa.Table) -> pa.Table:
    """fi/la (ETRS89) -> both Slovene grids via the Helmert chain
    (menu 2 + 4): adds x_d96, y_d96, x_d48, y_d48."""
    fi = _np(batch, "fi")
    la = _np(batch, "la")
    x96, y96 = tm_fwd(fi, la, D96_TM)
    x48, y48, _ = T.fila_wgs2gkxy(fi, la)
    return (
        batch.append_column("x_d96", pa.array(x96))
        .append_column("y_d96", pa.array(y96))
        .append_column("x_d48", pa.array(x48))
        .append_column("y_d48", pa.array(y48))
    )


def geoid_stage(batch: pa.Table, model: str = "slo2000", h_col: str | None = None) -> pa.Table:
    """Adds geoid undulation N + orthometric height H (h_ell − N).

    The grid is loaded once per process via the assets lru_cache —
    stateless task is fine, no actor needed (SURVEY.md §2.1 K8)."""
    grid = assets.load_geoid(model)
    fi = _np(batch, "fi")
    la = _np(batch, "la")
    und, inb = geoid_undulation(fi, la, grid)
    h = _np(batch, h_col) if h_col else np.zeros_like(fi)
    return (
        batch.append_column("geoid_n", pa.array(und))
        .append_column("geoid_in_bounds", pa.array(inb))
        .append_column("H_orth", pa.array(h - und))
    )


def cell_stage(batch: pa.Table, level: int = 12) -> pa.Table:
    """S2-style cell id at the given level (north_rule tiling)."""
    cid = cell_id(_np(batch, "fi"), _np(batch, "la"), level)
    return batch.append_column("cell", pa.array(cid, pa.int64()))


def prepare_stage(batch: pa.Table, level: int = 12, geoid_model: str = "slo2000") -> pa.Table:
    """Fused stateless chain: extract -> filter -> project -> geoid ->
    cell. One map operator instead of five: per-task scheduling
    overhead is paid once per block, and intermediate columns never
    hit the object store."""
    from engine.extract import extract_coords, filter_has_coord

    b = filter_has_coord(extract_coords(batch))
    b = project_stage(b)
    b = geoid_stage(b, model=geoid_model)
    return cell_stage(b, level=level)


class SpatialJoin:
    """Fused stateful stage: AFT triangle transform + municipality PIP
    + control-point kNN. All three small sides load once per
    process/actor (triangulation index, polygon table, padded-grid kNN
    index); __call__ runs the three vectorized lookups back-to-back on
    the same resident batch.

    Two deployment shapes:
    - ``spatial_join_stage`` (default in the pipeline): stateless
      map_batches fn with a module-level singleton — the state is
      small (~2 MB) and immutable, so persistent task workers build it
      once per process FOR THE WHOLE SESSION and stay elastic. An
      actor pool here would pay pool construction (new processes +
      imports + index build) on every execution — measured 3-10 s per
      run at 16 actors.
    - ``map_batches(SpatialJoin, concurrency=...)`` directly: the
      actor-pool shape, appropriate when the state is too big or too
      slow to build in every task worker (multi-GB indexes, model
      weights) and construction must be bounded to the pool size.
    """

    def __init__(self, direction: str = "fwd", k: int = 3):
        self.aft = AftTransform(direction)
        self.pip = PipJoin()
        self.knn = KnnJoin(k=k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.knn(self.pip(self.aft(batch)))


_SPATIAL_SINGLETON: dict[tuple, SpatialJoin] = {}


def spatial_join_stage(batch: pa.Table, direction: str = "fwd", k: int = 3) -> pa.Table:
    """Stateless-task wrapper around SpatialJoin with a per-process
    cache (see SpatialJoin docstring for the deployment trade-off)."""
    key = (direction, k)
    sj = _SPATIAL_SINGLETON.get(key)
    if sj is None:
        sj = _SPATIAL_SINGLETON[key] = SpatialJoin(direction=direction, k=k)
    return sj(batch)


class AftTransform:
    """Actor-pool stage for the triangle-based affine transform (K9).

    ``__init__`` (once per actor) loads the triangulation and builds
    the uniform-grid candidate index; ``__call__`` (per batch) does
    the fully vectorized locate+apply. Adds x_<out>/y_<out>_aft
    columns + aft_found flag; out-of-coverage rows fall back to the
    already-computed Helmert columns when present (reference
    out-of-coverage behaviour)."""

    def __init__(self, direction: str = "fwd"):
        self.tri = assets.load_aft(direction)
        self.direction = direction
        src = "d48" if direction == "fwd" else "d96"
        dst = "d96" if direction == "fwd" else "d48"
        self.xin, self.yin = f"x_{src}", f"y_{src}"
        self.xout, self.yout = f"x_{dst}_aft", f"y_{dst}_aft"
        self.x_helm, self.y_helm = f"x_{dst}", f"y_{dst}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _np(batch, self.xin)
        y = _np(batch, self.yin)
        xo, yo, found = T.gkxy2tmxy_aft(x, y, self.tri)
        if self.x_helm in batch.column_names:
            xh = _np(batch, self.x_helm)
            yh = _np(batch, self.y_helm)
            xo = np.where(found, xo, xh)
            yo = np.where(found, yo, yh)
        return (
            batch.append_column(self.xout, pa.array(xo))
            .append_column(self.yout, pa.array(yo))
            .append_column("aft_found", pa.array(found))
        )


class PipJoin:
    """Point-in-polygon join vs municipality polygons (J3): broadcast
    small side, bbox prefilter + vectorized ray-crossing per batch.
    Adds muni_id (int32, -1 outside) + muni_name (null outside)."""

    def __init__(self, x_col: str = "x_d96", y_col: str = "y_d96"):
        self.polys = assets.load_municipalities()
        self.x_col, self.y_col = x_col, y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = _np(batch, self.x_col)
        py = _np(batch, self.y_col)
        # Auto-routes through the uniform-grid candidate index when the
        # polygon set is nationwide-sized (zone_of exists for
        # single-output callers; here idx is also needed for the name
        # gather, so the lookup runs once).
        idx = pip_lookup_auto(self.polys, px, py)
        found = idx >= 0
        muni = np.where(
            found, self.polys.muni_id[np.where(found, idx, 0)], -1
        ).astype(np.int32)
        names = np.where(found, self.polys.name[np.where(found, idx, 0)], None)
        return batch.append_column("muni_id", pa.array(muni, pa.int32())).append_column(
            "muni_name", pa.array(names, pa.string())
        )


class KnnJoin:
    """kNN join vs reference control points (J4): broadcast small
    side held as a PaddedGridKnn index (exact; ~W=12 candidates per
    query instead of all m control points — the IVF-style scale path,
    built once per actor). Adds nn_ids (list<int32>) +
    nn_dists (list<double>)."""

    def __init__(self, k: int = 3, x_col: str = "x_d96", y_col: str = "y_d96"):
        cp = assets.load_control_points()
        self.cp_id = cp["cp_id"]
        self.index = PaddedGridKnn(cp["x"], cp["y"], k, ncells=8192)
        self.x_col, self.y_col = x_col, y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = _np(batch, self.x_col)
        py = _np(batch, self.y_col)
        idx, dist = self.index.query(px, py)
        ids = self.cp_id[idx].astype(np.int32)
        n, k = ids.shape
        offsets = np.arange(0, (n + 1) * k, k, dtype=np.int32)
        ids_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(ids.ravel()))
        d_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(dist.ravel()))
        return batch.append_column("nn_ids", ids_arr).append_column("nn_dists", d_arr)
