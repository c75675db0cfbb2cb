"""Raster <-> vector operators (north_rule: "raster<->vector").

A raster here is a regular grid in projected space with the engine's
axis convention (x = northing -> row, y = easting -> col); pixels are
addressed by ``row = floor((x - x0)/dx)``, ``col = floor((y - y0)/dy)``.
Three operator families:

- ``rasterize_points`` (vector -> raster): bin points into pixels with
  the combiner-aggregate shuffle shape (engine.shuffle) — count + sum
  per pixel; the raster is a Dataset of (row, col, cnt, sums), i.e.
  sparse COO tiles that write as partitioned parquet.
- ``RasterSampler`` (raster -> vector): nearest + bilinear sampling of
  a broadcast raster at point locations; the raster array loads once
  per worker (same deployment shape as the geoid grid K8).
- ``zonal_stats`` (raster x vector): aggregate pixel values per
  polygon zone — PIP of pixel centers against the broadcast polygon
  table, then a combiner groupby per zone.

All three are SQL-value-oracled in engine/sql_oracles.py (floor
arithmetic + GROUP BY; analytic raster values mirrored term-for-term).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from ray.data import Dataset


@dataclass(frozen=True)
class RasterSpec:
    """Grid geometry: pixel (r, c) spans [x0 + r*dx, x0 + (r+1)*dx) x
    [y0 + c*dy, y0 + (c+1)*dy); value nodes sit at pixel CENTERS."""

    x0: float
    y0: float
    dx: float
    dy: float
    nrows: int
    ncols: int

    def pixel_of(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        r = np.floor((x - self.x0) / self.dx).astype(np.int64)
        c = np.floor((y - self.y0) / self.dy).astype(np.int64)
        inb = (r >= 0) & (r < self.nrows) & (c >= 0) & (c < self.ncols)
        return r, c, inb

    def center(self, r: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return (
            self.x0 + (r + 0.5) * self.dx,
            self.y0 + (c + 0.5) * self.dy,
        )


def rasterize_points(
    ds: Dataset,
    spec: RasterSpec,
    x_col: str = "x",
    y_col: str = "y",
    value_cols: tuple[str, ...] = (),
) -> Dataset:
    """Vector -> raster: points binned to pixels, count + per-pixel
    sums via the combiner aggregate (one partial row per pixel per
    block crosses the shuffle). Out-of-extent points are dropped.
    Output: (pix_row, pix_col, cnt, sum_<v>...)."""
    from engine.shuffle import grouped_count_sums

    def to_pixels(batch: pa.Table) -> pa.Table:
        from engine.util import col_np

        x = col_np(batch, x_col)
        y = col_np(batch, y_col)
        r, c, inb = spec.pixel_of(x, y)
        cols = {
            "pix": pa.array(r[inb] * spec.ncols + c[inb]),
        }
        for v in value_cols:
            cols[v] = pa.array(batch[v].to_numpy(zero_copy_only=False)[inb])
        return pa.table(cols)

    binned = ds.map_batches(to_pixels, batch_format="pyarrow")
    agg = grouped_count_sums(binned, key="pix", sum_cols=value_cols)

    def unpack(batch: pa.Table) -> pa.Table:
        pix = batch["pix"].to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "pix_row": pa.array(pix // spec.ncols),
                "pix_col": pa.array(pix % spec.ncols),
            }
        )
        for name in batch.column_names:
            if name != "pix":
                out = out.append_column(name, batch[name])
        return out

    return agg.map_batches(unpack, batch_format="pyarrow")


class RasterSampler:
    """Raster -> vector: sample a raster at point locations, nearest
    and bilinear (between pixel centers). The value array is built once
    per worker/actor from ``value_fn(row_grid, col_grid)`` (or pass a
    precomputed array) — broadcast-small-side shape, like K8."""

    def __init__(self, spec: RasterSpec, value_fn=None, values: np.ndarray | None = None):
        self.spec = spec
        if values is None:
            r = np.arange(spec.nrows, dtype=np.float64)
            c = np.arange(spec.ncols, dtype=np.float64)
            values = value_fn(r[:, None], c[None, :])
        self.values = np.ascontiguousarray(values, dtype=np.float64)

    def sample(
        self, x: np.ndarray, y: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (nearest, bilinear, in_bounds); out-of-extent points
        get 0.0 (reference K8 fallback convention)."""
        sp = self.spec
        # in_bounds = FULL raster extent (same rule as pixel_of), not
        # the pixel-center hull: points in the outer half-pixel band
        # have a well-defined nearest pixel and get edge-clamped
        # bilinear, instead of being zeroed.
        rx = (np.asarray(x, dtype=np.float64) - sp.x0) / sp.dx
        cx_ = (np.asarray(y, dtype=np.float64) - sp.y0) / sp.dy
        inb = (rx >= 0.0) & (rx < sp.nrows) & (cx_ >= 0.0) & (cx_ < sp.ncols)
        # Continuous pixel-center coordinates.
        rf = rx - 0.5
        cf = cx_ - 0.5
        rfc = np.clip(rf, 0.0, float(sp.nrows - 1))
        cfc = np.clip(cf, 0.0, float(sp.ncols - 1))
        r0 = np.minimum(np.floor(rfc).astype(np.int64), sp.nrows - 2)
        c0 = np.minimum(np.floor(cfc).astype(np.int64), sp.ncols - 2)
        fr = rfc - r0
        fc = cfc - c0
        g = self.values
        n00 = g[r0, c0]
        n01 = g[r0, c0 + 1]
        n10 = g[r0 + 1, c0]
        n11 = g[r0 + 1, c0 + 1]
        bilin = (
            n00 * (1.0 - fr) * (1.0 - fc)
            + n01 * (1.0 - fr) * fc
            + n10 * fr * (1.0 - fc)
            + n11 * fr * fc
        )
        rn = np.clip(np.floor(rfc + 0.5).astype(np.int64), 0, sp.nrows - 1)
        cn = np.clip(np.floor(cfc + 0.5).astype(np.int64), 0, sp.ncols - 1)
        near = g[rn, cn]
        return (
            np.where(inb, near, 0.0),
            np.where(inb, bilin, 0.0),
            inb,
        )


def pixel_table(spec: RasterSpec, value_fn) -> pa.Table:
    """Materialize the dense pixel-center table (row, col, cx, cy,
    value) — the vector view of an analytic raster; used by zonal
    stats and as a deterministic raster source for tests/oracles."""
    r = np.repeat(np.arange(spec.nrows, dtype=np.int64), spec.ncols)
    c = np.tile(np.arange(spec.ncols, dtype=np.int64), spec.nrows)
    cx, cy = spec.center(r, c)
    val = value_fn(r.astype(np.float64), c.astype(np.float64))
    return pa.table(
        {
            "pix_row": pa.array(r),
            "pix_col": pa.array(c),
            "cx": pa.array(cx),
            "cy": pa.array(cy),
            "value": pa.array(val),
        }
    )


def zonal_stats(
    pixels: Dataset,
    polys,
    x_col: str = "cx",
    y_col: str = "cy",
    value_col: str = "value",
) -> Dataset:
    """Raster x vector: per-zone count + sum of pixel values for
    pixels whose CENTER falls inside the zone polygon (-1 = outside
    all). PIP against the broadcast polygon set per batch, then the
    combiner groupby."""
    from engine.shuffle import grouped_count_sums
    from engine.util import col_np
    from geokit.polygons import zone_of

    def assign(batch: pa.Table) -> pa.Table:
        zone = zone_of(polys, col_np(batch, x_col), col_np(batch, y_col))
        return pa.table(
            {
                "zone": pa.array(zone, pa.int32()),
                value_col: batch[value_col],
            }
        )

    assigned = pixels.map_batches(assign, batch_format="pyarrow")
    return grouped_count_sums(assigned, key="zone", sum_cols=(value_col,))
