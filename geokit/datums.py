"""Projection parameter sets and Helmert parameter sets.

Mirrors the reference's constant tables (``geo.h``/``ggeo.c`` init,
SURVEY.md §2.1 K12): both Slovene grids are Transverse Mercator with
central meridian 15°E, scale 0.9999, false easting 500 000 m, false
northing −5 000 000 m; D48/GK sits on Bessel 1841, D96/TM on GRS80.

Coordinate convention follows the reference's ``GEOUTM``: **x is the
NORTHING, y is the EASTING** (SURVEY.md §1.1).

The country-wide 7-parameter set below is a *synthetic but realistic*
Slovenia-magnitude parameter set (SURVEY.md §7.2: the reference's real
data tables are unavailable in this sandbox and external data is
forbidden; constants are data, swappable without code changes). All
correctness tests are round-trip and golden-vector based against
``geokit.scalar_ref``, so any consistent set exercises the same code
paths the real constants would.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from geokit.ellipsoids import BESSEL, GRS80, Ellipsoid


@dataclass(frozen=True)
class TMProjection:
    name: str
    ellipsoid: Ellipsoid
    lon0_deg: float  # central meridian
    lat0_deg: float  # latitude of origin
    k0: float  # scale on central meridian
    false_easting: float  # added to y (easting)
    false_northing: float  # added to x (northing)


# Both Slovene grids share the projection parameters; only the datum
# (ellipsoid + Helmert shift) differs.
D48_GK = TMProjection(
    name="D48/GK",
    ellipsoid=BESSEL,
    lon0_deg=15.0,
    lat0_deg=0.0,
    k0=0.9999,
    false_easting=500_000.0,
    false_northing=-5_000_000.0,
)

D96_TM = TMProjection(
    name="D96/TM",
    ellipsoid=GRS80,
    lon0_deg=15.0,
    lat0_deg=0.0,
    k0=0.9999,
    false_easting=500_000.0,
    false_northing=-5_000_000.0,
)


@dataclass(frozen=True)
class HelmertParams:
    """Bursa-Wolf 7-parameter similarity transform parameters.

    dx, dy, dz in metres; rx, ry, rz in arc-seconds; s in ppm.
    Applied as X' = (1 + s*1e-6) * R(rx, ry, rz) @ X + T  (position-vector
    rotation convention, small-angle R), cf. reference
    ``ggeo.c::xyz2xyz_helmert`` (SURVEY.md §2.1 K7).
    """

    name: str
    dx: float
    dy: float
    dz: float
    rx_sec: float
    ry_sec: float
    rz_sec: float
    s_ppm: float

    @property
    def rx(self) -> float:
        return math.radians(self.rx_sec / 3600.0)

    @property
    def ry(self) -> float:
        return math.radians(self.ry_sec / 3600.0)

    @property
    def rz(self) -> float:
        return math.radians(self.rz_sec / 3600.0)

    @property
    def scale(self) -> float:
        return 1.0 + self.s_ppm * 1e-6


# Country-wide best-fit set, D48 (Bessel geocentric) -> D96/ETRS89
# (GRS80 geocentric). Magnitudes match the published Slovenia-wide
# transformation class (hundreds of metres translation, arcsec-level
# rotations, ~10 ppm scale); exact digits are synthetic per module
# docstring.
HELMERT_D48_TO_D96 = HelmertParams(
    name="slovenia_v1",
    dx=409.520,
    dy=72.192,
    dz=486.872,
    rx_sec=-3.086250,
    ry_sec=-5.468945,
    rz_sec=11.020370,
    s_ppm=-17.919456,
)

# Alternate / regional sets present so the parameter-set selection
# surface exists (SURVEY.md §2.1 K12). Region keys are illustrative.
HELMERT_SETS: dict[str, HelmertParams] = {
    "slovenia_v1": HELMERT_D48_TO_D96,
    "region_ne": HelmertParams("region_ne", 409.8, 72.4, 486.5, -3.09, -5.47, 11.03, -17.9),
    "region_sw": HelmertParams("region_sw", 409.2, 71.9, 487.1, -3.08, -5.46, 11.01, -17.94),
}

# Slovenia geographic bounding box used by assets and validity checks.
SLO_BBOX = (45.2, 13.1, 47.1, 16.7)  # (lat_min, lon_min, lat_max, lon_max)
