"""geokit — pure-NumPy geodesy kernels (no Ray dependency).

From-scratch reimplementation of the coordinate mathematics of
mrihtar/GeoCoordinateConverter (``ggeo.c``: Transverse Mercator /
Gauss-Krüger forward+inverse, Bursa-Wolf 7-parameter Helmert,
geodetic<->ECEF, bilinear geoid-height interpolation, triangle-based
affine datum transform), expressed as vectorized float64 NumPy kernels
that operate on whole Arrow-batch columns at once.

The Ray layer (``engine/``) only orchestrates; every function here is
importable and testable without a Ray session (SURVEY.md §3.3).
"""

from geokit.ellipsoids import BESSEL, GRS80, WGS84, Ellipsoid
from geokit.datums import D48_GK, D96_TM, HELMERT_D48_TO_D96, TMProjection

__all__ = [
    "BESSEL",
    "GRS80",
    "WGS84",
    "Ellipsoid",
    "D48_GK",
    "D96_TM",
    "HELMERT_D48_TO_D96",
    "TMProjection",
]
