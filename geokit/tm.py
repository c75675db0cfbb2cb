"""Transverse Mercator (Gauss-Krüger) forward / inverse projection.

Vectorized float64 NumPy reimplementation of the reference's
``ggeo.c::fila2xy_ellips`` (forward, SURVEY.md §2.1 K3) and
``ggeo.c::xy2fila_ellips`` (inverse, K4), using the standard
Krüger/Redfearn power series (meridian-arc series in e²; footpoint
latitude by series in e1). Accuracy is sub-millimetre within a few
degrees of the central meridian — far tighter than the 1 mm round-trip
bar (BASELINE.json:north_star) over the Slovenian bbox.

Convention (reference ``GEOUTM``): x = NORTHING, y = EASTING.
"""

from __future__ import annotations

import numpy as np

from geokit.datums import TMProjection
from geokit.ellipsoids import Ellipsoid


def meridian_arc(phi: np.ndarray, ell: Ellipsoid) -> np.ndarray:
    """Meridian arc length from equator to latitude phi (radians)."""
    e2 = ell.e2
    e4 = e2 * e2
    e6 = e4 * e2
    a = ell.a
    return a * (
        (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
        - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0) * np.sin(2.0 * phi)
        + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * np.sin(4.0 * phi)
        - (35.0 * e6 / 3072.0) * np.sin(6.0 * phi)
    )


def tm_fwd(
    fi_deg: np.ndarray, la_deg: np.ndarray, proj: TMProjection
) -> tuple[np.ndarray, np.ndarray]:
    """Geographic (deg) -> grid. Returns (x=northing, y=easting) in metres."""
    ell = proj.ellipsoid
    e2 = ell.e2
    ep2 = ell.ep2
    phi = np.deg2rad(np.asarray(fi_deg, dtype=np.float64))
    lam = np.deg2rad(np.asarray(la_deg, dtype=np.float64))
    lam0 = np.deg2rad(proj.lon0_deg)

    sin_phi = np.sin(phi)
    cos_phi = np.cos(phi)
    tan_phi = sin_phi / cos_phi

    N = ell.a / np.sqrt(1.0 - e2 * sin_phi * sin_phi)
    T = tan_phi * tan_phi
    C = ep2 * cos_phi * cos_phi
    A = (lam - lam0) * cos_phi

    A2 = A * A
    A3 = A2 * A
    A4 = A2 * A2
    A5 = A4 * A
    A6 = A4 * A2

    M = meridian_arc(phi, ell)
    M0 = meridian_arc(np.deg2rad(proj.lat0_deg), ell)

    easting = proj.false_easting + proj.k0 * N * (
        A
        + (1.0 - T + C) * A3 / 6.0
        + (5.0 - 18.0 * T + T * T + 72.0 * C - 58.0 * ep2) * A5 / 120.0
    )
    northing = proj.false_northing + proj.k0 * (
        M
        - M0
        + N
        * tan_phi
        * (
            A2 / 2.0
            + (5.0 - T + 9.0 * C + 4.0 * C * C) * A4 / 24.0
            + (61.0 - 58.0 * T + T * T + 600.0 * C - 330.0 * ep2) * A6 / 720.0
        )
    )
    return northing, easting


def tm_inv(
    x: np.ndarray, y: np.ndarray, proj: TMProjection
) -> tuple[np.ndarray, np.ndarray]:
    """Grid (x=northing, y=easting, metres) -> geographic (fi, la) degrees."""
    ell = proj.ellipsoid
    a = ell.a
    e2 = ell.e2
    ep2 = ell.ep2
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)

    M0 = meridian_arc(np.deg2rad(np.float64(proj.lat0_deg)), ell)
    M = M0 + (x - proj.false_northing) / proj.k0

    e4 = e2 * e2
    e6 = e4 * e2
    mu = M / (a * (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0))

    sqrt1me2 = np.sqrt(1.0 - e2)
    e1 = (1.0 - sqrt1me2) / (1.0 + sqrt1me2)
    e1_2 = e1 * e1
    e1_3 = e1_2 * e1
    e1_4 = e1_2 * e1_2

    # Footpoint latitude.
    phi1 = (
        mu
        + (3.0 * e1 / 2.0 - 27.0 * e1_3 / 32.0) * np.sin(2.0 * mu)
        + (21.0 * e1_2 / 16.0 - 55.0 * e1_4 / 32.0) * np.sin(4.0 * mu)
        + (151.0 * e1_3 / 96.0) * np.sin(6.0 * mu)
        + (1097.0 * e1_4 / 512.0) * np.sin(8.0 * mu)
    )

    sin_phi1 = np.sin(phi1)
    cos_phi1 = np.cos(phi1)
    tan_phi1 = sin_phi1 / cos_phi1

    C1 = ep2 * cos_phi1 * cos_phi1
    T1 = tan_phi1 * tan_phi1
    one_m = 1.0 - e2 * sin_phi1 * sin_phi1
    N1 = a / np.sqrt(one_m)
    R1 = a * (1.0 - e2) / (one_m * np.sqrt(one_m))
    D = (y - proj.false_easting) / (N1 * proj.k0)

    D2 = D * D
    D3 = D2 * D
    D4 = D2 * D2
    D5 = D4 * D
    D6 = D4 * D2

    phi = phi1 - (N1 * tan_phi1 / R1) * (
        D2 / 2.0
        - (5.0 + 3.0 * T1 + 10.0 * C1 - 4.0 * C1 * C1 - 9.0 * ep2) * D4 / 24.0
        + (
            61.0
            + 90.0 * T1
            + 298.0 * C1
            + 45.0 * T1 * T1
            - 252.0 * ep2
            - 3.0 * C1 * C1
        )
        * D6
        / 720.0
    )
    lam = np.deg2rad(proj.lon0_deg) + (
        D
        - (1.0 + 2.0 * T1 + C1) * D3 / 6.0
        + (5.0 - 2.0 * C1 + 28.0 * T1 - 3.0 * C1 * C1 + 8.0 * ep2 + 24.0 * T1 * T1)
        * D5
        / 120.0
    ) / cos_phi1

    return np.rad2deg(phi), np.rad2deg(lam)


def tm_point_scale_convergence(
    fi_deg: np.ndarray, la_deg: np.ndarray, proj: TMProjection
) -> tuple[np.ndarray, np.ndarray]:
    """Point scale factor k and meridian convergence gamma (deg).

    Diagnostic outputs the reference exposes alongside conversions
    (SURVEY.md §2.6). Series truncated at the A^4 / A^3 terms —
    ample for a diagnostic at Slovenian longitudes.
    """
    ell = proj.ellipsoid
    ep2 = ell.ep2
    phi = np.deg2rad(np.asarray(fi_deg, dtype=np.float64))
    lam = np.deg2rad(np.asarray(la_deg, dtype=np.float64))
    dl = lam - np.deg2rad(proj.lon0_deg)
    cos_phi = np.cos(phi)
    sin_phi = np.sin(phi)
    tan_phi = sin_phi / cos_phi
    A = dl * cos_phi
    C = ep2 * cos_phi * cos_phi
    T = tan_phi * tan_phi
    A2 = A * A
    # Explicit multiplies (no float pow): keeps the evaluation order
    # exactly mirrorable in the DuckDB oracle SQL.
    k = proj.k0 * (1.0 + (1.0 + C) * A2 / 2.0 + (5.0 - 4.0 * T) * (A2 * A2) / 24.0)
    gamma = dl * sin_phi * (1.0 + (1.0 + 3.0 * C) * A2 / 3.0)
    return k, np.rad2deg(gamma)
