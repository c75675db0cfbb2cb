"""Scalar, straight-from-the-formulas reference implementation.

Golden-vector source for the vectorized kernels (SURVEY.md §5.2.1):
pure ``math``-module Python, one point at a time, written directly
from the published Krüger/Redfearn + Bursa-Wolf formulas and kept
deliberately independent of the NumPy code paths in geokit.tm /
geokit.helmert / geokit.cells. Every vectorized kernel must match
this to <=1e-9 deg / <=1 mm on the ctt-style fixture points.
"""

from __future__ import annotations

import math

from geokit.datums import HelmertParams, TMProjection
from geokit.ellipsoids import Ellipsoid


def merid_arc(phi: float, ell: Ellipsoid) -> float:
    e2 = ell.e2
    return ell.a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * math.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * math.sin(4 * phi)
        - (35 * e2**3 / 3072) * math.sin(6 * phi)
    )


def tm_fwd_scalar(fi_deg: float, la_deg: float, proj: TMProjection) -> tuple[float, float]:
    ell = proj.ellipsoid
    e2, ep2 = ell.e2, ell.ep2
    phi = math.radians(fi_deg)
    lam = math.radians(la_deg)
    N = ell.a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    T = math.tan(phi) ** 2
    C = ep2 * math.cos(phi) ** 2
    A = (lam - math.radians(proj.lon0_deg)) * math.cos(phi)
    M = merid_arc(phi, ell)
    M0 = merid_arc(math.radians(proj.lat0_deg), ell)
    easting = proj.false_easting + proj.k0 * N * (
        A + (1 - T + C) * A**3 / 6 + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120
    )
    northing = proj.false_northing + proj.k0 * (
        M - M0
        + N * math.tan(phi) * (
            A**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720
        )
    )
    return northing, easting


def tm_inv_scalar(x: float, y: float, proj: TMProjection) -> tuple[float, float]:
    ell = proj.ellipsoid
    a, e2, ep2 = ell.a, ell.e2, ell.ep2
    M = merid_arc(math.radians(proj.lat0_deg), ell) + (x - proj.false_northing) / proj.k0
    mu = M / (a * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * math.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * math.sin(4 * mu)
        + (151 * e1**3 / 96) * math.sin(6 * mu)
        + (1097 * e1**4 / 512) * math.sin(8 * mu)
    )
    C1 = ep2 * math.cos(phi1) ** 2
    T1 = math.tan(phi1) ** 2
    N1 = a / math.sqrt(1 - e2 * math.sin(phi1) ** 2)
    R1 = a * (1 - e2) / (1 - e2 * math.sin(phi1) ** 2) ** 1.5
    D = (y - proj.false_easting) / (N1 * proj.k0)
    phi = phi1 - (N1 * math.tan(phi1) / R1) * (
        D**2 / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * ep2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * ep2 - 3 * C1**2) * D**6 / 720
    )
    lam = math.radians(proj.lon0_deg) + (
        D
        - (1 + 2 * T1 + C1) * D**3 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * ep2 + 24 * T1**2) * D**5 / 120
    ) / math.cos(phi1)
    return math.degrees(phi), math.degrees(lam)


def fila2xyz_scalar(fi: float, la: float, h: float, ell: Ellipsoid) -> tuple[float, float, float]:
    phi, lam = math.radians(fi), math.radians(la)
    N = ell.a / math.sqrt(1 - ell.e2 * math.sin(phi) ** 2)
    return (
        (N + h) * math.cos(phi) * math.cos(lam),
        (N + h) * math.cos(phi) * math.sin(lam),
        (N * (1 - ell.e2) + h) * math.sin(phi),
    )


def xyz2fila_scalar(X: float, Y: float, Z: float, ell: Ellipsoid) -> tuple[float, float, float]:
    p = math.hypot(X, Y)
    lam = math.atan2(Y, X)
    phi = math.atan2(Z, p * (1 - ell.e2))
    for _ in range(8):
        N = ell.a / math.sqrt(1 - ell.e2 * math.sin(phi) ** 2)
        phi = math.atan2(Z + ell.e2 * N * math.sin(phi), p)
    N = ell.a / math.sqrt(1 - ell.e2 * math.sin(phi) ** 2)
    h = p / math.cos(phi) - N
    return math.degrees(phi), math.degrees(lam), h


def helmert_scalar(
    X: float, Y: float, Z: float, p: HelmertParams
) -> tuple[float, float, float]:
    c = p.scale
    rx, ry, rz = p.rx, p.ry, p.rz
    return (
        c * (X - rz * Y + ry * Z) + p.dx,
        c * (rz * X + Y - rx * Z) + p.dy,
        c * (-ry * X + rx * Y + Z) + p.dz,
    )


def bilinear_scalar(
    grid, fi: float, la: float
) -> float:
    """Scalar bilinear geoid interpolation (same contract as
    geokit.geoid.geoid_undulation, in-bounds points only)."""
    ri = (fi - grid.lat0) / grid.dlat
    ci = (la - grid.lon0) / grid.dlon
    r0 = min(int(math.floor(ri)), grid.N.shape[0] - 2)
    c0 = min(int(math.floor(ci)), grid.N.shape[1] - 2)
    fr, fc = ri - r0, ci - c0
    g = grid.N
    return (
        g[r0, c0] * (1 - fr) * (1 - fc)
        + g[r0, c0 + 1] * (1 - fr) * fc
        + g[r0 + 1, c0] * fr * (1 - fc)
        + g[r0 + 1, c0 + 1] * fr * fc
    )


def cell_id_scalar(fi: float, la: float, level: int) -> int:
    """Digit-at-a-time recomputation of geokit.cells.cell_id."""
    phi, lam = math.radians(fi), math.radians(la)
    x = math.cos(phi) * math.cos(lam)
    y = math.cos(phi) * math.sin(lam)
    z = math.sin(phi)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x >= 0 else 3
        major, u, v = x, y / x, z / x
    elif ay >= az:
        face = 1 if y >= 0 else 4
        major, u, v = y, z / y, x / y
    else:
        face = 2 if z >= 0 else 5
        major, u, v = z, x / z, y / z

    def st(w: float) -> float:
        return 0.5 * math.sqrt(1 + 3 * w) if w >= 0 else 1 - 0.5 * math.sqrt(1 - 3 * w)

    n = 1 << level
    i = min(max(int(st(u) * n), 0), n - 1)
    j = min(max(int(st(v) * n), 0), n - 1)
    morton = 0
    for b in range(level):
        morton |= ((i >> b) & 1) << (2 * b)
        morton |= ((j >> b) & 1) << (2 * b + 1)
    return (level << 58) | (face << 55) | morton
