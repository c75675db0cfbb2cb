"""Geodetic <-> ECEF conversions and Bursa-Wolf 7-parameter transform.

Vectorized reimplementation of the reference's ``ggeo.c::fila2xyz``
(SURVEY.md §2.1 K5), ``ggeo.c::xyz2fila`` (K6, iterative latitude
solve with fixed iteration count for determinism) and
``ggeo.c::xyz2xyz_helmert`` (K7, small-angle position-vector rotation).

The inverse Helmert uses the *exact* inverse of the forward linear map
(a 3x3 solve of the same similarity) rather than sign-negated
parameters: negated small-angle parameters leave a ~4 mm round-trip
residual at Slovenian rotation magnitudes, which would eat the entire
1 mm round-trip budget (BASELINE.json:north_star).
"""

from __future__ import annotations

import numpy as np

from geokit.datums import HelmertParams
from geokit.ellipsoids import Ellipsoid


def fila2xyz(
    fi_deg: np.ndarray,
    la_deg: np.ndarray,
    h: np.ndarray,
    ell: Ellipsoid,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Geodetic (deg, deg, m ellipsoidal) -> geocentric ECEF (m)."""
    phi = np.deg2rad(np.asarray(fi_deg, dtype=np.float64))
    lam = np.deg2rad(np.asarray(la_deg, dtype=np.float64))
    h = np.asarray(h, dtype=np.float64)
    e2 = ell.e2
    sin_phi = np.sin(phi)
    cos_phi = np.cos(phi)
    N = ell.a / np.sqrt(1.0 - e2 * sin_phi * sin_phi)
    X = (N + h) * cos_phi * np.cos(lam)
    Y = (N + h) * cos_phi * np.sin(lam)
    Z = (N * (1.0 - e2) + h) * sin_phi
    return X, Y, Z


def xyz2fila(
    X: np.ndarray,
    Y: np.ndarray,
    Z: np.ndarray,
    ell: Ellipsoid,
    iterations: int = 8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ECEF -> geodetic. Fixed-point latitude iteration, fixed count
    (determinism over data-dependent convergence; 8 iterations reach
    <1e-12 rad for |h| < 10 km)."""
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    Z = np.asarray(Z, dtype=np.float64)
    e2 = ell.e2
    a = ell.a
    p = np.sqrt(X * X + Y * Y)
    lam = np.arctan2(Y, X)
    # Initial latitude ignoring height.
    phi = np.arctan2(Z, p * (1.0 - e2))
    for _ in range(iterations):
        sin_phi = np.sin(phi)
        N = a / np.sqrt(1.0 - e2 * sin_phi * sin_phi)
        phi = np.arctan2(Z + e2 * N * sin_phi, p)
    sin_phi = np.sin(phi)
    N = a / np.sqrt(1.0 - e2 * sin_phi * sin_phi)
    h = p / np.cos(phi) - N
    return np.rad2deg(phi), np.rad2deg(lam), h


def _rotation_matrix(params: HelmertParams) -> np.ndarray:
    """Small-angle position-vector rotation matrix (row-major 3x3)."""
    rx, ry, rz = params.rx, params.ry, params.rz
    return np.array(
        [
            [1.0, -rz, ry],
            [rz, 1.0, -rx],
            [-ry, rx, 1.0],
        ],
        dtype=np.float64,
    )


def helmert(
    X: np.ndarray,
    Y: np.ndarray,
    Z: np.ndarray,
    params: HelmertParams,
    inverse: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply (or exactly invert) X' = c * R @ X + T over a batch.

    Vectorized as one 3x3 matmul over the whole batch
    (SURVEY.md §2.1 K7: ``np.einsum('ij,nj->ni', R, X)`` shape).
    """
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    Z = np.asarray(Z, dtype=np.float64)
    c = params.scale
    rx, ry, rz = params.rx, params.ry, params.rz
    if not inverse:
        # Explicit component expressions (not a matmul): fixed
        # left-to-right evaluation order, bitwise-mirrorable in oracle
        # SQL and identical to scalar_ref.helmert_scalar.
        Xo = c * (X - rz * Y + ry * Z) + params.dx
        Yo = c * (rz * X + Y - rx * Z) + params.dy
        Zo = c * (-ry * X + rx * Y + Z) + params.dz
        return Xo, Yo, Zo
    R = _rotation_matrix(params)
    Rinv = np.linalg.inv(R)
    P = np.stack([X, Y, Z], axis=-1)
    T = np.array([params.dx, params.dy, params.dz], dtype=np.float64)
    out = ((P - T) / c) @ Rinv.T
    return out[..., 0], out[..., 1], out[..., 2]
