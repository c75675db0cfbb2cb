"""S2-inspired spherical cell index, from scratch (SURVEY.md §7.3.4).

No h3/s2 library is installed in this environment, so this implements
a self-contained cube-face cell scheme using only published math
(the S2 geometry papers/docs describe the projection pipeline):

  lat/lon -> unit-sphere (x, y, z)
          -> cube face f in 0..5 (dominant axis)
          -> face coords (u, v) in [-1, 1]
          -> quadratic reprojection to (s, t) in [0, 1]   (S2's
             area-flattening "quadratic" transform)
          -> discrete (i, j) at resolution level L (i = floor(s·2^L))
          -> cell id: uint64 = (L << 58) | (f << 55) | morton(i, j)

Differences from real S2 (documented deliberately): bit layout is our
own explicit (level, face, Morton) packing rather than S2's trailing-
bit format, and child ordering is plain Morton rather than the Hilbert
curve. Equality joins, groupbys and parent/child containment — all the
engine needs (north_rule "H3/S2-style cell id") — behave identically;
only the linear ordering of adjacent ids differs. Max level 27
(2·27 = 54 Morton bits + 3 face + 6 level fits in 63 bits).

Fully vectorized uint64 NumPy bit arithmetic; the scalar oracle in
``geokit.scalar_ref`` recomputes it digit-by-digit for tests.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 27


def _spread_bits_27(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between bits of a 27-bit int (Morton spread)."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def latlon_to_xyz(fi_deg: np.ndarray, la_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    phi = np.deg2rad(np.asarray(fi_deg, dtype=np.float64))
    lam = np.deg2rad(np.asarray(la_deg, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # Dominant axis picks the face; ties broken by axis order (x, y, z).
    fx = (ax >= ay) & (ax >= az)
    fy = ~fx & (ay >= az)
    fz = ~fx & ~fy
    face = np.where(fx, np.where(x >= 0, 0, 3), np.where(fy, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5))).astype(np.int64)
    major = np.where(fx, x, np.where(fy, y, z))
    # Face-local axes, cyclic per dominant axis: x->(y,z), y->(z,x),
    # z->(x,y). Dividing by the (possibly negative) major keeps
    # (u, v) in [-1, 1] and bijective per face, since the face id
    # already encodes the major-axis sign.
    u = np.where(fx, y, np.where(fy, z, x)) / major
    v = np.where(fx, z, np.where(fy, x, y)) / major
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2 quadratic area-flattening transform, [-1,1] -> [0,1]."""
    pos = u >= 0
    # Clip the unused branch's argument so np.where doesn't evaluate
    # sqrt of a negative (u is in [-1, 1] by construction).
    return np.where(
        pos,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def cell_id(fi_deg: np.ndarray, la_deg: np.ndarray, level: int) -> np.ndarray:
    """lat/lon (deg) -> int64 cell id at the given level (value always
    < 2^63; computed in uint64 bit arithmetic)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x, y, z = latlon_to_xyz(fi_deg, la_deg)
    face, u, v = _face_uv(x, y, z)
    s = _uv_to_st(u)
    t = _uv_to_st(v)
    n = np.int64(1) << np.int64(level)
    i = np.clip((s * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    j = np.clip((t * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    morton = _spread_bits_27(i) | (_spread_bits_27(j) << np.uint64(1))
    cid = (
        (np.uint64(level) << np.uint64(58))
        | (face.astype(np.uint64) << np.uint64(55))
        | morton
    )
    # Max value (level 27, face 5, full morton) is < 2^63, so the id
    # fits int64 exactly. int64 avoids Ray Data's Python-object
    # fallback for uint64 shuffle boundaries and matches DuckDB BIGINT.
    return cid.astype(np.int64)


def cell_level(cid: np.ndarray) -> np.ndarray:
    return (np.asarray(cid).astype(np.uint64) >> np.uint64(58)).astype(np.int8)


def cell_face(cid: np.ndarray) -> np.ndarray:
    return ((np.asarray(cid).astype(np.uint64) >> np.uint64(55)) & np.uint64(0x7)).astype(np.int8)


def cell_parent(cid: np.ndarray, parent_level: int) -> np.ndarray:
    """Containing cell at a coarser level (drop low Morton bit pairs)."""
    cid = np.asarray(cid).astype(np.uint64)
    level = (cid >> np.uint64(58)).astype(np.int64)
    if np.any(level < parent_level):
        raise ValueError("parent_level must be <= cell level")
    face = (cid >> np.uint64(55)) & np.uint64(0x7)
    morton = cid & ((np.uint64(1) << np.uint64(55)) - np.uint64(1))
    shift = (2 * (level - parent_level)).astype(np.uint64)
    out = (
        (np.uint64(parent_level) << np.uint64(58))
        | (face << np.uint64(55))
        | (morton >> shift)
    )
    return out.astype(np.int64)
