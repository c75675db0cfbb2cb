"""Composite datum/projection transforms — the reference's 10-entry
menu (``ggeo.c::gkxy2fila_wgs`` family, SURVEY.md §2.1 K10, §3.1).

Helmert-path chains (transforms 1-6) are pure function compositions of
the geokit kernels; AFT-path variants (7-10) replace the Helmert step
by the triangle-based affine applied in grid space (K9) and take the
loaded triangulation as an argument (workers hold it in actor state).

Heights (K11 ``-ht``/``-hc``/geoid modes): every chain takes and
returns an ``h`` array; chains through ECEF transform it geometrically
(``-ht``); callers wanting ``-hc`` (copy) simply keep their input
column; geoid-corrected orthometric height is a separate kernel
(geokit.geoid.ortho_height).

Convention throughout: x = northing, y = easting (reference GEOUTM).
"""

from __future__ import annotations

import numpy as np

from geokit import helmert as hm
from geokit.aft import AftTriangulation, aft_apply
from geokit.datums import D48_GK, D96_TM, HELMERT_D48_TO_D96, HelmertParams
from geokit.ellipsoids import BESSEL, GRS80
from geokit.tm import tm_fwd, tm_inv

Arr = np.ndarray


# --- menu 1 / 2: D96/TM <-> ETRS89 geographic (same datum, pure projection)


def tmxy2fila_wgs(x: Arr, y: Arr) -> tuple[Arr, Arr]:
    return tm_inv(x, y, D96_TM)


def fila_wgs2tmxy(fi: Arr, la: Arr) -> tuple[Arr, Arr]:
    return tm_fwd(fi, la, D96_TM)


# --- menu 3 / 4: D48/GK <-> ETRS89 geographic via Helmert ECEF chain


def gkxy2fila_wgs(
    x: Arr, y: Arr, h: Arr | None = None, params: HelmertParams = HELMERT_D48_TO_D96
) -> tuple[Arr, Arr, Arr]:
    x = np.asarray(x, dtype=np.float64)
    h = np.zeros_like(x) if h is None else np.asarray(h, dtype=np.float64)
    fi_b, la_b = tm_inv(x, y, D48_GK)
    X, Y, Z = hm.fila2xyz(fi_b, la_b, h, BESSEL)
    X, Y, Z = hm.helmert(X, Y, Z, params)
    return hm.xyz2fila(X, Y, Z, GRS80)


def fila_wgs2gkxy(
    fi: Arr, la: Arr, h: Arr | None = None, params: HelmertParams = HELMERT_D48_TO_D96
) -> tuple[Arr, Arr, Arr]:
    fi = np.asarray(fi, dtype=np.float64)
    h = np.zeros_like(fi) if h is None else np.asarray(h, dtype=np.float64)
    X, Y, Z = hm.fila2xyz(fi, la, h, GRS80)
    X, Y, Z = hm.helmert(X, Y, Z, params, inverse=True)
    fi_b, la_b, h_b = hm.xyz2fila(X, Y, Z, BESSEL)
    x, y = tm_fwd(fi_b, la_b, D48_GK)
    return x, y, h_b


# --- menu 5 / 6: grid <-> grid via the ECEF chain


def gkxy2tmxy(
    x: Arr, y: Arr, h: Arr | None = None, params: HelmertParams = HELMERT_D48_TO_D96
) -> tuple[Arr, Arr, Arr]:
    fi, la, h2 = gkxy2fila_wgs(x, y, h, params)
    xt, yt = tm_fwd(fi, la, D96_TM)
    return xt, yt, h2


def tmxy2gkxy(
    x: Arr, y: Arr, h: Arr | None = None, params: HelmertParams = HELMERT_D48_TO_D96
) -> tuple[Arr, Arr, Arr]:
    fi, la = tm_inv(x, y, D96_TM)
    h = np.zeros_like(np.asarray(x, dtype=np.float64)) if h is None else h
    return fila_wgs2gkxy(fi, la, h, params)


# --- menu 7-10: AFT variants (triangle affine in grid space)


def gkxy2tmxy_aft(x: Arr, y: Arr, aft: AftTriangulation) -> tuple[Arr, Arr, Arr]:
    """D48/GK grid -> D96/TM grid via triangle affine; returns
    (x', y', found). Points outside the triangulation keep their
    input coords with found=False (caller may fall back to Helmert)."""
    return aft_apply(aft, x, y)


def tmxy2gkxy_aft(x: Arr, y: Arr, aft_inv: AftTriangulation) -> tuple[Arr, Arr, Arr]:
    return aft_apply(aft_inv, x, y)


def gkxy2fila_wgs_aft(x: Arr, y: Arr, aft: AftTriangulation) -> tuple[Arr, Arr, Arr]:
    xt, yt, found = aft_apply(aft, x, y)
    fi, la = tm_inv(xt, yt, D96_TM)
    return fi, la, found


def fila_wgs2gkxy_aft(fi: Arr, la: Arr, aft_inv: AftTriangulation) -> tuple[Arr, Arr, Arr]:
    xt, yt = tm_fwd(fi, la, D96_TM)
    return aft_apply(aft_inv, xt, yt)


#: Transform menu keyed like the reference CLI's ``-t N`` option
#: (SURVEY.md §3.1; AFT entries need the triangulation argument).
MENU = {
    1: tmxy2fila_wgs,
    2: fila_wgs2tmxy,
    3: gkxy2fila_wgs,
    4: fila_wgs2gkxy,
    5: gkxy2tmxy,
    6: tmxy2gkxy,
    7: gkxy2fila_wgs_aft,
    8: fila_wgs2gkxy_aft,
    9: gkxy2tmxy_aft,
    10: tmxy2gkxy_aft,
}
