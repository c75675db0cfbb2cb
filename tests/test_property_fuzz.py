"""Hypothesis property fuzzing of the pure geokit kernels (no Ray):
round-trip and invariant properties on arbitrary in-domain points —
complements the fixed golden vectors (SURVEY.md §5.2 item 2).

Assets are deterministic synthetic (SURVEY.md §7.2).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from geokit.cells import cell_id, cell_parent
from geokit.datums import D48_GK, D96_TM
from geokit.dms import deg2dms, dms2deg
from geokit.tm import tm_fwd, tm_inv

lat = st.floats(min_value=44.0, max_value=48.0, allow_nan=False)
lon = st.floats(min_value=12.0, max_value=18.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(fi=lat, la=lon)
def test_tm_roundtrip_1mm(fi, la):
    """tm_inv(tm_fwd(p)) == p within 1 mm (north_star bar) on BOTH
    Slovene projections, for arbitrary in-domain points."""
    for proj in (D96_TM, D48_GK):
        x, y = tm_fwd(np.array([fi]), np.array([la]), proj)
        fi2, la2 = tm_inv(x, y, proj)
        # 1e-8 deg ~ 1 mm
        assert abs(fi2[0] - fi) < 1e-8
        assert abs(la2[0] - la) < 1e-8


@settings(max_examples=200, deadline=None)
@given(dd=st.floats(min_value=-179.999, max_value=179.999, allow_nan=False))
def test_dms_roundtrip_exact(dd):
    d, m, s = deg2dms(np.array([dd]))
    back = dms2deg(d, m, s)[0]
    assert abs(back - dd) < 1e-12
    if dd >= 0:
        assert 0 <= m[0] < 60 and 0 <= s[0] < 60.0000001


@settings(max_examples=200, deadline=None)
@given(fi=lat, la=lon, lvl=st.integers(min_value=1, max_value=27))
def test_cell_parent_containment(fi, la, lvl):
    """A point's cell at level L has the point's coarser cell as its
    ancestor at every parent level (hierarchy consistency)."""
    fia = np.array([fi])
    laa = np.array([la])
    cid = cell_id(fia, laa, lvl)
    for pl in range(0, lvl + 1, max(1, lvl // 3)):
        par = cell_parent(cid, pl)
        direct = cell_id(fia, laa, pl)
        assert par[0] == direct[0], (lvl, pl)


@settings(max_examples=100, deadline=None)
@given(
    fi=lat,
    la=lon,
    h=st.floats(min_value=-100.0, max_value=3000.0, allow_nan=False),
)
def test_helmert_chain_roundtrip_1mm(fi, la, h):
    """fila_wgs2gkxy -> gkxy2fila_wgs round trip <= 1 mm / 1e-8 deg."""
    from geokit.transforms import fila_wgs2gkxy, gkxy2fila_wgs

    x, y, hb = fila_wgs2gkxy(np.array([fi]), np.array([la]), np.array([h]))
    fi2, la2, h2 = gkxy2fila_wgs(x, y, hb)
    assert abs(fi2[0] - fi) < 1e-8
    assert abs(la2[0] - la) < 1e-8
    assert abs(h2[0] - h) < 1e-3
