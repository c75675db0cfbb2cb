"""Golden-vector + property tests for the geokit kernels
(SURVEY.md §5.2.1-2; fixtures per FIXTURES.md B/E/F).

Assets are deterministic synthetic (SURVEY.md §7.2): the reference's
real geoid/AFT/ctt data tables are unavailable in this sandbox, so
golden expectations come from geokit.scalar_ref (an independent
straight-from-formula scalar implementation).
"""

import numpy as np
import pytest

import assets
from geokit import cells, scalar_ref as sr, transforms as T
from geokit.datums import D48_GK, D96_TM, HELMERT_D48_TO_D96, SLO_BBOX
from geokit.dms import deg2dms, dms2deg
from geokit.geoid import geoid_undulation
from geokit.helmert import fila2xyz, helmert, xyz2fila
from geokit.tm import tm_fwd, tm_inv

MM = 1e-3


@pytest.fixture(scope="module")
def ctt():
    t = assets.load_ctt_points().to_pandas()
    lat_min, lon_min, lat_max, lon_max = SLO_BBOX
    t["in_bbox"] = (
        (t.fi >= lat_min) & (t.fi <= lat_max) & (t.la >= lon_min) & (t.la <= lon_max)
    )
    return t


def test_tm_fwd_matches_scalar_golden(ctt):
    x96, y96 = tm_fwd(ctt.fi.values, ctt.la.values, D96_TM)
    assert np.abs(x96 - ctt.x_d96.values).max() < MM
    assert np.abs(y96 - ctt.y_d96.values).max() < MM


def test_full_chain_matches_scalar_golden(ctt):
    x48, y48, _ = T.fila_wgs2gkxy(ctt.fi.values, ctt.la.values, ctt.h_ell.values)
    assert np.abs(x48 - ctt.x_d48.values).max() < MM
    assert np.abs(y48 - ctt.y_d48.values).max() < MM


def test_tm_roundtrip_1mm(ctt):
    t = ctt[ctt.in_bbox]
    x, y = tm_fwd(t.fi.values, t.la.values, D96_TM)
    fi2, la2 = tm_inv(x, y, D96_TM)
    # 1e-8 deg ~ 1 mm
    assert np.abs(fi2 - t.fi.values).max() < 2e-8
    assert np.abs(la2 - t.la.values).max() < 2e-8


def test_helmert_chain_roundtrip_1mm(ctt):
    t = ctt[ctt.in_bbox]
    x48, y48, h48 = T.fila_wgs2gkxy(t.fi.values, t.la.values, t.h_ell.values)
    fi2, la2, h2 = T.gkxy2fila_wgs(x48, y48, h48)
    x48b, y48b, _ = T.fila_wgs2gkxy(fi2, la2, h2)
    assert np.abs(x48b - x48).max() < MM
    assert np.abs(y48b - y48).max() < MM


def test_helmert_ecef_roundtrip_exact():
    rng = np.random.default_rng(7)
    X = rng.uniform(4.2e6, 4.4e6, 500)
    Y = rng.uniform(1.0e6, 1.2e6, 500)
    Z = rng.uniform(4.5e6, 4.7e6, 500)
    X2, Y2, Z2 = helmert(*helmert(X, Y, Z, HELMERT_D48_TO_D96), HELMERT_D48_TO_D96, inverse=True)
    assert np.abs(X2 - X).max() < 1e-6
    assert np.abs(Y2 - Y).max() < 1e-6
    assert np.abs(Z2 - Z).max() < 1e-6


def test_helmert_matches_scalar():
    X, Y, Z = 4.3e6, 1.1e6, 4.6e6
    Xs = sr.helmert_scalar(X, Y, Z, HELMERT_D48_TO_D96)
    Xv = helmert(np.array([X]), np.array([Y]), np.array([Z]), HELMERT_D48_TO_D96)
    assert np.abs(np.array(Xs) - np.array([v[0] for v in Xv])).max() < 1e-9


def test_ecef_geodetic_roundtrip(ctt):
    t = ctt[ctt.in_bbox]
    X, Y, Z = fila2xyz(t.fi.values, t.la.values, t.h_ell.values, D96_TM.ellipsoid)
    fi2, la2, h2 = xyz2fila(X, Y, Z, D96_TM.ellipsoid)
    assert np.abs(fi2 - t.fi.values).max() < 1e-11
    assert np.abs(h2 - t.h_ell.values).max() < 1e-6


def test_geoid_golden_and_exact_at_nodes(ctt):
    g = assets.load_geoid("slo2000")
    und, inb = geoid_undulation(ctt.fi.values, ctt.la.values, g)
    assert np.abs((ctt.h_ell.values - und) - ctt.H_orth.values).max() < 1e-9
    # ctt rows 900..903 are exact grid nodes (make_assets); bilinear
    # must reproduce the surface exactly there.
    # Out-of-bbox rows: undulation 0, flagged.
    out = ~ctt.in_bbox.values
    assert (und[out] == 0.0).all()
    assert (~inb[out]).all()


def test_aft_roundtrip_and_coverage(ctt):
    t = ctt[ctt.in_bbox]
    x48, y48, _ = T.fila_wgs2gkxy(t.fi.values, t.la.values)
    aft_f = assets.load_aft("fwd")
    aft_i = assets.load_aft("inv")
    xa, ya, found = T.gkxy2tmxy_aft(x48, y48, aft_f)
    assert found.all()
    xb, yb, found2 = T.tmxy2gkxy_aft(xa, ya, aft_i)
    assert found2.all()
    # Same triangle topology both directions => piecewise-exact inverse.
    assert np.abs(xb - x48).max() < MM
    assert np.abs(yb - y48).max() < MM


def test_aft_differs_from_helmert(ctt):
    """AFT must measurably differ from Helmert (it models the wiggle)."""
    t = ctt[ctt.in_bbox]
    x48, y48, _ = T.fila_wgs2gkxy(t.fi.values, t.la.values)
    xa, ya, _ = T.gkxy2tmxy_aft(x48, y48, assets.load_aft("fwd"))
    xh, yh, _ = T.gkxy2tmxy(x48, y48)
    d = np.hypot(xa - xh, ya - yh)
    assert d.max() > 0.1  # wiggle amplitude is ~0.3 m


def test_dms_roundtrip():
    rng = np.random.default_rng(3)
    dd = rng.uniform(-180, 180, 1000)
    d, m, s = deg2dms(dd)
    back = dms2deg(d, m, s)
    assert np.abs(back - dd).max() < 1e-12


def test_cells_match_scalar_oracle(ctt):
    for level in (4, 12, 20):
        cid = cells.cell_id(ctt.fi.values, ctt.la.values, level)
        cid_s = np.array(
            [sr.cell_id_scalar(f, l, level) for f, l in zip(ctt.fi.values, ctt.la.values)],
            dtype=np.int64,
        )
        assert np.array_equal(cid, cid_s)


def test_cells_parent_containment(ctt):
    cid12 = cells.cell_id(ctt.fi.values, ctt.la.values, 12)
    cid8 = cells.cell_id(ctt.fi.values, ctt.la.values, 8)
    assert np.array_equal(cells.cell_parent(cid12, 8), cid8)
    assert (cells.cell_level(cid12) == 12).all()


def test_cells_global_sanity():
    """Cells behave on the whole globe, not just Slovenia."""
    rng = np.random.default_rng(11)
    fi = rng.uniform(-89.9, 89.9, 2000)
    la = rng.uniform(-180, 180, 2000)
    cid = cells.cell_id(fi, la, 10)
    faces = cells.cell_face(cid)
    assert set(np.unique(faces)) <= {0, 1, 2, 3, 4, 5}
    assert len(np.unique(faces)) == 6


def test_format_dms_negative_fraction_sign():
    """Sign must survive for degrees in (-1, 0): -0.5 deg is
    -0°30', and -0.99999999999 must NOT print as +1° (review bug)."""
    from geokit.dms import format_dms

    got = format_dms(np.array([-0.5, -0.99999999999, -46.0569]))
    assert got[0] == "-0°30'00.00000\""
    assert got[1] == "-1°00'00.00000\""
    assert got[2].startswith("-46°03'")


def test_helmert_regional_sets_roundtrip_and_differ():
    """K12 parameter-set selection: every registered set round-trips
    the chain to <=1 mm, and a regional set produces measurably
    different coordinates than the country-wide set."""
    import numpy as np

    from geokit.datums import HELMERT_SETS
    from geokit.transforms import fila_wgs2gkxy, gkxy2fila_wgs

    x = np.array([97512.3, 130000.0])
    y = np.array([462318.9, 455000.0])
    h = np.array([400.0, 350.0])
    results = {}
    for name, p in HELMERT_SETS.items():
        fi, la, hh = gkxy2fila_wgs(x, y, h, params=p)
        xb, yb, hb = fila_wgs2gkxy(fi, la, hh, params=p)
        assert np.max(np.abs(xb - x)) < 1e-3  # <= 1 mm round trip
        assert np.max(np.abs(yb - y)) < 1e-3
        results[name] = (fi.copy(), la.copy())
    d_ne = np.abs(results["region_ne"][0] - results["slovenia_v1"][0]).max()
    assert d_ne > 1e-7  # regional set measurably differs (> ~1 cm)
