"""Shapefile (.shp/.shx/.dbf) binary codec tests — S3/S4 parity.

The writer/reader are validated three ways (no third-party shapefile
lib exists in this container): (1) byte-level golden checks against
the published ESRI whitepaper layout (magic, lengths, record framing),
(2) write->read round-trips per shape type and DBF field type,
(3) the full gk-shp pipeline (read real .shp -> explode -> menu-5
transform -> reassemble -> write .shp) cross-checked against the
direct kernel on the same vertices.
"""

import struct
from datetime import date

import numpy as np
import pyarrow as pa
import pytest

from engine import shapefile as shp


def _poly_table(n=7, kind="polygon", with_z=False, seed=5):
    rng = np.random.default_rng(seed)
    xs, ys, zs = [], [], []
    for _ in range(n):
        m = int(rng.integers(3, 9))
        xs.append(rng.uniform(380000, 620000, m).tolist())
        ys.append(rng.uniform(30000, 200000, m).tolist())
        zs.append(rng.uniform(0, 500, m).tolist())
    cols = {
        "entity_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array([kind] * n),
        "xs": pa.array(xs, pa.list_(pa.float64())),
        "ys": pa.array(ys, pa.list_(pa.float64())),
        "name": pa.array([f"ent-{i}" for i in range(n)]),
        "score": pa.array(rng.uniform(0, 1, n)),
        "cnt": pa.array(rng.integers(0, 1000, n), pa.int64()),
    }
    if with_z:
        cols["zs"] = pa.array(zs, pa.list_(pa.float64()))
    return pa.table(cols)


def test_shp_golden_bytes_point(tmp_path):
    """Byte-level layout of a one-point file matches the ESRI spec:
    magic 9994 BE at 0, version 1000 LE at 28, type 1 at 32, file
    length 64 words (100-byte header + 8-byte record header + 20-byte
    point record), record 1 framed big-endian."""
    t = pa.table(
        {
            "entity_id": pa.array([7], pa.int64()),
            "kind": pa.array(["point"]),
            "xs": pa.array([[500000.0]], pa.list_(pa.float64())),
            "ys": pa.array([[100000.0]], pa.list_(pa.float64())),
        }
    )
    shp.write_shp(t, tmp_path / "one")
    buf = (tmp_path / "one.shp").read_bytes()
    assert struct.unpack(">i", buf[:4])[0] == 9994
    assert struct.unpack(">i", buf[24:28])[0] == 64  # 128 bytes / 2
    assert struct.unpack("<2i", buf[28:36]) == (1000, 1)
    # bbox degenerate to the single point
    assert struct.unpack("<4d", buf[36:68]) == (500000.0, 100000.0, 500000.0, 100000.0)
    recno, clen = struct.unpack(">2i", buf[100:108])
    assert (recno, clen) == (1, 10)
    st, x, y = struct.unpack("<i2d", buf[108:128])
    assert (st, x, y) == (1, 500000.0, 100000.0)
    assert len(buf) == 128
    # .shx: one index record pointing at offset 50 words, length 10
    sx = (tmp_path / "one.shx").read_bytes()
    assert struct.unpack(">2i", sx[100:108]) == (50, 10)


@pytest.mark.parametrize("kind", ["point", "polyline", "polygon", "multipoint"])
def test_shp_roundtrip_kinds(tmp_path, kind):
    n = 1 if kind == "point" else 6
    t = _poly_table(n=n, kind=kind)
    if kind == "point":  # one vertex per entity
        t = t.set_column(2, "xs", pa.array([[123456.25]], pa.list_(pa.float64())))
        t = t.set_column(3, "ys", pa.array([[87654.5]], pa.list_(pa.float64())))
    shp.write_shp(t, tmp_path / "rt")
    back = shp.read_shp(tmp_path / "rt")
    assert back["kind"].to_pylist() == [kind] * n
    assert back["entity_id"].to_pylist() == t["entity_id"].to_pylist()
    for c in ("xs", "ys"):
        got = back[c].to_pylist()
        want = t[c].to_pylist()
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)  # float64 bit-exact
    assert back["name"].to_pylist() == t["name"].to_pylist()
    assert back["cnt"].to_pylist() == t["cnt"].to_pylist()
    np.testing.assert_allclose(
        back["score"].to_pylist(), t["score"].to_pylist(), atol=5e-7
    )  # N-field with 6 decimals


def test_shp_roundtrip_z_and_parts(tmp_path):
    t = _poly_table(n=4, kind="polygonz", with_z=True)
    # entity 0: two parts
    parts = [[0, 2], [0], [0], [0]]
    t = t.append_column("parts", pa.array(parts, pa.list_(pa.int32())))
    shp.write_shp(t, tmp_path / "z")
    back = shp.read_shp(tmp_path / "z")
    for g, w in zip(back["zs"].to_pylist(), t["zs"].to_pylist()):
        np.testing.assert_array_equal(g, w)
    assert back["parts"].to_pylist()[0] == [0, 2]


def test_dbf_types_roundtrip(tmp_path):
    t = pa.table(
        {
            "name": pa.array(["a", "série", ""]),  # non-ascii degrades, not crashes
            "n_int": pa.array([0, -42, 123456], pa.int64()),
            "n_float": pa.array([1.5, -2.25, 0.0]),
            "flag": pa.array([True, False, None]),
            "d": pa.array([date(2021, 3, 14), None, date(1999, 12, 31)]),
        }
    )
    shp.write_dbf(t, tmp_path / "t.dbf")
    back = shp.read_dbf(tmp_path / "t.dbf")
    assert back["n_int"].to_pylist() == [0, -42, 123456]
    assert back["n_float"].to_pylist() == [1.5, -2.25, 0.0]
    assert back["flag"].to_pylist() == [True, False, None]
    assert back["d"].to_pylist() == [date(2021, 3, 14), None, date(1999, 12, 31)]
    assert back["name"].to_pylist()[0] == "a"


def test_null_shape_roundtrip(tmp_path):
    t = pa.table(
        {
            "entity_id": pa.array([0, 1], pa.int64()),
            "kind": pa.array(["point", "point"]),
            "xs": pa.array([[5.0], []], pa.list_(pa.float64())),
            "ys": pa.array([[6.0], []], pa.list_(pa.float64())),
        }
    )
    shp.write_shp(t, tmp_path / "n")
    back = shp.read_shp(tmp_path / "n")
    assert back["xs"].to_pylist() == [[5.0], []]


def test_null_shape_keeps_file_kind(tmp_path):
    """A polygon file with one empty entity must read back all-polygon
    (null shapes take the header's shape type) and stay re-writable."""
    t = _poly_table(3)
    t = t.set_column(
        2, "xs", pa.array([t["xs"][0].as_py(), [], t["xs"][2].as_py()], pa.list_(pa.float64()))
    ).set_column(
        3, "ys", pa.array([t["ys"][0].as_py(), [], t["ys"][2].as_py()], pa.list_(pa.float64()))
    )
    shp.write_shp(t, tmp_path / "pn")
    back = shp.read_shp(tmp_path / "pn")
    assert set(back["kind"].to_pylist()) == {"polygon"}
    shp.write_shp(back, tmp_path / "pn2")  # one-kind check must not raise
    again = shp.read_shp(tmp_path / "pn2")
    assert again["xs"].to_pylist() == back["xs"].to_pylist()


def test_dbf_early_year_date_framing(tmp_path):
    """Years < 1000 must still write 8-byte dates (strftime %Y does not
    zero-pad; a 7-byte date would shear every later field)."""
    t = pa.table(
        {
            "d": pa.array([date(999, 1, 2), date(2020, 6, 7)]),
            "n": pa.array([7, 8], pa.int64()),
        }
    )
    shp.write_dbf(t, tmp_path / "y.dbf")
    back = shp.read_dbf(tmp_path / "y.dbf")
    assert back["d"].to_pylist() == [date(999, 1, 2), date(2020, 6, 7)]
    assert back["n"].to_pylist() == [7, 8]


def test_dbf_name_truncation_collision_raises(tmp_path):
    t = pa.table(
        {
            "municipality_a": pa.array([1], pa.int64()),
            "municipality_b": pa.array([2], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="collision"):
        shp.write_dbf(t, tmp_path / "c.dbf")


@pytest.mark.usefixtures("ray_session")
def test_gkshp_pipeline_over_real_shapefiles(tmp_path):
    """End-to-end gk-shp equivalent over actual .shp bytes: write two
    shapefiles, read_shapefiles -> explode -> menu-5 (D48/GK->D96/TM)
    -> reassemble -> write partitions; every output vertex must equal
    the direct kernel on the input vertices (order-preserving within
    entity), and the output .shp must itself round-trip."""
    from engine.geometry import explode_vertices, reassemble_entities, transform_vertices
    from geokit.transforms import gkxy2tmxy

    t1 = _poly_table(n=5, kind="polyline", seed=11)
    t2 = _poly_table(n=4, kind="polyline", seed=12)
    shp.write_shp(t1, tmp_path / "in-a")
    shp.write_shp(t2, tmp_path / "in-b")

    ds = shp.read_shapefiles([str(tmp_path / "in-a"), str(tmp_path / "in-b")])
    verts = ds.map_batches(explode_vertices, batch_format="pyarrow")
    moved = verts.map_batches(
        transform_vertices, batch_format="pyarrow", fn_kwargs=dict(transform=5)
    )
    out = reassemble_entities(moved)
    bases = shp.write_shapefile_partitions(
        out.map_batches(
            lambda b: b.append_column(
                "kind", pa.array(["polyline"] * b.num_rows)
            ),
            batch_format="pyarrow",
        ),
        tmp_path / "out",
    )
    assert bases
    got = {}
    for b in bases:
        back = shp.read_shp(b)
        for eid, xs, ys in zip(
            back["entity_id"].to_pylist(), back["xs"].to_pylist(), back["ys"].to_pylist()
        ):
            got[eid] = (np.asarray(xs), np.asarray(ys))
    for fidx, t in enumerate([t1, t2]):
        for eid, xs, ys in zip(
            t["entity_id"].to_pylist(), t["xs"].to_pylist(), t["ys"].to_pylist()
        ):
            ex, ey, _ = gkxy2tmxy(np.asarray(xs), np.asarray(ys))
            gx, gy = got[(fidx << 40) + eid]
            np.testing.assert_array_equal(gx, ex)
            np.testing.assert_array_equal(gy, ey)


def test_shp_roundtrip_hypothesis(tmp_path):
    """Property fuzz: arbitrary float64 coordinates (incl. negatives,
    tiny/huge magnitudes) and arbitrary printable attr strings
    round-trip bit-exactly through the binary codec."""
    from hypothesis import given, settings, strategies as st

    finite = st.floats(allow_nan=False, allow_infinity=False, width=64)

    @settings(max_examples=25, deadline=None)
    @given(
        data=st.lists(
            st.tuples(
                st.lists(finite, min_size=1, max_size=6),
                st.text(
                    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                    max_size=12,
                ),
            ),
            min_size=1,
            max_size=5,
        )
    )
    def roundtrip(data):
        n = len(data)
        xs = [d[0] for d in data]
        ys = [[v + 1.0 for v in d[0]] for d in data]
        t = pa.table(
            {
                "entity_id": pa.array(np.arange(n, dtype=np.int64)),
                "kind": pa.array(["polyline"] * n),
                "xs": pa.array(xs, pa.list_(pa.float64())),
                "ys": pa.array(ys, pa.list_(pa.float64())),
                "name": pa.array([d[1] for d in data]),
            }
        )
        base = tmp_path / "fuzz"
        shp.write_shp(t, base)
        back = shp.read_shp(base)
        for g, w in zip(back["xs"].to_pylist(), xs):
            np.testing.assert_array_equal(g, w)
        for g, w in zip(back["ys"].to_pylist(), t["ys"].to_pylist()):
            np.testing.assert_array_equal(g, w)
        # DBF strips trailing spaces by format definition; compare stripped
        assert back["name"].to_pylist() == [d[1][:254].rstrip() for d in data]

    roundtrip()


def _with_ms(t, seed=9):
    rng = np.random.default_rng(seed)
    ms = [rng.uniform(0, 9000, len(x)).tolist() for x in t["xs"].to_pylist()]
    return t.append_column("ms", pa.array(ms, pa.list_(pa.float64())))


def test_shp_golden_bytes_pointm(tmp_path):
    """PointM record layout per spec: type 21, x, y, m — 28-byte
    content (clen 14); header M range carries the measures."""
    t = pa.table(
        {
            "entity_id": pa.array([1], pa.int64()),
            "kind": pa.array(["pointm"]),
            "xs": pa.array([[444000.0]], pa.list_(pa.float64())),
            "ys": pa.array([[91000.0]], pa.list_(pa.float64())),
            "ms": pa.array([[12.5]], pa.list_(pa.float64())),
        }
    )
    shp.write_shp(t, tmp_path / "pm")
    buf = (tmp_path / "pm.shp").read_bytes()
    assert struct.unpack("<2i", buf[28:36]) == (1000, 21)
    # header mmin/mmax (bytes 84:100 of the 8d box)
    assert struct.unpack("<2d", buf[84:100]) == (12.5, 12.5)
    recno, clen = struct.unpack(">2i", buf[100:108])
    assert (recno, clen) == (1, 14)
    st, x, y, m = struct.unpack("<i3d", buf[108:136])
    assert (st, x, y, m) == (21, 444000.0, 91000.0, 12.5)
    assert len(buf) == 136


@pytest.mark.parametrize(
    "kind", ["pointm", "polylinem", "polygonm", "multipointm", "multipointz"]
)
def test_shp_roundtrip_measured_kinds(tmp_path, kind):
    n = 1 if kind == "pointm" else 5
    t = _poly_table(n=n, kind=kind, with_z=(kind == "multipointz"))
    if kind == "pointm":
        t = t.set_column(2, "xs", pa.array([[401250.5]], pa.list_(pa.float64())))
        t = t.set_column(3, "ys", pa.array([[130750.25]], pa.list_(pa.float64())))
    t = _with_ms(t)
    shp.write_shp(t, tmp_path / "m")
    back = shp.read_shp(tmp_path / "m")
    assert back["kind"].to_pylist() == [kind] * n
    for c in ("xs", "ys", "ms") + (("zs",) if kind == "multipointz" else ()):
        for g, w in zip(back[c].to_pylist(), t[c].to_pylist()):
            np.testing.assert_array_equal(g, w)  # float64 bit-exact


def test_shp_z_without_ms_stays_ms_free(tmp_path):
    """A Z-type table with no ms column writes NODATA measures and
    reads back WITHOUT an ms column (spec: M < -1e38 is 'no data' —
    schema is round-trip stable)."""
    t = _poly_table(n=3, kind="polylinez", with_z=True)
    shp.write_shp(t, tmp_path / "zn")
    back = shp.read_shp(tmp_path / "zn")
    assert "ms" not in back.column_names
    # and WITH measures they round-trip bit-exact on the same type
    t2 = _with_ms(t)
    shp.write_shp(t2, tmp_path / "zm")
    back2 = shp.read_shp(tmp_path / "zm")
    for g, w in zip(back2["ms"].to_pylist(), t2["ms"].to_pylist()):
        np.testing.assert_array_equal(g, w)


def test_shp_multipatch_roundtrip_and_framing(tmp_path):
    """MultiPatch (type 31): PolygonZ framing + PartTypes int array.
    Round-trips parts, part_types, zs and ms bit-exactly; byte layout
    places PartTypes between Parts and Points per the spec."""
    t = _poly_table(n=3, kind="multipatch", with_z=True)
    parts = [[0, 4], [0], [0, 3, 6]]
    ptypes = [[2, 3], [0], [2, 5, 5]]  # OuterRing/InnerRing, TriStrip, rings
    t = t.append_column("parts", pa.array(parts, pa.list_(pa.int32())))
    t = t.append_column("part_types", pa.array(ptypes, pa.list_(pa.int32())))
    shp.write_shp(t, tmp_path / "mp")
    back = shp.read_shp(tmp_path / "mp")
    assert back["kind"].to_pylist() == ["multipatch"] * 3
    assert back["parts"].to_pylist() == parts
    assert back["part_types"].to_pylist() == ptypes
    for c in ("xs", "ys", "zs"):
        for g, w in zip(back[c].to_pylist(), t[c].to_pylist()):
            np.testing.assert_array_equal(g, w)
    # golden framing of record 1: type 31, then bbox(32B), NumParts=2,
    # NumPoints=n0, Parts[2], PartTypes[2], then points.
    buf = (tmp_path / "mp.shp").read_bytes()
    assert struct.unpack("<2i", buf[28:36]) == (1000, 31)
    content = buf[108:]
    st = struct.unpack("<i", content[:4])[0]
    assert st == 31
    nparts, npts = struct.unpack("<2i", content[36:44])
    assert nparts == 2 and npts == len(t["xs"].to_pylist()[0])
    assert struct.unpack("<2i", content[44:52]) == (0, 4)  # Parts
    assert struct.unpack("<2i", content[52:60]) == (2, 3)  # PartTypes
    x0, y0 = struct.unpack("<2d", content[60:76])
    assert (x0, y0) == (t["xs"].to_pylist()[0][0], t["ys"].to_pylist()[0][0])


def test_shp_multipatch_defaults_and_single_part(tmp_path):
    """A multipatch written without parts/part_types defaults to one
    TriStrip part and reads back with explicit [0]/[0] columns (parts
    are load-bearing for this type, so they are always materialized)."""
    t = _poly_table(n=2, kind="multipatch", with_z=True)
    shp.write_shp(t, tmp_path / "mp1")
    back = shp.read_shp(tmp_path / "mp1")
    assert back["parts"].to_pylist() == [[0], [0]]
    assert back["part_types"].to_pylist() == [[0], [0]]


def test_cli_shp_streams_z_parts_ptypes(tmp_path):
    """The gk-shp CLI end-to-end over a MultiPatch file: x/y transform
    per the direct kernel, z + ring structure (parts/part_types)
    copied through the STREAMING vertex path (no vertex-scale payload
    on the broadcast side), DBF attrs preserved."""
    import subprocess
    import sys

    from geokit.transforms import gkxy2tmxy

    t = _poly_table(n=3, kind="multipatch", with_z=True, seed=21)
    parts = [[0, 3], [0], [0, 2]]
    ptypes = [[2, 3], [0], [5, 5]]
    t = t.append_column("parts", pa.array(parts, pa.list_(pa.int32())))
    t = t.append_column("part_types", pa.array(ptypes, pa.list_(pa.int32())))
    shp.write_shp(t, tmp_path / "mp-in")

    out_dir = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable, "-m", "engine.cli", "shp", "-t", "5",
            str(tmp_path / "mp-in.shp"), "--output", str(out_dir),
            "--num-cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json as _json

    bases = _json.loads(r.stdout.strip().splitlines()[-1])["written"]
    got = {}
    for b in bases:
        back = shp.read_shp(b)
        for i in range(back.num_rows):
            got[back["entity_id"][i].as_py()] = {
                c: back[c][i].as_py() for c in back.column_names
            }
    assert len(got) == 3
    for i in range(3):
        eid = i  # single input file: ids pass through read_shapefiles' fidx=0
        w = got[eid]
        ex, ey, _ = gkxy2tmxy(
            np.asarray(t["xs"][i].as_py()), np.asarray(t["ys"][i].as_py())
        )
        np.testing.assert_array_equal(w["xs"], ex)
        np.testing.assert_array_equal(w["ys"], ey)
        np.testing.assert_array_equal(w["zs"], t["zs"][i].as_py())  # copied
        assert w["parts"] == parts[i]
        assert w["part_types"] == ptypes[i]
        assert w["kind"] == "multipatch"
        assert w["name"] == t["name"][i].as_py()
