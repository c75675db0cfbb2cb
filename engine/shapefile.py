"""ESRI shapefile (.shp/.shx/.dbf) binary I/O — from-scratch codec
for the reference's `gk-shp` source/sink (upstream shapelib
`shpopen.c`/`dbfopen.c`; SURVEY.md §2.2 S3/S4), implemented from the
published ESRI Shapefile Technical Description (July 1998 whitepaper)
and the dBASE III file layout. No code is derived from shapelib.

Supported shape types (the complete set in the spec):
  1 Point, 3 PolyLine, 5 Polygon, 8 MultiPoint; Z variants 11 PointZ,
  13 PolyLineZ, 15 PolygonZ, 18 MultiPointZ; measured variants
  21 PointM, 23 PolyLineM, 25 PolygonM, 28 MultiPointM; 31 MultiPatch
  (PolygonZ framing plus a PartTypes int array — 0 TriStrip, 1 TriFan,
  2 OuterRing, 3 InnerRing, 4 FirstRing, 5 Ring — carried as a
  ``part_types:list<int32>`` column). Null shapes (0) round-trip as
  empty. Measures follow the spec's "no data"
  convention (< -1e38): absent ms columns write NODATA and all-NODATA
  M blocks read back as absent, so schemas are round-trip stable.
DBF field types: C (string), N (int64 or float64 by decimals), F
(float64), L (bool), D (date as YYYYMMDD string).

Geometry table mapping (matches engine/geometry.py):
  entity_id:int64, kind:string, xs:list<double>, ys:list<double>,
  [zs:list<double>], [ms:list<double>], [parts:list<int32>],
  attribute columns.

Scale shape: one shapefile == one Ray task (`read_shapefiles` maps a
dataset of paths through a parse task; `write_shapefile_partitions`
writes one numbered shapefile per block — the resumable layout). The
per-entity loop inside a task mirrors the format's record framing
(records are length-prefixed and cannot be parsed without walking
them); per-record point arrays are bulk `np.frombuffer` views.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np
import pyarrow as pa

SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8
SHAPE_POINTZ = 11
SHAPE_POLYLINEZ = 13
SHAPE_POLYGONZ = 15
SHAPE_MULTIPOINTZ = 18
SHAPE_POINTM = 21
SHAPE_POLYLINEM = 23
SHAPE_POLYGONM = 25
SHAPE_MULTIPOINTM = 28
SHAPE_MULTIPATCH = 31

_KIND_TO_TYPE = {
    "point": SHAPE_POINT,
    "polyline": SHAPE_POLYLINE,
    "polygon": SHAPE_POLYGON,
    "multipoint": SHAPE_MULTIPOINT,
    "pointz": SHAPE_POINTZ,
    "polylinez": SHAPE_POLYLINEZ,
    "polygonz": SHAPE_POLYGONZ,
    "multipointz": SHAPE_MULTIPOINTZ,
    "pointm": SHAPE_POINTM,
    "polylinem": SHAPE_POLYLINEM,
    "polygonm": SHAPE_POLYGONM,
    "multipointm": SHAPE_MULTIPOINTM,
    "multipatch": SHAPE_MULTIPATCH,
}
_TYPE_TO_KIND = {v: k for k, v in _KIND_TO_TYPE.items()}
_MULTI = {
    SHAPE_POLYLINE,
    SHAPE_POLYGON,
    SHAPE_POLYLINEZ,
    SHAPE_POLYGONZ,
    SHAPE_POLYLINEM,
    SHAPE_POLYGONM,
}
_HASZ = {
    SHAPE_POINTZ,
    SHAPE_POLYLINEZ,
    SHAPE_POLYGONZ,
    SHAPE_MULTIPOINTZ,
    SHAPE_MULTIPATCH,
}
# Types with a *required-by-this-writer* measure block; Z types also
# carry M (the spec makes M optional in both families — this writer
# always emits it, and the reader accepts either).
_HASM = {SHAPE_POINTM, SHAPE_POLYLINEM, SHAPE_POLYGONM, SHAPE_MULTIPOINTM}
_MULTIPT = {SHAPE_MULTIPOINT, SHAPE_MULTIPOINTZ, SHAPE_MULTIPOINTM}


# ------------------------------------------------------------ .shp/.shx


def _shp_header(shape_type: int, bbox: tuple, file_len_words: int) -> bytes:
    xmin, ymin, xmax, ymax, zmin, zmax, mmin, mmax = bbox
    return (
        struct.pack(">i", 9994)
        + b"\x00" * 20
        + struct.pack(">i", file_len_words)
        + struct.pack("<ii", 1000, shape_type)
        + struct.pack("<8d", xmin, ymin, xmax, ymax, zmin, zmax, mmin, mmax)
    )


# ESRI spec: measure values < -1e38 mean "no data". Writing NODATA
# (not zeros) for absent measures keeps read_shp's schema stable — a
# Z-type file written without an ms column reads back without one.
M_NODATA = -1e40
_M_ABSENT = -1e38


def _measure_block(ms, n: int) -> bytes:
    """(Mmin, Mmax, Marray) block — NODATA fill when no measures."""
    m = (
        np.asarray(ms, dtype="<f8")
        if ms is not None and len(ms) == n
        else np.full(n, M_NODATA, dtype="<f8")
    )
    return struct.pack("<2d", m.min(), m.max()) + m.tobytes()


def _record_content(
    shape_type: int, xs, ys, zs, parts, ms=None, part_types=None
) -> bytes:
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    if n == 0:
        return struct.pack("<i", 0)  # Null shape
    if shape_type in (SHAPE_POINT, SHAPE_POINTZ, SHAPE_POINTM):
        out = struct.pack("<i", shape_type) + struct.pack("<2d", xs[0], ys[0])
        m = float(ms[0]) if ms is not None and len(ms) else M_NODATA
        if shape_type == SHAPE_POINTZ:
            z = float(zs[0]) if zs is not None and len(zs) else 0.0
            out += struct.pack("<2d", z, m)  # z, m
        elif shape_type == SHAPE_POINTM:
            out += struct.pack("<d", m)
        return out
    pts = np.empty((n, 2), dtype="<f8")
    pts[:, 0] = xs
    pts[:, 1] = ys
    bbox = struct.pack("<4d", xs.min(), ys.min(), xs.max(), ys.max())
    if shape_type in _MULTIPT:
        out = struct.pack("<i", shape_type) + bbox + struct.pack("<i", n) + pts.tobytes()
        if shape_type == SHAPE_MULTIPOINTZ:
            z = (
                np.asarray(zs, dtype="<f8")
                if zs is not None and len(zs) == n
                else np.zeros(n, dtype="<f8")
            )
            out += struct.pack("<2d", z.min(), z.max()) + z.tobytes()
        if shape_type in (SHAPE_MULTIPOINTZ, SHAPE_MULTIPOINTM):
            out += _measure_block(ms, n)
        return out
    p = np.asarray(parts if parts is not None and len(parts) else [0], dtype="<i4")
    out = (
        struct.pack("<i", shape_type)
        + bbox
        + struct.pack("<2i", len(p), n)
        + p.tobytes()
    )
    if shape_type == SHAPE_MULTIPATCH:
        # PartTypes array, one int per part (spec: 0 TriStrip .. 5
        # Ring); absent column defaults to TriStrip (0).
        pt = np.asarray(
            part_types
            if part_types is not None and len(part_types) == len(p)
            else np.zeros(len(p)),
            dtype="<i4",
        )
        out += pt.tobytes()
    out += pts.tobytes()
    if shape_type in _HASZ:
        z = (
            np.asarray(zs, dtype="<f8")
            if zs is not None and len(zs) == n
            else np.zeros(n, dtype="<f8")
        )
        out += struct.pack("<2d", z.min(), z.max()) + z.tobytes()
    if shape_type in _HASZ or shape_type in _HASM:
        out += _measure_block(ms, n)
    return out


# Public EPSG WKT for the two Slovene grids + geographic ETRS89 — the
# reference's gk-shp writes a .prj naming the output CRS.
PRJ_WKT = {
    "d48": (
        'PROJCS["MGI 1901 / Slovene National Grid",GEOGCS["MGI 1901",'
        'DATUM["MGI_1901",SPHEROID["Bessel 1841",6377397.155,299.1528128]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],'
        'PARAMETER["central_meridian",15],PARAMETER["scale_factor",0.9999],'
        'PARAMETER["false_easting",500000],PARAMETER["false_northing",-5000000],'
        'UNIT["metre",1]]'
    ),
    "d96": (
        'PROJCS["Slovenia 1996 / Slovene National Grid",GEOGCS["Slovenia 1996",'
        'DATUM["Slovenia_Geodetic_Datum_1996",SPHEROID["GRS 1980",6378137,298.257222101]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],'
        'PARAMETER["central_meridian",15],PARAMETER["scale_factor",0.9999],'
        'PARAMETER["false_easting",500000],PARAMETER["false_northing",-5000000],'
        'UNIT["metre",1]]'
    ),
    "wgs84": (
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
    ),
}

# Menu transform (1-10) -> output CRS of the converted shapefile.
MENU_OUT_CRS = {1: "wgs84", 2: "d96", 3: "wgs84", 4: "d48", 5: "d96",
                6: "d48", 7: "wgs84", 8: "d48", 9: "d96", 10: "d48"}


def write_shp(table: pa.Table, base: str | Path, crs: str | None = None) -> None:
    """Write ``table`` (geometry-table schema above) as ``base``.shp +
    .shx + .dbf (+ .prj when ``crs`` is one of PRJ_WKT's keys or a raw
    WKT string). All entities must share one shape kind (the format's
    constraint); attribute columns = every column not in the geometry
    set."""
    base = Path(base)
    kinds = set(table["kind"].to_pylist())
    if len(kinds) != 1:
        raise ValueError(f"one shape kind per shapefile, got {kinds}")
    shape_type = _KIND_TO_TYPE[kinds.pop()]

    xs_l = table["xs"].to_pylist()
    ys_l = table["ys"].to_pylist()
    zs_l = table["zs"].to_pylist() if "zs" in table.column_names else [None] * len(xs_l)
    ms_l = table["ms"].to_pylist() if "ms" in table.column_names else [None] * len(xs_l)
    parts_l = (
        table["parts"].to_pylist() if "parts" in table.column_names else [None] * len(xs_l)
    )
    ptypes_l = (
        table["part_types"].to_pylist()
        if "part_types" in table.column_names
        else [None] * len(xs_l)
    )

    records = []
    for i in range(table.num_rows):
        records.append(
            _record_content(
                shape_type, xs_l[i], ys_l[i], zs_l[i], parts_l[i], ms_l[i], ptypes_l[i]
            )
        )

    all_x = np.concatenate([np.asarray(x, dtype=np.float64) for x in xs_l if len(x)] or [np.zeros(1)])
    all_y = np.concatenate([np.asarray(y, dtype=np.float64) for y in ys_l if len(y)] or [np.zeros(1)])
    have_z = shape_type in _HASZ
    all_z = (
        np.concatenate(
            [np.asarray(z, dtype=np.float64) for z in zs_l if z is not None and len(z)]
            or [np.zeros(1)]
        )
        if have_z
        else np.zeros(1)
    )
    all_m = (
        np.concatenate(
            [np.asarray(m, dtype=np.float64) for m in ms_l if m is not None and len(m)]
            or [np.zeros(1)]
        )
        if (have_z or shape_type in _HASM)
        else np.zeros(1)
    )
    bbox = (
        all_x.min(), all_y.min(), all_x.max(), all_y.max(),
        all_z.min(), all_z.max(), all_m.min(), all_m.max(),
    )

    shp_len = 50 + sum(4 + len(r) // 2 for r in records)  # 16-bit words
    shx_len = 50 + 4 * len(records)
    with open(base.with_suffix(".shp"), "wb") as f_shp, open(
        base.with_suffix(".shx"), "wb"
    ) as f_shx:
        f_shp.write(_shp_header(shape_type, bbox, shp_len))
        f_shx.write(_shp_header(shape_type, bbox, shx_len))
        offset = 50
        for i, rec in enumerate(records):
            clen = len(rec) // 2
            f_shp.write(struct.pack(">2i", i + 1, clen) + rec)
            f_shx.write(struct.pack(">2i", offset, clen))
            offset += 4 + clen

    attr_cols = [
        c
        for c in table.column_names
        if c not in ("kind", "xs", "ys", "zs", "ms", "parts", "part_types")
    ]
    write_dbf(table.select(attr_cols), base.with_suffix(".dbf"))
    if crs is not None:
        base.with_suffix(".prj").write_text(PRJ_WKT.get(crs, crs))


def read_shp(base: str | Path) -> pa.Table:
    """Parse ``base``.shp (+ .dbf if present) back into the geometry
    table. Inverse of write_shp (round-trip pytest-verified) and reads
    any conforming file of the supported types."""
    base = Path(base)
    buf = base.with_suffix(".shp").read_bytes()
    if struct.unpack(">i", buf[:4])[0] != 9994:
        raise ValueError(f"{base}: not a shapefile (bad magic)")
    file_len = struct.unpack(">i", buf[24:28])[0] * 2
    version, _gtype = struct.unpack("<2i", buf[28:36])
    if version != 1000:
        raise ValueError(f"{base}: unsupported shapefile version {version}")

    kinds, xs_out, ys_out, zs_out, ms_out, parts_out = [], [], [], [], [], []
    ptypes_out = []
    any_z = False
    any_m = False
    any_parts = False
    any_ptypes = False
    pos = 100
    while pos < min(file_len, len(buf)):
        _recno, clen = struct.unpack(">2i", buf[pos : pos + 8])
        pos += 8
        content = buf[pos : pos + clen * 2]
        pos += clen * 2
        st = struct.unpack("<i", content[:4])[0]
        if st == 0:  # Null shape: empty geometry OF THE FILE'S kind —
            # hardcoding "point" would mix kinds in a one-kind file and
            # break re-writing (write_shp's one-kind check) and silently
            # change kind on round-trip.
            kinds.append(_TYPE_TO_KIND.get(_gtype, "point"))
            xs_out.append([])
            ys_out.append([])
            zs_out.append([])
            ms_out.append([])
            parts_out.append([])
            ptypes_out.append([])
            continue
        kinds.append(_TYPE_TO_KIND[st])
        if st in (SHAPE_POINT, SHAPE_POINTZ, SHAPE_POINTM):
            x, y = struct.unpack("<2d", content[4:20])
            xs_out.append([x])
            ys_out.append([y])
            if st == SHAPE_POINTZ:
                zs_out.append([struct.unpack("<d", content[20:28])[0]])
                any_z = True
                # The spec makes the point's M optional — present iff
                # the record is long enough.
                mv = (
                    struct.unpack("<d", content[28:36])[0]
                    if len(content) >= 36
                    else M_NODATA
                )
                if mv > _M_ABSENT:
                    ms_out.append([mv])
                    any_m = True
                else:
                    ms_out.append([])
            elif st == SHAPE_POINTM:
                zs_out.append([])
                mv = struct.unpack("<d", content[20:28])[0]
                if mv > _M_ABSENT:
                    ms_out.append([mv])
                    any_m = True
                else:
                    ms_out.append([])
            else:
                zs_out.append([])
                ms_out.append([])
            parts_out.append([0])
            ptypes_out.append([])
            continue
        if st in _MULTIPT:
            n = struct.unpack("<i", content[36:40])[0]
            pts = np.frombuffer(content, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
            xs_out.append(pts[:, 0].tolist())
            ys_out.append(pts[:, 1].tolist())
            off = 40 + 16 * n
            if st == SHAPE_MULTIPOINTZ:
                z = np.frombuffer(content, dtype="<f8", count=n, offset=off + 16)
                zs_out.append(z.tolist())
                any_z = True
                off += 16 + 8 * n
            else:
                zs_out.append([])
            m = (
                np.frombuffer(content, dtype="<f8", count=n, offset=off + 16)
                if st in (SHAPE_MULTIPOINTZ, SHAPE_MULTIPOINTM)
                and len(content) >= off + 16 + 8 * n
                else None
            )
            if m is not None and (m > _M_ABSENT).any():
                ms_out.append(m.tolist())
                any_m = True
            else:
                ms_out.append([])
            parts_out.append([0])
            ptypes_out.append([])
            continue
        nparts, npts = struct.unpack("<2i", content[36:44])
        p = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
        off = 44 + 4 * nparts
        if st == SHAPE_MULTIPATCH:
            pt = np.frombuffer(content, dtype="<i4", count=nparts, offset=off)
            off += 4 * nparts
            ptypes_out.append(pt.tolist())
            any_ptypes = True
        else:
            ptypes_out.append([])
        pts = np.frombuffer(content, dtype="<f8", count=2 * npts, offset=off).reshape(
            npts, 2
        )
        off += 16 * npts
        xs_out.append(pts[:, 0].tolist())
        ys_out.append(pts[:, 1].tolist())
        if st in _HASZ:
            z = np.frombuffer(content, dtype="<f8", count=npts, offset=off + 16)
            zs_out.append(z.tolist())
            any_z = True
            off += 16 + 8 * npts
        else:
            zs_out.append([])
        m = (
            np.frombuffer(content, dtype="<f8", count=npts, offset=off + 16)
            if (st in _HASZ or st in _HASM)
            and len(content) >= off + 16 + 8 * npts
            else None
        )
        if m is not None and (m > _M_ABSENT).any():
            # M block (optional per spec, even for M-types; an
            # all-NODATA block reads back as absent).
            ms_out.append(m.tolist())
            any_m = True
        else:
            ms_out.append([])
        parts_out.append(p.tolist())
        # MultiPatch parts are load-bearing even when single-part (the
        # part_types column aligns with them), so always keep them.
        any_parts = any_parts or nparts > 1 or st == SHAPE_MULTIPATCH

    cols = {
        "entity_id": pa.array(np.arange(len(kinds), dtype=np.int64)),
        "kind": pa.array(kinds, pa.string()),
        "xs": pa.array(xs_out, pa.list_(pa.float64())),
        "ys": pa.array(ys_out, pa.list_(pa.float64())),
    }
    if any_z:
        cols["zs"] = pa.array(zs_out, pa.list_(pa.float64()))
    if any_m:
        cols["ms"] = pa.array(ms_out, pa.list_(pa.float64()))
    if any_parts:
        cols["parts"] = pa.array(parts_out, pa.list_(pa.int32()))
    if any_ptypes:
        cols["part_types"] = pa.array(ptypes_out, pa.list_(pa.int32()))
    out = pa.table(cols)

    dbf_path = base.with_suffix(".dbf")
    if dbf_path.exists():
        attrs = read_dbf(dbf_path)
        for name in attrs.column_names:
            if name == "entity_id":
                # The DBF's stored id wins over the positional default
                # (write_shp emits entity_id as a DBF attribute, so a
                # round-trip preserves arbitrary ids).
                out = out.set_column(0, "entity_id", attrs[name])
            elif name not in out.column_names:
                out = out.append_column(name, attrs[name])
    return out


# ----------------------------------------------------------------- .dbf


def _dbf_field_spec(name: str, typ: pa.DataType, col: pa.ChunkedArray):
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        vals = col.to_pylist()
        width = max([len(v.encode("ascii", "replace")) for v in vals if v is not None] + [1])
        return ("C", min(width, 254), 0)
    if pa.types.is_integer(typ):
        return ("N", 20, 0)  # fits INT64_MIN (20 chars incl. sign)
    if pa.types.is_floating(typ):
        return ("N", 24, 6)
    if pa.types.is_boolean(typ):
        return ("L", 1, 0)
    if pa.types.is_date(typ):
        return ("D", 8, 0)
    raise TypeError(f"DBF cannot store column {name!r} of type {typ}")


def write_dbf(table: pa.Table, path: str | Path) -> None:
    """dBASE III (0x03) writer: fixed-width ASCII records."""
    specs = [
        (name, *_dbf_field_spec(name, table.schema.field(name).type, table[name]))
        for name in table.column_names
    ]
    # DBF field names are 10 bytes: detect post-truncation collisions
    # (two columns sharing a 10-char prefix would write two descriptors
    # with one name, and the name-keyed reader then mis-associates).
    short = [name.encode("ascii")[:10] for name, *_ in specs]
    if len(set(short)) != len(short):
        dupes = sorted({s.decode() for s in short if short.count(s) > 1})
        raise ValueError(
            f"DBF 10-char field-name collision after truncation: {dupes}"
        )
    header_size = 32 + 32 * len(specs) + 1
    record_size = 1 + sum(w for _, _, w, _ in specs)
    head = struct.pack(
        "<B3BIHH20x", 0x03, 95, 1, 1, table.num_rows, header_size, record_size
    )
    fields = b""
    for name, typ, width, dec in specs:
        fields += struct.pack(
            "<11sc4xBB14x", name.encode("ascii")[:10].ljust(11, b"\x00"), typ.encode(), width, dec
        )
    body = bytearray()
    cols = {name: table[name].to_pylist() for name in table.column_names}
    for i in range(table.num_rows):
        body += b" "  # not-deleted flag
        for name, typ, width, dec in specs:
            v = cols[name][i]
            if typ == "C":
                s = ("" if v is None else str(v)).encode("ascii", "replace")[:width]
                body += s.ljust(width, b" ")
            elif typ == "N":
                s = b"" if v is None else (f"{v:.{dec}f}" if dec else f"{int(v)}").encode()
                if len(s) > width:
                    # Refuse to corrupt: a silent prefix-truncation of
                    # a numeric literal changes its VALUE (e.g. drops
                    # the last digit of a 19-digit int64).
                    raise ValueError(
                        f"DBF field {name!r} width {width} cannot hold {v!r}"
                    )
                body += s.rjust(width, b" ")
            elif typ == "L":
                body += b"?" if v is None else (b"T" if v else b"F")
            elif typ == "D":
                # NOT strftime: glibc %Y doesn't zero-pad years < 1000,
                # which would emit < 8 bytes and shear the fixed-width
                # framing of every later field in the record.
                s = (
                    b"        "
                    if v is None
                    else f"{v.year:04d}{v.month:02d}{v.day:02d}".encode()
                )
                if len(s) != 8:
                    raise ValueError(f"DBF date field {name!r} cannot hold {v!r}")
                body += s
    with open(path, "wb") as f:
        f.write(head + fields + b"\x0d" + bytes(body) + b"\x1a")


def read_dbf(path: str | Path) -> pa.Table:
    buf = Path(path).read_bytes()
    nrec, header_size, record_size = struct.unpack("<IHH", buf[4:12])
    specs = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        typ = chr(buf[pos + 11])
        width = buf[pos + 16]
        dec = buf[pos + 17]
        specs.append((name, typ, width, dec))
        pos += 32
    raw = buf[header_size : header_size + nrec * record_size]
    cols: dict[str, list] = {name: [] for name, *_ in specs}
    for i in range(nrec):
        rec = raw[i * record_size : (i + 1) * record_size]
        if rec[:1] == b"*":  # deleted
            continue
        off = 1
        for name, typ, width, dec in specs:
            field = rec[off : off + width]
            off += width
            text = field.decode("ascii", "replace")
            # C fields are left-justified and padded on the RIGHT only:
            # leading spaces are content (hypothesis-caught). Numeric/
            # logical/date fields strip both sides.
            s = text.strip()
            if typ == "C":
                cols[name].append(text.rstrip())
            elif typ in ("N", "F"):
                if not s:
                    cols[name].append(None)
                elif dec or typ == "F" or "." in s:
                    cols[name].append(float(s))
                else:
                    cols[name].append(int(s))
            elif typ == "L":
                cols[name].append(None if s in ("?", "") else s in ("T", "t", "Y", "y"))
            elif typ == "D":
                import datetime

                cols[name].append(
                    None
                    if not s
                    else datetime.date(int(s[:4]), int(s[4:6]), int(s[6:8]))
                )
            else:
                cols[name].append(s)
    arrays = {}
    for name, typ, width, dec in specs:
        vals = cols[name]
        if typ == "C":
            arrays[name] = pa.array(vals, pa.string())
        elif typ in ("N", "F"):
            is_float = dec or typ == "F" or any(isinstance(v, float) for v in vals)
            arrays[name] = pa.array(
                vals, pa.float64() if is_float else pa.int64()
            )
        elif typ == "L":
            arrays[name] = pa.array(vals, pa.bool_())
        elif typ == "D":
            arrays[name] = pa.array(vals, pa.date32())
        else:
            arrays[name] = pa.array(vals, pa.string())
    return pa.table(arrays)


# ------------------------------------------------------ Ray integration


def read_shapefiles(paths: list[str]):
    """Dataset over many shapefiles: one parse task per file (the
    format is record-framed, so a file is the parallelism unit), rows
    tagged with ``src_file`` lineage. entity_id is made globally
    unique as file_idx * 2^40 + local id (a shapefile cannot hold
    2^40 records: record offsets are 32-bit word counts). The shift
    applies only when the file's ids are POSITIONAL (0..n-1, i.e. no
    stored entity_id attribute): engine-written shapefiles carry
    already-global ids in the DBF, and re-shifting those on re-ingest
    would collide part files. Files in one call should share a shape
    kind (one Dataset schema)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            t = read_shp(row["base"])
            eid = t["entity_id"].to_numpy(zero_copy_only=False)
            if np.array_equal(eid, np.arange(len(eid), dtype=eid.dtype)):
                eid = eid + (np.int64(row["idx"]) << np.int64(40))
            t = t.set_column(0, "entity_id", pa.array(eid))
            tables.append(
                t.append_column(
                    "src_file", pa.array([str(row["base"])] * t.num_rows, pa.string())
                )
            )
        return pa.concat_tables(tables, promote_options="default")

    items = [{"base": str(p), "idx": i} for i, p in enumerate(paths)]
    return rd.from_items(items).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def write_shapefile_partitions(ds, out_dir: str | Path, crs: str | None = None) -> list[str]:
    """Sink: one shapefile per block under ``out_dir`` (part-{i:05d}
    base names — the resumable layout: finished parts can be skipped
    on re-run). Returns the written base paths."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    # Blocks stream through the driver one at a time (iter_batches with
    # a large batch hint keeps block granularity without materializing
    # the dataset); file writing is I/O-bound, the pipeline upstream
    # stays distributed.
    for i, batch in enumerate(ds.iter_batches(batch_size=None, batch_format="pyarrow")):
        base = out_dir / f"part-{i:05d}"
        write_shp(batch, base, crs=crs)
        written.append(str(base))
    return written
