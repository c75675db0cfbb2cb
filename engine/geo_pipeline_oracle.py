"""End-to-end SQL value oracle for the FLAGSHIP geo pipeline.

``geo_pipeline_sql`` drives the REAL flagship stages — the RE2
layout-autodetect extractor (engine/extract.py), the fused
``prepare_stage`` (project both grids -> geoid -> cell) and the fused
``spatial_join_stage`` (AFT affine + municipality PIP) — over a corpus
of coordinate-bearing text synthesized from the ``orders`` driver
table by integer arithmetic, and pairs it with a complete DuckDB
mirror: the SAME text strings are rebuilt in SQL (printf — proven
string-identical in ``format_points``), regexp-extracted with the same
RE2 patterns, normalized per layout (D48 Helmert chain / D96 TM
inverse / DMS / decimal), projected, geoid-interpolated, cell-assigned,
AFT-transformed (barycentric form) and PIP-joined against the
municipality polygon edges embedded as VALUES literals.

This upgrades the flagship enrichment chain from a rows-only driver
check to a driver-gate VALUE check (the full-precision ``geo_enriched``
stays rows-only; its exactness is this query plus pytest). Everything
the corpus generator needs on the SQL side (fila2gk for D48 strings,
tm_fwd for D96 strings) reuses the bitwise-proven mirrors from
engine/sql_oracles.py.

Quantization: cm for projected metres (proven margins in
``fila2gk``/``aft_transform``), microdegrees for fi/la (the helmert_chain
precedent; the inverse chains agree to ~2e-14 deg, so the per-row
boundary-straddle probability is ~4e-8); 0.1 mm for geoid undulation
(cross-engine diff <= 4e-14 m).

Reference parity: the pipeline is the gk-slo lifecycle (SURVEY.md
§3.1) — upstream gk-slo.c main-loop parse + ggeo.c transforms.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from engine.sql_oracles import (
    CELL_LEVEL,
    _AFT_NX,
    _AFT_NY,
    _AFT_SUF,
    _AFT_X0,
    _AFT_Y0,
    _c,
    _fila2gk_ctes,
    _gk2tm_chain_ctes,
    _np,
    _read,
    _sql_cell_chain,
    _sql_cell_expr,
    _sql_geoid_interp_ctes,
    _sql_geoid_und_expr,
)

# ------------------------------------------------------- corpus (both engines)
#
# Derived per orders row (o_orderkey=ok, o_custkey=ck):
#   fi = 45.3 + ((ok*40503 + ck) % 100000) * 1.6e-5   [- 20 if ok%23==0]
#   la = 13.2 + ((ok*69069 + ck) % 100000) * 2.4e-5
#   layout = ok%2 if ok%23==0 else ok%4   (oob rows stay text-parseable
#                                          so the M4 bounds filter, not
#                                          the regex, rejects them)
#   no coordinate at all when ok%17==0 (extractor must drop the row)


def _derive(ok: np.ndarray, ck: np.ndarray):
    fi = 45.3 + ((ok * 40503 + ck) % 100000) * 1.6e-5
    la = 13.2 + ((ok * 69069 + ck) % 100000) * 2.4e-5
    oob = ok % 23 == 0
    fi = fi - np.where(oob, 20.0, 0.0)
    layout = np.where(oob, ok % 2, ok % 4)
    has = ok % 17 != 0
    return fi, la, layout, has


def _build_texts(batch: pa.Table) -> pa.Table:
    """orders -> (page_id, text): the corpus builder, numpy side.

    String ops mirror engine/pages.py make_pages_table exactly
    (np.char printf formatting, _dms_vec DMS assembly)."""
    from geokit.datums import D96_TM
    from geokit.tm import tm_fwd
    from geokit.transforms import fila_wgs2gkxy

    from engine.pages import _dms_vec

    ok = _np(batch, "o_orderkey")
    ck = _np(batch, "o_custkey")
    fi, la, layout, has = _derive(ok, ck)
    x48, y48, _h = fila_wgs2gkxy(fi, la)
    x96, y96 = tm_fwd(fi, la, D96_TM)

    coord = np.empty(len(ok), dtype=object)
    m0 = layout == 0
    coord[m0] = np.char.add(
        np.char.add(np.char.mod("%.4f", fi[m0]), ", "), np.char.mod("%.4f", la[m0])
    )
    m1 = layout == 1
    coord[m1] = np.char.add(
        np.char.add(_dms_vec(fi[m1], "N"), " "), _dms_vec(la[m1], "E")
    )
    for code, xx, yy, tag in ((2, x48, y48, "(D48/GK)"), (3, x96, y96, "(D96/TM)")):
        m = layout == code
        c = np.char.add(np.char.mod("x=%.1f", xx[m]), np.char.mod(" y=%.1f", yy[m]))
        coord[m] = np.char.add(c, " " + tag)

    texts = np.where(
        has,
        np.char.add(
            np.char.add("novice obvestila ", coord.astype(str)), " kontakt zima"
        ),
        "novice obvestila kontakt zima",
    )
    return pa.table(
        {
            "page_id": pa.array(ok, pa.int64()),
            "text": pa.array(texts.astype(object), pa.string()),
        }
    )


def _quantize(b: pa.Table) -> pa.Table:
    def q(col: str, scale: float) -> pa.Array:
        v = _np(b, col)
        return pa.array(np.floor(v * scale + 0.5).astype(np.int64))

    return pa.table(
        {
            "page_id": b["page_id"],
            "system": pa.array(_np(b, "system").astype(np.int32), pa.int32()),
            "fi_udeg": q("fi", 1e6),
            "la_udeg": q("la", 1e6),
            "x48_cm": q("x_d48", 1e2),
            "y48_cm": q("y_d48", 1e2),
            "x96_cm": q("x_d96", 1e2),
            "y96_cm": q("y_d96", 1e2),
            "xaft_cm": q("x_d96_aft", 1e2),
            "yaft_cm": q("y_d96_aft", 1e2),
            "n_dmm": q("geoid_n", 1e4),
            "horth_dmm": q("H_orth", 1e4),
            "geoid_in_bounds": b["geoid_in_bounds"],
            "aft_found": b["aft_found"],
            "cell": b["cell"],
            "muni_id": b["muni_id"],
        }
    )


def q_geo_pipeline_sql(sf_dir: str) -> Dataset:
    """The flagship chain, driver-table-derived and value-checkable:
    build text -> REAL extract/prepare/spatial stages -> quantize."""
    from engine.stages import prepare_stage, spatial_join_stage

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        _build_texts, batch_format="pyarrow"
    )
    ds = ds.map_batches(prepare_stage, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(
        spatial_join_stage,
        fn_kwargs=dict(direction="fwd", k=3),
        batch_format="pyarrow",
        batch_size=None,
    )
    return ds.map_batches(_quantize, batch_format="pyarrow")


def q_geo_muni_rollup_sql(sf_dir: str) -> Dataset:
    """Municipality rollup on the SAME value-checkable chain: the REAL
    stages + the REAL combiner-shuffle aggregate (grouped_count_sums)
    over the PIP group key. H_orth is quantized per row BEFORE the sum
    (0.1 mm int64) so the comparison is integer-exact regardless of
    float summation order on either engine."""
    from engine.shuffle import grouped_count_sums

    ds = q_geo_pipeline_sql(sf_dir).select_columns(["muni_id", "horth_dmm"])
    return grouped_count_sums(ds, key="muni_id", sum_cols=("horth_dmm",))


# ------------------------------------------------------------ SQL mirror


def _sql_pat(pat: str) -> str:
    """Python named-group RE2 pattern -> DuckDB literal (plain groups,
    names supplied positionally via the regexp_extract name list)."""
    return re.sub(r"\(\?P<[^>]+>", "(", pat).replace("'", "''")


def _tm_fwd_ctes(p: str, src: str) -> tuple[str, str, str, str]:
    """GRS80/D96 TM forward over fi/la in ``src`` — term-for-term
    mirror of geokit.tm.tm_fwd (proven bitwise in ``tm_forward``).
    CTE names AND columns prefixed with ``p`` (safe under SELECT *
    chaining). Returns (fragment, x_expr, y_expr, final_cte)."""
    from geokit.datums import D96_TM

    ell = D96_TM.ellipsoid
    e2 = ell.e2
    e4 = e2 * e2
    e6 = e4 * e2
    ep2 = ell.ep2
    a = ell.a
    c1 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    c2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    c3 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    c4 = 35.0 * e6 / 3072.0
    frag = f""",
{p}a AS (SELECT *, radians(fi) AS {p}phi, radians(la) AS {p}lam FROM {src}),
{p}b AS (SELECT *, sin({p}phi) AS {p}sp, cos({p}phi) AS {p}cp FROM {p}a),
{p}c AS (SELECT *, {p}sp / {p}cp AS {p}tp,
    {_c(a)} / sqrt(1.0e0 - {_c(e2)} * {p}sp * {p}sp) AS {p}N,
    {_c(ep2)} * {p}cp * {p}cp AS {p}C,
    ({p}lam - radians(15.0e0)) * {p}cp AS {p}A,
    {_c(a)} * ({_c(c1)} * {p}phi - {_c(c2)} * sin(2.0e0 * {p}phi) + {_c(c3)} * sin(4.0e0 * {p}phi) - {_c(c4)} * sin(6.0e0 * {p}phi)) AS {p}M FROM {p}b),
{p}d AS (SELECT *, {p}tp * {p}tp AS {p}T, {p}A * {p}A AS {p}A2 FROM {p}c),
{p}e AS (SELECT *, {p}A2 * {p}A AS {p}A3, {p}A2 * {p}A2 AS {p}A4 FROM {p}d),
{p}f AS (SELECT *, {p}A4 * {p}A AS {p}A5, {p}A4 * {p}A2 AS {p}A6 FROM {p}e)"""
    x_expr = (
        f"(-5.0e6 + 0.9999e0 * ({p}M - 0.0e0 + {p}N * {p}tp * ({p}A2 / 2.0e0"
        f" + (5.0e0 - {p}T + 9.0e0 * {p}C + 4.0e0 * {p}C * {p}C) * {p}A4 / 24.0e0"
        f" + (61.0e0 - 58.0e0 * {p}T + {p}T * {p}T + 600.0e0 * {p}C - 330.0e0 * {_c(ep2)}) * {p}A6 / 720.0e0)))"
    )
    y_expr = (
        f"(5.0e5 + 0.9999e0 * {p}N * ({p}A"
        f" + (1.0e0 - {p}T + {p}C) * {p}A3 / 6.0e0"
        f" + (5.0e0 - 18.0e0 * {p}T + {p}T * {p}T + 72.0e0 * {p}C - 58.0e0 * {_c(ep2)}) * {p}A5 / 120.0e0))"
    )
    return frag, x_expr, y_expr, f"{p}f"


def _tm_inv_ctes(p: str, src: str, xcol: str, ycol: str) -> tuple[str, str, str, str]:
    """GRS80/D96 TM inverse over projected ``xcol``/``ycol`` in ``src``
    — term-for-term mirror of geokit.tm.tm_inv (proven in
    ``tm_inverse``). Returns (fragment, fi_expr_deg, la_expr_deg,
    final_cte)."""
    from geokit.datums import D96_TM

    g = D96_TM.ellipsoid
    e2, ep2, a = g.e2, g.ep2, g.a
    e4, e6 = e2 * e2, e2 ** 3
    c1 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    sq = np.sqrt(1.0 - e2)
    e1 = (1.0 - sq) / (1.0 + sq)
    d1 = 3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0
    d2 = 21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0
    d3 = 151.0 * e1 ** 3 / 96.0
    d4 = 1097.0 * e1 ** 4 / 512.0
    frag = f""",
{p}a AS (SELECT *, 0.0e0 + ({xcol} - (-5.0e6)) / 0.9999e0 AS {p}M FROM {src}),
{p}b AS (SELECT *, {p}M / ({_c(a)} * {_c(c1)}) AS {p}mu FROM {p}a),
{p}c AS (SELECT *, {p}mu + {_c(d1)} * sin(2.0e0*{p}mu) + {_c(d2)} * sin(4.0e0*{p}mu) + {_c(d3)} * sin(6.0e0*{p}mu) + {_c(d4)} * sin(8.0e0*{p}mu) AS {p}phi1 FROM {p}b),
{p}d AS (SELECT *, sin({p}phi1) AS {p}sp1, cos({p}phi1) AS {p}cp1 FROM {p}c),
{p}e AS (SELECT *, {p}sp1/{p}cp1 AS {p}tp1, {_c(ep2)} * {p}cp1 * {p}cp1 AS {p}C1, ({p}sp1/{p}cp1)*({p}sp1/{p}cp1) AS {p}T1, 1.0e0 - {_c(e2)} * {p}sp1 * {p}sp1 AS {p}om FROM {p}d),
{p}f AS (SELECT *, {_c(a)} / sqrt({p}om) AS {p}N1, {_c(a)} * (1.0e0 - {_c(e2)}) / ({p}om * sqrt({p}om)) AS {p}R1 FROM {p}e),
{p}g AS (SELECT *, ({ycol} - 5.0e5) / ({p}N1 * 0.9999e0) AS {p}D FROM {p}f),
{p}h AS (SELECT *, {p}D*{p}D AS {p}DD2 FROM {p}g),
{p}i AS (SELECT *, {p}DD2*{p}D AS {p}DD3, {p}DD2*{p}DD2 AS {p}DD4 FROM {p}h),
{p}j AS (SELECT *, {p}DD4*{p}D AS {p}DD5, {p}DD4*{p}DD2 AS {p}DD6 FROM {p}i),
{p}k AS (SELECT *,
  {p}phi1 - ({p}N1 * {p}tp1 / {p}R1) * ({p}DD2/2.0e0 - (5.0e0 + 3.0e0*{p}T1 + 10.0e0*{p}C1 - 4.0e0*{p}C1*{p}C1 - 9.0e0*{_c(ep2)}) * {p}DD4/24.0e0
      + (61.0e0 + 90.0e0*{p}T1 + 298.0e0*{p}C1 + 45.0e0*{p}T1*{p}T1 - 252.0e0*{_c(ep2)} - 3.0e0*{p}C1*{p}C1) * {p}DD6/720.0e0) AS {p}phi,
  radians(15.0e0) + ({p}D - (1.0e0 + 2.0e0*{p}T1 + {p}C1) * {p}DD3/6.0e0
      + (5.0e0 - 2.0e0*{p}C1 + 28.0e0*{p}T1 - 3.0e0*{p}C1*{p}C1 + 8.0e0*{_c(ep2)} + 24.0e0*{p}T1*{p}T1) * {p}DD5/120.0e0) / {p}cp1 AS {p}lam FROM {p}j)"""
    return frag, f"degrees({p}phi)", f"degrees({p}lam)", f"{p}k"


def _sql_dms_str(col: str, hemi: str) -> str:
    """Mirror of engine/pages.py _dms_vec: `46°03'25.12\" N`-style
    string from decimal degrees (floor arithmetic + printf)."""
    rem = f"(({col} - floor({col})) * 6.0e1)"
    return (
        f"printf('%d', CAST(floor({col}) AS BIGINT)) || '°' || "
        f"printf('%02d', CAST(floor({rem}) AS BIGINT)) || '''' || "
        f"printf('%05.2f', LEAST(({rem} - floor({rem})) * 6.0e1, {_c(59.994999)}))"
        f" || '\" {hemi}'"
    )


def _sql_muni_edges() -> str:
    """Municipality polygon edges as a VALUES CTE body (256 rows:
    64 jittered quads x 4 edges) — the deterministic seed=42 asset
    embedded as literals so the oracle needs no filesystem access."""
    import assets

    polys = assets.load_municipalities()
    rows = []
    for i in range(len(polys.muni_id)):
        rs, re_ = polys.ring_start[i], polys.ring_start[i + 1]
        nv = re_ - rs
        for k in range(nv):
            x0, y0 = polys.xs[rs + k], polys.ys[rs + k]
            x1, y1 = polys.xs[rs + (k + 1) % nv], polys.ys[rs + (k + 1) % nv]
            rows.append(
                f"({int(polys.muni_id[i])}, {_c(x0)}, {_c(y0)}, {_c(x1)}, {_c(y1)})"
            )
    return ",\n  ".join(rows)


def _sql_geo_pipeline(final: str | None = None, corpus: str | None = None) -> str:
    """Full-chain mirror; ``final`` overrides the tail SELECT (it sees
    the ``aftq`` row set and the ``lab`` PIP labels). ``corpus``
    overrides the orders-derived text generation with any WITH-chain
    ending in a CTE ``txt(page_id, text, ...)`` — the extraction →
    normalize → project → geoid → cell → AFT → PIP chain from ``ex``
    onward is corpus-agnostic (q_geo_enriched runs it over the
    synthetic pages parquet read directly by DuckDB)."""
    from engine.extract import PAT_D48, PAT_D96, PAT_DEC, PAT_DMS

    # ---- corpus generation (mirror of _build_texts) ----------------
    fi_expr = (
        "45.3e0 + ((o_orderkey * 40503 + o_custkey) % 100000) * 1.6e-5"
        " - (CASE WHEN o_orderkey % 23 = 0 THEN 2.0e1 ELSE 0.0e0 END)"
    )
    la_expr = "13.2e0 + ((o_orderkey * 69069 + o_custkey) % 100000) * 2.4e-5"
    layout_expr = (
        "CASE WHEN o_orderkey % 23 = 0 THEN o_orderkey % 2 ELSE o_orderkey % 4 END"
    )
    gsrc = f"""
WITH gsrc AS (
 SELECT o_orderkey AS page_id,
   {layout_expr} AS layout,
   (o_orderkey % 17 != 0) AS has,
   {fi_expr} AS fi,
   {la_expr} AS la
 FROM orders)"""
    gkeys = "page_id, layout, has, fi, la"
    gchain, gx48e, gy48e, _gh = _fila2gk_ctes(gkeys, src="gsrc", p="g")
    gen48 = f""",
gx48t AS (SELECT {gkeys}, {gx48e} AS gx48, {gy48e} AS gy48 FROM gfh)"""
    gtfrag, gtx, gty, gtfin = _tm_fwd_ctes("gt", "gx48t")
    gen96 = f""",
gxy AS (SELECT {gkeys}, gx48, gy48, {gtx} AS gx96, {gty} AS gy96 FROM {gtfin})"""
    # MATERIALIZED: optimization barrier. Without it DuckDB's
    # projection-inlining + filter-pushdown substitutes the generation
    # chains into the branch predicates and the planner's expression
    # rewriting explodes combinatorially (EXPLAIN alone ran >200 s;
    # with the two barriers the whole query plans+runs in <1 s).
    txt = f""",
txt AS MATERIALIZED (
 SELECT page_id,
   CASE WHEN NOT has THEN 'novice obvestila kontakt zima'
   ELSE 'novice obvestila ' || CASE layout
     WHEN 0 THEN printf('%.4f', fi) || ', ' || printf('%.4f', la)
     WHEN 1 THEN {_sql_dms_str('fi', 'N')} || ' ' || {_sql_dms_str('la', 'E')}
     WHEN 2 THEN printf('x=%.1f y=%.1f (D48/GK)', gx48, gy48)
     ELSE printf('x=%.1f y=%.1f (D96/TM)', gx96, gy96)
   END || ' kontakt zima' END AS text
 FROM gxy)"""

    # ---- extraction (mirror of engine/extract.py) ------------------
    ex = f""",
ex AS (
 SELECT page_id,
   regexp_extract(text, '{_sql_pat(PAT_D48)}', ['gx', 'gy']) AS e48,
   regexp_extract(text, '{_sql_pat(PAT_D96)}', ['tx', 'ty']) AS e96,
   regexp_extract(text, '{_sql_pat(PAT_DMS)}', ['fd', 'fm', 'fs', 'ld', 'lm', 'ls']) AS edms,
   regexp_extract(text, '{_sql_pat(PAT_DEC)}', ['pfi', 'pla']) AS edec
 FROM txt)"""

    # ---- layout normalization branches -----------------------------
    b2src = """,
b2src AS (
 SELECT page_id,
   CAST(struct_extract(e48, 'gx') AS DOUBLE) AS gx,
   CAST(struct_extract(e48, 'gy') AS DOUBLE) AS gy
 FROM ex WHERE struct_extract(e48, 'gx') != '')"""
    b2_all = _gk2tm_chain_ctes([""], "b2src", prefix="b2")
    b2_upto = next(i for i, (n, _q) in enumerate(b2_all) if n == "b2fin")
    b2chain = ",\n" + ",\n".join(f"{n} AS ({q})" for n, q in b2_all[: b2_upto + 1])

    b3src = """,
b3src AS (
 SELECT page_id,
   CAST(struct_extract(e96, 'tx') AS DOUBLE) AS tx,
   CAST(struct_extract(e96, 'ty') AS DOUBLE) AS ty
 FROM ex WHERE struct_extract(e96, 'tx') != '' AND struct_extract(e48, 'gx') = '')"""
    b3frag, b3fi, b3la, b3fin = _tm_inv_ctes("b3", "b3src", "tx", "ty")

    # dms2deg for positive degrees: sign * (abs(d) + m/60 + s/3600)
    # reduces to d + m/60 + s/3600 (geokit/dms.py:14).
    b1 = """,
b1 AS (
 SELECT page_id,
   CAST(struct_extract(edms, 'fd') AS DOUBLE) + CAST(struct_extract(edms, 'fm') AS DOUBLE) / 60.0e0 + CAST(struct_extract(edms, 'fs') AS DOUBLE) / 3600.0e0 AS fi,
   CAST(struct_extract(edms, 'ld') AS DOUBLE) + CAST(struct_extract(edms, 'lm') AS DOUBLE) / 60.0e0 + CAST(struct_extract(edms, 'ls') AS DOUBLE) / 3600.0e0 AS la
 FROM ex WHERE struct_extract(edms, 'fd') != ''
   AND struct_extract(e48, 'gx') = '' AND struct_extract(e96, 'tx') = '')"""
    b0 = """,
b0 AS (
 SELECT page_id,
   CAST(struct_extract(edec, 'pfi') AS DOUBLE) AS fi,
   CAST(struct_extract(edec, 'pla') AS DOUBLE) AS la
 FROM ex WHERE struct_extract(edec, 'pfi') != '' AND struct_extract(e48, 'gx') = ''
   AND struct_extract(e96, 'tx') = '' AND struct_extract(edms, 'fd') = '')"""

    # pts0 MATERIALIZED: same barrier, between the normalize branches
    # and the projection tail (the bounds filter would otherwise push
    # into all four branch chains by substitution).
    union = f""",
pts0 AS MATERIALIZED (
 SELECT page_id, 2 AS sys, fi, la FROM b2fin
 UNION ALL SELECT page_id, 3 AS sys, {b3fi} AS fi, {b3la} AS la FROM {b3fin}
 UNION ALL SELECT page_id, 1 AS sys, fi, la FROM b1
 UNION ALL SELECT page_id, 0 AS sys, fi, la FROM b0),
pts AS (
 SELECT * FROM pts0
 WHERE fi > 30.0e0 AND fi < 60.0e0 AND la > 5.0e0 AND la < 25.0e0)"""

    # ---- projection tail (mirror of prepare_stage) -----------------
    tkeys = "page_id, sys, fi, la"
    tchain, tx48, ty48, _th = _fila2gk_ctes(tkeys, src="pts", p="t")
    tail48 = f""",
xy48 AS (SELECT {tkeys}, {tx48} AS x48, {ty48} AS y48 FROM tfh)"""
    ttfrag, ttx, tty, ttfin = _tm_fwd_ctes("tt", "xy48")
    tail96 = f""",
enr AS (SELECT {tkeys}, x48, y48, {ttx} AS x96, {tty} AS y96 FROM {ttfin})"""

    geoid = _sql_geoid_interp_ctes("slo2000", "gs_").replace("{prev}", "enr")
    gq = f""",
gq AS (SELECT *, {_sql_geoid_und_expr('gs_')} AS gn FROM gs_ge)"""

    cells = _sql_cell_chain(CELL_LEVEL).replace("FROM pts)", "FROM gq)", 1)
    pre = f""",
pre AS (SELECT page_id, sys, fi, la, x48, y48, x96, y96, gn, gs_inb AS gin,
  {_sql_cell_expr(CELL_LEVEL)} AS cellid FROM cg)"""

    # ---- AFT (mirror of _sql_aft_transform over computed x48/y48) --
    aloc = f""",
aloc AS (
 SELECT *,
   ((x48 - {_c(_AFT_X0)}) / 3.0e3 >= 0.0e0 AND (x48 - {_c(_AFT_X0)}) / 3.0e3 <= {_AFT_NX - 1}.0e0
    AND (y48 - {_c(_AFT_Y0)}) / 3.0e3 >= 0.0e0 AND (y48 - {_c(_AFT_Y0)}) / 3.0e3 <= {_AFT_NY - 1}.0e0) AS in_cov,
   LEAST(GREATEST(CAST(floor((x48 - {_c(_AFT_X0)}) / 3.0e3) AS BIGINT), 0), {_AFT_NX - 2}) AS i0q,
   LEAST(GREATEST(CAST(floor((y48 - {_c(_AFT_Y0)}) / 3.0e3) AS BIGINT), 0), {_AFT_NY - 2}) AS j0q
 FROM pre)"""
    anode = (
        ",\nanode AS (SELECT *, "
        f"{_c(_AFT_X0)} + i0q * 3.0e3 AS gx00, {_c(_AFT_Y0)} + j0q * 3.0e3 AS gy00, "
        f"{_c(_AFT_X0)} + i0q * 3.0e3 AS gx01, {_c(_AFT_Y0)} + (j0q + 1) * 3.0e3 AS gy01, "
        f"{_c(_AFT_X0)} + (i0q + 1) * 3.0e3 AS gx10, {_c(_AFT_Y0)} + j0q * 3.0e3 AS gy10, "
        f"{_c(_AFT_X0)} + (i0q + 1) * 3.0e3 AS gx11, {_c(_AFT_Y0)} + (j0q + 1) * 3.0e3 AS gy11 "
        "FROM aloc)"
    )
    az = _gk2tm_chain_ctes(_AFT_SUF, "anode", prefix="az", wiggle=True)
    azchain = ",\n" + ",\n".join(f"{n} AS ({q})" for n, q in az)
    abary = """,
abary AS (SELECT *, (x48 - gx00) / 3.0e3 AS au, (y48 - gy00) / 3.0e3 AS av FROM azwg)"""
    aftq = """,
aftq AS (
 SELECT page_id, sys, fi, la, x48, y48, x96, y96, gn, gin, cellid, in_cov,
   CASE WHEN NOT in_cov THEN x96
     WHEN au + av <= 1.0e0 THEN (1.0e0 - au - av) * dstx00 + av * dstx01 + au * dstx10
     ELSE (1.0e0 - au) * dstx01 + (au + av - 1.0e0) * dstx11 + (1.0e0 - av) * dstx10 END AS xaft,
   CASE WHEN NOT in_cov THEN y96
     WHEN au + av <= 1.0e0 THEN (1.0e0 - au - av) * dsty00 + av * dsty01 + au * dsty10
     ELSE (1.0e0 - au) * dsty01 + (au + av - 1.0e0) * dsty11 + (1.0e0 - av) * dsty10 END AS yaft
 FROM abary)"""

    # ---- municipality PIP (even-odd ray crossing, embedded edges) --
    pip = f""",
medges(muni_id, ex0, ey0, ex1, ey1) AS (VALUES
  {_sql_muni_edges()}),
inside AS (
 SELECT a.page_id AS iid, e.muni_id AS im
 FROM aftq a CROSS JOIN medges e
 WHERE CASE WHEN (e.ey0 > a.y96) != (e.ey1 > a.y96)
   THEN a.x96 < e.ex0 + (a.y96 - e.ey0) / (e.ey1 - e.ey0) * (e.ex1 - e.ex0)
   ELSE FALSE END
 GROUP BY 1, 2 HAVING COUNT(*) % 2 = 1),
lab AS (SELECT iid, MIN(im) AS mid FROM inside GROUP BY 1)"""

    final = final or """
SELECT a.page_id, CAST(a.sys AS INTEGER) AS system,
  CAST(FLOOR(a.fi * 1e6 + 0.5e0) AS BIGINT) AS fi_udeg,
  CAST(FLOOR(a.la * 1e6 + 0.5e0) AS BIGINT) AS la_udeg,
  CAST(FLOOR(a.x48 * 1e2 + 0.5e0) AS BIGINT) AS x48_cm,
  CAST(FLOOR(a.y48 * 1e2 + 0.5e0) AS BIGINT) AS y48_cm,
  CAST(FLOOR(a.x96 * 1e2 + 0.5e0) AS BIGINT) AS x96_cm,
  CAST(FLOOR(a.y96 * 1e2 + 0.5e0) AS BIGINT) AS y96_cm,
  CAST(FLOOR(a.xaft * 1e2 + 0.5e0) AS BIGINT) AS xaft_cm,
  CAST(FLOOR(a.yaft * 1e2 + 0.5e0) AS BIGINT) AS yaft_cm,
  CAST(FLOOR(a.gn * 1e4 + 0.5e0) AS BIGINT) AS n_dmm,
  CAST(FLOOR((0.0e0 - a.gn) * 1e4 + 0.5e0) AS BIGINT) AS horth_dmm,
  a.gin AS geoid_in_bounds,
  a.in_cov AS aft_found,
  a.cellid AS cell,
  CAST(COALESCE(l.mid, -1) AS INTEGER) AS muni_id
FROM aftq a LEFT JOIN lab l ON a.page_id = l.iid
"""

    corpus_part = (
        corpus
        if corpus is not None
        else gsrc + gchain + gen48 + gtfrag + gen96 + txt
    )
    return (
        corpus_part
        + ex
        + b2src
        + b2chain
        + b3src
        + b3frag
        + b1
        + b0
        + union
        + tchain
        + tail48
        + ttfrag
        + tail96
        + geoid
        + gq
        + cells
        + pre
        + aloc
        + anode
        + azchain
        + abary
        + aftq
        + pip
        + final
    )


def _quantize_enriched(b: pa.Table) -> pa.Table:
    """geo_enriched at driver-gate VALUE strength: the geo_pipeline_sql
    precedent applied to the full enrichment table — µdeg coordinates,
    cm projected metres, 0.1 mm geoid/H_orth ints (margins proven in
    the component queries), exact string/int/bool columns verbatim."""

    def q(col: str, scale: float) -> pa.Array:
        v = _np(b, col)
        return pa.array(np.floor(v * scale + 0.5).astype(np.int64))

    return pa.table(
        {
            "url": b["url"],
            "lang": b["lang"],
            "system": pa.array(_np(b, "system").astype(np.int32), pa.int32()),
            "fi_udeg": q("fi", 1e6),
            "la_udeg": q("la", 1e6),
            "x48_cm": q("x_d48", 1e2),
            "y48_cm": q("y_d48", 1e2),
            "x96_cm": q("x_d96", 1e2),
            "y96_cm": q("y_d96", 1e2),
            "xaft_cm": q("x_d96_aft", 1e2),
            "yaft_cm": q("y_d96_aft", 1e2),
            "n_dmm": q("geoid_n", 1e4),
            "horth_dmm": q("H_orth", 1e4),
            "geoid_in_bounds": b["geoid_in_bounds"],
            "aft_found": b["aft_found"],
            "cell": b["cell"],
            "muni_id": b["muni_id"],
        }
    )


def q_geo_enriched(sf_dir: str) -> Dataset:
    """Full flagship enrichment over the synthetic pages corpus,
    quantized for the SQL-value gate (VERDICT-r3 #4: flips
    geo_enriched from rows-only to value-checked; the full-precision
    variant stays as geo_enriched_full, pytest-covered)."""
    from engine.pages import pages_parquet, sf_to_n_rows
    from engine.pipeline import enrich_pages

    enr = enrich_pages(pages_parquet(sf_to_n_rows(sf_dir)))
    return enr.map_batches(_quantize_enriched, batch_format="pyarrow")


def _sql_geo_enriched(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """DuckDB mirror of q_geo_enriched: read the SAME cached pages
    parquet (deterministic synthetic corpus, FIXTURES.md §A — both
    engines consume identical bytes; the Ray query materializes the
    cache before the oracle runs per the driver's query-then-oracle
    order), run the corpus-agnostic chain from ``ex`` onward, and
    re-join url/lang from the source. The path is pinned to the
    driver's correctness sf (0.01) — the contract runs oracles there
    only."""
    import os

    from engine.pages import SEED, sf_to_n_rows

    n = sf_to_n_rows(sf_dir)
    path = os.path.join(f"/tmp/geokit_pages/n{n}_s{SEED}", "part-*.parquet")
    corpus = f"""
WITH txt AS MATERIALIZED (
 SELECT url AS page_id, lang, text
 FROM read_parquet('{path}'))"""
    final = """
SELECT a.page_id AS url, t.lang, CAST(a.sys AS INTEGER) AS system,
  CAST(FLOOR(a.fi * 1e6 + 0.5e0) AS BIGINT) AS fi_udeg,
  CAST(FLOOR(a.la * 1e6 + 0.5e0) AS BIGINT) AS la_udeg,
  CAST(FLOOR(a.x48 * 1e2 + 0.5e0) AS BIGINT) AS x48_cm,
  CAST(FLOOR(a.y48 * 1e2 + 0.5e0) AS BIGINT) AS y48_cm,
  CAST(FLOOR(a.x96 * 1e2 + 0.5e0) AS BIGINT) AS x96_cm,
  CAST(FLOOR(a.y96 * 1e2 + 0.5e0) AS BIGINT) AS y96_cm,
  CAST(FLOOR(a.xaft * 1e2 + 0.5e0) AS BIGINT) AS xaft_cm,
  CAST(FLOOR(a.yaft * 1e2 + 0.5e0) AS BIGINT) AS yaft_cm,
  CAST(FLOOR(a.gn * 1e4 + 0.5e0) AS BIGINT) AS n_dmm,
  CAST(FLOOR((0.0e0 - a.gn) * 1e4 + 0.5e0) AS BIGINT) AS horth_dmm,
  a.gin AS geoid_in_bounds,
  a.in_cov AS aft_found,
  a.cellid AS cell,
  CAST(COALESCE(l.mid, -1) AS INTEGER) AS muni_id
FROM aftq a LEFT JOIN lab l ON a.page_id = l.iid
JOIN txt t ON t.page_id = a.page_id
"""
    return _sql_geo_pipeline(final=final, corpus=corpus)


def _sql_geo_muni_rollup() -> str:
    """GROUP BY over the same chain: count + 0.1 mm-quantized H_orth
    sum per municipality (muni_id = -1 for points outside every
    polygon, same as the engine's PipJoin)."""
    return _sql_geo_pipeline(
        final="""
SELECT CAST(COALESCE(l.mid, -1) AS INTEGER) AS muni_id,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(CAST(FLOOR((0.0e0 - a.gn) * 1e4 + 0.5e0) AS BIGINT)) AS BIGINT) AS sum_horth_dmm
FROM aftq a LEFT JOIN lab l ON a.page_id = l.iid
GROUP BY 1
"""
    )
