"""Coordinate extraction from page text — the graft's version of the
reference's layout-autodetecting line parser (``gk-slo.c`` main-loop
parse, SURVEY.md §2.2 S1 / §2.3 M1).

The reference auto-detects per line whether tokens are projected
``x y [H]`` vs geographic ``φ λ [h]``, decimal vs DMS; here the same
four layouts are recognized *inside free text* with vectorized RE2
kernels (``pyarrow.compute.extract_regex`` — C++, no Python loop) and
normalized to a single (fi, la, system) ETRS89 representation:

  system 0 = decimal degrees (WGS84/ETRS89)
  system 1 = DMS (WGS84/ETRS89)
  system 2 = projected D48/GK  (normalized via the Helmert chain)
  system 3 = projected D96/TM  (normalized via TM inverse)
  system -1 = no coordinate found (fi/la null)

Magnitude-based validity mirrors the reference's autodetect bounds
(projected ~1e5-1e6 m, geographic <90/<180, SURVEY.md §1.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geokit.datums import D96_TM
from geokit.dms import dms2deg
from geokit.tm import tm_inv
from geokit.transforms import gkxy2fila_wgs

PAT_DEC = r"(?P<fi>\d{2}\.\d{1,6}), (?P<la>\d{2}\.\d{1,6})"
PAT_DMS = (
    r"(?P<fd>\d{1,2})°(?P<fm>\d{2})'(?P<fs>\d{2}\.\d{2})\" N "
    r"(?P<ld>\d{1,3})°(?P<lm>\d{2})'(?P<ls>\d{2}\.\d{2})\" E"
)
PAT_D48 = r"x=(?P<x>\d{4,7}\.\d) y=(?P<y>\d{4,7}\.\d) \(D48/GK\)"
PAT_D96 = r"x=(?P<x>\d{4,7}\.\d) y=(?P<y>\d{4,7}\.\d) \(D96/TM\)"

# Single-pass alternation of all four layouts (group names uniquified):
# ONE RE2 scan over the text column instead of four — measured 52 ms vs
# 88 ms per 62.5k-row block. Exactly one branch's groups are non-null
# per match. Selection rule: earliest occurrence in the text wins (the
# reference parses line-at-a-time, so per-page multiple formats have no
# reference analog; the corpus embeds at most one coordinate per page).
def _rename_groups(pat: str, mapping: dict[str, str]) -> str:
    for old, new in mapping.items():
        pat = pat.replace(f"(?P<{old}>", f"(?P<{new}>")
    return pat


PAT_ALL = "|".join(
    [
        "(?:" + _rename_groups(PAT_D48, {"x": "x48", "y": "y48"}) + ")",
        "(?:" + _rename_groups(PAT_D96, {"x": "x96", "y": "y96"}) + ")",
        "(?:" + PAT_DMS + ")",
        "(?:" + PAT_DEC + ")",
    ]
)


def _f64(struct_arr: pa.Array, field: str) -> np.ndarray:
    """Struct field -> float64 numpy with NaN for null/empty.

    In an alternation match the non-matching branches' groups come
    back as EMPTY STRINGS (not nulls) — blank them before the cast."""
    col = pc.struct_field(struct_arr, field)
    col = pc.if_else(pc.equal(col, ""), pa.scalar(None, pa.string()), col)
    return pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)


def extract_coords(batch: pa.Table) -> pa.Table:
    """map_batches kernel: pages -> pages + (fi, la, system).

    Selection contract: when a page contains MORE THAN ONE coordinate
    format, the EARLIEST occurrence in the text wins (single-pass
    alternation), not a fixed format priority — the reference parses
    line-at-a-time so multi-format pages have no reference analog, and
    the synthetic corpus embeds at most one coordinate per page
    (pytest-asserted in the extractor ground-truth test). Callers that
    need D48>D96>DMS>DEC priority on adversarial text should scan the
    four patterns separately.

    Drops ``html`` if present (memory pressure at scale — SURVEY.md §4
    backpressure row); keeps ``text`` (byte-identity invariant).
    """
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    m = pc.extract_regex(text, PAT_ALL)

    n = len(text)
    fi = np.full(n, np.nan)
    la = np.full(n, np.nan)
    system = np.full(n, -1, dtype=np.int8)

    x48 = _f64(m, "x48")
    got = ~np.isnan(x48)
    if got.any():
        y48 = _f64(m, "y48")
        f, l, _ = gkxy2fila_wgs(x48[got], y48[got])
        fi[got] = f
        la[got] = l
        system[got] = 2

    x96 = _f64(m, "x96")
    g96 = ~np.isnan(x96) & (system == -1)
    if g96.any():
        y96 = _f64(m, "y96")
        f, l = tm_inv(x96[g96], y96[g96], D96_TM)
        fi[g96] = f
        la[g96] = l
        system[g96] = 3

    fd = _f64(m, "fd")
    gdms = ~np.isnan(fd) & (system == -1)
    if gdms.any():
        fi[gdms] = dms2deg(fd[gdms], _f64(m, "fm")[gdms], _f64(m, "fs")[gdms])
        la[gdms] = dms2deg(
            _f64(m, "ld")[gdms], _f64(m, "lm")[gdms], _f64(m, "ls")[gdms]
        )
        system[gdms] = 1

    fdec = _f64(m, "fi")
    gdec = ~np.isnan(fdec) & (system == -1)
    if gdec.any():
        fi[gdec] = fdec[gdec]
        la[gdec] = _f64(m, "la")[gdec]
        system[gdec] = 0

    # Validity bounds (reference M4): geographic plausibility window.
    bad = (system >= 0) & ~((fi > 30.0) & (fi < 60.0) & (la > 5.0) & (la < 25.0))
    fi[bad] = np.nan
    la[bad] = np.nan
    system[bad] = -1

    keep = [c for c in batch.column_names if c != "html"]
    out = batch.select(keep)
    out = out.append_column("fi", pa.array(fi, pa.float64()))
    out = out.append_column("la", pa.array(la, pa.float64()))
    out = out.append_column("system", pa.array(system, pa.int8()))
    return out


def filter_has_coord(batch: pa.Table) -> pa.Table:
    """Vectorized predicate filter (faster than ds.filter(row_fn))."""
    return batch.filter(pc.greater_equal(batch["system"], 0))
