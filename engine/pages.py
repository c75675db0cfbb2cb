"""Deterministic synthetic ``pages`` corpus (FIXTURES.md §A).

Shape is the authoritative input hint (BASELINE.json:input_hint):
``pages(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``. ~70% of rows embed exactly one coordinate string in
``text`` in one of the reference parser's accepted layouts (decimal
degrees, DMS, projected D48/GK, projected D96/TM — SURVEY.md §1.1
autodetect semantics); geographic distribution is skewed (60% of
points inside 3 city disks) to exercise cell salting. Seed=42,
reproducible byte-for-byte for a given (n_rows, seed).

The generator keeps the ground-truth coordinates + layout per row so
tests can oracle the extractor exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute
import pyarrow.parquet as pq

from geokit.datums import SLO_BBOX, D96_TM
from geokit.tm import tm_fwd
from geokit.transforms import fila_wgs2gkxy

SEED = 42
LANGS = np.array(["sl", "en", "de", "it"])
LANG_P = np.array([0.45, 0.30, 0.15, 0.10])
# City disks (lat, lon, radius_deg) — Ljubljana/Maribor/Koper-ish.
CITIES = [(46.05, 14.51, 0.06), (46.55, 15.65, 0.05), (45.55, 13.73, 0.04)]

_FILLER = (
    "novice obvestila kontakt turizem zgodovina kultura sport recept gore jezero "
    "reka mesto vas grad muzej pot kolo vreme zima poletje news about contact "
    "hiking lake castle valley bridge trail forest market street station"
).split()


def generate_points(n: int, rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """60% of points in 3 city disks (skew), rest uniform in bbox."""
    lat_min, lon_min, lat_max, lon_max = SLO_BBOX
    fi = rng.uniform(lat_min + 0.01, lat_max - 0.01, n)
    la = rng.uniform(lon_min + 0.01, lon_max - 0.01, n)
    in_city = rng.random(n) < 0.6
    which = rng.integers(0, len(CITIES), n)
    for ci, (cfi, cla, r) in enumerate(CITIES):
        m = in_city & (which == ci)
        k = int(m.sum())
        ang = rng.uniform(0, 2 * np.pi, k)
        rad = r * np.sqrt(rng.random(k))
        fi[m] = cfi + rad * np.sin(ang)
        la[m] = cla + rad * np.cos(ang) / np.cos(np.deg2rad(cfi))
    return fi, la


def _dms_vec(dd: np.ndarray, hemi: str) -> np.ndarray:
    """Vectorized `46°03'25.12" N`-style strings (np.char C printf)."""
    d = np.floor(dd).astype(np.int64)
    rem = (dd - d) * 60.0
    m = np.floor(rem).astype(np.int64)
    s = (rem - m) * 60.0
    # Guard the rare s==60.00 rounding carry so parse == truth.
    s = np.minimum(s, 59.994999)
    out = np.char.add(np.char.mod("%d", d), "°")
    out = np.char.add(out, np.char.mod("%02d", m))
    out = np.char.add(out, "'")
    out = np.char.add(out, np.char.mod("%05.2f", s))
    return np.char.add(out, f'" {hemi}')


def make_pages_table(n_rows: int, seed: int = SEED, id_offset: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed)
    idx = np.arange(id_offset, id_offset + n_rows, dtype=np.int64)
    lang = LANGS[rng.choice(len(LANGS), n_rows, p=LANG_P)]
    url = np.char.add(
        np.char.add("https://ex-", lang), np.char.mod(".example/p%09d", idx)
    )
    # Deterministic spread over 2024 (us precision).
    ts = np.datetime64("2024-01-01T00:00:00", "us") + (
        (idx * np.int64(2654435761)) % np.int64(31_536_000)
    ).astype("timedelta64[s]").astype("timedelta64[us]")

    has_coord = rng.random(n_rows) < 0.7
    fi, la = generate_points(n_rows, rng)
    layout = rng.choice(4, n_rows, p=[0.4, 0.2, 0.2, 0.2])  # dec, dms, d48, d96

    # Projected truth for layouts 2/3.
    x48, y48, _ = fila_wgs2gkxy(fi, la)
    x96, y96 = tm_fwd(fi, la, D96_TM)

    # Coordinate strings, fully vectorized per layout.
    coord = np.empty(n_rows, dtype=object)
    m0 = layout == 0
    coord[m0] = np.char.add(
        np.char.add(np.char.mod("%.4f", fi[m0]), ", "), np.char.mod("%.4f", la[m0])
    )
    m1 = layout == 1
    coord[m1] = np.char.add(np.char.add(_dms_vec(fi[m1], "N"), " "), _dms_vec(la[m1], "E"))
    for mcode, xx, yy, tag in ((2, x48, y48, "(D48/GK)"), (3, x96, y96, "(D96/TM)")):
        m = layout == mcode
        c = np.char.add(np.char.mod("x=%.1f", xx[m]), np.char.mod(" y=%.1f", yy[m]))
        coord[m] = np.char.add(c, " " + tag)
    coord[~has_coord] = ""

    # Filler text: word pool sampled as prefix/suffix phrase tables so
    # the whole corpus builds with C-level string ops.
    pool = np.array([" ".join(rng.choice(_FILLER, 6)) for _ in range(512)])
    prefix = pool[(idx * 7 + rng.integers(0, 512, n_rows)) % 512]
    suffix = pool[(idx * 13 + rng.integers(0, 512, n_rows)) % 512]
    mid = np.where(has_coord, np.char.add(np.char.add(" ", coord.astype(str)), " "), " ")
    texts = np.char.add(np.char.add(prefix, mid), suffix)

    html_str = np.char.add(np.char.add("<html><body>", texts), "</body></html>")
    text_arr = pa.array(texts, pa.string())
    return pa.table(
        {
            "url": pa.array(url, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.compute.cast(pa.array(html_str, pa.string()), pa.binary()),
            "text": text_arr,
            "lang": pa.array(lang, pa.string()),
            # Ground truth (oracle columns; real corpora obviously lack
            # these — the pipeline must never read them).
            "_true_fi": pa.array(fi),
            "_true_la": pa.array(la),
            "_true_layout": pa.array(np.where(has_coord, layout, -1).astype(np.int8)),
        }
    )


def sf_to_n_rows(sf_dir: str) -> int:
    """Map a testdata sf dir to a deterministic pages row count."""
    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.001
    return max(200, int(5_000_000 * sf))


def pages_parquet(n_rows: int, seed: int = SEED, shards: int = 32) -> str:
    """Write (once, cached) the synthetic pages table as a sharded
    parquet directory under /tmp and return the path. Sharded so the
    Ray read parallelizes like a real multi-file corpus."""
    path = f"/tmp/geokit_pages/n{n_rows}_s{seed}"
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        os.makedirs(path, exist_ok=True)
        per = (n_rows + shards - 1) // shards
        start = 0
        for s in range(shards):
            cnt = min(per, n_rows - start)
            if cnt <= 0:
                break
            shard_path = os.path.join(path, f"part-{s:04d}.parquet")
            # Resume-safe: shards are deterministic in (seed, offset),
            # so a prior interrupted generation's finished shards are
            # exact and can be kept (only the in-flight one could be
            # torn — write to a temp name and rename atomically).
            if not os.path.exists(shard_path):
                t = make_pages_table(cnt, seed + s, id_offset=start)
                tmp_path = shard_path + ".tmp"
                pq.write_table(t, tmp_path)
                os.replace(tmp_path, shard_path)
            start += cnt
        with open(done, "w") as f:
            f.write("ok")
    return path
