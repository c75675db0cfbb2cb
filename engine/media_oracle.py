"""Driver-gate VALUE oracle for the tri-modal media pipeline.

``media_pipeline`` (VERDICT-r3 #6) runs the REAL spec-implemented
decoders (PPM, padded-BGR-bottom-up BMP, WAV, big-endian .au,
YUV4MPEG2) through auto-sniffing actor pools at NATIVE size and emits
order-invariant exact-int aggregates per media (pixel-byte sum, signed
int16 sample sum, luma-plane sum, dimensions, counts). The DuckDB
mirror recomputes every aggregate from the SAME payload bytes by pure
byte arithmetic — ``hex(payload)`` exploded through generate_series,
header fields decoded from fixed offsets (BMP/WAV/AU) or ASCII-in-hex
regexp (PPM/Y4M) — a fully independent second implementation of each
container format. A wrong header parse, row-padding slip, endianness
flip or plane-offset bug on either side mismatches the gate.

Order-invariance is what keeps the SQL tractable: byte SUMS don't care
about BGR channel order, bottom-up row order, or zero row-padding, so
the mirror never re-indexes pixels — it only has to find where the
data starts (and, for Y4M, which bytes are luma, which is pure modular
arithmetic over the frame length).

Both engines read identical bytes from the cached corpus parquet
(engine.multimodal.media_corpus_parquet — the exact mixed-format
tables the rows-only pipeline has always used). The oracle path is
pinned to the driver's correctness sf (0.01), like the geo_enriched
precedent; the Ray query materializes the cache before the oracle runs
(driver order: query, then oracle).
"""

from __future__ import annotations

from ray.data import Dataset

_HEXD = "0123456789ABCDEF"


def _v(i: str) -> str:
    """SQL: byte value at 1-based position ``i`` of the hex string hx."""
    return (
        f"((strpos('{_HEXD}', substring(hx, 2*({i})-1, 1)) - 1) * 16"
        f" + strpos('{_HEXD}', substring(hx, 2*({i}), 1)) - 1)"
    )


def _le(first: int, nbytes: int) -> str:
    """SQL: little-endian unsigned int at fixed 1-based byte offset."""
    return " + ".join(f"{_v(str(first + k))} * {256 ** k}" for k in range(nbytes))


def _be(first: int, nbytes: int) -> str:
    """SQL: big-endian unsigned int at fixed 1-based byte offset."""
    return " + ".join(
        f"{_v(str(first + k))} * {256 ** (nbytes - 1 - k)}" for k in range(nbytes)
    )


# '3X' hex pairs (ASCII digits) -> decimal: drop the leading 3 of each
# pair. regexp_replace with a backreference keeps it one expression.
def _ascii_digits(group_expr: str) -> str:
    return f"CAST(regexp_replace({group_expr}, '3(.)', '\\1', 'g') AS BIGINT)"


def _sql_media_pipeline(sf_dir: str = "/root/testdata/sf0.01") -> str:
    import os

    from engine.pages import sf_to_n_rows

    n = max(64, sf_to_n_rows(sf_dir) // 200)
    root = f"/tmp/geokit_media/n{n}"
    img_p = os.path.join(root, "images.parquet")
    aud_p = os.path.join(root, "audio.parquet")
    vid_p = os.path.join(root, "video.parquet")

    # ---- images: PPM "P6\n{w} {h}\n255\n" | BMP fixed LE header ----
    # PPM header hex: 50 36 0A <digits> 20 <digits> 0A 32 35 35 0A
    ppm_pat = "^50360A((?:3[0-9])+)20((?:3[0-9])+)0A3235350A"
    img = f"""
img AS (SELECT media_id, hex(payload) AS hx, octet_length(payload) AS nb
        FROM read_parquet('{img_p}')),
imgmeta AS (
 SELECT media_id, hx, nb,
   CASE WHEN substring(hx, 1, 4) = '5036' THEN
     {_ascii_digits(f"regexp_extract(hx, '{ppm_pat}', 1)")}
   ELSE {_le(19, 4)} END AS w,
   CASE WHEN substring(hx, 1, 4) = '5036' THEN
     {_ascii_digits(f"regexp_extract(hx, '{ppm_pat}', 2)")}
   ELSE {_le(23, 4)} END AS h,
   CASE WHEN substring(hx, 1, 4) = '5036' THEN
     -- P6\\n + wdigits + ' ' + hdigits + \\n255\\n
     3 + length(regexp_extract(hx, '{ppm_pat}', 1)) // 2
       + 1 + length(regexp_extract(hx, '{ppm_pat}', 2)) // 2 + 5
   ELSE {_le(11, 4)} END AS off
 FROM img),
imgx AS (
 SELECT media_id, w, h, hx, unnest(generate_series(off + 1, nb)) AS i
 FROM imgmeta),
img_cs AS (
 SELECT media_id,
   CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
   CAST(SUM({_v('i')}) AS BIGINT) AS pix_sum
 FROM imgx GROUP BY media_id, w, h)"""

    # ---- audio: canonical 44-byte WAV (LE) | 24-byte .au (BE) ------
    aud = f"""
aud AS (SELECT media_id, hex(payload) AS hx, octet_length(payload) AS nb
        FROM read_parquet('{aud_p}')),
audmeta AS (
 SELECT media_id, hx, nb,
   substring(hx, 1, 8) = '52494646' AS is_wav,
   CASE WHEN substring(hx, 1, 8) = '52494646'
     THEN {_le(25, 4)} ELSE {_be(17, 4)} END AS sample_rate,
   CASE WHEN substring(hx, 1, 8) = '52494646'
     THEN 44 ELSE {_be(5, 4)} END AS off
 FROM aud),
audx AS (
 SELECT media_id, sample_rate, nb, off, is_wav, hx,
   unnest(generate_series(off + 1, nb)) AS i
 FROM audmeta),
aud_cs AS (
 SELECT m.media_id,
   CAST(m.sample_rate AS BIGINT) AS sample_rate,
   CAST((m.nb - m.off) // 2 AS BIGINT) AS n_samples,
   CAST(SUM(CASE
     -- LE: data-relative odd byte = low, even = high (x256, signed)
     WHEN m.is_wav AND (m.i - m.off) % 2 = 1 THEN {_v('m.i')}
     WHEN m.is_wav THEN 256 * {_v('m.i')}
       - CASE WHEN {_v('m.i')} >= 128 THEN 65536 ELSE 0 END
     -- BE: data-relative odd byte = high (x256, signed), even = low
     WHEN (m.i - m.off) % 2 = 1 THEN 256 * {_v('m.i')}
       - CASE WHEN {_v('m.i')} >= 128 THEN 65536 ELSE 0 END
     ELSE {_v('m.i')} END) AS BIGINT) AS samp_sum
 FROM audx m GROUP BY m.media_id, m.sample_rate, m.nb, m.off)"""

    # ---- video: Y4M "YUV4MPEG2 ...\n" + per-frame FRAME\n + YUV ----
    # Header = hex pairs up to the first PAIR-ALIGNED 0A (the header
    # is pure ASCII, so the first aligned 0A is the newline).
    y4m_hdr = "^(595556344D50454732(?:..)*?0A)"
    vid = f"""
vid AS (SELECT media_id, hex(payload) AS hx, octet_length(payload) AS nb
        FROM read_parquet('{vid_p}')),
vidmeta AS (
 SELECT media_id, hx, nb,
   length(regexp_extract(hx, '{y4m_hdr}', 1)) // 2 AS hdr,
   {_ascii_digits("regexp_extract(hx, '2057((?:3[0-9])+)', 1)")} AS w,
   {_ascii_digits("regexp_extract(hx, '2048((?:3[0-9])+)', 1)")} AS h
 FROM vid),
vidx AS (
 SELECT media_id, w, h, nb, hdr, hx,
   unnest(generate_series(hdr + 1, nb)) AS i
 FROM vidmeta),
vid_cs AS (
 SELECT m.media_id,
   CAST(m.w AS BIGINT) AS vid_w, CAST(m.h AS BIGINT) AS vid_h,
   CAST((m.nb - m.hdr) // (6 + m.w * m.h * 3 // 2) AS BIGINT) AS n_frames,
   CAST(SUM(CASE WHEN (m.i - m.hdr - 1) % (6 + m.w * m.h * 3 // 2)
       BETWEEN 6 AND 5 + m.w * m.h
     THEN {_v('m.i')} ELSE 0 END) AS BIGINT) AS y_sum
 FROM vidx m GROUP BY m.media_id, m.w, m.h, m.nb, m.hdr)"""

    return f"""
WITH {img.lstrip()},
{aud.lstrip()},
{vid.lstrip()}
SELECT i.media_id, i.width, i.height, i.pix_sum,
  a.sample_rate, a.n_samples, a.samp_sum,
  v.vid_w, v.vid_h, v.n_frames, v.y_sum
FROM img_cs i JOIN aud_cs a USING (media_id) JOIN vid_cs v USING (media_id)
"""


def q_media_pipeline(sf_dir: str) -> Dataset:
    """Tri-modal pipeline at SQL-value strength: the cached mixed
    corpora (PPM+BMP / WAV+AU / Y4M) through one auto-sniffing actor
    pool per modality (magic-byte detection — the reference's
    layout-autodetect idiom), native-size decode, exact-int checksums,
    image ⋈ audio ⋈ video hash joins on media_id. The feature variant
    (resize/rms/frame-sample rollup) stays registered as
    media_features (rows-only, pytest-exact decode checks)."""
    import ray.data as rd

    from engine.joins import hash_join
    from engine.multimodal import (
        AudioChecksum,
        ImageChecksum,
        VideoChecksum,
        media_corpus_parquet,
    )
    from engine.pages import sf_to_n_rows
    from engine.util import clean_read_schema

    n = max(64, sf_to_n_rows(sf_dir) // 200)
    paths = media_corpus_parquet(n)

    def read(kind: str) -> Dataset:
        cols = ["media_id", "payload"]
        return rd.read_parquet(
            paths[kind], columns=cols, schema=clean_read_schema(paths[kind], cols)
        )

    pool = dict(batch_format="pyarrow", batch_size=32, concurrency=(1, 8))
    imgs = read("images").map_batches(ImageChecksum, **pool)
    auds = read("audio").map_batches(AudioChecksum, **pool)
    vids = read("video").map_batches(VideoChecksum, **pool)
    ia = hash_join(imgs, auds, key="media_id", num_buckets=4, how="inner")
    return hash_join(ia, vids, key="media_id", num_buckets=4, how="inner")
