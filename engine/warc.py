"""WARC-style raw-crawl record parsing (X46): the ingest format of
web-scale pipelines (Common-Crawl-shaped WARC/1.0 concatenated
records). A crawl delivers large binary chunk files; each chunk holds
records of the form

    WARC/1.0\\r\\n
    <Header-Name>: <value>\\r\\n ...        (incl. Content-Length: N)
    \\r\\n
    <N payload bytes>\\r\\n\\r\\n

Upstream parity: no analogue in GeoCoordinateConverter — brief-
mandated ingest infrastructure (the from-spec binary-reader family:
engine/shapefile.py, engine/multimodal.py).

Parsing contract (exactly as implemented): records are located by
CONTENT-LENGTH ARITHMETIC (find the first CRLFCRLF after the version
line, read Content-Length, jump), never by searching for the next
record marker — so payloads may legally contain "WARC/1.0\\r\\n" or
CRLFCRLF. The DuckDB gate mirror, by contrast, splits on the record
marker and recovers the payload by CRLFCRLF POSITION arithmetic — a
genuinely independent extraction path; the two agree on any corpus
whose payloads don't contain the full marker (the gate corpus, by
construction), and the Content-Length path is additionally verified
against generator truth on an adversarial marker-in-payload corpus in
pytest.

Scale shape: the parallel unit is the CHUNK (a crawl file split —
64-512 MB in production); chunks stream through an ordinary
map_batches, payload slices are zero-copy views until decode, and
nothing shuffles. The per-record Python loop inside a chunk is the
binary-reader idiom (shapefile/multimodal precedent): record COUNT
per chunk is I/O-bounded, not row-scale relative to the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MARKER = b"WARC/1.0\r\n"
CRLF2 = b"\r\n\r\n"

VOCAB = (
    "crawl fetch parse index shard spider frontier robots sitemap "
    "payload header record offset digest charset"
).split()


class WarcFormatError(ValueError):
    pass


def parse_warc_chunk(chunk_id: int, data: bytes) -> list[dict]:
    """Parse one chunk's records by Content-Length arithmetic."""
    out = []
    off = 0
    n = len(data)
    rec_index = 0
    while off < n:
        if data[off : off + len(MARKER)] != MARKER:
            raise WarcFormatError(f"chunk {chunk_id}: bad magic at {off}")
        hdr_end = data.find(CRLF2, off)
        if hdr_end < 0:
            raise WarcFormatError(f"chunk {chunk_id}: unterminated header at {off}")
        headers: dict[str, str] = {}
        for line in data[off + len(MARKER) : hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b": ")
            headers[k.decode("ascii")] = v.decode("ascii")
        clen = int(headers["Content-Length"])
        p0 = hdr_end + len(CRLF2)
        payload = data[p0 : p0 + clen]
        if len(payload) != clen or data[p0 + clen : p0 + clen + len(CRLF2)] != CRLF2:
            raise WarcFormatError(
                f"chunk {chunk_id}: record {rec_index} truncated at {off}"
            )
        out.append(
            {
                "chunk_id": chunk_id,
                "rec_index": rec_index,
                "warc_type": headers.get("WARC-Type", ""),
                "target_uri": headers.get("WARC-Target-URI", ""),
                "warc_date": headers.get("WARC-Date", ""),
                "content_length": clen,
                "payload": payload.decode("ascii"),
            }
        )
        rec_index += 1
        off = p0 + clen + len(CRLF2)
    return out


def parse_warc_batch(b: pa.Table, id_col: str = "chunk_id", data_col: str = "data") -> pa.Table:
    rows: list[dict] = []
    ids = b[id_col].to_pylist()
    for cid, blob in zip(ids, b[data_col].to_pylist()):
        rows.extend(parse_warc_chunk(cid, blob))
    if not rows:
        return pa.table(
            {
                "chunk_id": pa.array([], pa.int64()),
                "rec_index": pa.array([], pa.int64()),
                "warc_type": pa.array([], pa.string()),
                "target_uri": pa.array([], pa.string()),
                "warc_date": pa.array([], pa.string()),
                "content_length": pa.array([], pa.int64()),
                "payload": pa.array([], pa.string()),
            }
        )
    cols = list(rows[0])
    return pa.table(
        {
            c: pa.array(
                [r[c] for r in rows],
                pa.int64() if c in ("chunk_id", "rec_index", "content_length") else pa.string(),
            )
            for c in cols
        }
    )


def read_warc(ds: Dataset, id_col: str = "chunk_id", data_col: str = "data") -> Dataset:
    """Explode a Dataset of (chunk_id, data-binary) crawl chunks into
    one row per WARC record."""
    return ds.map_batches(
        lambda b: parse_warc_batch(b, id_col=id_col, data_col=data_col),
        batch_format="pyarrow",
    )


def _make_record(i: int, j: int, adversarial: bool) -> tuple[bytes, dict]:
    w = lambda k: VOCAB[(i * 5 + j * 3 + k) % len(VOCAB)]
    wtype = ["response", "request", "metadata"][(i + j) % 3]
    uri = f"https://{w(0)}.example/{w(1)}/{w(2)}?id={i * 100 + j}"
    date = f"2026-{1 + (i % 12):02d}-{1 + (j % 28):02d}T{i % 24:02d}:{j % 60:02d}:00Z"
    words = [VOCAB[(i + j + t) % len(VOCAB)] for t in range(3 + (i * 7 + j) % 9)]
    payload = " ".join(words)
    if (i + j) % 4 == 1:
        payload += "\r\n\r\nsecond paragraph " + w(3)  # CRLFCRLF inside payload
    if (i + j) % 6 == 2:
        payload += " WARC/1.0 lookalike (no CRLF)"  # marker PREFIX inside payload
    if adversarial and (i + j) % 5 == 3:
        payload += "\r\nWARC/1.0\r\nfull marker inside payload"
    body = payload.encode("ascii")
    rec = (
        MARKER
        + f"WARC-Type: {wtype}\r\n".encode()
        + f"WARC-Record-ID: <urn:uuid:{i:08d}-{j:04d}>\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n"  # blank line: header lines already end in CRLF
        + body
        + CRLF2
    )
    truth = {
        "warc_type": wtype,
        "target_uri": uri,
        "warc_date": date,
        "content_length": len(body),
        "payload": payload,
    }
    return rec, truth


def make_warc_corpus(
    n_chunks: int, adversarial: bool = False
) -> tuple[pa.Table, list[dict]]:
    """Deterministic synthetic crawl: (chunk_id, data) chunks of 1-6
    concatenated records each, plus the flat per-record truth list.
    ``adversarial=True`` plants the FULL record marker inside some
    payloads (Content-Length arithmetic must not split there) — used
    in pytest only; the gate corpus keeps the mirror's split rule
    sound (documented in the module docstring)."""
    chunks, truths = [], []
    for i in range(n_chunks):
        n_rec = 1 + (i * 11) % 6
        blob = b""
        for j in range(n_rec):
            rec, truth = _make_record(i, j, adversarial)
            blob += rec
            truths.append({"chunk_id": i, "rec_index": j, **truth})
        chunks.append(blob)
    tbl = pa.table(
        {
            "chunk_id": pa.array(np.arange(n_chunks, dtype=np.int64)),
            "data": pa.array(chunks, pa.binary()),
        }
    )
    return tbl, truths


def warc_corpus_parquet(n_chunks: int) -> str:
    """Persist (once, cached) the gate crawl corpus so both engines
    read identical bytes (the weburl/webhtml idiom)."""
    import os

    import pyarrow.parquet as pq

    root = f"/tmp/geokit_warc/n{n_chunks}"
    path = os.path.join(root, "chunks.parquet")
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(root, exist_ok=True)
    tbl, _ = make_warc_corpus(n_chunks)
    pq.write_table(tbl, path)
    open(done, "w").write("ok")
    return path
