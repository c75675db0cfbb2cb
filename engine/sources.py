"""Row-format sources / sinks for webtext ingestion: JSONL and CSV.

Web-scale text corpora ship as JSONL (one JSON object per line — the
Common-Crawl/WET-derivative interchange shape) and occasionally CSV;
parquet is this engine's native analytical format. These wrappers
adapt Ray Data's streaming readers (`read_json` / `read_csv` — block
per file shard, no driver materialization) with the repo's schema
hygiene, and provide the one-time ingest conversion.

Scale contract, documented rather than hidden:
- A row format cannot prune columns at the read — `columns=` here is
  a post-read projection (drops the data immediately, but the bytes
  were already scanned). A corpus that will be scanned more than once
  should be converted ONCE via `jsonl_to_parquet` and all pipelines
  pointed at the parquet (where `_read`'s pruned scan applies).
- Writers emit one file per block into a directory (resumable /
  parallel like every sink in this repo), never one giant file.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


def read_jsonl(paths: str | Sequence[str], columns: Sequence[str] | None = None) -> Dataset:
    """Streaming JSONL read (one JSON object per line, .jsonl/.json;
    gz shards supported by extension via Arrow). ``columns`` is a
    post-read projection — see the module scale contract."""
    ds = rd.read_json(paths, file_extensions=["jsonl", "json", "gz"])
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds


def read_csv(paths: str | Sequence[str], columns: Sequence[str] | None = None) -> Dataset:
    """Streaming CSV read. ``columns`` is a post-read projection."""
    ds = rd.read_csv(paths)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds


def write_jsonl(ds: Dataset, out_dir: str) -> None:
    """One .json file per block under ``out_dir`` (JSONL lines)."""
    ds.write_json(out_dir)


def write_csv(ds: Dataset, out_dir: str) -> None:
    ds.write_csv(out_dir)


def jsonl_to_parquet(
    paths: str | Sequence[str],
    out_dir: str,
    columns: Sequence[str] | None = None,
    schema: pa.Schema | None = None,
) -> None:
    """The ingest conversion: stream JSONL shards into partitioned
    parquet (one file per block — downstream scans then prune columns
    and row groups for free). ``schema`` optionally casts each block
    (JSON readers infer per-file types; a declared schema pins
    int64/float64/string across shards)."""
    ds = read_jsonl(paths, columns)
    if schema is not None:
        def cast(b: pa.Table) -> pa.Table:
            return b.select(schema.names).cast(schema)

        ds = ds.map_batches(cast, batch_format="pyarrow")
    ds.write_parquet(out_dir)


# --- columnar interchange formats: ORC and Arrow IPC (S7) --------------
#
# Unlike the row formats above, both are COLUMNAR: `columns=` prunes at
# the read (ORC reads only those streams; IPC memory-maps the file so
# unselected column buffers are never paged in), so they are legitimate
# analytical sources, not just ingest shapes. Ray Data has no built-in
# reader/writer for either; reads follow the shapefile pattern (one
# parse task per file — both formats are file-framed), writes follow
# the write_shapefile_partitions pattern (one numbered file per block,
# the resumable layout). Readers/sinks share the two helpers below.


def _read_file_framed(paths: str | Sequence[str], parse_one) -> Dataset:
    if isinstance(paths, str):
        paths = [paths]

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_one(row["path"]) for row in batch.to_pylist()]
        return pa.concat_tables(tables, promote_options="default")

    items = [{"path": str(p)} for p in paths]
    return rd.from_items(items).map_batches(parse, batch_format="pyarrow", batch_size=1)


def _write_blocks(ds: Dataset, out_dir: str, ext: str, write_one) -> list[str]:
    """One part-{i:05d}.{ext} per block. Blocks stream through the
    driver one at a time (the shapefile-sink contract: upstream stays
    distributed, writing is I/O-bound)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i, b in enumerate(ds.iter_batches(batch_size=None, batch_format="pyarrow")):
        p = os.path.join(out_dir, f"part-{i:05d}.{ext}")
        write_one(b, p)
        written.append(p)
    return written


def read_orc(paths: str | Sequence[str], columns: Sequence[str] | None = None) -> Dataset:
    """Dataset over ORC files: one read task per file, columns pruned
    AT the read (pyarrow reads only the selected stripes' streams)."""
    import pyarrow.orc as orc

    cols = list(columns) if columns is not None else None
    return _read_file_framed(paths, lambda p: orc.read_table(p, columns=cols))


def write_orc(ds: Dataset, out_dir: str) -> list[str]:
    import pyarrow.orc as orc

    return _write_blocks(ds, out_dir, "orc", orc.write_table)


def read_ipc(paths: str | Sequence[str], columns: Sequence[str] | None = None) -> Dataset:
    """Dataset over Arrow IPC files (Feather v2 container): one read
    task per file. The file is MEMORY-MAPPED, so with ``columns`` the
    unselected columns' buffers are never paged in — a true pruned
    read, not a post-read projection."""
    import pyarrow.ipc as ipc

    def one(p: str) -> pa.Table:
        # No explicit close: the returned table's buffers hold a
        # reference to the map, which pyarrow keeps alive until the
        # buffers are released (closing it early would invalidate
        # zero-copy views).
        t = ipc.open_file(pa.memory_map(p)).read_all()
        if columns is not None:
            t = t.select(list(columns))
        return t

    return _read_file_framed(paths, one)


def write_ipc(ds: Dataset, out_dir: str) -> list[str]:
    import pyarrow.ipc as ipc

    def one(b: pa.Table, p: str) -> None:
        with ipc.new_file(p, b.schema) as w:
            w.write_table(b)

    return _write_blocks(ds, out_dir, "arrow", one)
