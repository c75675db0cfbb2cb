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
# the read (pyarrow reads only those streams), so they are legitimate
# analytical sources, not just ingest shapes. Ray Data has no built-in
# reader/writer for either; reads follow the shapefile pattern (one
# parse task per file — both formats are file-framed), writes follow
# the write_shapefile_partitions pattern (one numbered file per block,
# the resumable layout).


def read_orc(paths: Sequence[str], columns: Sequence[str] | None = None) -> Dataset:
    """Dataset over ORC files: one read task per file, columns pruned
    AT the read (ORC stripes are columnar)."""
    import pyarrow.orc as orc

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            orc.read_table(row["path"], columns=list(columns) if columns else None)
            for row in batch.to_pylist()
        ]
        return pa.concat_tables(tables, promote_options="default")

    items = [{"path": str(p)} for p in paths]
    return rd.from_items(items).map_batches(parse, batch_format="pyarrow", batch_size=1)


def write_orc(ds: Dataset, out_dir: str) -> list[str]:
    """One part-{i:05d}.orc per block under ``out_dir``. Blocks stream
    through the driver one at a time (the shapefile-sink contract:
    upstream stays distributed, writing is I/O-bound)."""
    import os

    import pyarrow.orc as orc

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i, b in enumerate(ds.iter_batches(batch_size=None, batch_format="pyarrow")):
        p = os.path.join(out_dir, f"part-{i:05d}.orc")
        orc.write_table(b, p)
        written.append(p)
    return written


def read_ipc(paths: Sequence[str], columns: Sequence[str] | None = None) -> Dataset:
    """Dataset over Arrow IPC files (Feather v2 container): one read
    task per file; ``columns`` selects record-batch fields zero-copy."""
    import pyarrow.ipc as ipc

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            t = ipc.open_file(row["path"]).read_all()
            if columns is not None:
                t = t.select(list(columns))
            tables.append(t)
        return pa.concat_tables(tables, promote_options="default")

    items = [{"path": str(p)} for p in paths]
    return rd.from_items(items).map_batches(parse, batch_format="pyarrow", batch_size=1)


def write_ipc(ds: Dataset, out_dir: str) -> list[str]:
    """One part-{i:05d}.arrow IPC file per block under ``out_dir``."""
    import os

    import pyarrow.ipc as ipc

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i, b in enumerate(ds.iter_batches(batch_size=None, batch_format="pyarrow")):
        p = os.path.join(out_dir, f"part-{i:05d}.arrow")
        with ipc.new_file(p, b.schema) as w:
            w.write_table(b)
        written.append(p)
    return written
