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
