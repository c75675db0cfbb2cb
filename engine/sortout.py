"""Globally-sorted export with SAMPLED range splits (X72).

The ORDER BY surface: write a corpus as range-partitioned parquet
files that are each internally sorted and whose lexicographic file
order IS the global order — the standard shape for sorted exports,
merge-ready shards and ordered downstream scans.

The new machinery is the SPLIT CHOICE. pack_shards/sweep partition by
EQUAL-WIDTH value ranges ((v - lo) // width) — correct for their
prefix-sum carries, but a skewed value distribution hot-spots them:
on Zipf values, one width-range holds nearly every row and one task
sorts the corpus. Here splits come from a deterministic per-block
stride SAMPLE (every ceil(n/k)-th value of each block, collected
driver-side — P·k scalars), whose empirical quantiles bound every
partition's population regardless of the distribution (sample-based
range partitioning, the TeraSort design — public literature).

Determinism: the stride sample depends only on block contents and
layout; the EXPORT is layout-independent anyway because splits only
move partition BOUNDARIES — the concatenation of sorted partitions
is the same total order for any split choice. Ties on the sort key
stay within one partition only if the key is unique — callers sort by
a UNIQUE composite (key, tiebreak) packed into the int64 (asserted in
the gate pipeline), which also makes per-file contents deterministic.

Output: out_dir/part-{i:05d}.parquet (+ a manifest row count per
file); `ranked_rows` reads the manifest back and attaches the global
0-based rank = file offset + position — which the DuckDB mirror
recomputes as ROW_NUMBER() OVER (ORDER BY ...), value-checking the
whole write→read→rank chain.

Upstream parity: the reference CLI emits record streams in input
order; ordered bulk export is brief-mandated output machinery.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from ray.data import Dataset

SAMPLE_PER_BLOCK = 64


def sampled_splits(
    ds: Dataset, col: str, num_partitions: int, k: int = SAMPLE_PER_BLOCK
) -> np.ndarray:
    """num_partitions-1 ascending split points from per-block stride
    samples (every ceil(n/k)-th sorted value per block)."""

    def sample(b: pa.Table) -> pa.Table:
        v = np.sort(b[col].to_numpy(zero_copy_only=False).astype(np.int64))
        if len(v) == 0:
            return pa.table({"s": pa.array([], pa.int64())})
        stride = max(1, -(-len(v) // k))
        return pa.table({"s": pa.array(v[::stride])})

    s = np.sort(
        ds.map_batches(sample, batch_format="pyarrow").to_pandas()["s"].to_numpy()
    )
    if len(s) == 0:
        return np.zeros(0, np.int64)
    idx = (np.arange(1, num_partitions) * len(s)) // num_partitions
    return np.unique(s[idx])  # dedup collapses ties; fewer, larger parts


def sorted_export(
    ds: Dataset,
    *,
    col: str,
    out_dir: str,
    num_partitions: int = 32,
    keep_cols: list[str] | None = None,
) -> pd.DataFrame:
    """Write ds as out_dir/part-*.parquet, each sorted by ``col``,
    file order = global order. Returns the manifest DataFrame
    (file, rows, min, max). ``col`` must be int64.

    Filesystem contract: partition files are written from WORKER
    tasks and read back by whoever consumes the manifest — correct
    only when ``out_dir`` is on a filesystem all workers and the
    reader share (single node, NFS, or an object-store mount; at
    cluster scale point it at shared storage). Callers must also use
    a UNIQUE per-run dir (tempfile.mkdtemp — two concurrent runs over
    one dir overwrite each other's part files)."""
    from engine.shuffle import keyed_partition_map

    splits = sampled_splits(ds, col, num_partitions)
    os.makedirs(out_dir, exist_ok=True)
    cols = keep_cols or []

    def tag(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("_part", pa.array(np.searchsorted(splits, v, side="right").astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    schema = pa.schema(
        [("file", pa.string()), ("rows", pa.int64()), ("vmin", pa.int64()), ("vmax", pa.int64())]
    )

    def write_part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "_part" not in df.columns:
            return pd.DataFrame(
                {"file": pd.Series(dtype=object), "rows": pd.Series(dtype=np.int64),
                 "vmin": pd.Series(dtype=np.int64), "vmax": pd.Series(dtype=np.int64)}
            )
        out = []
        # a coarse partition may hold several _part values — one file each
        for p, sub in df.groupby("_part", sort=True):
            sub = sub.sort_values(col, kind="stable")
            name = f"part-{int(p):05d}.parquet"
            tbl = pa.Table.from_pandas(
                sub[[col] + cols], preserve_index=False
            )
            pq.write_table(tbl, os.path.join(out_dir, name))
            v = sub[col].to_numpy()
            out.append((name, len(sub), int(v[0]), int(v[-1])))
        return pd.DataFrame(out, columns=["file", "rows", "vmin", "vmax"])

    manifest = (
        keyed_partition_map(tagged, ["_part"], write_part, num_partitions, out_schema=schema)
        .to_pandas()
        .sort_values("file")
        .reset_index(drop=True)
    )
    # global-order audit across files (adjacent files must not overlap)
    vmax = manifest.vmax.to_numpy()
    vmin = manifest.vmin.to_numpy()
    if len(manifest) > 1 and not (vmax[:-1] <= vmin[1:]).all():
        raise AssertionError("sorted_export: file ranges overlap")
    return manifest


def ranked_rows(out_dir: str, manifest: pd.DataFrame, col: str, cols: list[str]) -> pa.Table:
    """Read the export back in file order and attach the global rank
    (file offset + in-file position) — tiny result tables only; large
    exports consume files directly."""
    offs = np.r_[np.int64(0), np.cumsum(manifest.rows.to_numpy())[:-1]]
    parts = []
    for off, name in zip(offs, manifest.file):
        t = pq.read_table(os.path.join(out_dir, name), columns=[col] + cols)
        parts.append(
            t.append_column(
                "rank", pa.array(off + np.arange(t.num_rows, dtype=np.int64))
            )
        )
    return pa.concat_tables(parts)
