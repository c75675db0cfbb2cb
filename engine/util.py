"""Small shared helpers for Arrow-batch kernels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def col_np(batch: pa.Table, col: str) -> np.ndarray:
    """Column -> numpy, ChunkedArray-safe (the one implementation —
    stages/raster/sql_oracles all need exactly this)."""
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False)


def filter_ray_empty_block_schema_warnings() -> None:
    """Install a logging filter for ONE specific Ray Data warning:
    "Operator produced a RefBundle with a different schema ... new
    schema: ." — emitted when an operator outputs a SCHEMA-LESS empty
    bundle after normal ones.

    Root cause (verified against ray 2.49.2 source): a sort-based
    shuffle with more output ranges than distinct key values produces
    empty quantile ranges, and ``merge_sorted_blocks`` returns
    ``pa.table({})`` for them (ray/data/_internal/arrow_block.py:409);
    ``map_batches`` UDFs are never invoked on empty blocks, so no user
    code can re-type those bundles. The executor keeps the previous
    schema when schemas are not enforced, so the condition is harmless.
    Every ENGINE-produced block is schema-stable (typed empties via
    keyed_partition_map(out_schema=...), hashable schemas via
    clean_read_schema); only this Ray-internal artifact is filtered —
    schema divergences BETWEEN TYPED schemas still warn."""
    import logging

    class _EmptyBundleSchemaNoise(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "Operator produced a RefBundle with a different schema" in msg
                and "new schema: ." in msg
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyBundleSchemaNoise())


def clean_read_schema(path: str, columns=None) -> pa.Schema | None:
    """Metadata-FREE schema for a parquet read (file or directory).

    Parquet files written through pandas carry a ``b'pandas'`` schema
    metadata dict that makes ``pa.Schema`` unhashable; Ray's block
    concat then logs "Failed to hash the schemas (for deduplication)"
    on every chunk unification (transform_pyarrow.unify_schemas ->
    set(schemas)). Passing read_parquet an explicit metadata-free
    (sub)schema makes every downstream block schema hashable. Returns
    None if no footer can be read (caller falls back to plain read)."""
    import glob
    import os

    import pyarrow.parquet as pq

    try:
        f = path
        if os.path.isdir(path):
            members = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not members:
                return None
            f = members[0]
        full = pq.read_schema(f)
        names = list(columns) if columns is not None else list(full.names)
        return pa.schema([full.field(c).remove_metadata() for c in names])
    except Exception:  # noqa: BLE001 — odd layouts: let read_parquet decide
        return None
