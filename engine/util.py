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
