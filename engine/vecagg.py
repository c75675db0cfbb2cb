"""Grouped vector aggregation (X49): exact per-group embedding
centroids — the class-prototype / cluster-summary reduction every
embedding pipeline runs (label prototypes for classification-by-
nearest-centroid, per-domain embedding summaries, k-means M-steps).

Upstream parity: no analogue in GeoCoordinateConverter — brief-
mandated embedding infrastructure (the ann/semantic family; this is
its missing AGGREGATE: ann_multi searches vectors, semantic_clusters
assigns them, label_centroid_sums REDUCES them).

Exactness: float sums are reduction-order-dependent, so the vectors
are quantized ONCE (float64 multiply by 2^20, round half-away — the
repo's exact-int idiom, engine/queries.py cents precedent) and every
downstream sum is int64: results are bit-identical under any
partitioning and SQL-mirrorable term-for-term. The float centroid is
derived from the exact sums in one fixed final division.

Scale shape: the per-batch kernel reduces (n, d) -> (labels-in-batch,
d) partial sums via one np.add.at scatter (no Python loops); only
(label, dim, sum, cnt) partial rows — group-scale × d, never
vector-count-scale — enter the ONE combiner shuffle
(grouped_count_sums). d rides as a column, so a hot label spreads
over d co-partition rows naturally (and `salts` is available).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from engine.shuffle import grouped_count_sums

QUANT = 1 << 20  # 2^20 quantization — float32 inputs are exact in f64


def _quantize_block(
    b: pa.Table, label_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray, int]:
    """(labels, int64 (n, d) matrix, d) for one batch — arrow kernels
    end-to-end so rounding matches SQL ROUND (half away from zero)."""
    col = b[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    q = pc.cast(
        pc.round(
            pc.multiply(pc.cast(flat, pa.float64()), float(QUANT)),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    ).to_numpy()
    n = len(b)
    d = len(q) // n if n else 0
    # ragged vectors would silently misalign the reshape; fail loudly
    offs = col.offsets.to_numpy(zero_copy_only=False)
    if n and not (np.diff(offs) == d).all():
        raise ValueError("label_centroid_sums requires fixed-length vectors")
    labels = b[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return labels, q.reshape(n, d), d


def label_centroid_sums(
    ds: Dataset,
    label_col: str = "label",
    vec_col: str = "embedding",
    num_partitions: int = 8,
    salts: int | str = 1,
) -> Dataset:
    """Exact per-(label, dim) quantized sums + counts + the derived
    centroid. Output: (label, dim, sum_q int64, cnt int64,
    centroid float64 = sum_q / (cnt * 2^20), one fixed division)."""

    def partials(b: pa.Table) -> pa.Table:
        labels, q, d = _quantize_block(b, label_col, vec_col)
        if len(labels) == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                }
            )
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, q)
        cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        lab = np.repeat(uniq, d)
        dim = np.tile(np.arange(d, dtype=np.int64), len(uniq))
        return pa.table(
            {
                "label": pa.array(lab),
                "dim": pa.array(dim),
                "q": pa.array(sums.reshape(-1)),
                # count partial rides dim 0 rows only; reconstructed
                # after the merge by a per-label broadcast join — but
                # simpler and still partial-scale: repeat per dim.
                "c": pa.array(np.repeat(cnts, d)),
            }
        )

    proj = ds.select_columns([label_col, vec_col]).map_batches(
        partials, batch_format="pyarrow"
    )
    merged = grouped_count_sums(
        proj,
        key=["label", "dim"],
        sum_cols=("q", "c"),
        num_partitions=num_partitions,
        salts=salts,
    )

    def finish(b: pa.Table) -> pa.Table:
        sum_q = b["sum_q"].to_numpy(zero_copy_only=False)
        cnt = b["sum_c"].to_numpy(zero_copy_only=False)
        centroid = sum_q / (cnt.astype(np.float64) * float(QUANT))
        return pa.table(
            {
                "label": b["label"],
                "dim": b["dim"],
                "sum_q": pa.array(sum_q),
                "cnt": pa.array(cnt),
                "centroid": pa.array(centroid),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")
