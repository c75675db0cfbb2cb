"""Flagship pipeline: geotag a pages corpus (SURVEY.md §3.1 engine
equivalent of the ``gk-slo`` lifecycle, at corpus scale).

read_parquet(url, warc_ts, text, lang — html pruned AT THE READ)
  -> map_batches(extract_coords)        stateless, RE2-vectorized
  -> map_batches(filter_has_coord)      vectorized predicate
  -> map_batches(project_stage)         TM fwd + Helmert chain (menu 2/4)
  -> map_batches(geoid_stage)           bilinear undulation, module cache
  -> map_batches(AftTransform, actors)  triangle affine, index per actor
  -> map_batches(cell_stage)            S2-style cell at fixed level
  -> map_batches(PipJoin, actors)       municipality PIP join
  -> map_batches(KnnJoin, actors)       control-point kNN join
  -> combiner pre-agg + groupby(cell)   skew-proof per-cell aggregate

Everything streams; nothing materializes the corpus. Batch size 32k
rows keeps a batch (text + ~20 float64 cols) well under 100 MB while
amortizing kernel launch overhead.
"""

from __future__ import annotations

import ray.data as rd
from ray.data import Dataset

from engine.extract import extract_coords, filter_has_coord
from engine.shuffle import grouped_count_sums, topk
from engine.stages import (
    AftTransform,
    KnnJoin,
    PipJoin,
    cell_stage,
    geoid_stage,
    project_stage,
)

BATCH = 32_768


def enrich_pages(
    pages_path: str | list[str],
    level: int = 12,
    knn_k: int = 3,
    actor_concurrency: int | tuple[int, int] = (1, 8),
) -> Dataset:
    """The streaming enrichment pipeline; returns the lazy enriched
    Dataset (one row per geotagged page)."""
    ds = rd.read_parquet(pages_path, columns=["url", "warc_ts", "text", "lang"])
    ds = ds.map_batches(extract_coords, batch_format="pyarrow", batch_size=BATCH)
    ds = ds.map_batches(filter_has_coord, batch_format="pyarrow", batch_size=BATCH)
    ds = ds.map_batches(project_stage, batch_format="pyarrow", batch_size=BATCH)
    ds = ds.map_batches(geoid_stage, batch_format="pyarrow", batch_size=BATCH)
    ds = ds.map_batches(
        AftTransform,
        fn_constructor_kwargs=dict(direction="fwd"),
        batch_format="pyarrow",
        batch_size=BATCH,
        concurrency=actor_concurrency,
    )
    ds = ds.map_batches(
        cell_stage, fn_kwargs=dict(level=level), batch_format="pyarrow", batch_size=BATCH
    )
    ds = ds.map_batches(
        PipJoin,
        batch_format="pyarrow",
        batch_size=BATCH,
        concurrency=actor_concurrency,
    )
    ds = ds.map_batches(
        KnnJoin,
        fn_constructor_kwargs=dict(k=knn_k),
        batch_format="pyarrow",
        batch_size=BATCH,
        concurrency=actor_concurrency,
    )
    return ds


def cell_rollup(enriched: Dataset) -> Dataset:
    """Per-cell aggregate (A1): page count + mean coordinates, via the
    per-batch combiner so the shuffle moves partials, not rows."""
    slim = enriched.select_columns(["cell", "fi", "la"])
    return grouped_count_sums(slim, key="cell", mean_cols=("fi", "la"))


def densest_cells(enriched: Dataset, k: int = 20) -> Dataset:
    """Top-k densest cells (A4) over the already-reduced rollup."""
    return topk(cell_rollup(enriched), "cnt", k)
