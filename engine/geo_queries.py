"""Geo pipeline driver-contract queries (rows-only checks).

The geodesy operators are not ANSI-SQL-expressible (TM series, Helmert
chain, triangle AFT, bilinear geoid, S2 cells), so per the driver
contract they get rows-only checks here and their exactness is proven
by the pytest golden/oracle suite (tests/test_kernels.py,
tests/test_joins.py, tests/test_pipeline.py) instead.

Inputs are the deterministic synthetic pages corpus (FIXTURES.md §A)
sized from the sf dir — BASELINE.json:input_hint shape; the driver's
relational tables carry no coordinates.
"""

from __future__ import annotations

from ray.data import Dataset

from engine.pages import pages_parquet, sf_to_n_rows
from engine.pipeline import cell_rollup, densest_cells, enrich_pages
from engine.shuffle import grouped_count_sums


def _pages(sf_dir: str) -> str:
    return pages_parquet(sf_to_n_rows(sf_dir))


def q_geo_enriched(sf_dir: str) -> Dataset:
    """Full flagship enrichment: extract -> project (both grids) ->
    geoid -> AFT -> cell -> PIP -> kNN."""
    ds = enrich_pages(_pages(sf_dir))
    return ds.select_columns(
        [
            "url",
            "lang",
            "fi",
            "la",
            "system",
            "x_d96",
            "y_d96",
            "x_d48",
            "y_d48",
            "x_d96_aft",
            "y_d96_aft",
            "H_orth",
            "cell",
            "muni_id",
        ]
    )


def q_geo_cell_rollup(sf_dir: str) -> Dataset:
    return cell_rollup(enrich_pages(_pages(sf_dir)))


def q_geo_densest_cells(sf_dir: str) -> Dataset:
    return densest_cells(enrich_pages(_pages(sf_dir)), k=20)


def q_geo_muni_rollup(sf_dir: str) -> Dataset:
    """Pages per municipality (PIP join then combiner aggregate)."""
    ds = enrich_pages(_pages(sf_dir)).select_columns(["muni_id", "H_orth"])
    return grouped_count_sums(ds, key="muni_id", mean_cols=("H_orth",))


GEO_REGISTRY = {
    "geo_enriched": q_geo_enriched,
    "geo_cell_rollup": q_geo_cell_rollup,
    "geo_densest_cells": q_geo_densest_cells,
    "geo_muni_rollup": q_geo_muni_rollup,
}
