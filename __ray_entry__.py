"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

No function here (nor the library code underneath) calls
``ray.init()`` / ``ray.shutdown()`` — sessions are owned by the
driver / bench.py / the test fixture.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001-scale synthetic
    pages (the relational testdata carries no coordinates; the pages
    corpus is the deterministic FIXTURES.md §A table): geotag ->
    project both Slovene grids -> geoid -> AFT -> S2 cells -> PIP ->
    kNN -> per-cell rollup. Returns the rollup as pandas."""
    from engine.geo_queries import q_geo_cell_rollup

    return q_geo_cell_rollup("/root/testdata/sf0.001").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from engine.geo_queries import GEO_REGISTRY
    from engine.queries import REGISTRY

    out: dict[str, Callable[[str], Any]] = {}
    for name, (fn, _sql) in REGISTRY.items():
        out[name] = fn
    out.update(GEO_REGISTRY)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per SQL-expressible query (geo pipelines are
    rows-only; their exactness is covered by the pytest golden suite)."""
    from engine.queries import REGISTRY

    return {name: sql for name, (fn, sql) in REGISTRY.items() if sql is not None}
