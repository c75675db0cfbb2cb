"""engine — the Ray Data orchestration layer.

Everything here expresses work as ``ray.data.Dataset`` pipelines:
``read_parquet -> map_batches (Arrow, zero-copy) -> groupby/sort ->
write_parquet``. Stateful stages (AFT triangulation, PIP polygons,
kNN control points) are callable classes run as actor pools. No
module in this package calls ``ray.init()`` — sessions are owned by
bench.py / cli.py / the test fixture (driver contract).
"""
