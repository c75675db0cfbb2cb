"""Local replica of the driver's correctness gate: run every
``queries()`` entry at a given sf against its ``oracle_sql()`` DuckDB
mirror; compare row count, schema (column-name set) and
order-insensitive values (columns sorted by name, rows sorted by all
columns; floats must match to 1e-9 relative, ints/strings exactly).

Usage: python -m tools.check_oracles [--all] [sf_dir] [query ...]

``--all`` sweeps the ENTIRE registry (engine.queries.REGISTRY +
GEO_REGISTRY), not just the driver's 50-query window — the
window-rotation debt check (VERDICT r4 item 8): every rotated-out
entry re-verifies against its REGISTRY oracle so rotation never
silently hides a regression. Entries without SQL run rows-only.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame, float_cols: set | None = None) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    # Sort by exact-typed columns FIRST, floats last: float columns can
    # differ in low bits between engines and a float-led sort could
    # misalign rows. float_cols must be the UNION of both frames'
    # float columns (dtypes differ across engines — e.g. DuckDB HUGEINT
    # sums arrive as float64 while Ray's are int64), so both frames
    # sort in the same column order.
    if float_cols is None:
        float_cols = {c for c in df.columns if np.issubdtype(df[c].dtype, np.floating)}
    order = sorted(df.columns, key=lambda c: (c in float_cols, c))
    return df.sort_values(by=order, kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    errs = []
    if len(ray_df) != len(sql_df):
        errs.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        errs.append(f"schema ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return errs
    if errs:
        return errs
    float_cols = {
        c
        for df in (ray_df, sql_df)
        for c in df.columns
        if np.issubdtype(df[c].dtype, np.floating)
    }
    a, b = canon(ray_df, float_cols), canon(sql_df, float_cols)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        # The driver's value-hash is dtype- and bit-exact: an int64
        # engine column vs a float64 oracle column (DuckDB HUGEINT
        # arriving as float) hash-mismatches even when values agree.
        # Mirror that: dtype divergence is a HARD failure here.
        ak, bk = np.asarray(av).dtype.kind, np.asarray(bv).dtype.kind
        if ak != bk:
            errs.append(
                f"col {c}: DTYPE ray={np.asarray(av).dtype} sql={np.asarray(bv).dtype}"
                " (driver hash would mismatch)"
            )
            continue
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            bad = ~np.isclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True)
            nexact = int((av != bv).sum())
            if bad.any():
                i = int(np.argmax(bad))
                errs.append(f"col {c}: {bad.sum()} mismatches, e.g. {av[i]} vs {bv[i]}")
            elif nexact:
                errs.append(
                    f"col {c}: {nexact} non-bitwise float diffs (within tol but"
                    " driver hash would mismatch)"
                )
        else:
            if not np.array_equal(av, bv):
                bad = av != bv
                i = int(np.argmax(bad))
                errs.append(f"col {c}: {bad.sum()} mismatches, e.g. {av[i]!r} vs {bv[i]!r}")
    return errs


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--all"]
    all_mode = "--all" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from engine.util import filter_ray_empty_block_schema_warnings

    filter_ray_empty_block_schema_warnings()

    import __ray_entry__ as e

    if all_mode:
        from engine.geo_queries import GEO_REGISTRY
        from engine.queries import REGISTRY

        qs = {}
        oracles = {}
        for n, (fn, sql) in REGISTRY.items():
            qs[n] = fn
            if sql is not None:
                oracles[n] = sql
        for n, fn in GEO_REGISTRY.items():
            qs.setdefault(n, fn)
    else:
        qs = e.queries()
        oracles = e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"[FAIL] {name}: ray query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(ray_df)} rows, {len(ray_df.columns)} cols ({dt:.1f}s)")
            continue
        sql_df = con.sql(oracles[name]).df()
        errs = compare(name, ray_df, sql_df)
        hard = errs
        if hard:
            failures += 1
            print(f"[FAIL] {name} ({dt:.1f}s):")
            for e2 in errs:
                print(f"    {e2}")
        else:
            w = "; ".join(x for x in errs if "WARNING" in x)
            print(f"[ok] {name}: {len(ray_df)} rows ({dt:.1f}s){' ' + w if w else ''}")

    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
