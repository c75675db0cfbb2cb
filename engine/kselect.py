"""Exact distributed global selection (X69): k-th smallest without a
global sort, by driver-coordinated iterative histogram narrowing.

grouped_quantiles / winsorize compute exact ranks by co-partitioning
GROUPS — correct while every group fits one partition. The degenerate
case at corpus scale is ONE giant group (a global median over 10^12
values): no key to partition by, and a global sort is exactly the
all-to-all the engine avoids. The classic fix (distributed selection
/ iterative bucketing, the BigTable/Dremel approximate-histogram
ancestor made EXACT) runs here:

  state per requested rank: value interval [lo, hi] and the residual
  rank k within it. Each round, ONE combiner pass histograms every
  unresolved interval into B equal-width buckets (per-block int64
  np.add.at partials — a few KB per block); the driver locates the
  bucket holding rank k, subtracts the counts below it, and narrows.
  An interval shrinks by B each round (B = 512 => <= 7 rounds for the
  full int64 range); when its population falls under a gather cap,
  one bounded filter pass collects the survivors and picks exactly.

Every pass is a full scan of the PRUNED, MATERIALIZED int column
(8 B/row in the object store, spillable); rounds are driver-synced
scalars — the same iterate-with-1-row-sync discipline as BPE's merge
argmax (engine/bpe.py). Result is EXACT for any distribution
(duplicates, skew, adversarial gaps) — the gather cap only changes
WHEN gathering happens, never the value.

The DuckDB mirror computes each rank as ORDER BY + OFFSET k-1 (the
sort plan); ranks use the shared ceil(q*n) integer formula, so the
gate checks the narrowing loop value-for-value.

Upstream parity: no analogue in GeoCoordinateConverter; brief-mandated
analytics machinery (corpus-wide exact percentiles for threshold
picking — dedup cutoffs, quality gates — where "one giant group"
is the normal case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# (tag, numerator, denominator): rank k = ceil(q * n), 1-based
DEFAULT_RANKS: tuple[tuple[str, int, int], ...] = (
    ("p25", 1, 4),
    ("p50", 1, 2),
    ("p75", 3, 4),
    ("p99", 99, 100),
)

_BUCKETS = 512
_GATHER_CAP = 65_536


def global_kth(
    ds: Dataset,
    x_col: str,
    ranks: tuple[tuple[str, int, int], ...] = DEFAULT_RANKS,
) -> pa.Table:
    """Exact k-th-smallest values of ``x_col`` (int64) at the given
    rank fractions. Returns a tiny Arrow table (tag, n, k, value) —
    driver-resident by design, like every reduced aggregate."""
    from ray.data.aggregate import Count, Max, Min

    ds = ds.materialize()  # scanned once per round
    mm = ds.aggregate(Count(), Min(x_col), Max(x_col))
    n = int(mm["count()"])
    if n == 0:
        return pa.table(
            {
                "tag": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "value": pa.array([], pa.int64()),
            }
        )
    glo, ghi = int(mm[f"min({x_col})"]), int(mm[f"max({x_col})"])
    if ghi - glo > (1 << 63) - 2:
        # the per-block (x - lo) histogram index is int64; a value
        # range spanning the WHOLE int64 line would wrap it — split
        # such inputs by sign first (never hits cents/epoch data)
        raise ValueError("global_kth: value range width must be < 2^63")

    # state: tag -> [lo, hi, k_residual, population]; resolved: tag -> value
    state: dict[str, list[int]] = {}
    ks: dict[str, int] = {}
    for tag, qn, qd in ranks:
        k = max(1, -(-qn * n // qd))  # ceil(q*n), 1-based global rank
        ks[tag] = k
        state[tag] = [glo, ghi, k, n]
    resolved: dict[str, int] = {}

    def settle():
        for tag in list(state):
            lo, hi, k, pop = state[tag]
            if lo == hi:
                resolved[tag] = lo
                del state[tag]

    settle()
    while state:
        # gather small populations exactly in one bounded filter pass
        gather = {t: s for t, s in state.items() if s[3] <= _GATHER_CAP}
        if gather:
            # OR of each tag's OWN [lo, hi] — NOT their union hull.
            # All rank intervals narrow at the same rate, so p25..p99
            # typically cross the cap in the same round; the hull from
            # the p25 interval to the p99 interval would collect an
            # O(n) fraction of the corpus to the driver (~74% measured
            # on uniform data). Per-interval OR bounds the collect at
            # n_tags * _GATHER_CAP rows — the documented contract.
            ivs = sorted({(s[0], s[1]) for s in gather.values()})

            def in_range(b: pa.Table) -> pa.Table:
                x = b[x_col]
                m = None
                for lo_i, hi_i in ivs:
                    mi = pc.and_(
                        pc.greater_equal(x, pa.scalar(lo_i)),
                        pc.less_equal(x, pa.scalar(hi_i)),
                    )
                    m = mi if m is None else pc.or_(m, mi)
                return pa.table({x_col: x.filter(m)})

            vals = np.sort(
                ds.map_batches(in_range, batch_format="pyarrow")
                .to_pandas()[x_col]
                .to_numpy()
                .astype(np.int64)
            )
            for tag, (lo, hi, k, _pop) in gather.items():
                sub = vals[np.searchsorted(vals, lo) :]
                sub = sub[: np.searchsorted(sub, hi, side="right")]
                resolved[tag] = int(sub[k - 1])
                del state[tag]
            continue
        # one histogram pass over every unresolved interval
        snap = {t: (s[0], s[1]) for t, s in state.items()}
        widths = {
            t: max(1, -(-(hi - lo + 1) // _BUCKETS))
            for t, (lo, hi) in snap.items()
        }

        def hist(b: pa.Table, snap=snap, widths=widths) -> pa.Table:
            x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
            tags_out, bk_out, cnt_out = [], [], []
            for t, (lo, hi) in snap.items():
                m = (x >= lo) & (x <= hi)
                if not m.any():
                    continue
                idx = (x[m] - lo) // widths[t]
                counts = np.zeros(_BUCKETS, np.int64)
                np.add.at(counts, idx, 1)
                nz = np.flatnonzero(counts)
                tags_out.append(np.full(len(nz), t, object))
                bk_out.append(nz.astype(np.int64))
                cnt_out.append(counts[nz])
            if not tags_out:
                return pa.table(
                    {
                        "tag": pa.array([], pa.string()),
                        "bk": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "tag": pa.array(np.concatenate(tags_out), pa.string()),
                    "bk": pa.array(np.concatenate(bk_out)),
                    "c": pa.array(np.concatenate(cnt_out)),
                }
            )

        pp = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
        agg = pp.groupby(["tag", "bk"])["c"].sum()
        for t in list(state):
            lo, hi, k, _pop = state[t]
            w = widths[t]
            counts = np.zeros(_BUCKETS, np.int64)
            if t in agg.index.get_level_values(0):
                sub = agg.loc[t]
                counts[sub.index.to_numpy().astype(np.int64)] = sub.to_numpy()
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, k))
            below = int(cum[b - 1]) if b else 0
            state[t] = [
                lo + b * w,
                min(hi, lo + (b + 1) * w - 1),
                k - below,
                int(counts[b]),
            ]
        settle()

    return pa.table(
        {
            "tag": pa.array([t for t, _, _ in ranks], pa.string()),
            "n": pa.array([n] * len(ranks), pa.int64()),
            "k": pa.array([ks[t] for t, _, _ in ranks], pa.int64()),
            "value": pa.array(
                [resolved[t] for t, _, _ in ranks], pa.int64()
            ),
        }
    )


def global_kth_events(ds_events: Dataset) -> pa.Table:
    """Gate pipeline: exact global p25/p50/p75/p99 of events'
    value-milli — the one-giant-group selection case."""

    def prep(b: pa.Table) -> pa.Table:
        milli = pc.cast(
            pc.round(
                pc.multiply(b["value"], 1000.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"x": milli})

    return global_kth(ds_events.map_batches(prep, batch_format="pyarrow"), "x")


def sql_global_kth_events() -> str:
    """DuckDB mirror: each rank = the ORDER BY + OFFSET sort plan the
    engine's narrowing loop avoids; ranks share the exact
    ceil(q*n) integer formula."""
    parts = []
    for tag, qn, qd in DEFAULT_RANKS:
        parts.append(f"""
SELECT '{tag}' AS tag,
       (SELECT COUNT(*) FROM v) AS n,
       GREATEST(1, ({qn} * (SELECT COUNT(*) FROM v) + {qd} - 1) // {qd}) AS k,
       (SELECT x FROM v ORDER BY x
        LIMIT 1
        OFFSET GREATEST(1, ({qn} * (SELECT COUNT(*) FROM v) + {qd} - 1) // {qd}) - 1
       ) AS value""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH v AS (
  SELECT CAST(ROUND(value * 1000) AS BIGINT) AS x FROM events)
{body}
"""
