"""Count-Min frequency sketch + approximate heavy hitters (SURVEY.md
§2.9 — completes the sketch family: HLL = distinct, t-digest =
quantiles, CMS = per-item frequency).

Same combiner idiom as engine.sketch: per-batch partial = one D×W
int64 counter matrix (vectorized adds), merge = elementwise SUM —
associative and commutative, so CMS(A ∪ B) is register-exact equal to
CMS(A) + CMS(B) (the tests assert this). The shuffle moves one
D×W×8-byte row per input block regardless of data size; at 100 TB the
sketch costs one narrow column scan plus a metadata-sized exchange,
versus a full token shuffle for the exact counts
(engine.queries.q_vocab_topk).

Estimates are one-sided: est(x) >= true(x) always (each row only ever
adds), and est(x) <= true(x) + eps·N with probability 1 - delta for
eps = e/W, delta = e^-D (Cormode & Muthukrishnan 2005, public).

Hashing: one splitmix64 base hash per value (engine.sketch's
version-stable path: FNV-1a over bytes for strings), then D row
hashes derived by re-finalizing base XOR a fixed odd seed per row —
pairwise-independent enough in practice and fully vectorized.

Driver-gate status: approximate by design, so excluded from the
50-query oracle window like ann_ivf / approx_distinct_users; accuracy
and the overcount-only property are pytest-bounded against the exact
vocab_topk counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from engine.sketch import _hash_column, _splitmix64

D_DEFAULT = 4  # delta = e^-4 ~= 1.8%
W_DEFAULT = 1 << 14  # eps = e/16384 ~= 0.017% of total weight

# Fixed odd seeds decorrelating the D row hashes (digits of pi/e —
# nothing-up-my-sleeve constants; any distinct odd values work).
_ROW_SEEDS = np.array(
    [0x243F6A8885A308D3, 0x13198A2E03707345, 0xA4093822299F31D1, 0x082EFA98EC4E6C89],
    dtype=np.uint64,
)


def _row_buckets(base: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) bucket indices: row i uses splitmix64(base ^ seed_i) % w."""
    return np.stack(
        [(_splitmix64(base ^ _ROW_SEEDS[i]) % np.uint64(w)).astype(np.int64) for i in range(d)]
    )


def cms_batch(
    col, weights: np.ndarray | None, d: int = D_DEFAULT, w: int = W_DEFAULT
) -> np.ndarray:
    """One batch's partial (d, w) counter matrix."""
    base = _hash_column(col)
    buckets = _row_buckets(base, d, w)
    cms = np.zeros((d, w), dtype=np.int64)
    wts = np.ones(len(base), dtype=np.int64) if weights is None else weights
    for i in range(d):
        np.add.at(cms[i], buckets[i], wts)
    return cms


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_estimate(cms: np.ndarray, values: pa.Array | list) -> np.ndarray:
    """Point-query estimates (min over rows) for each value — always
    >= the true summed weight, exact when no row collides."""
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values)
    base = _hash_column(values)
    d, w = cms.shape
    buckets = _row_buckets(base, d, w)
    ests = np.stack([cms[i][buckets[i]] for i in range(d)])
    return ests.min(axis=0)


def cms_sketch(
    ds: Dataset,
    col: str,
    weight_col: str | None = None,
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
) -> np.ndarray:
    """Distributed CMS for one column (optionally weighted): per-block
    partial matrices tree-merged inside map_batches, final elementwise
    sum over the handful of surviving rows on the driver (bounded by
    the post-merge block count, never by data size)."""
    width = d * w

    def partial(b: pa.Table) -> pa.Table:
        wts = None
        if weight_col is not None:
            wc = b[weight_col]
            if isinstance(wc, pa.ChunkedArray):
                wc = wc.combine_chunks()
            wts = wc.to_numpy(zero_copy_only=False).astype(np.int64)
        cms = cms_batch(b[col], wts, d, w)
        return pa.table(
            {"cms": pa.FixedSizeListArray.from_arrays(pa.array(cms.reshape(-1)), width)}
        )

    def merge_rows(b: pa.Table) -> pa.Table:
        arr = (
            b["cms"]
            .combine_chunks()
            .values.to_numpy(zero_copy_only=False)
            .reshape(-1, width)
        )
        return pa.table(
            {
                "cms": pa.FixedSizeListArray.from_arrays(
                    pa.array(arr.sum(axis=0, dtype=np.int64)), width
                )
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = partials.map_batches(merge_rows, batch_format="pyarrow", batch_size=64)
    out = np.zeros((d, w), dtype=np.int64)
    for b in merged.iter_batches(batch_format="pyarrow"):
        vals = b["cms"].combine_chunks().values.to_numpy(zero_copy_only=False)
        out += vals.reshape(-1, d, w).sum(axis=0)
    return out


def local_top_candidates(
    ds: Dataset, col: str, weight_col: str, m: int = 64
) -> pa.Array:
    """Heavy-hitter candidate set: each block's top-m keys by local
    weight, distinct-unioned on the driver. Driver traffic is bounded
    by m × blocks rows (never data size). A key with global share
    >= 1/m of any block's weight is in that block's top-m, so true
    global heavy hitters are practically always candidates; the CMS
    estimate then ranks them without a second data pass."""

    def local_top(b: pa.Table) -> pa.Table:
        df = pa.table({col: b[col], "_w": b[weight_col]})
        g = (
            df.group_by(col)
            .aggregate([("_w", "sum")])
            .sort_by([("_w_sum", "descending"), (col, "ascending")])
        )
        return g.slice(0, m).select([col])

    tops = ds.map_batches(local_top, batch_format="pyarrow")
    seen: list = []
    for b in tops.iter_batches(batch_format="pyarrow"):
        seen.extend(b[col].to_pylist())
    return pa.array(sorted(set(seen)))


def q_cms_heavy_hitters(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Approximate top-k document tokens: one pass builds per-batch
    (token, count) combiner partials (shared with vocab_topk), a CMS
    over the weighted partials, and a bounded local-top candidate set;
    estimates rank the candidates with the (est DESC, token ASC) tie
    order. Columns: token, est_cnt."""
    from engine.queries import _read
    from engine.textops import token_count_partials

    ds = _read(sf_dir, "documents", ["text"], rows_per_block=256)
    # materialize() here holds combiner partials (per-block distinct
    # tokens, Heaps'-law bounded), NOT the corpus — two consumers
    # (sketch + candidates) then share one tokenization pass.
    partials = ds.map_batches(token_count_partials, batch_format="pyarrow").materialize()
    sketch = cms_sketch(partials, "token", weight_col="_cnt")
    cands = local_top_candidates(partials, "token", "_cnt", m=2 * k)
    ests = cms_estimate(sketch, cands)
    df = pd.DataFrame({"token": cands.to_pylist(), "est_cnt": ests.astype(np.int64)})
    df = df.sort_values(
        ["est_cnt", "token"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return df.reset_index(drop=True)
